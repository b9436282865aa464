"""r12: dialect adapter for the transactional JDBC MERGE sink.

Derby is the EXECUTED leg (the e2e replay matrix in
tests/test_stream_merge.py runs every statement against embedded
Derby). MySQL — the reference warehouse's actual store
(``dags/rentalFilmDAG.py:18-20``) — has no server in this container, so
its leg is certified by GOLDEN SQL: the exact statements the dialect
emits for a representative (2-key + seq) sink, each divergence from the
ANSI/Derby form being one of the documented MySQL constraints
(backtick quoting, CREATE TABLE LIKE, multi-table DELETE, the
error-1093 derived-table probe). A structural twin test then pins that
the two dialects diverge ONLY in syntax — same statement count, same
ordering, so the exactly-once control flow is dialect-invariant.
"""

from __future__ import annotations

from filmdatawarehouse_spark.streaming.jdbc_dialect import (
    DERBY,
    MYSQL,
    DerbyDialect,
    JdbcMergeDialect,
    MySqlDialect,
    dialect_for_url,
)

COLS = ["k1", "k2", "status", "seq"]
KEYS = ["k1", "k2"]


def test_dialect_resolution_from_url():
    assert isinstance(
        dialect_for_url("jdbc:derby:memory:x;create=true"), DerbyDialect
    )
    assert isinstance(
        dialect_for_url("jdbc:mysql://host:3306/warehouse"), MySqlDialect
    )
    assert isinstance(
        dialect_for_url("jdbc:mariadb://host/db"), MySqlDialect
    )
    # unknown subprotocol: the ANSI base, not a crash
    unknown = dialect_for_url("jdbc:postgresql://host/db")
    assert type(unknown) is JdbcMergeDialect


def test_derby_metadata_folding_and_quoting():
    assert DERBY.fold_unquoted("merged_t") == "MERGED_T"
    assert DERBY.quote("status") == '"status"'
    assert MYSQL.fold_unquoted("merged_t") == "merged_t"  # exact probe
    assert MYSQL.quote("status") == "`status`"


def test_mysql_golden_ddl():
    assert (
        MYSQL.create_target_like_staging("tgt", "tgt_stg_r1", COLS)
        == "CREATE TABLE tgt LIKE tgt_stg_r1"
    )
    assert (
        MYSQL.create_key_index("tgt", KEYS)
        == "CREATE INDEX tgt_key_idx ON tgt (`k1`, `k2`)"
    )


def test_mysql_golden_merge_trio():
    got = MYSQL.merge_statements("tgt", "stg", COLS, KEYS, "seq")
    sup = " AND (s.`seq` >= t.`seq` OR t.`seq` IS NULL)"
    eq = "s.`k1` = t.`k1` AND s.`k2` = t.`k2`"
    nsafe = (
        "(s.`k1` = t.`k1` OR (s.`k1` IS NULL AND t.`k1` IS NULL)) AND "
        "(s.`k2` = t.`k2` OR (s.`k2` IS NULL AND t.`k2` IS NULL))"
    )
    assert got == [
        # multi-table DELETE form; indexed pure-equality hot path
        "DELETE t FROM tgt t WHERE EXISTS "
        f"(SELECT 1 FROM stg s WHERE {eq}{sup})",
        # residual null-safe pass, restricted to NULL-key rows
        "DELETE t FROM tgt t WHERE "
        "(t.`k1` IS NULL OR t.`k2` IS NULL) AND EXISTS "
        "(SELECT 1 FROM stg s WHERE "
        f"(s.`k1` IS NULL OR s.`k2` IS NULL) AND {nsafe}{sup})",
        # anti-join INSERT; the target probe goes through a DERIVED
        # table — MySQL error 1093 forbids reading the INSERT target
        # directly in a subquery
        "INSERT INTO tgt (`k1`, `k2`, `status`, `seq`) "
        "SELECT `k1`, `k2`, `status`, `seq` FROM stg s "
        "WHERE ((s.`k1` IS NOT NULL AND s.`k2` IS NOT NULL) "
        "AND NOT EXISTS "
        f"(SELECT 1 FROM (SELECT * FROM tgt) t WHERE {eq})) "
        "OR ((s.`k1` IS NULL OR s.`k2` IS NULL) AND NOT EXISTS "
        "(SELECT 1 FROM (SELECT * FROM tgt) t WHERE "
        f"(t.`k1` IS NULL OR t.`k2` IS NULL) AND {nsafe}))",
    ]


def test_derby_golden_matches_pre_dialect_sql():
    """Regression pin: the refactor must emit byte-identical SQL to the
    r11 inline Derby statements (which the e2e matrix executes)."""
    got = DERBY.merge_statements("tgt", "stg", COLS, KEYS, "seq")
    sup = ' AND (s."seq" >= t."seq" OR t."seq" IS NULL)'
    eq = 's."k1" = t."k1" AND s."k2" = t."k2"'
    nsafe = (
        '(s."k1" = t."k1" OR (s."k1" IS NULL AND t."k1" IS NULL)) AND '
        '(s."k2" = t."k2" OR (s."k2" IS NULL AND t."k2" IS NULL))'
    )
    assert got == [
        "DELETE FROM tgt t WHERE EXISTS "
        f"(SELECT 1 FROM stg s WHERE {eq}{sup})",
        "DELETE FROM tgt t WHERE "
        '(t."k1" IS NULL OR t."k2" IS NULL) AND EXISTS '
        "(SELECT 1 FROM stg s WHERE "
        f'(s."k1" IS NULL OR s."k2" IS NULL) AND {nsafe}{sup})',
        'INSERT INTO tgt ("k1", "k2", "status", "seq") '
        'SELECT "k1", "k2", "status", "seq" FROM stg s '
        'WHERE ((s."k1" IS NOT NULL AND s."k2" IS NOT NULL) '
        "AND NOT EXISTS "
        f"(SELECT 1 FROM tgt t WHERE {eq})) "
        'OR ((s."k1" IS NULL OR s."k2" IS NULL) AND NOT EXISTS '
        "(SELECT 1 FROM tgt t WHERE "
        f'(t."k1" IS NULL OR t."k2" IS NULL) AND {nsafe}))',
    ]
    assert (
        DERBY.create_target_like_staging("tgt", "stg", COLS)
        == 'CREATE TABLE tgt AS SELECT "k1", "k2", "status", "seq" '
        "FROM stg WITH NO DATA"
    )
    assert (
        DERBY.create_key_index("tgt", KEYS)
        == 'CREATE INDEX tgt_key_idx ON tgt ("k1", "k2")'
    )


def test_dialects_diverge_only_in_syntax():
    """Same statement count and order for every dialect — the
    exactly-once control flow (delete-superseded, delete-null-residual,
    insert-missing) is dialect-invariant; no-seq form drops exactly the
    supersedes clause in both."""
    for seq in ("seq", None):
        d = DERBY.merge_statements("t", "s", COLS, KEYS, seq)
        m = MYSQL.merge_statements("t", "s", COLS, KEYS, seq)
        assert len(d) == len(m) == 3
        for dd, mm in zip(d, m):
            assert dd.split()[0] == mm.split()[0]  # DELETE/DELETE/INSERT
        has_sup = seq is not None
        # the supersedes clause lives in the two DELETEs only
        assert all((">=" in x) == has_sup for x in d[:2] + m[:2])
        assert ">=" not in d[2] and ">=" not in m[2]
