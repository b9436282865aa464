"""Exactly-once streaming MERGE into a TRANSACTIONAL JDBC warehouse.

The snapshot sink (``streaming.merge``) is the recipe for stores without
transactions; when the target is a real database — the reference's whole
warehouse is one (MySQL, ``dags/rentalFilmDAG.py:18-20``) — the textbook
exactly-once recipe is stronger and cheaper than snapshots: stage the
micro-batch, then apply it and record the batch id in ONE database
transaction. Either both the upsert and the ledger row commit, or
neither does; at-least-once redelivery consults the ledger and skips.

Per ``foreachBatch(batch_df, batch_id)``:

1. reduce the batch to one survivor per key (``merged_frame`` with no
   base — the same max_by aggregate the snapshot sink uses);
2. overwrite the STAGING table via the distributed Spark JDBC writer
   (replay-safe: staging is scratch, rewriting it has no effect on the
   target; data never flows through the driver);
3. in one driver-side JDBC transaction:
     a. skip if the ledger already holds (sink, run, batch_id) — the
        crash-after-commit replay window;
     b. DELETE target rows a staging row supersedes (same key AND
        staging seq >= target seq — an out-of-order redelivered OLD
        batch cannot regress a newer row);
     c. INSERT staging rows whose key no longer exists in the target;
     d. INSERT the (sink, run, batch_id) ledger row; COMMIT.

Crash anywhere: before the txn — nothing visible; inside — the DB rolls
back; after commit, before the checkpoint — step (a) makes the replay a
no-op. Set-based SQL does the merge INSIDE the database; the driver only
orchestrates statements.

The ledger key is (sink, RUN identity, batch_id), not batch_id alone:
after a checkpoint loss the restarted stream numbers its first batch 0
again — with old AND new rows — and a batch-id-only ledger would skip
it as already applied, silently losing the new rows (review r09). A
new-run redelivery therefore RE-APPLIES, which is convergent with a
``seq_col`` (recommended); without one it is last-redelivery-wins.

Tested end-to-end against the embedded Derby that ships with Spark
(tests/test_stream_merge.py) — the same stand-in the repo's other JDBC
paths use. Statement SYNTAX is delegated to ``streaming.jdbc_dialect``
(r12): the control flow here is dialect-invariant, and the dialect —
resolved from the JDBC URL, or passed explicitly — supplies the DDL,
identifier quoting/folding, and the merge statement trio. Derby is the
executed leg; the MySQL dialect (the reference's actual store,
``dags/rentalFilmDAG.py:18-20``; ``io/sources.py:mysql_connection``
pins that connection contract) is certified by golden-SQL tests since
no MySQL server ships in this container. Driver-side credentials ARE
honored: ``user``/``password`` in ``jdbc_options`` reach both the
Spark staging writer and this module's transaction connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from filmdatawarehouse_spark.streaming.jdbc_dialect import (
    JdbcMergeDialect,
    dialect_for_url,
)

LEDGER_TABLE = "stream_batch_ledger"


def _connect(
    spark: SparkSession,
    url: str,
    driver: str | None,
    options: dict[str, str] | None = None,
):
    """Driver-side JDBC connection honoring the same credential options
    the Spark staging writer receives (user/password — a sink pointed at
    an authenticated warehouse must not authenticate only on the
    distributed half)."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    for k in ("user", "password"):
        if options and k in options:
            props.setProperty(k, options[k])
    return jvm.java.sql.DriverManager.getConnection(url, props)


def _execute(conn, sql: str) -> None:
    st = conn.createStatement()
    try:
        st.execute(sql)
    finally:
        st.close()


def _table_exists(conn, table: str, dialect: JdbcMergeDialect) -> bool:
    """Spark's JDBC writer emits the TABLE name verbatim-unquoted (the
    store case-folds it per its rules — the dialect knows which) but
    QUOTES column names (case-preserved). All SQL in this module mirrors
    that: table identifiers unquoted, column identifiers dialect-quoted.

    getTables takes LIKE patterns, so the name's underscores are escaped
    (an unescaped MERGED_T pattern matches MERGEDAT) and the search is
    pinned to the connection's CURRENT schema (a same-named table in
    another user's schema must not suppress CREATE TABLE here)."""
    md = conn.getMetaData()
    esc = md.getSearchStringEscape()
    pattern = dialect.fold_unquoted(table).replace("_", f"{esc}_")
    rs = md.getTables(conn.getCatalog(), conn.getSchema(), pattern, None)
    try:
        return rs.next()
    finally:
        rs.close()


def _columns_rs(conn, table: str, dialect: JdbcMergeDialect):
    # Catalog AND schema pinned to the connection's current ones
    # (ADVICE r13): MySQL Connector/J exposes the current database as
    # the CATALOG and returns null from getSchema(), so a null-catalog
    # lookup there depends on the driver's nullCatalogMeansCurrent
    # default — with non-default settings a same-named table in another
    # database would leak phantom dropped/added columns into the
    # drift-refusal/ALTER logic. Passing both pins the lookup on
    # catalog-termed (MySQL) and schema-termed (Derby/Postgres) stores
    # alike; a null from either getter means "that axis is unused
    # here", which is exactly the wildcard the API expects.
    md = conn.getMetaData()
    esc = md.getSearchStringEscape()
    pattern = dialect.fold_unquoted(table).replace("_", f"{esc}_")
    return md.getColumns(conn.getCatalog(), conn.getSchema(), pattern, None)


def _table_columns(conn, table: str, dialect: JdbcMergeDialect) -> list[str]:
    """COLUMN_NAMEs of ``table`` (current schema, metadata order, stored
    case — which matches batch column names because every table this
    sink touches was created with dialect-quoted, case-preserved column
    identifiers)."""
    rs = _columns_rs(conn, table, dialect)
    out: list[str] = []
    try:
        while rs.next():
            out.append(rs.getString("COLUMN_NAME"))
    finally:
        rs.close()
    return out


def _column_ddl_type(
    conn, table: str, col: str, dialect: JdbcMergeDialect
) -> str:
    """The column's DDL type string reconstructed from metadata — asked
    of the STAGING table Spark just wrote, so the widened target column
    carries exactly the store-side type the JDBC writer chose for the
    batch (length for char types, precision/scale for decimals)."""
    rs = _columns_rs(conn, table, dialect)
    try:
        while rs.next():
            if rs.getString("COLUMN_NAME") == col:
                t = rs.getString("TYPE_NAME")
                size = rs.getInt("COLUMN_SIZE")
                digits = rs.getInt("DECIMAL_DIGITS")
                up = t.upper()
                if up in ("VARCHAR", "CHAR", "CHARACTER VARYING", "CHARACTER"):
                    return f"{t}({size})"
                if up in ("DECIMAL", "NUMERIC"):
                    return f"{t}({size},{digits})"
                return t
    finally:
        rs.close()
    raise ValueError(f"column {col!r} not found in {table}")


def _ensure_ledger(conn, dialect: JdbcMergeDialect) -> None:
    if not _table_exists(conn, LEDGER_TABLE, dialect):
        _execute(
            conn,
            f"CREATE TABLE {LEDGER_TABLE} "
            "(sink VARCHAR(128) NOT NULL, run VARCHAR(64) NOT NULL, "
            "batch_id BIGINT NOT NULL, "
            "PRIMARY KEY (sink, run, batch_id))",
        )


def _ledger_has(conn, sink: str, run_id: str, batch_id: int) -> bool:
    ps = conn.prepareStatement(
        f"SELECT 1 FROM {LEDGER_TABLE} "
        "WHERE sink = ? AND run = ? AND batch_id = ?"
    )
    try:
        ps.setString(1, sink)
        ps.setString(2, run_id)
        ps.setLong(3, batch_id)
        rs = ps.executeQuery()
        try:
            return rs.next()
        finally:
            rs.close()
    finally:
        ps.close()


def merge_jdbc_batch(
    batch_df: DataFrame,
    batch_id: int,
    url: str,
    table: str,
    keys: list[str],
    seq_col: str | None = None,
    driver: str | None = None,
    *,
    run_id: str,
    dialect: JdbcMergeDialect | None = None,
    schema_evolution: str = "strict",
    **jdbc_options: str,
) -> None:
    """Idempotently apply one micro-batch to a transactional JDBC target
    (see module docstring for the staging + single-transaction recipe;
    the idempotence key is (table, run_id, batch_id)). ``dialect``
    defaults to URL resolution (``jdbc_dialect.dialect_for_url``).

    ``run_id`` is REQUIRED (keyword-only) because no default is safe:
    the old shared ``'api'`` default gave independent callers the same
    staging table — the zombie-writer overwrite race — and colliding
    ledger keys (caller B's batch 0 skipped because caller A applied
    ITS batch 0); a per-call fresh uuid instead silently LOSES replay
    protection (a retried batch never matches the ledger and, without
    ``seq_col``, a stale retry overwrites newer rows) while growing the
    ledger with never-matched rows. The caller must pin a run identity
    with the right scope: stable across retries of one logical stream
    (what ``write_stream_merge_jdbc`` does with its per-start uuid),
    distinct across independent writers.

    ``schema_evolution`` ('strict' | 'additive', r13) mirrors the
    snapshot sink's drift policy (``merge.merged_frame``): a batch
    missing target columns REFUSES in every mode (its superseding
    DELETE + narrower INSERT would silently lose the column per key);
    a batch adding value columns refuses under 'strict' and, under
    'additive', widens the target with ``ALTER TABLE ADD COLUMN``
    typed from the staging table's own metadata (existing rows read
    NULL). The ALTER runs on a SEPARATE autocommit connection BEFORE
    the merge transaction — MySQL DDL implicitly commits, so putting
    it inside the transaction would silently break the trio+ledger
    atomicity there; a crash between the ALTER and the transaction
    replays convergently (the re-probe finds the column present and
    alters nothing). Keys and ``seq_col`` are never evolvable."""
    from filmdatawarehouse_spark.streaming.merge import merged_frame

    if schema_evolution not in ("strict", "additive"):
        raise ValueError(
            f"unknown schema_evolution {schema_evolution!r}: "
            "expected 'strict' or 'additive'"
        )
    spark = batch_df.sparkSession
    dl = dialect or dialect_for_url(url)
    # staging is per-RUN: a fixed name could be overwritten by a zombie
    # writer (old driver after failover) between this sink's staging
    # write and its transaction, applying the wrong rows under this
    # batch's ledger entry; with a per-run name the zombie scribbles on
    # its own scratch table only
    staging = f"{table}_stg_{run_id}"
    survivors = merged_frame(None, batch_df, keys, seq_col)
    cols = survivors.columns

    # cheap ledger probe BEFORE the staging write: a crash-after-commit
    # replay would otherwise pay a full distributed JDBC overwrite of
    # the batch just to discover it is a no-op (autocommit connection —
    # the ledger CREATE, if needed, commits immediately). Schema drift
    # is checked here too — a strict refusal should not pay the staging
    # write either.
    added: list[str] = []
    probe = _connect(spark, url, driver, jdbc_options)
    try:
        _ensure_ledger(probe, dl)
        if _ledger_has(probe, table, run_id, batch_id):
            return  # already applied: skip the staging write too
        if _table_exists(probe, table, dl):
            tcols = _table_columns(probe, table, dl)
            batch_set = set(cols)
            dropped = [c for c in tcols if c not in batch_set]
            added = [c for c in cols if c not in set(tcols)]
            if dropped:
                raise ValueError(
                    f"batch is missing target column(s) {dropped}: a "
                    "MERGE batch cannot retract columns — null-fill "
                    "them in the batch"
                )
            bad = [c for c in added if c in keys or c == seq_col]
            if bad:
                raise ValueError(
                    f"batch adds key/seq column(s) {bad} absent from "
                    "the target: keys and the survivorship column are "
                    "not evolvable"
                )
            if added and schema_evolution != "additive":
                raise ValueError(
                    f"batch adds column(s) {added} not in the target; "
                    "pass schema_evolution='additive' to widen it "
                    "(existing rows read NULL)"
                )
    finally:
        probe.close()

    writer = (
        survivors.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in jdbc_options.items():
        writer = writer.option(k, v)
    writer.mode("overwrite").save()

    if added:
        # additive widening on its own AUTOCOMMIT connection (docstring:
        # MySQL DDL implicitly commits — inside the merge transaction it
        # would break trio+ledger atomicity there); typed from staging's
        # own metadata, which the JDBC writer just created
        ddl_conn = _connect(spark, url, driver, jdbc_options)
        try:
            for c in added:
                _execute(
                    ddl_conn,
                    dl.add_column(
                        table, c, _column_ddl_type(ddl_conn, staging, c, dl)
                    ),
                )
        finally:
            ddl_conn.close()

    conn = _connect(spark, url, driver, jdbc_options)
    try:
        conn.setAutoCommit(False)
        _ensure_ledger(conn, dl)
        if _ledger_has(conn, table, run_id, batch_id):
            conn.rollback()  # crash-after-commit replay: already applied
            return
        if not _table_exists(conn, table, dl):
            # first batch: create the target with staging's exact shape,
            # plus a key index — the DELETE/INSERT below probe the target
            # per staging key via correlated EXISTS, which degenerates to
            # an O(target x staging) nested loop without one (measured:
            # a 1M-row unindexed Derby target made a 1k-row batch hang
            # for minutes; indexed it is sub-second)
            _execute(conn, dl.create_target_like_staging(table, staging, cols))
            _execute(conn, dl.create_key_index(table, keys))
        # The merge trio (dialect-invariant semantics, dialect syntax):
        # NULL-key handling without killing the index — plain `=` is
        # never true for NULL keys, so a NULL-key row would dodge the
        # DELETE and re-INSERT every batch (duplicate accumulation); but
        # an inline null-safe `(= OR both-NULL)` disjunction is
        # non-sargable and collapsed the indexed probe back into the
        # O(target x staging) nested loop (measured: 0.5 s -> 13 s per
        # 1k-row batch at a 10k-row target). So: statement 1 keeps pure
        # equality (index-friendly), statement 2 is the residual
        # null-safe pass restricted to NULL-key rows on both sides
        # (normally zero rows), statement 3 inserts keys that no longer
        # exist. Seq survivorship `>= OR t.seq IS NULL` matches max_by's
        # NULL-lowest ordering (pinned by the cross-sink agreement
        # property test, whose seq strategy includes None).
        for stmt in dl.merge_statements(table, staging, cols, keys, seq_col):
            _execute(conn, stmt)
        qs = staging
        ps = conn.prepareStatement(
            f"INSERT INTO {LEDGER_TABLE} (sink, run, batch_id) "
            "VALUES (?, ?, ?)"
        )
        try:
            ps.setString(1, table)
            ps.setString(2, run_id)
            ps.setLong(3, batch_id)
            ps.executeUpdate()
        finally:
            ps.close()
        conn.commit()
        # best-effort scratch cleanup AFTER the commit (per-run staging
        # tables would otherwise accumulate one per sink start); a crash
        # here just leaves a scratch table for manual cleanup — never
        # affects the committed data
        try:
            _execute(conn, f"DROP TABLE {qs}")
            conn.commit()
        except Exception:
            pass
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()


def write_stream_merge_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
    seq_col: str | None = None,
    driver: str | None = None,
    run_id: str | None = None,
    dialect: JdbcMergeDialect | None = None,
    schema_evolution: str = "strict",
    **jdbc_options: str,
):
    """Start the transactional exactly-once JDBC MERGE sink (availableNow;
    returns the started StreamingQuery). Each start gets a fresh run
    identity unless the caller pins one (see module docstring).
    ``schema_evolution`` is ``merge_jdbc_batch``'s drift policy."""
    import uuid

    rid = run_id or uuid.uuid4().hex[:12]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_jdbc_batch(
            batch_df, batch_id, url, table, keys,
            seq_col=seq_col, driver=driver, run_id=rid, dialect=dialect,
            schema_evolution=schema_evolution, **jdbc_options,
        )

    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
