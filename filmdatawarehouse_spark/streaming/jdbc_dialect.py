"""SQL dialect adapters for the transactional JDBC MERGE sink.

``streaming.jdbc_merge`` owns the exactly-once control flow (stage the
batch distributed, apply + ledger in ONE driver-side transaction); this
module owns every statement string, because the r11 implementation was
pinned to Derby's dialect (``CREATE TABLE ... WITH NO DATA``, the
``DELETE FROM t t`` alias form, double-quoted identifiers, upper-case
metadata folding) while the reference's actual warehouse is MySQL
(``dags/rentalFilmDAG.py:18-20``, ``mysql+pymysql``). Each dialect emits
the same four statement groups with identical MERGE semantics:

1. first-batch DDL: empty target shaped like staging + a key index
   (the correlated EXISTS probes degenerate to O(target x staging)
   nested loops without one — measured in jdbc_merge.py);
2. the indexed-equality DELETE of superseded rows (NULL keys never
   match plain ``=`` — by design, see #3);
3. the residual NULL-key null-safe DELETE (restricted to rows with at
   least one NULL key on both sides, so its non-sargable match touches
   ~zero rows);
4. the anti-join INSERT of rows whose key no longer exists.

Seq survivorship (``s.seq >= t.seq OR t.seq IS NULL``) and the NULL-key
group semantics are dialect-INVARIANT — they mirror the snapshot sink's
``max_by`` aggregate and are pinned by the cross-sink agreement property
test. Only syntax differs per dialect.

Dialect resolution is by JDBC URL subprotocol (``dialect_for_url``);
callers may pass an explicit dialect instead. Derby is the e2e-tested
leg (embedded, ships with Spark); MySQL is certified by golden-SQL
tests (no MySQL server in this container) — its statements follow the
documented MySQL 8 constraints, most notably that the INSERT's
anti-join subquery must read the target through a materialized derived
table (MySQL error 1093 forbids selecting from the INSERT target in a
subquery directly).
"""

from __future__ import annotations


class JdbcMergeDialect:
    """Base: ANSI-leaning statements (Derby-compatible). Subclasses
    override only the syntax points that diverge."""

    name = "ansi"

    # --- identifiers -----------------------------------------------------
    def quote(self, ident: str) -> str:
        """Quoted COLUMN identifier (case-preserved). Table names stay
        verbatim-unquoted everywhere, mirroring Spark's JDBC writer."""
        return f'"{ident}"'

    def fold_unquoted(self, ident: str) -> str:
        """How the store case-folds an unquoted table identifier — the
        form ``DatabaseMetaData.getTables`` must be probed with."""
        return ident

    # --- first-batch DDL ---------------------------------------------------
    def create_target_like_staging(
        self, target: str, staging: str, cols: list[str]
    ) -> str:
        qcols = ", ".join(self.quote(c) for c in cols)
        return (
            f"CREATE TABLE {target} AS SELECT {qcols} FROM {staging} "
            "WITH NO DATA"
        )

    def create_key_index(self, target: str, keys: list[str]) -> str:
        qkeys = ", ".join(self.quote(k) for k in keys)
        return f"CREATE INDEX {target}_key_idx ON {target} ({qkeys})"

    # --- additive schema evolution (r13) ----------------------------------
    def add_column(self, target: str, col: str, ddl_type: str) -> str:
        """Widen ``target`` with one nullable column. The ANSI form is
        shared by Derby and MySQL 8; the type string comes from the
        staging table's own metadata (``jdbc_merge._column_ddl_type``),
        so the widened column carries exactly the type Spark's JDBC
        writer chose for the batch."""
        return f"ALTER TABLE {target} ADD COLUMN {self.quote(col)} {ddl_type}"

    # --- condition fragments (shared across dialects) --------------------
    def _fragments(self, keys: list[str], seq_col: str | None):
        q = self.quote
        eq = " AND ".join(f"s.{q(k)} = t.{q(k)}" for k in keys)
        nsafe = " AND ".join(
            f"(s.{q(k)} = t.{q(k)} OR (s.{q(k)} IS NULL "
            f"AND t.{q(k)} IS NULL))"
            for k in keys
        )
        anynull_s = " OR ".join(f"s.{q(k)} IS NULL" for k in keys)
        anynull_t = " OR ".join(f"t.{q(k)} IS NULL" for k in keys)
        allnn_s = " AND ".join(f"s.{q(k)} IS NOT NULL" for k in keys)
        supersedes = (
            f" AND (s.{q(seq_col)} >= t.{q(seq_col)}"
            f" OR t.{q(seq_col)} IS NULL)"
            if seq_col
            else ""
        )
        return eq, nsafe, anynull_s, anynull_t, allnn_s, supersedes

    # --- the merge trio ---------------------------------------------------
    def _delete_where(self, target: str, cond: str) -> str:
        """DELETE rows of ``target`` (aliased t) satisfying ``cond``.
        ANSI/Derby accept a bare correlation name after the table."""
        return f"DELETE FROM {target} t WHERE {cond}"

    def _target_probe(self, target: str) -> str:
        """How the INSERT's NOT EXISTS subquery reads the target table
        (aliased t). ANSI/Derby read it directly."""
        return f"{target} t"

    def merge_statements(
        self,
        target: str,
        staging: str,
        cols: list[str],
        keys: list[str],
        seq_col: str | None,
    ) -> list[str]:
        """The three statements applying staging onto target — identical
        semantics in every dialect (module docstring)."""
        qcols = ", ".join(self.quote(c) for c in cols)
        eq, nsafe, anynull_s, anynull_t, allnn_s, supersedes = (
            self._fragments(keys, seq_col)
        )
        probe = self._target_probe(target)
        return [
            self._delete_where(
                target,
                f"EXISTS (SELECT 1 FROM {staging} s WHERE {eq}"
                f"{supersedes})",
            ),
            self._delete_where(
                target,
                f"({anynull_t}) AND EXISTS "
                f"(SELECT 1 FROM {staging} s WHERE ({anynull_s}) "
                f"AND {nsafe}{supersedes})",
            ),
            f"INSERT INTO {target} ({qcols}) "
            f"SELECT {qcols} FROM {staging} s "
            f"WHERE (({allnn_s}) AND NOT EXISTS "
            f"(SELECT 1 FROM {probe} WHERE {eq})) "
            f"OR (({anynull_s}) AND NOT EXISTS "
            f"(SELECT 1 FROM {probe} WHERE ({anynull_t}) AND {nsafe}))",
        ]


class DerbyDialect(JdbcMergeDialect):
    """Embedded Derby — the e2e-tested leg. ANSI statements as-is; the
    only divergence from the base is metadata case-folding (unquoted
    identifiers fold UPPER)."""

    name = "derby"

    def fold_unquoted(self, ident: str) -> str:
        return ident.upper()


class MySqlDialect(JdbcMergeDialect):
    """MySQL 8 / MariaDB — the reference's actual warehouse. Divergences:

    - identifiers quote with backticks (double quotes need the
      non-default ANSI_QUOTES sql_mode);
    - unquoted table identifiers do NOT case-fold (exact-name metadata
      probe; on case-insensitive filesystems MySQL lowercases table
      FILES, but the comparison in getTables honors
      lower_case_table_names — exact name is the correct probe);
    - ``CREATE TABLE ... AS SELECT ... WITH NO DATA`` is not MySQL;
      ``CREATE TABLE t LIKE s`` copies staging's exact shape (staging
      was created by Spark's JDBC writer, so its shape IS the batch's);
    - single-table ``DELETE FROM t alias WHERE`` rejects the bare-alias
      correlation form the way Derby spells it; the multi-table form
      ``DELETE t FROM tbl t WHERE ...`` is the MySQL idiom;
    - the INSERT's NOT EXISTS may not read the INSERT target directly
      (error 1093: target table specified twice); routing the probe
      through a derived table materializes it and is the documented
      workaround.
    """

    name = "mysql"

    def quote(self, ident: str) -> str:
        return f"`{ident}`"

    def create_target_like_staging(
        self, target: str, staging: str, cols: list[str]
    ) -> str:
        return f"CREATE TABLE {target} LIKE {staging}"

    def _delete_where(self, target: str, cond: str) -> str:
        return f"DELETE t FROM {target} t WHERE {cond}"

    def _target_probe(self, target: str) -> str:
        return f"(SELECT * FROM {target}) t"


DERBY = DerbyDialect()
MYSQL = MySqlDialect()

_BY_SUBPROTOCOL = {
    "derby": DERBY,
    "mysql": MYSQL,
    "mariadb": MYSQL,
}


def dialect_for_url(url: str) -> JdbcMergeDialect:
    """Resolve the dialect from a JDBC URL (``jdbc:<subprotocol>:...``).
    Unknown subprotocols get the ANSI base — its statements are the
    standard forms — but passing an explicit dialect is better there."""
    parts = url.split(":", 2)
    sub = parts[1].lower() if len(parts) > 1 else ""
    return _BY_SUBPROTOCOL.get(sub, JdbcMergeDialect())
