"""Oracle-checked queries for the corpus-curation operators
(operators/curation.py): decontamination, stratified sampling, sequence
packing, PII redaction. No reference analog (SURVEY.md §2 — the reference
is a star-schema ETL); these are the engine's LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators import curation as cu

DECON_N = 5
BENCH_MOD = 97
SAMPLE_RATES = {"purchase": 0.5, "view": 0.1, "click": 0.25}
SAMPLE_DEFAULT = 0.05
PACK_WINDOW = 256
PACK_SHARDS = 16
WSAMPLE_CAP = 256      # weight clamp: docs longer than this don't over-draw
WSAMPLE_DENOM = 1024   # keep probability = clamp(n_tokens, 0, CAP) / DENOM

Entry = tuple


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: candidates = docs outside the pseudo
    eval set (doc_id % 97 != 0), benchmark = the rest; flag any candidate
    sharing a distinct word 5-gram with the benchmark."""
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.pmod(F.col("doc_id"), F.lit(BENCH_MOD)) == 0)
    cand = docs.filter(F.pmod(F.col("doc_id"), F.lit(BENCH_MOD)) != 0)
    return cu.decontaminate(cand, bench, n=DECON_N)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling of events by type (the corpus
    rebalancing primitive) — md5-keyed, stable under growth and re-runs."""
    e = read_table(spark, sf_dir, "events")
    return cu.stratified_sample(
        e.select("event_id", "event_type", "user_id"),
        "event_type",
        SAMPLE_RATES,
        key_col="event_id",
        default_rate=SAMPLE_DEFAULT,
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic document sampling
    (operators/curation.py:weighted_sample): keep probability
    ``min(n_tokens, 256) / 1024``, decided by exact integer arithmetic on
    a 32-bit md5 draw — the data-mixing primitive (weight by token count
    / quality score) with zero float comparisons, zero shuffle, and
    decisions stable under corpus growth. The oracle replays the identical
    integer inequality, so the gate is raw-hash (no rounding grid)."""
    from filmdatawarehouse_spark.operators.text import token_count_ws

    d = read_table(spark, sf_dir, "documents")
    weighted = d.select(
        "doc_id",
        "lang",
        token_count_ws("text").alias("n_tokens"),
    ).withColumn(
        # coalesce BEFORE the clamp: least() skips NULLs in both engines,
        # so a NULL-text row would otherwise weigh in at the full cap
        # instead of 0 (the operator-level guard never sees it)
        "weight",
        F.least(
            F.coalesce(F.col("n_tokens"), F.lit(0)), F.lit(WSAMPLE_CAP)
        ).cast("bigint"),
    )
    return cu.weighted_sample(
        weighted, "weight", "doc_id", denom=WSAMPLE_DENOM
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk packing of the document corpus into 256-token
    training sequences, 16 shards — per-doc token spans + chunk ranges."""
    return cu.pack_documents(
        read_table(spark, sf_dir, "documents"),
        window=PACK_WINDOW,
        n_shards=PACK_SHARDS,
    )


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents AUGMENTED with synthetic PII derived from
    doc_id (the corpus itself is PII-free, which would leave the regex
    machinery untested): both engines append the identical
    email/IP/phone suffix, redaction must strip all three and count them."""
    docs = read_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com on 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".7 call +1555-01"),
            (F.pmod(F.col("doc_id"), F.lit(90)) + 10).cast("string"),
        ).alias("text"),
    )
    return cu.redact_pii(aug)


def q_corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-data mix (operators/curation.py:
    balanced_mix_rates/_filter): every language's token budget is
    downsampled to the SMALLEST language's total — the uniform
    data-mixing policy of LLM pre-training — with exact integer ppb
    rates and the md5 keep-draw, so the whole mix is bit-identical
    across engines and re-runs. Emits one row per language: corpus
    totals, the ppb rate, and the docs/tokens actually kept.

    Scale shape: the per-doc token frame is persisted once (tokenizing
    is the dominant cost; it feeds the totals aggregate AND the filter),
    rates are group-cardinality and broadcast, the keep-filter is
    map-side, and the final summary is a second group-cardinality
    aggregate. No shuffle ever carries the corpus itself.
    """
    from filmdatawarehouse_spark.operators.cache import managed_persist

    d = read_table(spark, sf_dir, "documents")
    t = managed_persist(
        d.select(
            "doc_id",
            "lang",
            F.coalesce(
                F.size(F.split(F.col("text"), " ")).cast("bigint"), F.lit(0)
            ).alias("n_tokens"),
        )
    )
    rates = cu.balanced_mix_rates(t, "lang", "n_tokens")
    kept = (
        cu.balanced_mix_filter(t, rates, "lang", "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_kept"),
            F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        )
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        "docs_total",
        "tokens_total",
        "rate_ppb",
        F.coalesce(F.col("docs_kept"), F.lit(0)).cast("bigint").alias(
            "docs_kept"
        ),
        F.coalesce(F.col("tokens_kept"), F.lit(0)).cast("bigint").alias(
            "tokens_kept"
        ),
    )


SHUFFLE_SALT = "cshuffle:"
SHUFFLE_SHARDS = 16


def q_corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-data shuffle: every document gets a
    shard and a position within it from the md5 draw alone —
    ``shard = u₃₂ mod N``, ``pos = rank of (u₃₂, doc_id) within the
    shard`` — so the exact training order is reproducible across
    engines, re-runs, and partition layouts (``df.orderBy(rand())`` is
    none of those), and appending documents never REORDERS existing ones
    within a shard relative to each other (new rows interleave; relative
    order of old rows is stable because their sort keys don't change).

    Scale shape: one exchange on shard (N bounded partitions) + a
    per-shard sort — the window never sees more than corpus/N rows, and
    N scales with the corpus (shards are the output-file unit, same
    contract as ``pack_documents``). No global sort anywhere.

    Determinism: u₃₂ is exact integer; ties broken by doc_id; NULLS
    FIRST pinned explicitly (Spark's ASC default, NOT DuckDB's — an
    unpinned order would flip any NULL-key corpus).
    """
    from pyspark.sql.window import Window

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(SHUFFLE_SALT), F.col("doc_id").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("shard").orderBy(
        F.col("u").asc_nulls_first(), F.col("doc_id").asc_nulls_first()
    )
    return (
        d.select(
            "doc_id",
            u.alias("u"),
            F.pmod(u, F.lit(SHUFFLE_SHARDS)).cast("int").alias("shard"),
        )
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )


_WORDS_SQL = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
)


MERGE_PRIO_WEB_MOD = 3      # corpus A ("web"): doc_id % 3 != 0, priority 2
MERGE_PRIO_CUR_MOD = 2      # corpus B ("curated"): doc_id % 2 == 0, priority 1
MERGE_ID_SHIFT = 20_000_000


def q_merge_corpora(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two overlapping corpora derived from documents — "curated" (doc_id
    even, shifted ids, priority 1) and "web" (doc_id % 3 != 0, priority 2)
    — merged with exact-text survivorship. Texts present in both must
    survive from the curated source; the id shift proves survivorship is
    decided by priority, not id magnitude."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    web = docs.filter(F.pmod(F.col("doc_id"), F.lit(MERGE_PRIO_WEB_MOD)) != 0)
    curated = docs.filter(
        F.pmod(F.col("doc_id"), F.lit(MERGE_PRIO_CUR_MOD)) == 0
    ).select((F.col("doc_id") + F.lit(MERGE_ID_SHIFT)).alias("doc_id"), "text")
    return cu.merge_corpora([(curated, "curated", 1), (web, "web", 2)])


CURATION_ORACLES: dict[str, str] = {
    "decontaminate_docs": f"""
        WITH w AS (
          SELECT doc_id, {_WORDS_SQL} AS words FROM documents
        ), g AS (
          SELECT DISTINCT doc_id,
                 array_to_string(words[i:i+{DECON_N - 1}], ' ') AS gram
          FROM (
            SELECT doc_id, words,
                   unnest(range(1, len(words) - {DECON_N} + 2)) AS i
            FROM w
          )
        ), bench AS (
          SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MOD} = 0
        ), hits AS (
          SELECT g.doc_id, COUNT(*)::BIGINT AS n_hit_grams
          FROM g JOIN bench USING (gram)
          WHERE g.doc_id % {BENCH_MOD} <> 0
          GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               COALESCE(h.n_hit_grams, 0)::BIGINT AS n_hit_grams,
               (COALESCE(h.n_hit_grams, 0) > 0)::INT AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % {BENCH_MOD} <> 0
    """,
    "stratified_sample_events": f"""
        SELECT event_id, event_type, user_id
        FROM events
        WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT
              / {float(1 << 60)!r}
              < CASE event_type
                  WHEN 'click' THEN 0.25
                  WHEN 'purchase' THEN 0.5
                  WHEN 'view' THEN 0.1
                  ELSE {SAMPLE_DEFAULT!r} END
    """,
    "weighted_sample_docs": f"""
        WITH t AS (
          SELECT doc_id, lang,
                 len(string_split(text, ' '))::BIGINT AS n_tokens
          FROM documents
        )
        SELECT doc_id, lang, n_tokens,
               LEAST(COALESCE(n_tokens, 0), {WSAMPLE_CAP})::BIGINT AS weight
        FROM t
        WHERE ('0x' || substr(md5('{cu.WEIGHTED_SALT}' || doc_id::VARCHAR),
                              1, {cu.WEIGHTED_HASH_BITS // 4}))::BIGINT
                * {WSAMPLE_DENOM}
              < LEAST(COALESCE(n_tokens, 0), {WSAMPLE_CAP})
                * {1 << cu.WEIGHTED_HASH_BITS}
    """,
    "corpus_shuffle_shards": f"""
        WITH t AS (
          SELECT doc_id,
                 ('0x' || substr(md5('{SHUFFLE_SALT}' || doc_id::VARCHAR),
                                 1, 8))::BIGINT AS u
          FROM documents
        )
        SELECT doc_id,
               (u % {SHUFFLE_SHARDS})::INT AS shard,
               row_number() OVER (
                 PARTITION BY u % {SHUFFLE_SHARDS}
                 ORDER BY u NULLS FIRST, doc_id NULLS FIRST
               )::BIGINT AS pos
        FROM t
    """,
    "corpus_mix_sample": f"""
        WITH t AS (
          SELECT doc_id, lang,
                 COALESCE(len(string_split(text, ' ')), 0)::BIGINT
                   AS n_tokens
          FROM documents
        ), lt AS (
          SELECT lang, COUNT(*)::BIGINT AS docs_total,
                 SUM(n_tokens)::BIGINT AS tokens_total
          FROM t GROUP BY lang
        ), tgt AS (
          SELECT MIN(tokens_total) AS target FROM lt
        ), r AS (
          SELECT lang, docs_total, tokens_total,
                 (CASE WHEN tokens_total <= 0 THEN {cu.MIX_PPB}
                       ELSE LEAST({cu.MIX_PPB},
                                  (tgt.target * {cu.MIX_PPB})
                                    // tokens_total)
                  END)::BIGINT AS rate_ppb
          FROM lt, tgt
        ), k AS (
          SELECT t.lang, COUNT(*)::BIGINT AS docs_kept,
                 SUM(n_tokens)::BIGINT AS tokens_kept
          FROM t JOIN r USING (lang)
          WHERE ('0x' || substr(md5('{cu.MIX_SALT}' || doc_id::VARCHAR),
                                1, 8))::BIGINT * {cu.MIX_PPB}
                < rate_ppb * {1 << 32}
          GROUP BY t.lang
        )
        SELECT r.lang, r.docs_total, r.tokens_total, r.rate_ppb,
               COALESCE(k.docs_kept, 0)::BIGINT AS docs_kept,
               COALESCE(k.tokens_kept, 0)::BIGINT AS tokens_kept
        FROM r LEFT JOIN k USING (lang)
    """,
    "pack_sequences": f"""
        WITH t AS (
          SELECT doc_id,
                 (doc_id % {PACK_SHARDS})::INT AS shard,
                 len({_WORDS_SQL})::BIGINT AS n_tokens
          FROM documents
        ), o AS (
          SELECT doc_id, shard, n_tokens,
                 (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING))::BIGINT
                   - n_tokens AS start_tok
          FROM t WHERE n_tokens > 0
        )
        SELECT doc_id, shard, n_tokens, start_tok,
               (start_tok // {PACK_WINDOW})::BIGINT AS chunk_first,
               ((start_tok + n_tokens - 1) // {PACK_WINDOW})::BIGINT
                 AS chunk_last
        FROM o
    """,
    "redact_pii_docs": f"""
        WITH aug AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id::VARCHAR
                      || '@mail.example.com on 10.0.'
                      || (doc_id % 256)::VARCHAR
                      || '.7 call +1555-01'
                      || (doc_id % 90 + 10)::VARCHAR AS text
          FROM documents
        ), s AS (
          SELECT doc_id, text,
                 regexp_replace(text, '{cu.EMAIL_RE}', '<EMAIL>', 'g')
                   AS no_email
          FROM aug
        ), s2 AS (
          SELECT *,
                 regexp_replace(no_email, '{cu.IPV4_RE}', '<IP>', 'g')
                   AS no_ip
          FROM s
        )
        SELECT doc_id,
               regexp_replace(no_ip, '{cu.PHONE_RE}', '<PHONE>', 'g')
                 AS clean_text,
               len(regexp_extract_all(text, '{cu.EMAIL_RE}'))::INT
                 AS n_emails,
               len(regexp_extract_all(no_email, '{cu.IPV4_RE}'))::INT
                 AS n_ips,
               len(regexp_extract_all(no_ip, '{cu.PHONE_RE}'))::INT
                 AS n_phones
        FROM s2
    """,
}


MERGE_ORACLE = """
    WITH u AS (
      SELECT doc_id + 20000000 AS id, text, 'curated' AS source, 1 AS prio
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id AS id, text, 'web' AS source, 2 AS prio
      FROM documents WHERE doc_id % 3 <> 0
    )
    SELECT text,
           arg_min(id, prio * 1000000000000 + id) AS survivor_id,
           arg_min(source, prio * 1000000000000 + id) AS survivor_source,
           count(*)::BIGINT AS n_copies,
           count(DISTINCT source)::BIGINT AS n_sources
    FROM u GROUP BY text
"""

CURATION_QUERIES: dict[str, Entry] = {
    "decontaminate_docs": (q_decontaminate, CURATION_ORACLES["decontaminate_docs"]),
    "stratified_sample_events": (
        q_stratified_sample,
        CURATION_ORACLES["stratified_sample_events"],
    ),
    "weighted_sample_docs": (
        q_weighted_sample,
        CURATION_ORACLES["weighted_sample_docs"],
    ),
    "corpus_mix_sample": (
        q_corpus_mix_sample,
        CURATION_ORACLES["corpus_mix_sample"],
    ),
    "corpus_shuffle_shards": (
        q_corpus_shuffle_shards,
        CURATION_ORACLES["corpus_shuffle_shards"],
    ),
    "pack_sequences": (q_pack_sequences, CURATION_ORACLES["pack_sequences"]),
    "redact_pii_docs": (q_redact_pii, CURATION_ORACLES["redact_pii_docs"]),
    "corpus_merge_priority": (q_merge_corpora, MERGE_ORACLE),
}
