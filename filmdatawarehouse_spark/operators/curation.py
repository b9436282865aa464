"""Corpus-curation operators a large-scale LLM training-data pipeline needs
beyond dedup: benchmark decontamination, stratified sampling, sequence
packing, and PII redaction.

No reference analog (the reference is a rental-film star schema,
SURVEY.md §2) — this is the engine's extended surface, same contract as the
dedup/similarity/text families: every operator is a lazy DataFrame
transform built from JVM-side expressions (no Python in the hot path), each
registered query has a DuckDB oracle replaying the exact semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization shared by the operators (must stay SQL-replayable)
# ---------------------------------------------------------------------------


def _words(text_col: str | Column) -> Column:
    """Lowercased whitespace tokens, empties dropped — the oracle twin is
    ``list_filter(regexp_split_to_array(lower(text),'\\s+'), w -> w <> '')``."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != F.lit(""))


def word_ngrams(text_col: str | Column, n: int) -> Column:
    """Space-joined word n-grams (distinct), built from a BOUND token array
    (never re-evaluate split inside the lambda — Catalyst re-evaluates per
    reference; callers select ``_words`` into a named column first when
    chaining)."""
    words = _words(text_col)
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))
    )


# ---------------------------------------------------------------------------
# 1. benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Test-set decontamination by exact word n-gram overlap: for every
    candidate document, how many distinct n-grams it shares with the
    benchmark corpus (``contaminated`` = shares at least one). The standard
    pre-training hygiene pass (filter eval-set leakage before training).

    Shape at scale: benchmark gram sets are small relative to the corpus
    (an eval suite, not a second corpus) → distinct bench grams BROADCAST
    to a hash join against the exploded candidate grams; the per-doc
    aggregate is two-phase on ``id_col``. Candidates never shuffle their
    text — only (id, gram) rows after the explode. For a benchmark too big
    to broadcast, the same plan works as a shuffle join; at that point
    bucket both sides on the gram.

    Returns every candidate row: (id_col, n_hit_grams, contaminated).
    """
    cand_grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("_gram")
    )
    bench_grams = (
        bench.select(F.explode(word_ngrams(text_col, n)).alias("_gram"))
        .distinct()
    )
    hits = (
        cand_grams.join(F.broadcast(bench_grams), "_gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).alias("n_hit_grams"),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# 2. deterministic stratified sampling
# ---------------------------------------------------------------------------

HASH_SPACE = float(1 << 60)


def _unit_hash(key: Column) -> Column:
    """Deterministic uniform-ish u ∈ [0,1) from a key — the engine's
    portable md5 recipe (60 bits; DuckDB twin:
    ``('0x' || substr(md5(k),1,15))::BIGINT / 2^60``)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(HASH_SPACE)
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: a row survives iff
    ``hash(key)/2^60 < rate(stratum)`` — the corpus-balancing primitive
    (up/down-weight sources, languages, quality tiers) that is stable
    under corpus growth and re-runs (no RNG, no seed plumbing: adding rows
    never flips existing decisions, unlike ``df.sample``).

    Pure map-side filter — no shuffle, fully pushdown-friendly above the
    scan. ``rates`` maps stratum value → keep probability.
    """
    rate = None
    for value, r in sorted(rates.items()):
        cond = F.when(F.col(stratum_col) == value, F.lit(float(r)))
        rate = cond if rate is None else rate.when(
            F.col(stratum_col) == value, F.lit(float(r))
        )
    rate = (
        rate.otherwise(F.lit(float(default_rate)))
        if rate is not None
        else F.lit(float(default_rate))
    )
    return df.filter(_unit_hash(F.col(key_col)) < rate)


WEIGHTED_SALT = "wsample:"
WEIGHTED_HASH_BITS = 32


def _check_weighted_hash_bits(bits: int) -> int:
    """u·denom and w·2^bits must both stay inside int64 (bits + 20 ≤ 62)
    and the draw must be a whole number of hex digits. A real raise, run
    at import time — an assert would vanish under ``python -O`` while
    the overflow-freedom docstring contract still claimed it held."""
    if bits % 4 != 0 or not 0 < bits <= 40:
        raise RuntimeError(
            "WEIGHTED_HASH_BITS must be a positive multiple of 4 and "
            f"≤ 40 to keep the int64 comparison overflow-free: {bits}"
        )
    return bits


_check_weighted_hash_bits(WEIGHTED_HASH_BITS)


def weighted_sample(
    df: DataFrame,
    weight_col: str | Column,
    key_col: str,
    denom: int = 1024,
    salt: str = WEIGHTED_SALT,
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: a row survives with
    probability ``clamp(weight, 0, denom) / denom`` — the data-mixing
    primitive that up-weights long/high-quality documents without RNG
    state. The keep decision is EXACT integer arithmetic, no float
    anywhere:

        u * denom < clamp(w) * 2^32,   u = first 8 md5 hex digits of
                                           (salt || key) as a 32-bit int

    so the sample is reproducible across engines, partitionings, and
    corpus growth (adding rows never flips existing decisions — unlike
    ``df.sample``, whose output depends on partition layout). DuckDB twin
    of the draw: ``('0x' || substr(md5('<salt>' || k::VARCHAR), 1, 8))::BIGINT``.

    Bounds: u < 2^32 and denom ≤ 2^20 keep both products far inside
    int64, so the comparison is overflow-free without decimals. Pure
    map-side filter — zero shuffle; at 100 TB this is a scan-rate
    operator, and the weight column prunes to exactly what the filter
    needs.

    NULL semantics (identical in both engines): a NULL key nulls the
    concat → md5 → u chain (comparison UNKNOWN → dropped), and a NULL
    weight is coalesced to 0 (→ dropped) — the coalesce matters because
    Spark's and DuckDB's least/greatest SKIP nulls rather than propagate
    them, so an unguarded clamp would turn a NULL weight into the full
    ``denom`` and sample the row with probability 1. Sampling never
    invents a decision for a row it cannot hash or weigh.
    """
    if not 0 < denom <= 1 << 20:
        raise ValueError(f"denom must be in (0, 2^20]: {denom}")
    # bits + 20 ≤ 62 overflow bound: enforced at module import (above)
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.greatest(
        F.lit(0),
        F.least(F.coalesce(w.cast("bigint"), F.lit(0)), F.lit(int(denom))),
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
            1,
            WEIGHTED_HASH_BITS // 4,  # hex digits — keeps the draw width
        ),                            # coupled to the comparison scale
        16,
        10,
    ).cast("bigint")
    return df.filter(
        u * F.lit(int(denom)) < w * F.lit(1 << WEIGHTED_HASH_BITS)
    )


# ---------------------------------------------------------------------------
# 2c. balanced data mixing (downsample every group to the smallest)
# ---------------------------------------------------------------------------

MIX_SALT = "cmix:"
MIX_PPB = 1_000_000_000  # sampling rates in integer parts-per-billion


def balanced_mix_rates(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    total_alias: str = "tokens_total",
    count_alias: str = "docs_total",
) -> DataFrame:
    """Per-group sampling rates that balance every group's total weight
    down to the SMALLEST group's — the uniform data-mixing policy
    (equal token budget per language/source/domain) of LLM pre-training
    mixes. Returns one row per group:
    ``(group, count_alias, total_alias, rate_ppb)``.

    ``rate_ppb`` is exact integer parts-per-billion —
    ``min(PPB, (target·PPB) div total)`` with ``target = min(total)`` —
    no float division anywhere, so the rate (and every keep decision
    derived from it) is bit-identical across engines, partitionings,
    and re-runs. A zero/negative-total group rates PPB (keep all;
    nothing to downsample).

    Scale shape: one ``groupBy(group)`` aggregate (map-side combine →
    group-cardinality rows), a 1-row min broadcast back — never a
    second pass over ``df``. int64 bound: ``target·PPB`` caps the
    smallest group at ~9.2×10⁹ weight units; past that (a ≥10-trillion
    -token *minimum* language) swap the one product/DIV pair to
    decimal(38,0) — the comparison in ``balanced_mix_filter`` is
    unaffected (u32·PPB < 2⁶² always).
    """
    for reserved in ("_tot", "_target"):
        if reserved in df.columns:
            raise ValueError(
                f"df must not contain reserved column {reserved!r}"
            )
    totals = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias(count_alias),
        # coalesce: a group whose weights are ALL NULL sums to NULL, and
        # an unguarded NULL total would flow through to a NULL rate_ppb
        # whose keep-comparison is UNKNOWN for every row — silently
        # dropping the whole group instead of the documented keep-all
        F.coalesce(F.sum(F.col(weight_col)), F.lit(0))
        .cast("bigint")
        .alias("_tot"),
    )
    target = totals.agg(F.min("_tot").alias("_target"))
    rate = F.when(F.col("_tot") <= 0, F.lit(MIX_PPB).cast("bigint")).otherwise(
        F.least(
            F.lit(MIX_PPB).cast("bigint"),
            F.expr(f"(_target * CAST({MIX_PPB} AS BIGINT)) DIV _tot"),
        )
    )
    return totals.crossJoin(F.broadcast(target)).select(
        F.col(group_col),
        F.col(count_alias),
        F.col("_tot").alias(total_alias),
        rate.cast("bigint").alias("rate_ppb"),
    )


def balanced_mix_filter(
    df: DataFrame,
    rates: DataFrame,
    group_col: str,
    key_col: str,
    salt: str = MIX_SALT,
) -> DataFrame:
    """Apply per-group ``rate_ppb`` decisions from ``balanced_mix_rates``:
    a row survives iff ``u32(salt‖key)·PPB < rate_ppb·2³²`` — the same
    exact-integer md5 draw as ``weighted_sample`` (decisions stable under
    corpus growth; adding rows never flips existing ones). Both products
    stay under 2⁶² so the comparison is overflow-free int64.

    DuckDB twin of the draw:
    ``('0x' || substr(md5('<salt>' || k::VARCHAR), 1, 8))::BIGINT``.

    Scale shape: ``rates`` is group-cardinality (broadcast); the filter
    itself is map-side — one broadcast-hash-join probe per row, no
    shuffle of ``df``. NULL semantics: a NULL key nulls the md5 chain
    (UNKNOWN → dropped) and a NULL group never matches the join — in
    BOTH engines; sampling never invents a decision it cannot hash.
    """
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.join(F.broadcast(rates.select(group_col, "rate_ppb")), group_col)
        .filter(u32 * F.lit(MIX_PPB) < F.col("rate_ppb") * F.lit(1 << 32))
        .drop("rate_ppb")
    )


def _iroot(n: int, q: int) -> int:
    """floor(n**(1/q)) by integer Newton — exact at any magnitude."""
    if n < 0 or q <= 0:
        raise ValueError(f"iroot needs n >= 0, q >= 1: {n}, {q}")
    if n == 0:
        return 0
    if q == 1:
        return n
    x = 1 << -(-n.bit_length() // q)  # >= true root
    while True:
        y = ((q - 1) * x + n // x ** (q - 1)) // q
        if y >= x:
            return x
        x = y


def temperature_mix_rates(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    alpha,
    total_alias: str = "tokens_total",
    count_alias: str = "docs_total",
) -> DataFrame:
    """Per-group keep rates for TEMPERATURE-based data mixing — the
    mT5/mC4 family where group sampling mass ∝ total^alpha, so the
    per-row keep rate is ``(target/total)^(1-alpha)`` with ``target =
    min(total)`` (downsample-only; the smallest group keeps everything).
    ``alpha = 0`` is exactly ``balanced_mix_rates`` (equal budgets) on
    any corpus whose groups all have positive weight — with zero-weight
    groups the two differ deliberately: here ``target`` is the smallest
    POSITIVE total (a zero-weight group keeps all and cannot drag every
    other group's budget to zero). ``alpha = 1`` is the natural mix
    (keep all); ``alpha = "0.3"`` is the published mT5 setting. Output
    shape and the ``rate_ppb`` contract match ``balanced_mix_rates``;
    apply with ``balanced_mix_filter``.

    Determinism without float pow: cross-engine ``pow(x, y)`` is NOT
    correctly rounded, so fractional exponents on doubles are exactly
    the grid-flip class the sweep exists to catch. Instead ``alpha`` is
    taken as an exact rational (int, ``fractions.Fraction``, or a
    decimal STRING like ``"0.3"``; a bare float is refused — 0.3 the
    double is not 3/10) and each rate is one exact integer expression:
    with ``1 - alpha = p/q``,

        ``rate_ppb = iroot(PPB**q * target**p // total**p, q)``

    — pure Python bigints on the collected per-group totals, off from
    the real value by at most 1 ppb (the floor-div), identical on every
    engine, partitioning, and re-run by construction. The totals
    aggregate is the same map-side-combine ``groupBy`` as
    ``balanced_mix_rates``; collecting it is a BOUNDED collect
    (group-cardinality rows — languages/sources, not documents), the
    same contract as broadcasting it. Zero/negative-total groups rate
    PPB (keep all; nothing to downsample).
    """
    from fractions import Fraction

    if isinstance(alpha, float):
        raise ValueError(
            "pass alpha as an exact rational (str/int/Fraction): the "
            f"float {alpha!r} is a binary approximation and would make "
            "the rate contract depend on float parsing"
        )
    a = Fraction(alpha)
    if not 0 <= a <= 1:
        raise ValueError(f"alpha must be in [0, 1]: {a}")
    if a.denominator > 1000:
        # the bigint cost below scales with the exponent denominator:
        # alpha="0.333333" would mean PPB**10^6 (~30-million-bit ints)
        # on the driver. Published temperatures are small rationals;
        # ppb-scale precision needs q <= 1000.
        raise ValueError(
            f"alpha denominator {a.denominator} too large (max 1000): "
            "use a small exact rational like '0.3', '1/3', '0.25'"
        )
    e = 1 - a
    p, q = e.numerator, e.denominator
    totals = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias(count_alias),
        # same NULL-total guard as balanced_mix_rates
        F.coalesce(F.sum(F.col(weight_col)), F.lit(0))
        .cast("bigint")
        .alias(total_alias),
    )
    rows = totals.collect()  # bounded: group-cardinality
    pos = [r[total_alias] for r in rows if r[total_alias] > 0]
    target = min(pos) if pos else 0
    out = []
    for r in rows:
        tot = r[total_alias]
        if tot <= 0 or target <= 0:
            rate = MIX_PPB
        else:
            rate = min(
                MIX_PPB, _iroot(MIX_PPB**q * target**p // tot**p, q)
            )
        out.append((r[group_col], r[count_alias], tot, rate))
    from pyspark.sql import types as T

    schema = T.StructType(
        list(totals.schema.fields)
        + [T.StructField("rate_ppb", T.LongType(), False)]
    )
    return df.sparkSession.createDataFrame(out, schema)


# ---------------------------------------------------------------------------
# 3. sequence packing (concat-then-chunk)
# ---------------------------------------------------------------------------


def pack_documents(
    docs: DataFrame,
    window: int = 256,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are concatenated in
    deterministic order and cut into fixed ``window``-token training
    sequences; each document reports the token span and chunk range it
    lands in. This is the standard LLM pre-training packing layout (docs
    may straddle chunk boundaries; chunk count ≈ total_tokens/window with
    zero padding waste).

    Scale shape: packing is per-SHARD (``shard = id mod n_shards`` — the
    output-file unit every real pipeline packs within), so the running
    token offset is a window PARTITIONED by shard — distributed, never a
    global single-partition cumsum. Raise ``n_shards`` with the corpus;
    the assignment is embarrassingly parallel.

    Returns (id_col, shard, n_tokens, start_tok, chunk_first, chunk_last)
    for docs with ≥1 token.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.size(_words(text_col)).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    with_off = toks.withColumn(
        "start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return with_off.select(
        id_col,
        "shard",
        "n_tokens",
        "start_tok",
        F.expr(f"start_tok DIV {window}").cast("bigint").alias("chunk_first"),
        F.expr(f"(start_tok + n_tokens - 1) DIV {window}")
        .cast("bigint")
        .alias("chunk_last"),
    )


# ---------------------------------------------------------------------------
# 4. PII redaction
# ---------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"
PHONE_RE = r"\+\d[\d-]{6,14}\d"


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scrub emails / IPv4 addresses / international-format phone numbers,
    reporting per-document match counts — the minimum-viable PII pass of a
    web-corpus pipeline (swap in dictionary/NER stages behind the same
    frame contract when available).

    Patterns are deliberately restricted to syntax BOTH regex engines
    (java.util.regex here, RE2 in the DuckDB oracle) implement
    identically: character classes, bounded repetition, ``\\b`` — no
    lookaround, no backreferences. Counts are taken stage-by-stage
    (emails stripped before IPs are counted) so overlapping matches can't
    diverge between engines.

    Returns (id_col, clean_text, n_emails, n_ips, n_phones).
    """
    aug = F.col(text_col)
    no_email = F.regexp_replace(aug, EMAIL_RE, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, IPV4_RE, "<IP>")
    no_phone = F.regexp_replace(no_ip, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        no_phone.alias("clean_text"),
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(IPV4_RE), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(no_ip, F.lit(PHONE_RE), 0)).alias(
            "n_phones"
        ),
    )


PRIORITY_ENCODE = 10**12  # doc ids are < 1e12; priority*ENC + id is a total order


def merge_corpora(
    sources: list[tuple[DataFrame, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Merge several corpora into one deduplicated corpus, keeping ONE
    survivor per exact text: the copy from the highest-priority source
    (lowest ``priority`` number), ties broken by smallest id. The standard
    shape for combining crawl dumps with curated sets — "books beats web
    for the same text" — where survivorship must be deterministic so
    re-runs and incremental refreshes agree.

    ``sources`` is ``[(df, source_name, priority), ...]``; each df carries
    (id, text).

    Scale shape: ONE hash shuffle on the text key; survivorship is a
    map-side-combinable aggregation (``min_by`` on the encoded
    (priority, id) total order — never a window over a global sort). At
    100 TB, group on ``md5(text)`` instead of raw text to cut shuffle
    width (and re-verify the survivors' texts post-join if collision
    paranoia warrants); the certification query keeps raw text so the
    oracle is exact by construction.

    Output: (text, survivor_id, survivor_source, n_copies, n_sources).
    """
    if not sources:
        raise ValueError("merge_corpora needs at least one source")
    tagged = []
    for df, name, priority in sources:
        tagged.append(
            df.select(
                F.col(id_col).alias("_id"),
                F.col(text_col).alias("text"),
                F.lit(name).alias("_source"),
                F.lit(int(priority)).alias("_prio"),
            )
        )
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    order_key = F.col("_prio").cast("long") * F.lit(PRIORITY_ENCODE) + F.col("_id")
    # n_sources via collect_set, NOT countDistinct: a distinct aggregate
    # expands to a second Exchange; the set of source names per text is
    # bounded by len(sources), so collect_set stays map-side combinable
    # and the whole merge is ONE shuffle.
    return u.groupBy("text").agg(
        F.min_by("_id", order_key).alias("survivor_id"),
        F.min_by("_source", order_key).alias("survivor_source"),
        F.count(F.lit(1)).alias("n_copies"),
        F.size(F.collect_set("_source")).cast("long").alias("n_sources"),
    )
