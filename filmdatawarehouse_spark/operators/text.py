"""Text-analysis operators for large-scale corpus pipelines.

Beyond the reference's surface (it has no string functions at all, SURVEY.md
§2.8): language-ID, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, ...)`` table. All pure
built-in column expressions — JVM-side, whole-stage-codegen, no Python in the
hot path — so they scan-scale linearly with no shuffle at 100 TB.

Every function here has a DuckDB-expressible twin (see queries/extended.py);
cross-engine determinism comes from md5-based token hashing and integer
arithmetic (no float accumulation except where operand order is pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deliberately small, fixed marker sets — a deterministic heuristic, not a
# trained model. Priority order breaks ties (en > es > de > fr > zh).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "von"),
    "fr": ("le", "les", "des", "et", "une", "est"),
    "zh": ("的", "了", "是", "我", "不", "在"),
}

LANG_PRIORITY = ("en", "es", "de", "fr", "zh")

# "BPE-ish" token pattern: letter runs, digit runs, or single non-alnum marks
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

STOPWORDS = LANG_MARKERS["en"]

MOD_PRIME = 1_000_000_007


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokens (single-space split — matches the corpus format and
    is expressible identically in any SQL engine)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(text)).cast("bigint")


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / punctuation
    marks) — the cheap proxy for subword token counts in data pipelines."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE)).cast("bigint")


def _marker_score(tokens: Column, markers: tuple[str, ...]) -> Column:
    """Number of tokens that are language markers (multiset count)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(text: Column | str) -> Column:
    """N-gram/stopword-heuristic language ID: argmax of per-language marker
    counts with fixed priority-order tiebreak. Returns the language code."""
    toks = ws_tokens(text)
    scores = {lang: _marker_score(toks, LANG_MARKERS[lang]) for lang in LANG_PRIORITY}
    # priority-chain argmax: lang L wins if its score is strictly greater
    # than every higher-priority language and >= every lower-priority one.
    expr = F.lit(LANG_PRIORITY[-1])
    for lang in reversed(LANG_PRIORITY[:-1]):
        later = LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1 :]
        cond = None
        for other in later:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column | str) -> Column:
    """Deterministic document quality score in [0,1]:

      0.25 * min(1, tokens/50)            (length)
    + 0.25 * alpha_chars / chars          (alphabetic ratio)
    + 0.25 * (1 - punct_chars / chars)    (punctuation penalty)
    + 0.25 * stopword_tokens / tokens     (naturalness)

    Operand order is pinned so the DuckDB twin produces identical doubles.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = ws_tokens(c)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(c).cast("double")
    alpha = (F.length(c) - F.length(F.regexp_replace(c, "[a-zA-Z]", ""))).cast("double")
    punct = F.length(F.regexp_replace(c, "[^.,;:!?'\"()]", "")).cast("double")
    stop = _marker_score(toks, STOPWORDS).cast("double")
    len_score = F.least(F.lit(1.0), n_tok / F.lit(50.0))
    alpha_ratio = alpha / n_chars
    punct_ratio = punct / n_chars
    stop_ratio = stop / n_tok
    return (
        F.lit(0.25) * len_score
        + F.lit(0.25) * alpha_ratio
        + F.lit(0.25) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.25) * stop_ratio
    )


def lang_id_frame(
    docs, id_col: str = "doc_id", text_col: str = "text"
):
    """(id, lang_pred) — like ``lang_id`` but binds the per-language scores
    as columns first. The CASE-chain argmax references each score several
    times; bound columns are evaluated once per row, inline expressions are
    re-evaluated at every reference (see word_shingles note in dedup.py)."""
    toks = ws_tokens(text_col)
    scored = docs.select(
        F.col(id_col),
        *[
            _marker_score(toks, LANG_MARKERS[lang]).alias(f"s_{lang}")
            for lang in LANG_PRIORITY
        ],
    )
    expr = F.lit(LANG_PRIORITY[-1])
    for lang in reversed(LANG_PRIORITY[:-1]):
        later = LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1 :]
        cond = None
        for other in later:
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return scored.select(F.col(id_col), expr.alias("lang_pred"))


def quality_frame(
    docs, id_col: str = "doc_id", text_col: str = "text"
):
    """(id, quality) — the quality score with metric columns bound first
    (mirrors the oracle's CTE structure; identical operand order)."""
    c = F.col(text_col)
    toks = ws_tokens(c)
    m = docs.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("n_tok"),
        F.length(c).cast("double").alias("n_chars"),
        (F.length(c) - F.length(F.regexp_replace(c, "[a-zA-Z]", "")))
        .cast("double")
        .alias("alpha"),
        F.length(F.regexp_replace(c, "[^.,;:!?'\"()]", "")).cast("double").alias("punct"),
        _marker_score(toks, STOPWORDS).cast("double").alias("stop"),
    )
    return m.select(
        F.col(id_col),
        (
            F.lit(0.25) * F.least(F.lit(1.0), F.col("n_tok") / F.lit(50.0))
            + F.lit(0.25) * (F.col("alpha") / F.col("n_chars"))
            + F.lit(0.25) * (F.lit(1.0) - F.col("punct") / F.col("n_chars"))
            + F.lit(0.25) * (F.col("stop") / F.col("n_tok"))
        ).alias("quality"),
    )


def text_metrics_frame(
    docs, id_col: str = "doc_id", text_col: str = "text"
):
    """(id, lang_pred, quality, n_tokens) — lang ID, quality score, and
    token count fused into ONE two-step projection of the same frame.

    Joining ``lang_id_frame ⋈ quality_frame ⋈ token counts`` on the id
    (the original pipeline shape) costs two shuffle joins and re-splits the
    text per frame; all three metrics are per-row functions of the same
    text, so one bound-column projection computes them with zero shuffles.
    Expressions are copied verbatim from the single-metric frames (same
    operand order), so results — and the SQL oracles — are bit-identical.
    """
    c = F.col(text_col)
    toks = ws_tokens(c)
    scored = docs.select(
        F.col(id_col),
        *[
            _marker_score(toks, LANG_MARKERS[lang]).alias(f"s_{lang}")
            for lang in LANG_PRIORITY
        ],
        F.size(toks).cast("double").alias("n_tok"),
        F.length(c).cast("double").alias("n_chars"),
        (F.length(c) - F.length(F.regexp_replace(c, "[a-zA-Z]", "")))
        .cast("double")
        .alias("alpha"),
        F.length(F.regexp_replace(c, "[^.,;:!?'\"()]", ""))
        .cast("double")
        .alias("punct"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
    lang_expr = F.lit(LANG_PRIORITY[-1])
    for lang in reversed(LANG_PRIORITY[:-1]):
        later = LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1 :]
        cond = None
        for other in later:
            cnd = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = cnd if cond is None else (cond & cnd)
        lang_expr = F.when(cond, F.lit(lang)).otherwise(lang_expr)
    # STOPWORDS is LANG_MARKERS['en'], so the stopword count IS s_en — no
    # second marker scan
    return scored.select(
        F.col(id_col),
        lang_expr.alias("lang_pred"),
        (
            F.lit(0.25) * F.least(F.lit(1.0), F.col("n_tok") / F.lit(50.0))
            + F.lit(0.25) * (F.col("alpha") / F.col("n_chars"))
            + F.lit(0.25) * (F.lit(1.0) - F.col("punct") / F.col("n_chars"))
            + F.lit(0.25) * (F.col("s_en").cast("double") / F.col("n_tok"))
        ).alias("quality"),
        F.col("n_tokens"),
    )


def normalize_text(text: Column | str) -> Column:
    """Canonical text form for dedup/canonical-compare: lowercase, strip
    non-alphanumeric-non-space characters, collapse whitespace runs, trim.
    Pure codegen'd JVM expressions (lower/regexp_replace/trim) — scan-speed
    at any scale, and each step is expressible verbatim in ANSI SQL."""
    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    collapsed = F.regexp_replace(stripped, " +", " ")
    return F.trim(collapsed)


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: polynomial rolling hash over characters,
    h = (h*31 + codepoint) mod 1e9+7. Pure integer arithmetic — identical in
    any engine; codegen'd left fold, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(MOD_PRIME),
    )


WORD_ENTROPY_SCHEMA = (
    "doc_id bigint, n_words bigint, n_distinct_words int, word_entropy double"
)


def word_entropy(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document Shannon entropy of the word distribution — the
    token-diversity quality signal (low entropy = repetitive/boilerplate).

    Cross-engine determinism follows the ``byte_stats`` recipe exactly
    (operators/multimodal.py): H = log2(n) − (Σ c·log2 c)/n with the sum
    folded SEQUENTIALLY over counts in ascending WORD order, computed in
    Python ``math.log2`` — the same libm log2 DuckDB calls — so the
    doubles hash-compare bit-for-bit. (A JVM-side fold would use Spark's
    log2 = log(x)/log(2), which can differ in the last ulp.)

    Zero-shuffle Arrow stage; splitting is on single spaces, matching the
    corpus contract and the SQL twin.
    """
    import math
    from collections import Counter

    from collections.abc import Iterator

    import pandas as pd

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                counts = Counter((txt or "").split(" "))
                n = sum(counts.values())
                acc = 0.0
                for w in sorted(counts):  # pinned fold order: word asc
                    c = counts[w]
                    acc += float(c) * math.log2(float(c))
                h = math.log2(float(n)) - acc / n if n else 0.0
                rows.append((did, n, len(counts), h))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_words", "n_distinct_words", "word_entropy"],
            )

    return docs.select(id_col, text_col).mapInPandas(
        compute, schema=WORD_ENTROPY_SCHEMA
    )


def word_entropy_native(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """JVM-native twin of ``word_entropy`` — the 100 TB production path.

    Same output contract (doc_id, n_words, n_distinct_words, word_entropy)
    but computed entirely in whole-stage-codegen JVM expressions:
    explode(split) → per-(doc, word) count → per-doc Σ c·log2(c) — no
    Python, no Arrow transfer, map-side-combinable aggregations.

    The pinned-fold ``word_entropy`` variant exists ONLY because the
    cross-engine certification hash needs bit-identical doubles (libm log2,
    sequential fold); this variant lets Spark sum in any order with its own
    log2, so results can differ from the twin in the last ulps —
    property-tested to |Δ| < 1e-9 (tests/test_properties.py).

    Scale shape: two shuffles, both map-side combined — (doc, word) then
    (doc); the heavy first aggregation collapses each partition's repeated
    words before the exchange. No per-doc data ever leaves the JVM.
    """
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "_w"
        ),
    )
    h = words.groupBy(id_col, "_w").agg(F.count(F.lit(1)).alias("_c"))
    c = F.col("_c").cast("double")
    agg = h.groupBy(id_col).agg(
        F.sum("_c").alias("n_words"),
        F.count(F.lit(1)).cast("int").alias("n_distinct_words"),
        F.sum(c * F.log2(c)).alias("_acc"),
    )
    n = F.col("n_words").cast("double")
    return agg.select(
        id_col,
        "n_words",
        "n_distinct_words",
        (F.log2(n) - F.col("_acc") / n).alias("word_entropy"),
    )


# ---------------------------------------------------------------------------
# model-based quality scoring (CCNet-style perplexity gate) — r11
# ---------------------------------------------------------------------------


def bigram_perplexity(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    floor_p: float = 1e-7,
) -> DataFrame:
    """Model-based quality scoring, the CCNet recipe's engine half: each
    document's PERPLEXITY under a reference language model — here any
    bigram table ``(w1, w2, cond_p)`` such as ``text_bigram_lm``'s output
    trained on a trusted corpus. Text the reference model finds
    predictable scores low (keep); garbled/boilerplate text scores high
    (tail). The MODEL is pluggable (CCNet uses Kneser–Ney 5-grams); the
    plumbing — explode, broadcast score, one aggregation — is the part
    that must scale, and is what this operator owns.

    Returns ``(id, n_bigrams, avg_logprob, perplexity)``;
    ``perplexity = exp(-avg_logprob)``. Bigrams absent from the (pruned)
    LM back off to ``floor_p``. Documents with fewer than 2 tokens have
    no bigrams and emit NULL scores — never a pretended number.

    Scale shape: bigrams are built per-row with zip_with (zero shuffle,
    the ``text_bigram_lm`` pattern); the LM join is a BROADCAST (an LM
    table is top-K-bounded by construction); the plan's only exchange is
    the per-doc aggregation, map-side combined. Float caveat: the
    per-doc log-prob sum is a Spark aggregate (order-free); scores can
    differ in the last ulps across runs — a filtering gate, not a
    cross-engine hash surface (the determinism-certified text scores
    live in ``text_unigram_logprob``/``word_entropy``).
    """
    words = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    pairs = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    ex = docs.select(
        F.col(id_col), F.explode_outer(pairs).alias("_p")
    ).select(
        id_col,
        F.col("_p.w1").alias("w1"),
        F.col("_p.w2").alias("w2"),
    )
    lp = F.log(F.coalesce(F.col("cond_p"), F.lit(float(floor_p))))
    avg = F.col("_slp") / F.col("n_bigrams").cast("double")
    return (
        ex.join(
            F.broadcast(lm.select("w1", "w2", "cond_p")),
            ["w1", "w2"],
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count("w1").alias("n_bigrams"),
            F.sum(F.when(F.col("w1").isNotNull(), lp)).alias("_slp"),
        )
        .select(
            id_col,
            "n_bigrams",
            avg.alias("avg_logprob"),
            F.exp(-avg).alias("perplexity"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    head: float = 0.3,
    tail: float = 0.3,
    ppl_col: str = "perplexity",
    edges: tuple[float, float] | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by perplexity
    quantiles — head (most reference-like) feeds training directly,
    middle gets lighter filtering, tail is dropped or audited. Edges via
    ``approx_percentile`` (operational thresholds, not a certification
    surface), or EXPLICIT ``edges=(lo, hi)`` (r12) when the caller owns
    threshold policy — pinned production cutoffs, or a replayable test
    oracle that picks edges away from observed scores so float ulps
    cannot flip an assignment. Unscored docs (NULL perplexity) land in
    their own bucket rather than polluting an extreme. One scalar
    aggregate (bounded collect; skipped entirely with explicit edges)
    + a map-side withColumn — no shuffle of ``scored``."""
    c = F.col(ppl_col)
    if edges is not None:
        lo, hi = float(edges[0]), float(edges[1])
        if not lo <= hi:
            raise ValueError(f"edges must satisfy lo <= hi: {edges}")
    else:
        if not (0 < head and 0 < tail and head + tail < 1):
            raise ValueError(
                f"need 0<head, 0<tail, head+tail<1: {head}, {tail}"
            )
        row = scored.agg(
            F.percentile_approx(
                ppl_col, [float(head), float(1 - tail)]
            ).alias("qs")
        ).first()
        if row.qs is None or row.qs[0] is None:
            # no scored document at all: everything is unscored
            return scored.withColumn(
                "ppl_bucket",
                F.when(c.isNull(), F.lit("unscored")).otherwise(
                    F.lit("head")
                ),
            )
        lo, hi = float(row.qs[0]), float(row.qs[1])
    bucket = (
        F.when(c.isNull(), F.lit("unscored"))
        .when(c < F.lit(lo), F.lit("head"))
        .when(c <= F.lit(hi), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.withColumn("ppl_bucket", bucket)
