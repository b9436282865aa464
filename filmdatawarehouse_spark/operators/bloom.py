"""Portable Bloom-filter semi-join prefilter.

The runtime-filter pattern Spark applies internally (`spark.sql.optimizer.
runtime.bloomFilter.enabled`) exposed as an explicit operator: build a
Bloom filter over a SELECTIVE dimension's join keys, then drop fact rows
whose key cannot join BEFORE the fact side shuffles. At 100 TB the win is
shuffle volume: a 1%-selective dim turns a full-fact exchange into a ~1%
exchange for the cost of one scan + 2 salted ``xxhash64`` evaluations per
row, expanded to k bit positions by Kirsch–Mitzenmacher double hashing
(JVM codegen'd, no Python).

PySpark 4.1 exposes neither ``bloom_filter_agg`` nor
``DataFrame.stat.bloomFilter``, so the filter is built from first
principles: k double-hashed positions mod m set bits in an m-bit bitmap
(see ``_hash_positions`` for the exact arithmetic). The
bitmap is collected to the driver as ≤ m/64 longs (BOUNDED by the m_bits
parameter — 2048 longs at the default 2^17, the same O(constant) driver
contract as the ANN centroid arrays) and re-enters the plan as an array
literal, so the probe side is a zero-shuffle scan filter.

No false negatives (a present key always probes 1-bits), so prefilter +
join ≡ plain join — which is exactly what the registered query's oracle
asserts. False positives only cost wasted shuffle rows, bounded by the
standard (1 - e^{-kn/m})^k rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 1 << 17  # CAP, not the size: build_bloom sizes m to the key count
K_HASHES = 5
# ~10 bits/key at k=5 → fpp ≈ 1.1% ((1 - e^{-5/10})^5); the filter is sized
# to the keys it actually holds instead of a fixed 2^17. Measured r16: the
# per-row probe cost of the codegen'd literal-array lookup SCALES WITH THE
# ARRAY LENGTH (600k-row scan: 1.5-1.7 s at 2048 words vs ~0.5 s at 32 —
# interleaved runs, so not JIT warmup), so an oversized filter taxes every
# fact row for false-positive headroom nobody asked for. fpp only affects
# wasted shuffle rows, never results (the exact join removes survivors),
# which is why resizing is certified by the unchanged oracle.
BITS_PER_KEY = 10
M_BITS_FLOOR = 1 << 9


def _hash_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key via Kirsch–Mitzenmacher double hashing:
    pos_i = (h1 + i·h2) mod m from two salted ``xxhash64`` values (the
    salt literals hash as extra columns under xxhash64's fixed seed) — a
    single JVM-native hash expression per value (the md5 → substring →
    base-16 conv chain measured ~4× slower per row on the probe side,
    which runs on EVERY fact row). pmod folds each hash into
    [0, m) first so h1 + k·h2 stays far below int64 overflow. Build and
    probe share this exact arithmetic; the registered query's oracle
    never replays these internals (it certifies prefilter+join ≡ plain
    join), so hash portability across engines is not required."""
    h1 = F.pmod(F.xxhash64(key, F.lit(0x5EED1)), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x5EED2)), F.lit(m_bits))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m_bits: int | None = None,
    k: int = K_HASHES,
) -> list[int]:
    """Bitmap words (m_bits/64 longs) over the distinct keys of ``keys``.
    The distinct-position frame is at most m_bits rows regardless of key
    count — the collect is bounded by the filter size, not the data.

    ``m_bits=None`` (default) sizes the filter to the keys: the smallest
    power of two ≥ ``BITS_PER_KEY`` × distinct keys, clamped to
    [``M_BITS_FLOOR``, ``M_BITS``] — one tiny count job over the
    (selective, dim-side) key frame buys a probe array sized to the
    problem instead of the 2^17 worst case (see the BITS_PER_KEY note
    for the measured per-row cost of oversized literals). The returned
    word list encodes the chosen size (len·64), so ``bloom_prefilter``
    needs no separate parameter."""
    if m_bits is None:
        n_keys = keys.select(key_col).distinct().count()
        want = max(M_BITS_FLOOR, BITS_PER_KEY * max(n_keys, 1))
        m_bits = min(M_BITS, 1 << (want - 1).bit_length())
    pos = F.explode(
        F.array(*_hash_positions(F.col(key_col), m_bits, k))
    ).alias("p")
    rows = keys.select(pos).distinct().collect()
    words = [0] * (m_bits // 64)
    for r in rows:
        p = r["p"]
        words[p // 64] |= 1 << (p % 64)
    # literals are signed longs
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prefilter(
    fact: DataFrame,
    words: list[int],
    key_col: str,
    m_bits: int | None = None,
    k: int = K_HASHES,
) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the filter (all k probed
    bits set). Pure scan-side projection + filter — pushes below any
    downstream shuffle. ``m_bits`` defaults to the size encoded in the
    word list (``len(words) * 64`` — build_bloom keeps m a power of two,
    so the round-trip is exact)."""
    if m_bits is None:
        m_bits = len(words) * 64
    # ONE array Literal, not CreateArray(2048 literal children) — the
    # latter rebuilds the array per row in codegen; a Literal is free
    arr = F.lit([int(w) for w in words])
    probed = fact.withColumns(
        {
            f"_bp{i}": p
            for i, p in enumerate(
                _hash_positions(F.col(key_col), m_bits, k)
            )
        }
    )
    cond = None
    for i in range(k):
        bit = F.expr(
            f"(shiftright(element_at(_bw, CAST(_bp{i} DIV 64 AS INT) + 1), "
            f"CAST(pmod(_bp{i}, 64) AS INT)) & 1) = 1"
        )
        cond = bit if cond is None else (cond & bit)
    return (
        probed.withColumn("_bw", arr)
        .filter(cond)
        .drop("_bw", *[f"_bp{i}" for i in range(k)])
    )
