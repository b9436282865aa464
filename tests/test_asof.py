"""As-of and range join operators on hand-built fixtures (semantics pinned:
inclusive as-of match, (0, width] exclusive-inclusive range)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from filmdatawarehouse_spark.io.sources import literal_rows
from filmdatawarehouse_spark.operators.asof import asof_join, range_join

TS = datetime.datetime

L_SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("lts", T.TimestampType())]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("rts", T.TimestampType()),
    ]
)


def _fixture(spark):
    left = literal_rows(
        spark,
        [
            dict(k=1, lts=TS(2024, 1, 1, 10, 0, 0)),
            dict(k=1, lts=TS(2024, 1, 1, 11, 0, 0)),
            dict(k=2, lts=TS(2024, 1, 1, 9, 0, 0)),
        ],
        L_SCHEMA,
    )
    right = literal_rows(
        spark,
        [
            dict(rid=1, k=1, rts=TS(2024, 1, 1, 10, 30, 0)),  # → 10:00
            dict(rid=2, k=1, rts=TS(2024, 1, 1, 11, 0, 0)),   # tie → 11:00 (inclusive)
            dict(rid=3, k=1, rts=TS(2024, 1, 1, 9, 0, 0)),    # before any → null
            dict(rid=4, k=2, rts=TS(2024, 1, 1, 23, 0, 0)),   # → 9:00
            dict(rid=5, k=3, rts=TS(2024, 1, 1, 12, 0, 0)),   # no left key → null
        ],
        R_SCHEMA,
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _fixture(spark)
    out = {
        r.rid: r.asof_ts
        for r in asof_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    }
    assert out == {
        1: TS(2024, 1, 1, 10, 0, 0),
        2: TS(2024, 1, 1, 11, 0, 0),
        3: None,
        4: TS(2024, 1, 1, 9, 0, 0),
        5: None,
    }


def test_range_join_semantics(spark):
    left, right = _fixture(spark)
    pairs = {
        (r.lts, r.rid)
        for r in range_join(
            left, right, on="k", left_ts="lts", right_ts="rts", width_seconds=3600
        ).collect()
    }
    # (0, 3600s] after each left ts, same key:
    #   left 10:00 → rid 1 (30 min) and rid 2 (exactly 1h, inclusive)
    #   left 11:00 → nothing (rid 2 is at diff 0 → excluded)
    #   left 9:00 k=2 → nothing (rid 4 is 14h later)
    assert pairs == {
        (TS(2024, 1, 1, 10, 0, 0), 1),
        (TS(2024, 1, 1, 10, 0, 0), 2),
    }


def test_range_join_pre_epoch_timestamps(spark):
    """Negative-epoch timestamps must bucket by FLOOR, not truncation —
    truncation buckets 1969 rows one slot high and silently drops
    qualifying pairs (round-1 ADVICE)."""
    import pyspark.sql.types as T

    schema_l = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("lts", T.TimestampType())]
    )
    schema_r = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("rid", T.LongType()),
            T.StructField("rts", T.TimestampType()),
        ]
    )
    from filmdatawarehouse_spark.io.sources import literal_rows

    # 30 min before epoch → 15 min before epoch: diff = 900 s, width 3600 s.
    # floor(-1800e6/3600e6) = -1 for both; truncation gives 0 vs 0 too — so
    # also pin a pair straddling a negative bucket boundary: -3900 s → -3700 s
    # (buckets -2/-2 under floor; truncation puts both at -1... make them
    # differ): left at -3900 s (bucket -2), right at -3500 s (bucket -1 under
    # floor; truncation: -3900/3600→-1, -3500/3600→0 — pair lost without the
    # right-side explode matching, found with floor + explode of [-1, -2]).
    left = literal_rows(
        spark,
        [dict(k=1, lts=TS(1969, 12, 31, 22, 55, 0))],  # -3900 s
        schema_l,
    )
    right = literal_rows(
        spark,
        [dict(k=1, rid=7, rts=TS(1969, 12, 31, 23, 1, 40))],  # -3500 s
        schema_r,
    )
    got = range_join(
        left, right, on="k", left_ts="lts", right_ts="rts", width_seconds=3600
    ).collect()
    assert [(r.rid) for r in got] == [7]
