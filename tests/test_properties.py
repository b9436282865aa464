"""Property-based tests (hypothesis): the composed operators must agree
with brute-force references on randomized small inputs — the class of bugs
example tests miss (bucket boundaries, negative epochs, odd graph shapes).

Examples are capped low: each case builds real DataFrames, so the budget
is correctness breadth per second, not case count.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EPOCH = datetime.datetime(1970, 1, 1)

# timestamps straddling the epoch (negative micros exercised on purpose),
# seconds granularity, bounded so interval arithmetic stays tiny
_ts = st.integers(min_value=-100_000, max_value=100_000).map(
    lambda s: EPOCH + datetime.timedelta(seconds=s)
)
_key = st.integers(min_value=1, max_value=3)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=8),
    right=st.lists(st.tuples(_key, _ts), min_size=1, max_size=8),
    width=st.integers(min_value=1, max_value=7200),
)
def test_range_join_matches_bruteforce(spark, left, right, width):
    """range_join (bucketize + equi-join + exact filter) must equal the
    O(n·m) reference `0 < r.ts − l.ts ≤ width` for any key/time layout,
    including pre-epoch timestamps (the truncation-vs-floor bug class)."""
    from filmdatawarehouse_spark.operators.asof import range_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, lts timestamp, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right)], "k long, rts timestamp, rid long"
    )
    got = {
        (r.lid, r.rid)
        for r in range_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts", width_seconds=width
        ).collect()
    }
    want = {
        (li, ri)
        for li, (lk, lt) in enumerate(left)
        for ri, (rk, rt) in enumerate(right)
        if lk == rk and 0 < (rt - lt).total_seconds() <= width
    }
    assert got == want


def _components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node -> min node of its component."""
    parent = list(range(n_nodes + 1))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(1, n_nodes + 1)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_nodes=st.integers(min_value=2, max_value=12),
    edge_idx=st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12)), max_size=14
    ),
)
def test_dup_clusters_matches_union_find(spark, n_nodes, edge_idx):
    """Iterative min-label propagation must equal union-find on arbitrary
    graphs — chains, cycles, stars, self-referential edge lists."""
    from filmdatawarehouse_spark.operators.dedup import dup_clusters

    edges = [
        (min(a, b), max(a, b))
        for a, b in edge_idx
        if a != b and a <= n_nodes and b <= n_nodes
    ]
    ids = spark.createDataFrame([(i,) for i in range(1, n_nodes + 1)], "doc_id long")
    pairs = spark.createDataFrame(
        edges or [(None, None)], "doc_id_a long, doc_id_b long"
    ).dropna()
    got = {r.doc_id: r.cluster_id for r in dup_clusters(ids, pairs).collect()}
    assert got == _components(n_nodes, edges)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=24),
            st.integers(min_value=0, max_value=24),
        ),
        min_size=0,
        max_size=30,
    ),
)
def test_connected_components_match_union_find(spark, edges):
    """Both CC implementations (diameter-round BSP and log-round
    star-contraction) must equal a local union-find labeling every node
    0..24 with its component minimum, for arbitrary edge lists including
    self-loops, parallel edges, and isolated nodes."""
    from filmdatawarehouse_spark.operators.dedup import (
        dup_clusters,
        star_contraction_clusters,
    )

    n = 25
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}

    ids = spark.range(n).withColumnRenamed("id", "doc_id")
    clean = [(a, b) for a, b in edges if a != b]
    if clean:
        pairs = spark.createDataFrame(clean, "doc_id_a long, doc_id_b long")
    else:
        pairs = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    bsp = {r.doc_id: r.cluster_id for r in dup_clusters(ids, pairs, max_iters=30).collect()}
    star = {
        r.doc_id: r.cluster_id
        for r in star_contraction_clusters(ids, pairs).collect()
    }
    assert bsp == want
    assert star == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab é"),  # repeats + multibyte utf-8
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_native_twins_agree_with_pinned_fold(spark, texts):
    """The JVM-native production variants (word_entropy_native /
    byte_stats_native) must agree with their pinned-fold certification
    twins: exact-integer columns bit-equal, doubles within 1e-9 — on
    arbitrary texts including empty strings, runs of separators, and
    multibyte utf-8 payloads."""
    from filmdatawarehouse_spark.operators import text as tx
    from filmdatawarehouse_spark.operators.multimodal import (
        attach_text_payload,
        byte_stats,
        byte_stats_native,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {r.doc_id: r for r in tx.word_entropy(docs).collect()}
    b = {r.doc_id: r for r in tx.word_entropy_native(docs).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k].n_words == b[k].n_words
        assert a[k].n_distinct_words == b[k].n_distinct_words
        assert abs(a[k].word_entropy - b[k].word_entropy) < 1e-9

    assets = attach_text_payload(docs)
    p = {r.asset_id: r for r in byte_stats(assets).collect()}
    q = {r.asset_id: r for r in byte_stats_native(assets).collect()}
    assert p.keys() == q.keys()
    for k in p:
        assert p[k].n_bytes == q[k].n_bytes
        assert p[k].sum_bytes == q[k].sum_bytes
        assert p[k].n_distinct_bytes == q[k].n_distinct_bytes
        assert abs(p[k].mean_byte - q[k].mean_byte) < 1e-9
        assert abs(p[k].byte_entropy - q[k].byte_entropy) < 1e-9


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),  # user
            st.integers(min_value=0, max_value=20_000),  # epoch seconds
        ),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_capped_sessions_match_bruteforce(spark, events):
    """events_sessions_capped's gap+slice logic vs a sequential reference:
    same session membership (gap>30min splits, 60-min slices from session
    start) for any event layout, including exact-boundary gaps."""
    from filmdatawarehouse_spark.queries.timeseries import (
        SESSION_CAP_S,
        SESSION_GAP_S,
        q_events_sessions_capped,
    )

    import tempfile

    rows = [
        (i, datetime.datetime.utcfromtimestamp(ts), u, "t", 0.0, "{}")
        for i, (u, ts) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        got = {
            (r.user_id, r.gap_session, r.slice_idx, r.n_events)
            for r in q_events_sessions_capped(spark, tmp).collect()
        }

    # sequential reference
    want: dict[tuple, int] = {}
    by_user: dict[int, list[tuple]] = {}
    for i, (u, ts) in enumerate(events):
        by_user.setdefault(u, []).append((ts, i))
    for u, evs in by_user.items():
        evs.sort()
        gap_sess, prev = 0, None
        sess_start = None
        for ts, _i in evs:
            if prev is not None and ts - prev > SESSION_GAP_S:
                gap_sess += 1
                sess_start = ts
            elif prev is None:
                sess_start = ts
            prev = ts
            sub = (ts - sess_start) // SESSION_CAP_S
            key = (u, gap_sess, sub)
            want[key] = want.get(key, 0) + 1
    assert got == {(u, g, s, n) for (u, g, s), n in want.items()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # key
                st.integers(min_value=0, max_value=9),   # value payload
                st.integers(min_value=0, max_value=20),  # seq
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    ),
    replay=st.booleans(),
)
def test_merge_sink_equals_argmax_reduction(spark, tmp_path_factory, batches, replay):
    """streaming MERGE survivorship (streaming/merge.py) against the
    closed-form spec for ANY batch sequence: the final table holds, per
    key, the row with the lexicographically greatest (seq, batch-order,
    within-batch priority) — i.e. greatest seq wins, later arrival
    breaks seq ties. Replaying every batch a second time under fresh
    batch ids (worst-case at-least-once redelivery) must not change the
    table. Keys are intentionally few (0..5) to force collisions."""
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch,
        read_merge_table,
    )

    table = str(tmp_path_factory.mktemp("merge_prop"))
    schema = "k long, v long, seq long"
    for bid, rows in enumerate(batches):
        merge_upsert_batch(
            spark.createDataFrame(rows, schema), bid, table, ["k"],
            seq_col="seq",
        )
    if replay:
        for bid, rows in enumerate(batches):
            merge_upsert_batch(
                spark.createDataFrame(rows, schema),
                len(batches) + bid,
                table,
                ["k"],
                seq_col="seq",
            )

    # spec: fold batches in order; candidate replaces survivor iff
    # seq strictly greater, or equal seq (batch beats base / later batch
    # beats earlier). Within a batch, ties on seq resolve arbitrarily in
    # the engine, so the spec pins only (k -> max seq) and, where one
    # row uniquely holds that max across the whole history, its value.
    expect_seq: dict[int, int] = {}
    max_holders: dict[int, set[int]] = {}
    for rows in batches:
        for k, v, seq in rows:
            if k not in expect_seq or seq >= expect_seq[k]:
                if k not in expect_seq or seq > expect_seq[k]:
                    max_holders[k] = {v}
                else:
                    max_holders[k].add(v)
                expect_seq[k] = seq
    got = {
        r.k: (r.seq, r.v) for r in read_merge_table(spark, table).collect()
    }
    assert set(got) == set(expect_seq)
    for k, (seq, v) in got.items():
        assert seq == expect_seq[k], (k, seq, expect_seq[k])
        assert v in max_holders[k], (k, v, max_holders[k])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lines=st.lists(
        st.one_of(
            # valid record
            st.tuples(
                st.integers(min_value=0, max_value=99),
                st.text(
                    alphabet="abcxyz", min_size=0, max_size=5
                ),
            ).map(lambda t: f'{{"id": {t[0]}, "v": "{t[1]}"}}'),
            # garbage (never valid JSON, never blank)
            st.text(alphabet="{}xq<>", min_size=1, max_size=8).map(
                lambda s: "<" + s
            ),
            # blank / whitespace-only
            st.sampled_from(["", " ", "   ", "\t"]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_quarantine_split_spec(spark, tmp_path_factory, lines):
    """split_quarantine over ANY mix of valid / garbage / blank lines:
    conservation (clean + quarantine == input), clean holds exactly the
    well-formed records with their parsed values, quarantine preserves
    every dirty raw line verbatim (multiset), and no blank line ever
    reaches clean (the ADVICE r08 phantom-row class)."""
    import json as _json
    from collections import Counter

    from filmdatawarehouse_spark.io.formats import split_quarantine

    d = tmp_path_factory.mktemp("qprop")
    p = d / "in.json"
    # the text source drops a trailing newline-only record consistently;
    # write one line per input entry
    p.write_text("".join(line + "\n" for line in lines))

    raw = spark.read.text(str(p))
    clean, quarantine = split_quarantine(raw, "json", "id int, v string")
    got_clean = [(r.id, r.v) for r in clean.collect()]
    got_bad = [r.raw_record for r in quarantine.collect()]

    expect_clean, expect_bad = [], []
    for line in lines:
        try:
            if not line.strip():
                raise ValueError
            obj = _json.loads(line)
            expect_clean.append((obj["id"], obj["v"]))
        except ValueError:
            expect_bad.append(line)
    assert len(got_clean) + len(got_bad) == len(lines)
    assert Counter(got_clean) == Counter(expect_clean)
    assert Counter(got_bad) == Counter(expect_bad)


_XSINK_N = 0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
                st.integers(min_value=0, max_value=9),
                # seq includes None: NULL-seq rows are where the SQL
                # path's UNKNOWN three-valued logic can diverge from the
                # aggregate's NULL-orders-lowest semantics
                st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    ),
)
def test_snapshot_and_jdbc_merge_sinks_agree(
    spark, tmp_path_factory, batches
):
    """The two exactly-once MERGE implementations — parquet snapshot
    aggregate and SQL DELETE/INSERT over Derby — must produce the SAME
    keyed table for any batch sequence, INCLUDING NULL keys (where the
    SQL path's null-safe residual must match the aggregate's
    NULL-as-one-group semantics). Seqs are made unique per key per batch
    so ties cannot resolve differently between engines."""
    from filmdatawarehouse_spark.streaming.jdbc_merge import merge_jdbc_batch
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch,
        read_merge_table,
    )

    # de-dup (key, seq) within each batch so within-batch ties (which
    # both engines resolve arbitrarily) cannot cause a spurious mismatch
    uniq_batches = []
    for rows in batches:
        seen = {}
        for k, v, seq in rows:
            seen[(k, seq)] = (k, v, seq)
        uniq_batches.append(list(seen.values()))

    schema = "k long, v long, seq long"
    # a fresh Derby DB per example via a monotonic counter (a
    # Hypothesis-drawn tag repeats during shrinking, and a reused DB's
    # ledger rows would skip batches and fail for the wrong reason);
    # dropped at the end so examples don't accumulate in the JVM heap
    global _XSINK_N
    _XSINK_N += 1
    tag = _XSINK_N
    table = str(tmp_path_factory.mktemp("xsink"))
    url = f"jdbc:derby:memory:xsink{tag};create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    try:
        for bid, rows in enumerate(uniq_batches):
            df = spark.createDataFrame(rows, schema)
            merge_upsert_batch(
                df, bid, table, ["k"], seq_col="seq", run_id="r"
            )
            merge_jdbc_batch(
                df, bid, url, "xt", ["k"], seq_col="seq", driver=drv,
                run_id="r",
            )

        snap = {
            (r.k, r.v, r.seq)
            for r in read_merge_table(spark, table).collect()
        }
        back = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", drv)
            .option("dbtable", "xt")
            .load()
            .collect()
        )
        jdbc = {(r.k, r.v, r.seq) for r in back}
        assert snap == jdbc
        assert len(back) == len({r.k for r in back})  # keyed: no dupes
    finally:
        try:
            spark._jvm.java.sql.DriverManager.getConnection(
                f"jdbc:derby:memory:xsink{tag};drop=true"
            )
        except Exception:
            pass  # Derby signals a successful drop BY raising


# ---------------------------------------------------------------------------
# partition-selective compaction (io/maintenance.py)
# ---------------------------------------------------------------------------

_COMPACT_N = 0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    layout=st.lists(  # per partition: (value, files as row-counts)
        st.tuples(
            st.sampled_from(["a", "b", "c", None]),
            st.lists(
                st.integers(min_value=1, max_value=12),
                min_size=1,
                max_size=5,
            ),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],
    ),
    divisor=st.integers(min_value=1, max_value=6),
)
def test_compaction_conserves_rows_and_converges(
    spark, tmp_path_factory, layout, divisor
):
    """For ANY partition layout and target size: compaction never loses,
    duplicates, or mutates a row; repeated runs strictly shrink file
    counts until no victim remains (convergence, not oscillation)."""
    from filmdatawarehouse_spark.io import maintenance as mt

    global _COMPACT_N
    _COMPACT_N += 1
    path = str(tmp_path_factory.mktemp(f"cprop{_COMPACT_N}"))
    schema = "k long, v string, day string"
    next_k = 0
    for value, files in layout:
        for n in files:
            rows = [
                (next_k + i, f"v{next_k + i}", value) for i in range(n)
            ]
            next_k += n
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).partitionBy("day").parquet(path)

    def snapshot():
        return sorted(
            (r.k, r.v, r.day or "~null~")
            for r in spark.read.parquet(path).collect()
        )

    before = snapshot()
    total_bytes = sum(s for _, s in mt.list_data_files(spark, path))
    target = max(1, total_bytes // divisor)
    prev_files = len(mt.list_data_files(spark, path))
    for _ in range(6):
        summary = mt.compact_partitions(
            spark, path, "day", target_bytes=target
        )
        if summary["partitions"] == 0:
            break
        now_files = len(mt.list_data_files(spark, path))
        assert now_files < prev_files  # strict progress, no oscillation
        prev_files = now_files
    else:
        raise AssertionError("compaction did not converge in 6 rounds")
    assert snapshot() == before


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    layout=st.lists(  # per leaf: (day, hour, files as row-counts)
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.sampled_from([0, 1, None]),
            st.lists(
                st.integers(min_value=1, max_value=8),
                min_size=1,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda t: (t[0], t[1]),
    ),
    divisor=st.integers(min_value=1, max_value=5),
)
def test_multicol_compaction_conserves_rows_and_converges(
    spark, tmp_path_factory, layout, divisor
):
    """r11 multi-level twin of the single-col property: for ANY
    (day, hour) leaf layout — NULLs at either level included — and any
    target, compaction through the full column list never loses,
    duplicates, or mutates a row, and repeated runs strictly shrink
    file counts until no victim remains."""
    from filmdatawarehouse_spark.io import maintenance as mt

    global _COMPACT_N
    _COMPACT_N += 1
    path = str(tmp_path_factory.mktemp(f"cpropmc{_COMPACT_N}"))
    schema = "k long, v string, day string, hour int"
    next_k = 0
    for day, hour, files in layout:
        for n in files:
            rows = [
                (next_k + i, f"v{next_k + i}", day, hour)
                for i in range(n)
            ]
            next_k += n
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).partitionBy("day", "hour").parquet(path)

    def snapshot():
        return sorted(
            (r.k, r.v, r.day or "~null~", -1 if r.hour is None else r.hour)
            for r in spark.read.parquet(path).collect()
        )

    before = snapshot()
    total_bytes = sum(s for _, s in mt.list_data_files(spark, path))
    target = max(1, total_bytes // divisor)
    prev_files = len(mt.list_data_files(spark, path))
    for _ in range(6):
        summary = mt.compact_partitions(
            spark, path, ["day", "hour"], target_bytes=target
        )
        if summary["partitions"] == 0:
            break
        now_files = len(mt.list_data_files(spark, path))
        assert now_files < prev_files  # strict progress, no oscillation
        prev_files = now_files
    else:
        raise AssertionError("compaction did not converge in 6 rounds")
    assert snapshot() == before
