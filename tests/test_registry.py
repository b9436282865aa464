"""Registry-level guards: every declared oracle must be valid DuckDB SQL
over the test tables, and the driver contract must stay self-consistent —
cheap nets that catch typos before the (slow) full compare does."""

from __future__ import annotations

from filmdatawarehouse_spark.queries.registry import all_queries


def test_every_oracle_parses_and_runs_in_duckdb(duck):
    for name, (_fn, sql) in sorted(all_queries().items()):
        if sql is None:
            continue
        # EXPLAIN parses, binds, and plans without materializing the result
        duck.execute(f"EXPLAIN {sql}")


def test_registry_names_unique_and_callable(spark):
    reg = all_queries()
    # hard floor at the CURRENT registry size: all_queries() swallows a
    # module's ImportError by design (optional surfaces), so a broken
    # import would silently shrink the registry and the driver window
    # would backfill with the wrong entries — this floor makes any
    # shrink a loud failure. Raise it when registering new queries.
    assert len(reg) >= 151
    for name, (fn, _sql) in reg.items():
        assert callable(fn), name
        assert name == name.strip() and " " not in name


def test_rows_only_queries_are_documented():
    """An oracle-less query is only acceptable with an explicit design note
    naming its hash-gated certification sibling — never a missing oracle."""
    from filmdatawarehouse_spark.queries.registry import ROWS_ONLY_NOTES

    reg = all_queries()
    oracle_less = {n for n, (_f, sql) in reg.items() if sql is None}
    assert oracle_less == set(ROWS_ONLY_NOTES), (
        f"undocumented rows-only queries: {oracle_less - set(ROWS_ONLY_NOTES)}; "
        f"stale notes: {set(ROWS_ONLY_NOTES) - oracle_less}"
    )
    for name, note in ROWS_ONLY_NOTES.items():
        assert len(note) > 40, f"note for {name} too thin to justify rows-only"


def test_staleness_bounded_by_window_rotation():
    """Every registered query must have a green driver row no older than
    2 rounds OR a slot in this round's 50-entry window (VERDICT r05
    item 5). The ledger is pinned to the rounds that existed at rotation
    (CURRENT_ROUND - 1) so the guard is stable even after the driver
    writes this round's CORRECTNESS file."""
    import os
    import sys

    from filmdatawarehouse_spark.queries.registry import CURRENT_ROUND

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from gen_query_inventory import last_certified
    finally:
        sys.path.pop(0)

    from filmdatawarehouse_spark.queries.registry import (
        RETIRED,
        WINDOW_DEFERRED,
    )

    ledger = last_certified(CURRENT_ROUND - 1)
    reg = all_queries()
    window = set(list(reg)[:50])
    overdue = [
        n
        for n in reg
        if ledger.get(n, 0) <= CURRENT_ROUND - 3
        and n not in window
        # a NEVER-certified query may explicitly defer its first window
        # slot when the staleness backlog fills all 50 (registry
        # WINDOW_DEFERRED); a certified-stale one can never yield its slot
        and not (n in WINDOW_DEFERRED and n not in ledger)
        # RETIRED entries leave the rotation: certified by an active
        # sibling (test_retired_queries_are_sound), verified locally only
        and n not in RETIRED
    ]
    assert not overdue, (
        f"queries >2 rounds stale with no window slot this round: {overdue}"
    )


def test_window_deferrals_are_sound():
    """WINDOW_DEFERRED is a narrow escape hatch, not a parking lot: every
    deferred name must exist in the registry (a typo here would silently
    drop a query from certification — the r07 phantom-name failure mode),
    must NOT also hold a window slot, and must be driver-never-seen (a
    query with a prior CORRECTNESS row defers by staleness math, not by
    fiat)."""
    import os
    import sys

    from filmdatawarehouse_spark.queries.registry import (
        CURRENT_ROUND,
        DRIVER_PRIORITY,
        WINDOW_DEFERRED,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from gen_query_inventory import last_certified
    finally:
        sys.path.pop(0)

    reg = all_queries()
    unknown = [n for n in WINDOW_DEFERRED if n not in reg]
    assert not unknown, f"WINDOW_DEFERRED names not registered: {unknown}"
    overlap = set(WINDOW_DEFERRED) & set(DRIVER_PRIORITY)
    assert not overlap, f"deferred AND windowed: {sorted(overlap)}"
    ledger = last_certified(CURRENT_ROUND - 1)
    seen = [n for n in WINDOW_DEFERRED if n in ledger]
    assert not seen, (
        f"WINDOW_DEFERRED entries with prior driver rows (not deferrable): "
        f"{seen}"
    )


def test_retired_queries_are_sound():
    """Retirement is the only way the certified surface can grow past the
    150-entry steady-state capacity (50-slot window x 3-round staleness
    bound), so it must be impossible to abuse: every RETIRED name must be
    registered, must have at least one prior green driver row (retiring a
    never-certified query would just delete it from certification), must
    hold no window slot and no deferral, and must carry a RETIRED_NOTES
    entry naming — backquoted — an ACTIVE registered sibling whose driver
    rows certify the same capability. Also pins the headroom math: active
    entries must fit the steady-state capacity with room to grow."""
    import os
    import re
    import sys

    from filmdatawarehouse_spark.queries.registry import (
        CURRENT_ROUND,
        DRIVER_PRIORITY,
        RETIRED,
        RETIRED_NOTES,
        WINDOW_DEFERRED,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from gen_query_inventory import last_certified
    finally:
        sys.path.pop(0)

    reg = all_queries()
    assert set(RETIRED) == set(RETIRED_NOTES), (
        f"RETIRED and RETIRED_NOTES out of sync: "
        f"{set(RETIRED) ^ set(RETIRED_NOTES)}"
    )
    unknown = [n for n in RETIRED if n not in reg]
    assert not unknown, f"RETIRED names not registered: {unknown}"
    windowed = set(RETIRED) & set(DRIVER_PRIORITY)
    assert not windowed, f"retired AND windowed: {sorted(windowed)}"
    deferred = set(RETIRED) & set(WINDOW_DEFERRED)
    assert not deferred, f"retired AND deferred: {sorted(deferred)}"

    ledger = last_certified(CURRENT_ROUND - 1)
    never = [n for n in RETIRED if n not in ledger]
    assert not never, (
        f"RETIRED entries without any prior green driver row (that is "
        f"deletion, not retirement): {never}"
    )

    active = set(reg) - set(RETIRED)
    for name, note in RETIRED_NOTES.items():
        assert len(note) > 60, f"note for {name} too thin to justify retirement"
        survivors = [
            t for t in re.findall(r"`([a-z0-9_]+)`", note) if t in active
        ]
        assert survivors, (
            f"RETIRED_NOTES[{name}] names no active registered survivor "
            f"(backquote the certifying sibling)"
        )

    # headroom: each active entry needs a window slot at most every 3
    # rounds, so steady-state capacity is 50 x 3 = 150. Retirement exists
    # to keep this strictly positive; if it hits 0 the surface is frozen.
    capacity = 50 * 3
    headroom = capacity - (len(reg) - len(RETIRED))
    assert headroom > 0, (
        f"certification window saturated again (active={len(reg) - len(RETIRED)}, "
        f"capacity={capacity}): retire more entries or widen the window "
        f"before registering new queries"
    )


def test_query_inventory_in_sync():
    """QUERIES.md is generated from the registry; regenerate with
    `python tools/gen_query_inventory.py` whenever queries change."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from gen_query_inventory import render
    finally:
        sys.path.pop(0)
    with open(os.path.join(repo, "QUERIES.md")) as f:
        on_disk = f.read()
    assert on_disk == render(), (
        "QUERIES.md out of date — run `python tools/gen_query_inventory.py`"
    )


def test_bench_headline_names_all_registered():
    """Every bench.py HEADLINE name must exist in the registry — a typo
    or a renamed query would otherwise silently drop out of the bench
    (bench filters to registered names instead of failing)."""
    import importlib

    bench = importlib.import_module("bench")
    reg = all_queries()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, f"bench HEADLINE names not registered: {missing}"


def test_registry_import_errors_propagate(monkeypatch):
    """r12 (VERDICT): the driver imports __spark_entry__ WITHOUT running
    pytest first, so a family module that fails to import must blow up
    the registry loudly — the r11 `except ImportError: pass` wrappers
    silently shrank the certified window to whatever still imported."""
    import sys

    # poisoning sys.modules with None makes `import x` raise ImportError
    monkeypatch.setitem(
        sys.modules, "filmdatawarehouse_spark.queries.extended", None
    )
    try:
        all_queries()
    except ImportError:
        pass
    else:
        raise AssertionError(
            "all_queries() swallowed a family ImportError"
        )


def test_driver_window_names_validated_at_registry_build(monkeypatch):
    """Companion guard: a family that IMPORTS but lost its entries must
    also fail — every DRIVER_PRIORITY name resolves or the build raises."""
    import pytest

    from filmdatawarehouse_spark.queries import registry as reg

    monkeypatch.setattr(
        reg, "DRIVER_PRIORITY", reg.DRIVER_PRIORITY + ("no_such_query",)
    )
    with pytest.raises(RuntimeError, match="no_such_query"):
        reg.all_queries()
