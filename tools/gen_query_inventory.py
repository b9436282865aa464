"""Regenerate QUERIES.md from the live registry. Run after adding or
rotating queries; tests/test_registry.py asserts the file is in sync."""

from __future__ import annotations

import inspect
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_certified(max_round: int) -> dict[str, int]:
    """Latest round (<= ``max_round``) in which each query got a green
    driver row (rows_match true, no error) in CORRECTNESS_r{N}.json.
    ``max_round`` is pinned (registry.CURRENT_ROUND - 1) so the ledger —
    and the staleness guard built on it — does not shift mid-round when
    the driver drops the current round's file."""
    import json

    rounds: dict[str, int] = {}
    for rnd in range(1, max_round + 1):
        path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            data = json.load(f)
        for q, row in data.items():
            full = row.get("rows_match") and not row.get("err")
            # documented rows-only entries (registry.ROWS_ONLY_NOTES) get
            # err='no_oracle' from the driver; their green is "ran and
            # produced rows"
            rows_only = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if full or rows_only:
                rounds[q] = rnd
    return rounds


def render() -> str:
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from filmdatawarehouse_spark.queries.registry import (
        CURRENT_ROUND,
        RETIRED,
        RETIRED_NOTES,
        ROWS_ONLY_NOTES,
        all_queries,
    )

    reg = all_queries()
    window = set(list(reg)[:50])
    ledger = last_certified(CURRENT_ROUND - 1)
    lines = [
        "# Query inventory",
        "",
        "Auto-generated from `filmdatawarehouse_spark.queries.registry.all_queries()`",
        "(`python tools/gen_query_inventory.py`; drift-guarded by",
        "`tests/test_registry.py::test_query_inventory_in_sync`).",
        "",
        f"{len(reg)} registered queries ({len(reg) - len(RETIRED)} active, "
        f"{len(RETIRED)} retired); "
        f"{sum(1 for _, (_f, s) in reg.items() if s)} with DuckDB oracles",
        "(the rest are rows-only by design). The first 50 form the external",
        "driver's certification window for this round. `last driver row` is",
        f"the latest green CORRECTNESS round as of rotation (r{CURRENT_ROUND});",
        "`—` = awaiting first driver row (this round's window covers it).",
        "No ACTIVE query may be staler than 2 rounds without a window slot",
        "(`tests/test_registry.py::test_staleness_bounded_by_window_rotation`);",
        "`retired` entries leave the rotation — each is certified by a",
        "strictly-stronger active sibling (see Retired queries below) and is",
        "still oracle-verified locally on every pytest run.",
        "",
        "| # | query | oracle | window | last driver row | source |",
        "|---|-------|--------|--------|-----------------|--------|",
    ]
    for i, (name, (fn, sql)) in enumerate(reg.items(), 1):
        code = inspect.unwrap(fn).__code__
        path = code.co_filename.split(REPO + "/")[-1]
        last = f"r{ledger[name]:02d}" if name in ledger else "—"
        slot = "retired" if name in RETIRED else ("✓" if name in window else "")
        lines.append(
            f"| {i} | `{name}` | {'sql' if sql else 'rows-only'} | "
            f"{slot} | {last} | "
            f"`{path}:{code.co_firstlineno}` |"
        )
    lines.append("")
    if RETIRED_NOTES:
        lines.append("## Retired queries")
        lines.append("")
        lines.append(
            "Retired from driver-window rotation (still registered and"
        )
        lines.append(
            "locally oracle-verified); each names the active sibling whose"
        )
        lines.append(
            "green driver rows certify the capability "
            "(enforced by `tests/test_registry.py::test_retired_queries_are_sound`):"
        )
        lines.append("")
        for name in sorted(RETIRED_NOTES):
            lines.append(f"- `{name}` — {RETIRED_NOTES[name]}")
        lines.append("")
    if ROWS_ONLY_NOTES:
        lines.append("## Rows-only queries")
        lines.append("")
        lines.append(
            "Each oracle-less query is rows-only by documented design, with"
        )
        lines.append(
            "its certification delegated to a hash-gated sibling "
            "(enforced by `tests/test_registry.py`):"
        )
        lines.append("")
        for name in sorted(ROWS_ONLY_NOTES):
            lines.append(f"- `{name}` — {ROWS_ONLY_NOTES[name]}")
        lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    out = os.path.join(REPO, "QUERIES.md")
    with open(out, "w") as f:
        f.write(render())
    print(f"wrote {out}")
