"""Regenerate QUERIES.md from the live registry. Run after adding or
rotating queries; tests/test_registry.py asserts the file is in sync."""

from __future__ import annotations

import inspect
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def render() -> str:
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from filmdatawarehouse_spark.queries.registry import (
        ROWS_ONLY_NOTES,
        all_queries,
    )

    reg = all_queries()
    window = set(list(reg)[:50])
    lines = [
        "# Query inventory",
        "",
        "Auto-generated from `filmdatawarehouse_spark.queries.registry.all_queries()`",
        "(`python tools/gen_query_inventory.py`; drift-guarded by",
        "`tests/test_registry.py::test_query_inventory_in_sync`).",
        "",
        f"{len(reg)} registered queries; "
        f"{sum(1 for _, (_f, s) in reg.items() if s)} with DuckDB oracles",
        "(the rest are rows-only by design). The first 50 form the external",
        "driver's certification window for this round.",
        "",
        "| # | query | oracle | window | source |",
        "|---|-------|--------|--------|--------|",
    ]
    for i, (name, (fn, sql)) in enumerate(reg.items(), 1):
        code = inspect.unwrap(fn).__code__
        path = code.co_filename.split(REPO + "/")[-1]
        lines.append(
            f"| {i} | `{name}` | {'sql' if sql else 'rows-only'} | "
            f"{'✓' if name in window else ''} | `{path}:{code.co_firstlineno}` |"
        )
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
