"""sf0.1 cross-engine determinism sweep (VERDICT r08 item 3).

The r08 ad-hoc sweep caught two REAL at-scale hash flips — round(x, 12)
half-way boundary disagreements between Spark and DuckDB on O(1)-O(10)
values (``orders_abc_pareto`` 1-in-20k rows, ``text_unigram_logprob``
2-in-5000) — that the driver's own sf0.01 gate could not see: flip
probability scales with grid/ulp(value) x row count, so the failure class
only becomes visible at ~10x the gate SF. This tool makes that detection
power a committed, repeatable round-start step instead of a one-off run.

The determinism-RISK class is derived mechanically, not hand-listed, so a
new risky query can never be forgotten: a registry entry is in the class
when its builder source or its DuckDB oracle carries a rounding grid,
rank/percentile boundary, or float-producing expression (the c00bcc7
audit's risk markers). Over-inclusion only costs sweep minutes;
under-inclusion costs a driver-window hash failure a round later.

Usage:
    python tools/scale_sweep.py                 # run the sweep at sf0.1
    python tools/scale_sweep.py --list          # print the derived class
    python tools/scale_sweep.py --sf-dir D --batch-size 30

Batches are separate driver_sim subprocesses (a vanilla driver-style
session each) so one JVM never holds the whole sweep's shuffle state;
exit is nonzero if ANY query in any batch mismatches its oracle.
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG_PATH = os.path.join(REPO, "SWEEP.json")

# Markers of cross-engine determinism risk (see the grid rules in
# SCALING.md and the c00bcc7 audit): emitted rounded floats, quantile /
# rank boundaries, correlation/stddev/log/sqrt float math, double casts
# in arithmetic, DuckDB-side ::DOUBLE. Matched against BOTH the Spark
# builder source and the oracle SQL.
RISK_PATTERN = re.compile(
    r"\bround\s*\(|percentile|ntile\s*\(|cume_dist|\blog\s*\(|\bln\s*\("
    r"|sqrt\s*\(|corr\(|stddev|/ *F\.col|cast\(\"double\"\)|::DOUBLE",
    re.IGNORECASE,
)


def risk_class() -> list[str]:
    """Registry names in the determinism-risk class, registry order."""
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from filmdatawarehouse_spark.queries.registry import all_queries

    names = []
    for name, (fn, sql) in all_queries().items():
        try:
            src = inspect.getsource(inspect.unwrap(fn))
        except OSError:
            src = ""
        if RISK_PATTERN.search(src) or (sql and RISK_PATTERN.search(sql)):
            names.append(name)
    return names


def _risk_module_asts() -> list[tuple[str, str]]:
    """(relative path, AST dump) of every package module whose SOURCE
    matches the risk pattern — the operator code the builders call.
    Builder-source hashing alone left a blind spot: refactoring float
    math inside operators/ (log/sqrt/percentile paths) changes what
    runs at sf0.1 without touching any builder (r11). AST dumps, not
    raw text, so comment/formatting edits don't demand a 35-minute
    sweep; moving or editing actual code (docstrings included) does."""
    import ast

    pkg = os.path.join(REPO, "filmdatawarehouse_spark")
    out = []
    for dirpath, _, files in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            full = os.path.join(dirpath, f)
            with open(full) as fh:
                src = fh.read()
            if RISK_PATTERN.search(src):
                out.append(
                    (os.path.relpath(full, REPO), ast.dump(ast.parse(src)))
                )
    out.sort()
    return out


def class_fingerprint(names: list[str] | None = None) -> str:
    """Content hash of every risk-class query's builder source + oracle
    SQL, PLUS the AST of every package module carrying risk markers
    (the operator layer the builders call — see ``_risk_module_asts``).
    A GREEN sweep commits it to SWEEP.json; the pytest guard
    (tests/test_scale_sweep.py::test_green_sweep_log_is_current)
    recomputes it, so ANY edit to risk-class query or operator code
    reds the default suite until a fresh sf0.1 sweep passes — the sweep
    gate is structural, not remembered (VERDICT r10 item 6: its
    protection used to depend on the builder remembering to run it)."""
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from filmdatawarehouse_spark.queries.registry import all_queries

    reg = all_queries()
    if names is None:
        names = risk_class()
    h = hashlib.sha256()
    for n in names:
        fn, sql = reg[n]
        try:
            src = inspect.getsource(inspect.unwrap(fn))
        except OSError:
            src = ""
        h.update(n.encode())
        h.update(src.encode())
        h.update((sql or "").encode())
    for rel, dump in _risk_module_asts():
        h.update(rel.encode())
        h.update(dump.encode())
    return h.hexdigest()


def log_is_current() -> tuple[bool, str]:
    """(is_current, reason) for the committed SWEEP.json vs the live
    risk class. Shared by the pytest guard and bench.py's record."""
    try:
        with open(LOG_PATH) as f:
            log = json.load(f)
    except (OSError, ValueError) as e:
        return False, f"unreadable SWEEP.json: {e}"
    if log.get("status") != "green":
        return False, f"last sweep status: {log.get('status')!r}"
    if "sf0.1" not in str(log.get("sf_dir", "")):
        return False, f"swept at {log.get('sf_dir')!r}, not sf0.1"
    if log.get("fingerprint") != class_fingerprint():
        return False, (
            "risk-class fingerprint changed since the last green sweep "
            "— run: python tools/scale_sweep.py"
        )
    return True, "green and current"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--batch-size", type=int, default=30)
    ap.add_argument(
        "--jobs",
        type=int,
        default=1,
        help="concurrent driver_sim batches (per-query comparisons are "
        "independent processes, so parallelism changes wall time only, "
        "never results; each job is one vanilla local[8] Spark session "
        "plus a DuckDB oracle — size to cores/8)",
    )
    ap.add_argument(
        "--list", action="store_true", help="print the derived class and exit"
    )
    args = ap.parse_args()

    names = risk_class()
    if args.list:
        print(f"{len(names)} determinism-risk queries:")
        for n in names:
            print(f"  {n}")
        return 0

    print(
        f"scale sweep: {len(names)} risk-class queries at {args.sf_dir} "
        f"in batches of {args.batch_size}"
    )
    batches = [
        names[i : i + args.batch_size]
        for i in range(0, len(names), args.batch_size)
    ]

    def run_batch(idx_batch: tuple[int, list[str]]) -> int:
        idx, batch = idx_batch
        print(f"-- batch {idx + 1}: {len(batch)} queries")
        res = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "driver_sim.py"),
                args.sf_dir,
                *batch,
            ],
            cwd=REPO,
        )
        return res.returncode

    failed = False
    if args.jobs <= 1:
        for ib in enumerate(batches):
            if run_batch(ib) != 0:
                failed = True
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=args.jobs) as pool:
            for rc in pool.map(run_batch, enumerate(batches)):
                if rc != 0:
                    failed = True
    print("SWEEP " + ("FAILED" if failed else "GREEN"))
    if not failed:
        with open(LOG_PATH, "w") as f:
            json.dump(
                {
                    "status": "green",
                    "sf_dir": args.sf_dir,
                    "n_queries": len(names),
                    "fingerprint": class_fingerprint(names),
                },
                f,
                indent=1,
            )
            f.write("\n")
        print(f"wrote {LOG_PATH}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
