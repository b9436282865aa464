"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Optimization-round evidence (guide §1: measure first): one file per query,
``plans/<tag>/<query>_<suffix>.txt``, holding the FORMATTED physical plan
at the bench SF. The judge reads these instead of running Spark.

    python tools/capture_plans.py --tag r16 --suffix before [names...]

Names default to the full bench headline. Shared-memo persisted frames are
released between queries so each plan is the cold shape the bench times.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from bench import HEADLINE
    from filmdatawarehouse_spark.operators.cache import release_managed
    from filmdatawarehouse_spark.queries.registry import all_queries
    from filmdatawarehouse_spark.session import get_spark

    spark = get_spark("plan-capture")
    registry = all_queries()
    names = args.names or [n for n in HEADLINE if n in registry]
    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        # release in finally (ADVICE r16): a failed capture used to skip
        # release_managed(), leaking the failed query's persisted frames
        # into the NEXT query's captured plan as InMemoryRelation reuse —
        # contaminated before/after evidence
        try:
            df = registry[name][0](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — capture the rest
            print(f"capture failed for {name}: {exc}", file=sys.stderr)
            continue
        finally:
            release_managed()
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
