"""Micro-bench: the curation pipeline's four gates at one SF (r12).

The certified `pipeline_curate_documents` carries the heuristic gate +
lexical dedup; r12 composed three more gates off the same
`_gated_survivors` stages. This times each composed query end-to-end
(cold plans, shared session) so SCALING.md's numbers are measured, not
asserted: the marginal cost of a gate = its column minus the base.

Usage: python tools/curation_bench.py [sf_dir]  (default /root/testdata/sf0.1)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from filmdatawarehouse_spark.queries.pipeline import (
        curate_documents,
        curate_documents_lm,
        curate_documents_span_gated,
    )
    from filmdatawarehouse_spark.queries.semantic_pipeline import (
        curate_documents_semantic,
    )
    from filmdatawarehouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("curation-bench")

    def timed(fn):
        from filmdatawarehouse_spark.operators.cache import release_managed

        t = time.time()
        rows = fn(spark, sf_dir).collect()
        elapsed = round(time.time() - t, 4)
        # every gate manages persist'd frames (docs, kept) — release them
        # so each query is timed COLD, not against the previous query's
        # cached fragments (the cache.py bench-loop contract)
        release_managed()
        return elapsed, sum(r.n_docs for r in rows)

    out = {"sf_dir": sf_dir}
    for name, fn in [
        ("base_lexical", curate_documents),
        ("span_gated", curate_documents_span_gated),
        ("semantic", curate_documents_semantic),
        ("lm_bucketed", curate_documents_lm),
    ]:
        s, n_docs = timed(fn)
        out[f"{name}_s"] = s
        out[f"{name}_docs"] = n_docs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
