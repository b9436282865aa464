"""Guards for the sf0.1 determinism sweep (tools/scale_sweep.py).

The fast test pins the mechanical risk-class derivation: it must include
every query that has EVER hash-flipped at scale (the r08 pair) plus the
known grid-carrying families — if a refactor of the risk regex silently
drops one of these, the next flip ships to a driver window undetected.

The sweep itself (30+ min at sf0.1) runs as a round-start step, gated
here behind RUN_SCALE_SWEEP=1 so `pytest tests/` stays fast.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from scale_sweep import log_is_current, risk_class  # noqa: E402

sys.path.pop(0)

# queries that produced a REAL cross-engine hash flip at sf0.1 (c00bcc7),
# plus representatives of each grid-carrying family from that audit —
# membership here is a ratchet: never remove a name that once flipped
KNOWN_RISK = {
    "orders_abc_pareto",        # flipped r08: cum_share half-way boundary
    "text_unigram_logprob",     # flipped r08: mean logprob 1e-12 grid
    "text_hof_stats",           # migrated to 1e-9 in the same audit
    "skew_profile_custkey",     # p50/p99 rank boundaries
    "skew_profile_custkey_approx",
    "pricing_summary",          # the r05 avg_price 16-sig-digit lesson
    "percentile_order_value",   # quantile interpolation
    "text_word_entropy",        # log2 entropy grid
    "sketch_accuracy",          # float error-bound comparison
}


def test_risk_class_contains_every_known_flip_site():
    names = set(risk_class())
    missing = KNOWN_RISK - names
    assert not missing, (
        f"risk-class derivation lost known flip/grid sites: {sorted(missing)}"
        " — widen RISK_PATTERN, never narrow it past a site that flipped"
    )


def test_risk_class_names_are_registered_and_plural():
    from filmdatawarehouse_spark.queries.registry import all_queries

    reg = set(all_queries())
    names = risk_class()
    assert set(names) <= reg
    # the class is a substantial minority of the registry: a collapse to
    # near-zero means the derivation broke, not that risk disappeared
    assert len(names) >= 40, len(names)


def test_green_sweep_log_is_current():
    """VERDICT r10 item 6 — the sweep gate is structural, not
    remembered: the committed SWEEP.json must be a GREEN sf0.1 sweep
    whose content fingerprint matches the LIVE risk class. Editing any
    risk-class builder/oracle (or registering a query that enters the
    class) flips the fingerprint and reds this test until
    `python tools/scale_sweep.py` passes again. bench.py records the
    same check in every bench artifact."""
    current, reason = log_is_current()
    assert current, reason


@pytest.mark.skipif(
    not os.environ.get("RUN_SCALE_SWEEP"),
    reason="30+ min sf0.1 sweep; run explicitly with RUN_SCALE_SWEEP=1 "
    "(round-start step, see tools/scale_sweep.py)",
)
def test_scale_sweep_green_at_sf01():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scale_sweep.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stdout[-4000:] + res.stderr[-2000:]
