"""JobRunner: W1 dims-before-facts ordering, W3 retries, cycle detection."""

from __future__ import annotations

import pytest

from filmdatawarehouse_spark.runner import JobRunner


def test_dims_before_facts_ordering():
    ran: list[str] = []
    r = JobRunner()
    # the reference's DAG shape (`dags/rentalFilmDAG.py:163-164`)
    for dim in ["dim_staff", "dim_date", "dim_rental", "dim_film", "dim_store"]:
        r.add(dim, lambda d=dim: ran.append(d))
    r.add(
        "fact_monthly_payment",
        lambda: ran.append("fact_monthly_payment"),
        depends_on=["dim_staff", "dim_date", "dim_rental"],
    )
    r.add(
        "fact_daily_inventory",
        lambda: ran.append("fact_daily_inventory"),
        depends_on=["dim_film", "dim_store", "dim_date"],
    )
    r.run()
    assert ran.index("fact_monthly_payment") > max(
        ran.index(d) for d in ["dim_staff", "dim_date", "dim_rental"]
    )
    assert ran.index("fact_daily_inventory") > max(
        ran.index(d) for d in ["dim_film", "dim_store", "dim_date"]
    )


def test_retry_then_success():
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise RuntimeError("transient")

    JobRunner().add("flaky", flaky, retries=1).run()
    assert attempts["n"] == 2


def test_retries_exhausted_raises():
    def always_fails():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        JobRunner().add("bad", always_fails, retries=1).run()


def test_cycle_detection():
    r = JobRunner()
    r.add("a", lambda: None, depends_on=["b"])
    r.add("b", lambda: None, depends_on=["a"])
    with pytest.raises(ValueError, match="cycle"):
        r.run()


def test_unknown_dependency():
    r = JobRunner().add("a", lambda: None, depends_on=["ghost"])
    with pytest.raises(KeyError):
        r.run()
