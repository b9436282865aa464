"""Job runner: dependency-ordered execution with retries.

Reference parity (SURVEY.md §2.11): the Airflow DAG wires
``[dim_staff, dim_date, dim_rental] >> fact_monthly_payment`` and
``[dim_film, dim_store, dim_date] >> fact_inventory``
(`dags/rentalFilmDAG.py:163-164`, W1) with 1 retry / 5-min delay
(`dags/rentalFilmDAG.py:103-104`, W3). This is a thin in-engine equivalent:
a topological run of named jobs. Spark handles task-level retries itself;
this adds job-level retry. Scheduling cadence (W4) stays external.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable


@dataclass
class Job:
    name: str
    fn: Callable[[], None]
    depends_on: list[str] = field(default_factory=list)
    retries: int = 1
    retry_delay_s: float = 0.0


class JobRunner:
    def __init__(self) -> None:
        self._jobs: dict[str, Job] = {}

    def add(
        self,
        name: str,
        fn: Callable[[], None],
        depends_on: list[str] | None = None,
        retries: int = 1,
        retry_delay_s: float = 0.0,
    ) -> "JobRunner":
        self._jobs[name] = Job(name, fn, list(depends_on or []), retries, retry_delay_s)
        return self

    def topo_order(self) -> list[str]:
        order: list[str] = []
        state: dict[str, int] = {}  # 0=unseen 1=visiting 2=done

        def visit(n: str) -> None:
            if state.get(n) == 2:
                return
            if state.get(n) == 1:
                raise ValueError(f"dependency cycle at job {n!r}")
            if n not in self._jobs:
                raise KeyError(f"unknown dependency {n!r}")
            state[n] = 1
            for d in self._jobs[n].depends_on:
                visit(d)
            state[n] = 2
            order.append(n)

        for n in self._jobs:
            visit(n)
        return order

    def run(self) -> list[str]:
        """Run all jobs dependency-first; returns execution order."""
        order = self.topo_order()
        for name in order:
            job = self._jobs[name]
            attempts = job.retries + 1
            for attempt in range(1, attempts + 1):
                try:
                    job.fn()
                    break
                except Exception:
                    if attempt == attempts:
                        raise
                    if job.retry_delay_s:
                        time.sleep(job.retry_delay_s)
        return order
