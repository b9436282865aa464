"""Executed-plan introspection shared by tests and tools.

One walker for the adaptive physical plan (AQE wraps stages in
``AdaptiveSparkPlanExec`` / ``*QueryStageExec`` nodes that hide their
children from a naive traversal). Tests assert shuffle-record bounds and
window partitioning on it; ``tools/bloom_bench.py`` reads exchange
metrics. Keeping one copy means a Spark rename of a node class or metric
key is a one-line fix instead of a three-file drift hunt (r06 review
finding)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def walk_executed_plan(df: DataFrame, visit: Callable) -> None:
    """Call ``visit(node)`` on every node of the EXECUTED adaptive plan,
    descending through AQE wrapper nodes. Callers collect what they need
    inside ``visit``; the frame must already have been executed for
    runtime metrics to be populated."""

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        visit(node)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())  # noqa: SLF001


def executed_metric_values(
    df: DataFrame, node_class: str, metric_key: str
) -> list[int]:
    """The ``metric_key`` runtime-metric value of every ``node_class``
    node in the executed plan (e.g. ShuffleExchangeExec / recordsRead)."""
    out: list[int] = []

    def visit(node) -> None:
        if node.getClass().getSimpleName() != node_class:
            return
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == metric_key:
                out.append(int(kv._2().value()))

    walk_executed_plan(df, visit)
    return out


def executed_exchange_records(df: DataFrame) -> list[int]:
    """Collect the frame, then return every shuffle exchange's
    records-read metric (the per-exchange shuffle volume in rows)."""
    df.collect()
    return executed_metric_values(df, "ShuffleExchangeExec", "recordsRead")


def executed_window_partition_spec_sizes(df: DataFrame) -> list[int]:
    """Collect the frame, then return each WindowExec's partitionSpec
    size — 0 means a single-partition (global) window, the 100 TB
    anti-pattern the plan tests refuse."""
    df.collect()
    out: list[int] = []

    def visit(node) -> None:
        if node.getClass().getSimpleName() == "WindowExec":
            out.append(node.partitionSpec().size())

    walk_executed_plan(df, visit)
    return out
