"""Plan-string predicates over Spark's executed physical plan.

String-level on purpose: the executed-plan text is the stable,
version-tolerant surface (the same one ``df.explain`` prints), and the
properties asserted here — operator presence, pushed filters, exchange
counts — are exactly what a human reviews in an explain audit.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed physical plan as text (what explain() prints)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_nested_loop(df: DataFrame) -> bool:
    """True when the plan contains a BroadcastNestedLoopJoin or
    CartesianProduct — the two join shapes that do per-row scans of a
    whole side and never survive a 100 TB input."""
    plan = physical_plan(df)
    return "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan


def exchange_count(df: DataFrame) -> int:
    """Number of hash-partitioning shuffles in the plan."""
    return physical_plan(df).count("Exchange hashpartitioning")


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters: [...] payload from the plan's scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """Every ReadSchema payload — what each scan actually reads; a
    scan whose ReadSchema lists pruned-away columns is a pruning bug."""
    return re.findall(r"ReadSchema: (\S+)", physical_plan(df))


def assert_scale_safe(df: DataFrame, max_exchanges: int | None = None) -> None:
    """Raise AssertionError when the plan has a scale-killer shape:
    a nested-loop/cartesian join, or (optionally) more shuffles than
    the operator's contract allows."""
    if has_nested_loop(df):
        raise AssertionError(
            "plan contains BroadcastNestedLoopJoin/CartesianProduct:\n"
            + physical_plan(df)
        )
    if max_exchanges is not None:
        n = exchange_count(df)
        if n > max_exchanges:
            raise AssertionError(
                f"plan has {n} hash exchanges (allowed {max_exchanges}):\n"
                + physical_plan(df)
            )
