"""Physical-plan inspection: the scale properties an operator claims
(pushdown, broadcast strategy, no nested loops, bounded exchanges) as
checkable predicates.

The test suite's plan gates (tests/test_plans.py) are built on these,
but they are a user surface too: before promoting a query to a 100 TB
cluster, assert the plan you validated locally is the plan you ship —
``assert_scale_safe(df)`` in a pre-deploy check catches the silent
regressions (a dropped broadcast hint, a filter that stopped pushing
down, a join that degraded to a nested loop) that stay invisible at
test scale and melt a cluster at warehouse scale.
"""

from pypeline_spark.plans.inspect import (
    assert_scale_safe,
    exchange_count,
    has_nested_loop,
    physical_plan,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "assert_scale_safe",
    "exchange_count",
    "has_nested_loop",
    "physical_plan",
    "pushed_filters",
    "read_schemas",
]
