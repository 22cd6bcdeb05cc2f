"""Plan-quality gates for the TPC-H completion set
(operators/tpch_extra.py).  Correctness is oracle-checked by the
differential harness; these assert the SCALE properties each shape
exists to exercise — CNF extraction into the scans (Q19), scalar
aggregates attached by broadcast HASH join not a nested loop (Q11/
Q15/Q20/Q22), the Q13 outer join keeping its join-condition filter,
and integer-exact threshold rewrites staying in codegen.
"""

import pytest

from pypeline_spark.plans.inspect import physical_plan
from pypeline_spark.registry import load_all


@pytest.fixture(scope="module")
def cases():
    return load_all()


NEW_QUERIES = [
    "q_min_cost_supplier",
    "q_nation_volume",
    "q_product_profit",
    "q_value_concentration",
    "q_shipmode_priority",
    "q_order_count_distribution",
    "q_promo_revenue",
    "q_top_supplier",
    "q_supplier_part_counts",
    "q_small_qty_revenue",
    "q_disjunctive_pred",
    "q_excess_suppliers",
    "q_waiting_orders",
    "q_sales_opportunity",
]


def test_all_build_and_stay_hash_joined(spark, sf_dir, cases):
    """Every query in the set plans without a nested loop or cartesian
    product (also swept globally by TestNoNestedLoopSweep; kept here so
    a failure names the module)."""
    for name in NEW_QUERIES:
        plan = physical_plan(cases[name].builder(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_disjunctive_pred_pushes_common_factors(spark, sf_dir, cases):
    """Q19 shape: Catalyst must extract the brand IN-list / quantity
    envelope from the OR-of-ANDs and push them into the scans — the
    whole point of the shape."""
    plan = physical_plan(cases["q_disjunctive_pred"].builder(spark, sf_dir))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("Or(" in l or "In(p_brand" in l for l in pushed), pushed


def test_scalar_attaches_are_broadcast_hash_joins(spark, sf_dir, cases):
    """The 1-row threshold aggregates (Q11 fraction, Q15 max, Q20 mean,
    Q22 avg) must ride broadcast HASH joins on the derived zero key."""
    for name in (
        "q_value_concentration",
        "q_top_supplier",
        "q_excess_suppliers",
        "q_sales_opportunity",
    ):
        plan = physical_plan(cases[name].builder(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name


def test_order_count_distribution_keeps_outer_join(spark, sf_dir, cases):
    """Q13's priority exclusion must stay in the JOIN CONDITION: the
    plan keeps a LeftOuter join (a WHERE would have turned it inner and
    silently dropped the zero-order bucket)."""
    plan = physical_plan(cases["q_order_count_distribution"].builder(spark, sf_dir))
    assert "LeftOuter" in plan


def test_waiting_orders_single_fact_join_lineage(spark, sf_dir, cases):
    """Q21 decorrelates to ONE orders-lineitem join reused by the
    EXISTS/NOT-EXISTS logic — a naive translation joins lineitem three
    times; this plan must scan lineitem at most twice (once for lines,
    once if the semi-join re-reads)."""
    plan = physical_plan(cases["q_waiting_orders"].builder(spark, sf_dir))
    assert plan.count("lineitem.parquet") <= 2, plan.count("lineitem.parquet")
