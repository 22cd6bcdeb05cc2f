"""HLL sketch rollup: merged-sketch estimates must track exact
distincts, and the merge must commute with re-bucketing (the property
that makes sketches storable)."""

from pyspark.sql import functions as F

from pypeline_spark.registry import load_all
from pypeline_spark.session import load_table


def test_weekly_estimates_close_to_exact(spark, sf_dir):
    """Since r5 the query carries its own exact counts + 5% band flag
    (hash-checked against the oracle); verify the flag holds and the
    exact side matches an independent recomputation."""
    est = load_all()["q_hll_rollup"].builder(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    exact = (
        e.withColumn("week", F.date_trunc("week", F.to_date("ts")).cast("date"))
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("independent_users"))
    )
    rows = est.join(exact, "week").collect()
    assert rows
    for r in rows:
        # HLL_4 at default lgConfigK=12: relative error ~1.6%; 5% band
        assert r["approx_ok"] == 1, (r["week"], r["exact_users"])
        assert r["exact_users"] == r["independent_users"]


def test_union_of_daily_equals_direct_sketch(spark, sf_dir):
    """Merging per-day sketches = sketching the whole column directly —
    the mergeability contract that lets sketches be persisted."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    merged = (
        e.groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    assert merged == direct
