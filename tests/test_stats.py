"""Accuracy gates for sketch-based aggregates (rows-only in the oracle
harness): approx_count_distinct and percentile_approx vs exact."""

from pyspark.sql import functions as F

from pypeline_spark.registry import load_all
from pypeline_spark.session import load_table


class TestApproxAccuracy:
    """Since r5 the sketch queries carry their accuracy assertion IN the
    output (tolerance-band flags hash-checked against the oracle's
    literal 1s); these tests independently recompute the exact side and
    verify the band flags plus the exact columns the oracle hashes."""

    def test_approx_count_distinct_within_tolerance(self, spark, sf_dir):
        cases = load_all()
        approx = {
            r.l_returnflag: r
            for r in cases["q_approx_distinct"].builder(spark, sf_dir).collect()
        }
        exact = {
            r.l_returnflag: r
            for r in load_table(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.countDistinct("l_partkey").alias("parts"),
                F.countDistinct("l_suppkey").alias("supps"),
            )
            .collect()
        }
        for flag, ex in exact.items():
            ap = approx[flag]
            assert ap.exact_parts == ex.parts and ap.exact_supps == ex.supps
            assert ap.parts_ok == 1 and ap.supps_ok == 1

    def test_percentile_approx_within_tolerance(self, spark, sf_dir):
        cases = load_all()
        approx = {
            r.l_returnflag: r
            for r in cases["q_percentile_approx"].builder(spark, sf_dir).collect()
        }
        exact = {
            r.l_returnflag: r
            for r in load_table(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
                F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
            )
            .collect()
        }
        for flag, ex in exact.items():
            ap = approx[flag]
            assert ap.p50_cents == int(ex.p50 * 100 + 0.5)
            assert ap.p95_cents == int(ex.p95 * 100 + 0.5)
            assert ap.p50_rank_ok == 1 and ap.p95_rank_ok == 1


class TestIvmMerge:
    def test_batch_order_and_split_invariance(self, spark, sf_dir):
        """Merging per-month partial rollups in ANY order equals the
        direct rollup — the associativity/commutativity contract that
        lets maintenance batches land out of order."""
        from pyspark.sql import functions as F

        from pypeline_spark.operators.ivm import ivm_merge, rollup_events
        from pypeline_spark.session import load_table

        e = load_table(spark, sf_dir, "events")
        direct = rollup_events(e)
        bucket = F.pmod(F.dayofmonth(F.to_date("ts")), F.lit(3))
        parts = [rollup_events(e.filter(bucket == b)) for b in (0, 1, 2)]
        parts = [p for p in parts if p.count() > 0]
        assert len(parts) >= 2, "fixture spans fewer days than expected"

        def canon(df):
            return sorted(tuple(r) for r in df.collect())

        fwd = parts[0]
        for p in parts[1:]:
            fwd = ivm_merge(fwd, p)
        rev = parts[-1]
        for p in reversed(parts[:-1]):
            rev = ivm_merge(rev, p)
        assert canon(fwd) == canon(direct)
        assert canon(rev) == canon(direct)
