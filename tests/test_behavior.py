"""Invariant tests for the behavior, chunking, and multidim operators.

The differential harness (tools/check_oracle.py) already proves
engine parity; these tests pin the SEMANTIC invariants an oracle
match alone can't distinguish — funnel monotonicity, lossless chunk
reconstruction, mixture balance, z-order locality — plus the physical
plan shapes the scale story depends on.
"""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.registry import load_all
from pypeline_spark.session import load_table


@pytest.fixture(scope="module")
def cases():
    return load_all()


class TestFunnel:
    def test_monotone_and_bounded(self, spark, sf_dir, cases):
        rows = {r["step"]: r["users"] for r in cases["q_funnel"].builder(spark, sf_dir).collect()}
        assert set(rows) == {"view", "view_click", "view_click_purchase"}
        assert rows["view"] >= rows["view_click"] >= rows["view_click_purchase"] >= 0
        n_viewers = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "view")
            .select("user_id")
            .distinct()
            .count()
        )
        assert rows["view"] == n_viewers

    def test_no_nested_loop(self, spark, sf_dir, cases):
        # the 1h window must be a post-filter on the user_id equi-join,
        # never a nested-loop condition
        plan = cases["q_funnel"].builder(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestCohortRetention:
    def test_day0_covers_every_user(self, spark, sf_dir, cases):
        df = cases["q_cohort_retention"].builder(spark, sf_dir)
        day0 = df.filter(F.col("day_offset") == 0).agg(F.sum("users")).collect()[0][0]
        total_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
        # every user is active on their own cohort day by definition
        assert day0 == total_users

    def test_offsets_nonnegative(self, spark, sf_dir, cases):
        df = cases["q_cohort_retention"].builder(spark, sf_dir)
        assert df.filter(F.col("day_offset") < 0).count() == 0


class TestOutliers:
    def test_outliers_are_rare_and_extreme(self, spark, sf_dir, cases):
        out = cases["q_outliers"].builder(spark, sf_dir)
        total = load_table(spark, sf_dir, "events").count()
        n = out.count()
        assert n < 0.1 * total  # >2.5 sigma must be a small tail
        assert out.filter(F.abs(F.col("z")) < 2.5).count() == 0

    def test_stats_side_broadcast(self, spark, sf_dir, cases):
        plan = cases["q_outliers"].builder(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestChunking:
    def test_chunks_reconstruct_document(self, spark, sf_dir, cases):
        """Concatenating each doc's stride-aligned chunk prefixes (the
        first 24 of each 32-token chunk, all of the last) rebuilds the
        original token sequence exactly — chunking is lossless."""
        from pypeline_spark.functions.chunking import CHUNK_STRIDE

        chunks = cases["q_doc_chunks"].builder(spark, sf_dir)
        docs = load_table(spark, sf_dir, "documents")
        rebuilt = (
            chunks.withColumn("toks", F.split("chunk_text", " "))
            .withColumn(
                "prefix",
                F.when(
                    F.col("n_tokens") > CHUNK_STRIDE,
                    F.slice("toks", 1, CHUNK_STRIDE),
                ).otherwise(F.col("toks")),
            )
            .groupBy("doc_id")
            .agg(
                F.array_join(
                    F.flatten(F.array_sort(F.collect_list(F.struct("chunk_id", "prefix")))["prefix"]),
                    " ",
                ).alias("rebuilt")
            )
        )
        diff = (
            rebuilt.join(docs, "doc_id")
            .filter(F.col("rebuilt") != F.col("text"))
            .count()
        )
        assert diff == 0

    def test_chunk_sizes(self, spark, sf_dir, cases):
        from pypeline_spark.functions.chunking import CHUNK_STRIDE, CHUNK_TOKENS

        chunks = cases["q_doc_chunks"].builder(spark, sf_dir)
        assert chunks.filter(F.col("n_tokens") > CHUNK_TOKENS).count() == 0
        assert chunks.filter(F.col("n_tokens") < 1).count() == 0
        # a non-last chunk always has at least stride+1 tokens (the next
        # chunk's start exists, so >= stride tokens remain past this
        # one's start); only the LAST chunk may be shorter than that
        w_max = chunks.groupBy("doc_id").agg(F.max("chunk_id").alias("last_id"))
        too_short_not_last = (
            chunks.join(w_max, "doc_id")
            .filter(
                (F.col("n_tokens") <= CHUNK_STRIDE)
                & (F.col("chunk_id") != F.col("last_id"))
            )
            .count()
        )
        assert too_short_not_last == 0

    def test_chunking_is_one_stage_no_shuffle(self, spark, sf_dir, cases):
        plan = cases["q_doc_chunks"].builder(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # map-side explode only


class TestVocabStats:
    def test_df_bounded_by_corpus_size(self, spark, sf_dir, cases):
        df = cases["q_vocab_stats"].builder(spark, sf_dir)
        n_docs = load_table(spark, sf_dir, "documents").count()
        bad = df.filter((F.col("df") > n_docs) | (F.col("df") < 1)).count()
        assert bad == 0
        # idf >= 0, and 0 only for tokens present in every doc
        assert df.filter(F.col("idf") < 0).count() == 0


class TestMixtureSample:
    def test_strata_balanced_to_smallest(self, spark, sf_dir, cases):
        docs = load_table(spark, sf_dir, "documents")
        mn = docs.groupBy("source").count().agg(F.min("count")).collect()[0][0]
        kept = (
            cases["q_mixture_sample"].builder(spark, sf_dir).groupBy("source").count()
        )
        # each stratum is downsampled toward mn; hash granularity of
        # 1/10000 makes the expected kept-count mn +- binomial noise
        import math

        tol = 4 * math.sqrt(mn) + 3
        bad = kept.filter(F.abs(F.col("count") - mn) > tol).count()
        assert bad == 0

    def test_deterministic_across_runs(self, spark, sf_dir, cases):
        a = cases["q_mixture_sample"].builder(spark, sf_dir)
        b = cases["q_mixture_sample"].builder(spark, sf_dir)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestMarketBasket:
    def test_pairs_canonical_and_supported(self, spark, sf_dir, cases):
        df = cases["q_market_basket"].builder(spark, sf_dir)
        assert df.filter(F.col("part_a") >= F.col("part_b")).count() == 0
        assert df.filter(F.col("n_orders") < 1).count() == 0

    def test_self_join_is_hash_on_basket_key(self, spark, sf_dir, cases):
        plan = cases["q_market_basket"].builder(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestRfm:
    def test_quartiles_balanced(self, spark, sf_dir, cases):
        df = cases["q_rfm"].builder(spark, sf_dir)
        n = df.count()
        for col in ("r_q", "f_q", "m_q"):
            sizes = {r[col]: r["count"] for r in df.groupBy(col).count().collect()}
            assert set(sizes) == {1, 2, 3, 4}
            assert max(sizes.values()) - min(sizes.values()) <= 1  # NTILE balance
        assert n == df.select("custkey").distinct().count()


class TestRollingDau:
    def test_wau_at_least_dau(self, spark, sf_dir, cases):
        wau = cases["q_rolling_dau"].builder(spark, sf_dir)
        e = load_table(spark, sf_dir, "events")
        dau = e.groupBy(F.to_date("ts").alias("day")).agg(
            F.countDistinct("user_id").alias("dau")
        )
        violations = (
            wau.join(dau, "day").filter(F.col("wau") < F.col("dau")).count()
        )
        assert violations == 0  # a 7-day window contains its last day

    def test_covers_every_event_day(self, spark, sf_dir, cases):
        wau_days = cases["q_rolling_dau"].builder(spark, sf_dir).select("day")
        event_days = (
            load_table(spark, sf_dir, "events")
            .select(F.to_date("ts").alias("day"))
            .distinct()
        )
        assert event_days.exceptAll(wau_days).count() == 0


class TestEwma:
    def test_ewma_between_min_and_max_seen(self, spark, sf_dir, cases):
        """EWMA is a convex combination of the prefix — it can never
        leave the [running min, running max] envelope."""
        from pyspark.sql import Window as W

        df = cases["q_ewma_smooth"].builder(spark, sf_dir)
        e = load_table(spark, sf_dir, "events").select("event_id", "ts")
        w = (
            W.partitionBy("event_type")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        joined = df.join(e, "event_id").withColumn(
            "run_min", F.min("value").over(w)
        ).withColumn("run_max", F.max("value").over(w))
        eps = 1e-6  # ewma column is rounded to 6 decimals
        bad = joined.filter(
            (F.col("ewma") < F.col("run_min") - eps)
            | (F.col("ewma") > F.col("run_max") + eps)
        ).count()
        assert bad == 0

    def test_first_value_passthrough(self, spark, sf_dir, cases):
        from pyspark.sql import Window as W

        df = cases["q_ewma_smooth"].builder(spark, sf_dir)
        e = load_table(spark, sf_dir, "events").select("event_id", "ts")
        w = W.partitionBy("event_type").orderBy("ts", "event_id")
        first = (
            df.join(e, "event_id")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        bad = first.filter(
            F.abs(F.col("ewma") - F.round(F.col("value"), 6)) > 1e-9
        ).count()
        assert bad == 0


class TestZorderQuery:
    def test_bucket_ranges_nest(self, spark, sf_dir, cases):
        df = cases["q_zorder"].builder(spark, sf_dir)
        bad = df.filter(
            (F.col("z_min") < F.col("z_bucket") * 256)
            | (F.col("z_max") >= (F.col("z_bucket") + 1) * 256)
        ).count()
        assert bad == 0
