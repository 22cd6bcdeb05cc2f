"""Scale-pattern operators: plan shape, determinism, and parity tests.

The oracle harness already proves result correctness; these tests pin
the *mechanics* each operator claims — sample monotonicity, shuffle
counts, Arrow-path equivalence with the native plans — so a rewrite
that stays correct but loses the scale property fails here.
"""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.registry import load_all
from pypeline_spark.session import load_table


@pytest.fixture(scope="module")
def cases():
    return load_all()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestHashSample:
    """q_sample_hash has two regimes (r19/r20): under-split scans route
    through a repartition with a nondeterministic-fenced md5 filter so
    the hashing evaluates wide, post-shuffle, in one pipelined job;
    wide scans keep the original filter-at-scan shape.  Pin the
    mechanics of BOTH."""

    def _wide_scan(self, spark):
        import contextlib

        @contextlib.contextmanager
        def cm():
            old = spark.conf.get("spark.sql.files.maxPartitionBytes")
            spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
            try:
                yield
            finally:
                spark.conf.set("spark.sql.files.maxPartitionBytes", old)

        return cm()

    def test_wide_scan_has_no_shuffle(self, spark, sf_dir, cases):
        # guard off => pure map-side filter, embarrassingly parallel
        with self._wide_scan(spark):
            plan = plan_of(cases["q_sample_hash"].builder(spark, sf_dir))
        assert "Exchange" not in plan

    def test_wide_scan_column_pruning(self, spark, sf_dir, cases):
        with self._wide_scan(spark):
            read_schema = plan_of(cases["q_sample_hash"].builder(spark, sf_dir)).split(
                "ReadSchema:"
            )[1].splitlines()[0]
        assert "l_extendedprice" in read_schema
        assert "l_shipdate" not in read_schema

    def test_undersplit_fence_prunes_and_defers_filter(self, spark, sf_dir, cases):
        # guard on (fixture default) => the exchange carries ONLY the 3
        # projected columns, and the fenced md5 filter sits ABOVE the
        # exchange (post-shuffle, wide) instead of inside the scan task
        # — the nondeterministic term must neither fold away nor let
        # the predicate push/split below the repartition
        df = cases["q_sample_hash"].builder(spark, sf_dir)
        plan = plan_of(df)
        lines = plan.splitlines()
        fi = next(i for i, l in enumerate(lines) if "Filter" in l and "md5" in l)
        ei = next(i for i, l in enumerate(lines) if "Exchange" in l)
        assert fi < ei, "md5 filter was pushed below the parallelizing exchange"
        assert "SPARK_PARTITION_ID" in plan.upper()  # the fence survived folding
        assert set(df.columns) == {"l_orderkey", "l_linenumber", "l_extendedprice"}
        # results identical across the two regimes
        with self._wide_scan(spark):
            wide = cases["q_sample_hash"].builder(spark, sf_dir).collect()
        assert sorted(map(tuple, df.collect())) == sorted(map(tuple, wide))

    def test_rate_monotone(self, spark, sf_dir):
        """The 1% sample must be a subset of the 5% sample (same hash,
        smaller bucket cutoff) — the property that makes staged
        sample-size increases reproducible."""
        from pypeline_spark.operators.scale_ops import hash_bucket

        li = load_table(spark, sf_dir, "lineitem")
        bucket = hash_bucket(F.col("l_orderkey"), F.col("l_linenumber"))
        keys = lambda pct: {  # noqa: E731
            (r.l_orderkey, r.l_linenumber)
            for r in li.filter(bucket < pct).select("l_orderkey", "l_linenumber").collect()
        }
        k1, k5 = keys(1), keys(5)
        assert k1 and k1 < k5

    def test_rate_close_to_nominal(self, spark, sf_dir, cases):
        li = load_table(spark, sf_dir, "lineitem")
        n_total = li.count()
        n_sample = cases["q_sample_hash"].builder(spark, sf_dir).count()
        assert 0.02 <= n_sample / n_total <= 0.08  # 5% nominal


class TestUnpivot:
    def test_no_shuffle_expand_only(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_unpivot"].builder(spark, sf_dir))
        assert "Exchange" not in plan
        assert "Expand" in plan  # unpivot compiles to a generate/expand

    def test_filter_pushed_below_unpivot(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_unpivot"].builder(spark, sf_dir))
        assert "PushedFilters: [" in plan and "GreaterThanOrEqual" in plan


class TestSaltedAgg:
    def test_two_phase_shuffles(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_agg_salted"].builder(spark, sf_dir))
        # one exchange keyed (l_returnflag, salt), one keyed l_returnflag
        assert plan.count("Exchange hashpartitioning") == 2
        assert "salt" in plan

    def test_equals_direct_aggregation(self, spark, sf_dir, cases):
        salted = {
            r.l_returnflag: (r.n, round(r.sum_price, 2), round(r.sum_qty, 2))
            for r in cases["q_agg_salted"].builder(spark, sf_dir).collect()
        }
        li = load_table(spark, sf_dir, "lineitem")
        direct = {
            r.l_returnflag: (r.n, round(r.sum_price, 2), round(r.sum_qty, 2))
            for r in li.groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
            .collect()
        }
        assert salted == direct


class TestStreamEnrich:
    def test_streaming_matches_batch(self, spark, sf_dir):
        from pypeline_spark.operators.scale_ops import enrich_events
        from pypeline_spark.streaming.windows import run_streaming_events

        customer = load_table(spark, sf_dir, "customer")
        batch = {
            r.c_mktsegment: (r.n_events, r.total_value)
            for r in enrich_events(
                load_table(spark, sf_dir, "events"), customer, include_distinct=False
            ).collect()
        }
        streamed = run_streaming_events(
            spark,
            sf_dir,
            lambda ev: enrich_events(ev, customer, include_distinct=False),
            output_mode="complete",
        )
        got = {
            r.c_mktsegment: (r.n_events, r.total_value) for r in streamed.collect()
        }
        assert got == batch

    def test_dimension_broadcast(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_stream_enrich"].builder(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestArrowPathParity:
    def test_pandas_udf_matches_native(self, spark, sf_dir, cases):
        udf_counts = {
            r.doc_id: r.n_tokens
            for r in cases["q_udf_token_count"].builder(spark, sf_dir).collect()
        }
        native_counts = {
            r.doc_id: r.n_ws
            for r in cases["q_token_count"].builder(spark, sf_dir).collect()
        }
        assert udf_counts == native_counts

    def test_udf_is_arrow_not_row_python(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_udf_token_count"].builder(spark, sf_dir))
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan

    def test_sessionize_pandas_matches_native_session_window(
        self, spark, sf_dir, cases
    ):
        key = lambda r: (  # noqa: E731
            r.user_id,
            r.session_start,
            r.session_end,
            r.n_events,
            r.session_value,
        )
        pandas_sessions = sorted(
            map(key, cases["q_sessionize_pandas"].builder(spark, sf_dir).collect())
        )
        native_sessions = sorted(
            map(key, cases["q_session"].builder(spark, sf_dir).collect())
        )
        assert pandas_sessions == native_sessions

    def test_sessionize_single_shuffle_by_user(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_sessionize_pandas"].builder(spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "FlatMapGroupsInPandas" in plan


class TestWeightedSample:
    def test_deterministic_and_near_target(self, spark, sf_dir, cases):
        from pypeline_spark.operators.scale_ops import WEIGHTED_TARGET

        a = cases["q_sample_weighted"].builder(spark, sf_dir)
        keys1 = sorted(r.o_orderkey for r in a.collect())
        keys2 = sorted(
            r.o_orderkey
            for r in cases["q_sample_weighted"].builder(spark, sf_dir).collect()
        )
        assert keys1 == keys2  # replayable: same rows every run
        # Bernoulli with expected size WEIGHTED_TARGET: allow +-40%
        assert 0.6 * WEIGHTED_TARGET <= len(keys1) <= 1.4 * WEIGHTED_TARGET

    def test_higher_weight_higher_inclusion_rate(self, spark, sf_dir, cases):
        """Split orders at the median price: the above-median half must
        be over-represented in the weighted sample."""
        o = load_table(spark, sf_dir, "orders")
        med = o.approxQuantile("o_totalprice", [0.5], 0.01)[0]
        kept = cases["q_sample_weighted"].builder(spark, sf_dir)
        hi = kept.filter(F.col("o_totalprice") > med).count()
        lo = kept.filter(F.col("o_totalprice") <= med).count()
        assert hi > lo * 1.5


class TestTrainValSplit:
    def test_splits_partition_the_corpus(self, spark, sf_dir, cases):
        d = load_table(spark, sf_dir, "documents")
        out = cases["q_train_val_split"].builder(spark, sf_dir)
        agg = {r.split: r.n_docs for r in out.groupBy("split").agg(
            F.sum("n_docs").alias("n_docs")).collect()}
        assert sum(agg.values()) == d.count()  # exhaustive + disjoint
        assert set(agg) == {"train", "val", "test"}
        total = sum(agg.values())
        assert 0.7 <= agg["train"] / total <= 0.9  # ~80/10/10

    def test_assignment_is_stable_under_subsetting(self, spark, sf_dir):
        """A document's split must not depend on what else is in the
        corpus (content hash, not rank) — dropping half the corpus
        keeps every surviving assignment identical."""
        from pypeline_spark.functions.export import split_of

        d = load_table(spark, sf_dir, "documents")
        full = {
            r.doc_id: r.split
            for r in d.select("doc_id", split_of(F.col("doc_id")).alias("split")).collect()
        }
        half = {
            r.doc_id: r.split
            for r in d.filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", split_of(F.col("doc_id")).alias("split"))
            .collect()
        }
        assert all(full[k] == v for k, v in half.items())
