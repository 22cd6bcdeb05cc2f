"""Physical-plan quality gates: the scale properties the operators
claim (pushdown, broadcast, partial agg, top-k without global sort)
are asserted on the actual executed plans, so a regression that keeps
results correct but wrecks the 100 TB story fails CI."""

import inspect
import re

import pytest
from pyspark.sql import functions as F

from pypeline_spark.plans.inspect import optimized_plan, physical_plan
from pypeline_spark.registry import load_all


@pytest.fixture(scope="module")
def cases():
    return load_all()


# -- events-pushdown sweep derivation ---------------------------------------
# At 100 TB an unpruned events scan is the single largest I/O cliff in
# the repo.  Instead of a hand-maintained query list (which silently
# exempts anything someone forgets to add), the sweep DISCOVERS every
# registry query that time-bounds the events table: builder source
# (plus one level of same-module helpers) that loads events AND carries
# a constant time bound — load_events(since=/until=) or a col("ts")
# comparison whose right side is not another column (column-vs-column
# bounds like q_funnel's anchor window can never prune a scan).

_EVENTS_LOAD = re.compile(
    r"""load_events\s*\(|load_table\s*\([^)]*["']events["']"""
)
_TS_BOUND = re.compile(
    r"""\bsince\s*=|\buntil\s*=|"""
    # col("ts") — possibly wrapped in expression calls, hence \)* —
    # compared against anything that is NOT another column reference
    r"""col\(["']ts["']\)\s*\)*\s*[<>]=?(?!\s*(?:F\.col\(|col\())|"""
    r"""col\(["']ts["']\)\s*\.\s*between"""
)


def _builder_source(fn) -> str:
    src = inspect.getsource(fn)
    # strip the @query decorator: oracle SQL strings contain ts
    # comparisons that would false-positive the lint
    m = re.search(r"^\s*def \w+", src, flags=re.M)
    return src[m.start():]


def discover_time_bounded_events_queries(cases) -> list[str]:
    found = []
    for name, case in cases.items():
        try:
            src = _builder_source(case.builder)
        except (OSError, TypeError):
            continue
        mod = inspect.getmodule(case.builder)
        helpers = []
        for ident in set(re.findall(r"\b([A-Za-z_]\w*)\s*\(", src)):
            h = getattr(mod, ident, None)
            if (
                inspect.isfunction(h)
                and h is not case.builder
                and getattr(h, "__module__", "") == getattr(mod, "__name__", None)
            ):
                try:
                    helpers.append(_builder_source(h))
                except (OSError, TypeError):
                    pass
        blob = src + "\n".join(helpers)
        if _EVENTS_LOAD.search(blob) and _TS_BOUND.search(blob):
            found.append(name)
    return found


def _assert_events_ts_pushdown(name: str, df) -> None:
    plan = physical_plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, f"no PushedFilters line in {name} events plan"
    assert any(
        "GreaterThanOrEqual(ts" in l or "LessThan(ts" in l for l in pushed
    ), (name, pushed)


def plan_of(df) -> str:
    return physical_plan(df)


def optimized_of(df) -> str:
    return optimized_plan(df)


class TestPushdown:
    def test_filter_and_projection_reach_parquet_scan(self, spark, sf_dir, cases):
        df = cases["q_filter_project"].builder(spark, sf_dir)
        plan = plan_of(df)
        assert "PushedFilters: [" in plan
        # at least one real predicate pushed, not an empty list
        assert "GreaterThan" in plan or "LessThan" in plan or "IsNotNull" in plan
        # column pruning: the 11-column lineitem scan reads a subset
        read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "l_comment" not in read_schema
        assert "l_returnflag" not in read_schema  # not referenced by this query

    def test_events_time_bound_reaches_parquet_scan(self, spark, sf_dir, cases):
        """load_events filters the RAW nanos long, so the time bound
        must appear in PushedFilters — the micros-converted path can't
        prune and would full-scan a 100 TB events table.  The sweep
        list is DERIVED (discover_time_bounded_events_queries below),
        not hand-maintained: a future time-bounded events query is
        swept automatically, never silently exempted by a forgotten
        tuple entry (r6 verdict defect #3)."""
        names = sorted(discover_time_bounded_events_queries(cases))
        # known floor: the four r6-era time-bounded queries must all be
        # discovered — an empty or shrunken sweep means the lint broke,
        # not that the repo got cleaner
        assert {
            "q_events_pruned", "q_time_rollup", "q_latency_bands", "q_ivm_rollup"
        } <= set(names), names
        for name in names:
            _assert_events_ts_pushdown(name, cases[name].builder(spark, sf_dir))

    def test_sweep_flags_a_deliberately_unpruned_query(self, spark, sf_dir, cases):
        """End-to-end canary for the discovery + assertion machinery:
        a fixture query whose time bound hides behind an expression
        (unix_micros arithmetic — the defect class that can never reach
        PushedFilters; note a PLAIN post-normalization literal bound
        does push on Spark 4.1's NTZ read path, so that shape is no
        longer the hazard) must be (a) discovered by the source lint
        and (b) rejected by the pushdown assertion — without editing
        any list."""
        from pypeline_spark.registry import QueryCase
        from pypeline_spark.session import load_table

        def q_canary_unpruned(spark, sf_dir):
            e = load_table(spark, sf_dir, "events")
            bound = F.unix_micros(F.col("ts")) >= 1704844800000000  # unprunable
            return e.filter(bound).groupBy("event_type").count()

        import pypeline_spark.session as _sess

        # the lint resolves same-module helpers via the builder's module
        q_canary_unpruned.__module__ = _sess.__name__
        augmented = dict(cases)
        augmented["q_canary_unpruned"] = QueryCase(
            "q_canary_unpruned", q_canary_unpruned, None
        )
        found = discover_time_bounded_events_queries(augmented)
        assert "q_canary_unpruned" in found  # (a) discovered
        with pytest.raises(AssertionError):  # (b) flagged as unpruned
            _assert_events_ts_pushdown(
                "q_canary_unpruned", q_canary_unpruned(spark, sf_dir)
            )

    def test_both_bounds_push_when_given(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_events_pruned"].builder(spark, sf_dir))
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert any(
            "GreaterThanOrEqual(ts" in l and "LessThan(ts" in l for l in pushed
        ), pushed

    def test_scan_count_prunes_all_columns(self, spark, sf_dir, cases):
        df = cases["q_scan"].builder(spark, sf_dir)
        # count + count distinct needs only l_orderkey
        read_schema = plan_of(df).split("ReadSchema:")[1].splitlines()[0]
        assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


class TestJoinStrategy:
    def test_dim_joins_broadcast(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_join_inner"].builder(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_star_join_single_fact_shuffle(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_join_multi"].builder(spark, sf_dir))
        # dims broadcast; lineitem<->orders may sort-merge or broadcast
        assert plan.count("BroadcastHashJoin") >= 3

    def test_semi_anti_broadcast(self, spark, sf_dir, cases):
        for name in ("q_semi", "q_anti"):
            plan = plan_of(cases[name].builder(spark, sf_dir))
            assert "BroadcastHashJoin" in plan, name

    def test_range_join_is_not_cartesian(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_range_join"].builder(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_tpch_shapes_broadcast_dims_and_fold_topk(self, spark, sf_dir, cases):
        """Q3/Q10 shapes: dims broadcast (fact never shuffles for the
        join) and ORDER BY + LIMIT folds into TakeOrderedAndProject —
        no global sort materializes."""
        for name in ("q_shipping_priority", "q_returned_items"):
            plan = plan_of(cases[name].builder(spark, sf_dir))
            assert plan.count("BroadcastHashJoin") >= 2, name
            assert "TakeOrderedAndProject" in plan, name
            assert "CartesianProduct" not in plan, name

    def test_decontaminate_broadcasts_benchmark_set(self, spark, sf_dir, cases):
        """The benchmark shingle set must broadcast; the corpus side
        streams map-side — no corpus self-join, no shuffle of the big
        side for the join itself."""
        plan = plan_of(cases["q_decontaminate"].builder(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_dedup_embedding_cell_routed_not_all_pairs(self, spark, sf_dir, cases):
        """The embedding near-dup scan must never plan an all-pairs
        nested loop: candidates come from cell-local Arrow batches
        (FlatMapGroupsInPandas under groupBy(cell_id)) and the exact
        rescore joins back equi on vec_id."""
        spark.catalog.clearCache()
        plan = plan_of(cases["q_dedup_embedding"].builder(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "FlatMapGroupsInPandas" in plan


class TestAggregation:
    def test_q1_partial_aggregation(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_agg_pricing"].builder(spark, sf_dir))
        # two-phase hash aggregate: partial before the exchange
        assert plan.count("HashAggregate") >= 2
        assert "partial_sum" in plan or "partial" in plan.lower()

    def test_q1_stays_in_codegen(self, spark, sf_dir, cases):
        import contextlib
        import io

        # AQE wraps the unexecuted plan and reports 0 codegen subtrees;
        # disable it for the static inspection only
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            df = cases["q_agg_pricing"].builder(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("codegen")
            out = buf.getvalue()
            assert "WholeStageCodegen subtrees" in out
            assert "Found 0 WholeStageCodegen" not in out
            assert "BatchEvalPython" not in plan_of(df)  # no Python in the hot path
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")


class TestTopK:
    def test_global_topk_avoids_full_sort(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_topk"].builder(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan

    def test_window_topn_single_shuffle(self, spark, sf_dir, cases):
        plan = plan_of(cases["q_window_topn"].builder(spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 1

    def test_salted_join_shuffles_on_key_plus_salt(self, spark, sf_dir, cases):
        """Both sides of the salted join must hash-exchange on
        (key, __salt) — the salt spreading a hot key over reducers is
        the entire point of the rewrite."""
        plan = plan_of(cases["q_join_salted"].builder(spark, sf_dir))
        salted = [
            line
            for line in plan.splitlines()
            if "Exchange hashpartitioning" in line and "__salt" in line
        ]
        assert len(salted) == 2

    def test_minhash_signature_is_map_side(self, spark, sf_dir):
        """MinHash signatures must compute inside the scan stage: no
        per-shingle explode/aggregate shuffle, and the md5 hash array
        must stay materialized (Catalyst inlining it into each of the
        k array_min lambdas would re-hash every shingle k times)."""
        from pypeline_spark.functions.dedup import minhash_signature
        from pypeline_spark.session import load_table

        # earlier tests may have left the shingle-array relation cached
        # (q_dedup_minhash caches it); a cache hit substitutes an
        # InMemoryRelation whose stored child plan adds a second
        # "Exchange" string to the tree — clear for a deterministic plan
        spark.catalog.clearCache()
        sigs = minhash_signature(load_table(spark, sf_dir, "documents"))
        plan = plan_of(sigs)
        assert "HashAggregate" not in plan and "Generate" not in plan
        assert plan.count("Exchange") == 1  # only the explicit spread repartition
        assert plan.count("md5") == 1


class TestSkewHandling:
    def test_aqe_splits_skewed_join_partition(self, spark):
        """The 100 TB skew story (SCALE.md): a hot join key must not
        pin the whole join on one reducer.  With a 90%-hot key and
        local-scale thresholds, AQE's final plan must read the skewed
        shuffle partition as multiple splits (AQEShuffleRead ... skewed).
        """
        from pyspark.sql import functions as F

        saved = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.forceOptimizeSkewedJoin",
            )
        }
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
            )
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
            spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            # the agg above the join needs hash distribution, so the
            # split introduces an extra shuffle — allow it explicitly
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

            big = spark.range(0, 300_000).select(
                F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
                F.col("id").alias("v"),
            )
            dim = spark.range(0, 30_000).select(
                (F.col("id") % 1000).alias("k"), F.col("id").alias("w")
            )
            j = big.join(dim.hint("merge"), "k").groupBy().agg(F.count("*").alias("n"))
            n = j.collect()[0].n
            assert n == 8_103_000  # 270k hot rows x 30 dim matches + tail
            final_plan = j._jdf.queryExecution().executedPlan().toString()
            assert "skewed" in final_plan
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestDeleteByKeysJoinPaths:
    """delete_by_keys no longer forces F.broadcast on the key set: a
    delete batch from a large extract can exceed broadcast capacity at
    scale.  The strategy is the optimizer's call — both outcomes are
    asserted here: a small key set still broadcasts (stats/AQE), and
    with broadcast unavailable the join degrades to a SHUFFLED
    left-anti instead of failing or nested-looping."""

    def _delete_df(self, spark, sf_dir, cases):
        return cases["q_delete_keys"].builder(spark, sf_dir)

    def test_small_key_set_broadcasts(self, spark, sf_dir, cases):
        df = self._delete_df(spark, sf_dir, cases)
        df.count()  # let AQE finalize with runtime stats
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan

    def test_large_key_set_degrades_to_shuffled_anti(self, spark, sf_dir, cases):
        saved = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold",
            )
        }
        try:
            # broadcast off == what AQE decides when the key set is too
            # big to fit the threshold at cluster scale
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            df = self._delete_df(spark, sf_dir, cases)
            df.count()
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan, plan
            assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan) and "LeftAnti" in plan, plan
            assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestNoDriverCollects:
    def test_no_collect_in_operator_sources(self):
        # operators must stay distributed: no driver-side materialization
        # inside any query builder.  (Job-count checks are too noisy —
        # parquet footer reads launch metadata jobs — so gate statically.)
        import os

        import pypeline_spark

        root = os.path.dirname(pypeline_spark.__file__)
        banned = (".collect()", ".toPandas()", ".toLocalIterator()", ".toArrow()")
        # The ONE sanctioned driver materialization: the manifest's
        # distributed bloom-index build brings back O(partitions × cols)
        # 1 KiB partial bitsets — bounded index METADATA (same class as
        # its parquet-footer stats reads), never table rows.  Scoped to
        # (file, marker) so any second use still fails loudly.
        allowed = {("sinks/manifest.py", ".toArrow()")}
        offenders = []
        for dirpath, _, files in os.walk(root):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fn)
                with open(path) as fh:
                    src = fh.read()
                for b in banned:
                    if b in src:
                        rel = os.path.relpath(path, root)
                        if (rel, b) in allowed and src.count(b) == 1:
                            continue
                        offenders.append((rel, b))
        assert not offenders, f"driver-side materialization in: {offenders}"

    def test_builders_return_lazy_dataframes(self, spark, sf_dir, cases):
        from pyspark.sql import DataFrame

        for name, case in cases.items():
            if name == "q_pipeline_etl":  # runs a full ETL by design
                continue
            assert isinstance(case.builder(spark, sf_dir), DataFrame), name


class TestNoNestedLoopSweep:
    # Cross/nested shapes that are the operator's documented semantics:
    # q_join_cross IS a cross join; q_topk_cosine / q_knn_ivf broadcast
    # a tiny query/centroid set across the corpus by design;
    # q_knn_recall embeds the q_topk_cosine brute-force baseline as the
    # ground-truth side of the recall measurement (the LSH side it
    # grades is equi-joined and separately gated in test_llm_ops).
    # q_equidepth_hist broadcasts a 1-ROW boundary relation (the
    # scalar-subquery shape — Catalyst folds any literal equi-key away,
    # so it can only ever plan as a nested loop; O(n) with a 7-double
    # build side).
    # q_bloom_join broadcasts a 1-ROW bitset relation onto the fact
    # (same scalar-subquery shape as q_equidepth_hist's boundary row:
    # no equi-key exists, so Catalyst can only plan a nested loop with
    # a 1-row build side — O(n), and the whole point is the map-side
    # prefilter it enables).
    INTENTIONAL = {
        "q_join_cross", "q_topk_cosine", "q_knn_ivf", "q_knn_recall",
        "q_equidepth_hist", "q_equidepth_hist_approx", "q_bloom_join",
    }
    # Streaming builders execute a real streaming job; their plans are
    # asserted in tests/test_streaming.py instead.
    STREAMING = {
        "q_tumbling", "q_sliding", "q_session",
        "q_stream_dedup", "q_running_totals", "q_stream_join",
    }

    def test_every_batch_query_avoids_nested_loops(self, spark, sf_dir, cases):
        """Sweep: no registered batch operator may plan a
        BroadcastNestedLoopJoin/CartesianProduct unless its semantics
        ARE a cross product — the blanket guard that keeps future
        operators from quietly shipping an all-pairs plan."""
        from pypeline_spark.plans import has_nested_loop

        spark.catalog.clearCache()
        offenders = []
        for name, case in cases.items():
            if name in self.INTENTIONAL or name in self.STREAMING:
                continue
            if has_nested_loop(case.builder(spark, sf_dir)):
                offenders.append(name)
        assert not offenders, offenders


class TestNoExpensiveFilterReevaluation:
    """Predicate pushdown (incl. InferFiltersFromGenerate on explode)
    can clone an expensive computed-array subtree into a Filter below
    the parallelizing exchange — the whole shingle pipeline then runs
    serially inside the one-task scan stage.  Round-4 fixes: token-count
    gate in minhash_signature, explode_outer in shingle_rows.  This
    sweep keeps the pattern from coming back anywhere in the text/dedup
    family."""

    QUERIES = [
        "q_dedup_minhash",
        "q_dedup_incremental",
        "q_dedup_clusters",
        "q_ngram_jaccard",
        "q_decontaminate",
        "q_fingerprint",
        "q_corpus_pipeline",
        "q_vocab_stats",
        "q_bpe_pairs",
        "q_span_dedup",
        "q_span_dup_share",
        "q_image_phash",
    ]

    def test_no_array_subtree_inside_filters(self, spark, sf_dir, cases):
        import re

        offenders = []
        for name in self.QUERIES:
            plan = (
                cases[name]
                .builder(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            for line in plan.splitlines():
                stripped = line.strip().lstrip("+-: ")
                if stripped.startswith("Filter ") and (
                    "array_distinct" in line or "transform(sequence" in line
                ):
                    offenders.append((name, line.strip()[:120]))
                    break
        assert not offenders, f"expensive subtree re-evaluated in Filter: {offenders}"
