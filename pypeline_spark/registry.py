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
# The round-17 window is the staleness rotation the r16 verdict
# directed (directive #1): (a) the 12-name r11 tail — stale at r18,
# must re-cert THIS round, NON-NEGOTIABLE per the verdict; (b) 36 of
# the 50-query r12 cohort (alphabetical head, re-derived from
# CORRECTNESS_r01..r16 before pinning), deferring the 14-name r12
# tail (q_sample_weighted .. q_winsorize) to the r18 window inside
# its float (r12 certs are admissible through r18); and (c) TWO
# first-certification slots for the operators added this round, as
# the verdict allows ("a new first-cert may displace r12 head names
# into the r18 tail"): the lakehouse pipeline step's
# `q_pipeline_lakehouse` (directive #2) and the keep-best cluster
# representative `q_dedup_representative` (directive #5).  The
# ProtocolTooNew hardening (ADVICE), columnar checkpoints (#3),
# vectorized prune planning (#4), generated columns (#6) and row
# tracking (#7) are certified by pytest batteries / probes per the
# verdict's Done criteria and take no window slots.
#
# Cumulative driver record after round 16: 261 of 261 registered
# queries ever driver-green (never-certified set EMPTY);
# latest-cert histogram re-derived from CORRECTNESS_r01..r16 before
# pinning: 12@r11 / 50@r12 / 49@r13 / 50@r14 / 50@r15 / 50@r16 — the
# derivation matched the r16-planned r11 tail name for name.
# All 50 below pre-verified strict-canon green at sf0.01
# (SPARK_GRAFT_BARE=1 tools/check_oracle.py) before pinning.
#
# Rotation runway (registry 263 after the r17 additions; an rN cert
# is admissible until the newest record reaches N+6, so every cohort
# may drain across two windows):
#   r17 window = 12 r11 tail + 36 r12 head + 2 new first-certs (this
#                one; the r12 tail q_sample_weighted q_schema_drift
#                q_session_rollup q_shard_balance q_span_dedup
#                q_stream_autocompact q_time_travel_diff
#                q_time_weighted_avg q_token_entropy q_top_terms
#                q_train_val_split q_union_evolve q_weekday_profile
#                q_winsorize stays admissible through r18)
#   r18 window = the 14-name r12 tail (stale at r19, NON-NEGOTIABLE)
#                + ~36 of the r13 cohort (alphabetical head,
#                re-derive from CORRECTNESS_r01..r17 before pinning)
#                with the r13 tail deferring to r19; and so on, one
#                cohort per round with a tail riding its float.
# Steady state re-certifies every query at most 6 rounds apart,
# inside the guard's >MAX_CERT_AGE_ROUNDS bound (263 queries / 50
# slots — ceil(263/6) = 44 needed, 6 slack per window).
#
# tests/test_registry.py enforces the invariant mechanically: any
# registered query whose latest driver-green round is absent or stale
# must sit in this window.
_DRIVER_WINDOW = (
    # -- the 12-name r11 tail (stale at r18: re-cert NOW) -------------
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
    # -- 36 of the r12 cohort (alphabetical head) ---------------------
    "q_agg_distinct",
    "q_agg_pricing",
    "q_agg_stats",
    "q_anti",
    "q_arg_minmax",
    "q_epoch_shuffle",
    "q_equidepth_hist",
    "q_heavy_hitters_cms",
    "q_image_phash",
    "q_image_resize",
    "q_ivm_rollup",
    "q_jaccard_prefix",
    "q_kanon",
    "q_knn_ivf",
    "q_knn_lsh",
    "q_lang_drift",
    "q_langid_confusion",
    "q_latency_bands",
    "q_linear_trend",
    "q_manifest_analyze",
    "q_manifest_changes",
    "q_manifest_merge_prune",
    "q_manifest_ndv",
    "q_manifest_prune",
    "q_manifest_restore",
    "q_merge_variance",
    "q_mixture_temperature",
    "q_mode",
    "q_multimodal_decode",
    "q_ohlc",
    "q_outliers_mad",
    "q_partition_evolution",
    "q_pattern_match",
    "q_pattern_var",
    "q_period_growth",
    "q_pipeline_dedup",
    # -- first-certification slots (r17 directives #2 and #5) ---------
    "q_pipeline_lakehouse",
    "q_dedup_representative",
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
    "pypeline_spark.sources.manifest_stream",
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
