"""Incremental view maintenance for algebraic rollups.

A 100 TB deployment never recomputes a continuous aggregate from
scratch — it maintains the materialized rollup by merging in each new
batch's partial rollup (the "hypertable continuous aggregate" /
materialized-view-refresh pattern).  That merge is exact for
algebraic aggregates: COUNT and SUM add, MIN/MAX combine, and any
average derives from (sum, count) at read time.

``q_ivm_rollup`` PROVES the maintenance path: Spark builds the rollup
incrementally (pre-cutoff rollup merged with the post-cutoff delta
rollup) while the DuckDB oracle computes the direct rollup over all
events — the hash match is the equivalence check that incremental ==
recompute.  Value math is exact integer cents so the proof is not at
the mercy of float summation order (the repo-wide determinism move).

Scale: each side is one partial-aggregated groupBy at the rollup
grain; the merge is a grain-keyed full-outer join of two tiny
relations (rollup cardinality, not event cardinality).  The standing
rollup never rescans history — per batch you aggregate only the
delta, exactly like the mergeable HLL sketches in operators/stats.py
do for distinct counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

IVM_CUTOFF = "2024-02-01"  # delta = events on/after this day


def rollup_events(e: DataFrame) -> DataFrame:
    """(event_type, day) -> n, sum/min/max of integer cents."""
    cents = F.floor(F.col("value") * 100).cast("bigint")
    return (
        e.select("event_type", F.to_date("ts").alias("day"), cents.alias("c"))
        .groupBy("event_type", "day")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").cast("bigint").alias("sum_cents"),
            F.min("c").cast("bigint").alias("min_cents"),
            F.max("c").cast("bigint").alias("max_cents"),
        )
    )


def ivm_merge(a: DataFrame, b: DataFrame, keys=("event_type", "day")) -> DataFrame:
    """Merge two partial rollups of the same grain: counts/sums add,
    min/max combine.  Exact for these algebraic aggregates — merging
    is associative and commutative, so batches can land in any order."""
    keys = list(keys)
    bb = b.select(
        *keys,
        F.col("n").alias("__n"),
        F.col("sum_cents").alias("__s"),
        F.col("min_cents").alias("__mn"),
        F.col("max_cents").alias("__mx"),
    )
    return (
        a.join(bb, keys, "full_outer")
        .select(
            *keys,
            (F.coalesce("n", F.lit(0)) + F.coalesce("__n", F.lit(0))).alias("n"),
            (
                F.coalesce("sum_cents", F.lit(0)) + F.coalesce("__s", F.lit(0))
            )
            .cast("bigint")
            .alias("sum_cents"),
            F.least(
                F.coalesce("min_cents", F.col("__mn")),
                F.coalesce("__mn", F.col("min_cents")),
            )
            .cast("bigint")
            .alias("min_cents"),
            F.greatest(
                F.coalesce("max_cents", F.col("__mx")),
                F.coalesce("__mx", F.col("max_cents")),
            )
            .cast("bigint")
            .alias("max_cents"),
        )
    )


@query(
    "q_ivm_rollup",
    # The oracle computes the DIRECT rollup over all events; the Spark
    # side computes it INCREMENTALLY (pre-cutoff rollup + delta merge).
    # The hash match is the incremental == recompute equivalence proof.
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(MIN(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(MAX(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM events
    GROUP BY event_type, day
    """,
)
def q_ivm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate maintenance: the standing pre-cutoff rollup
    merged with the delta batch's partial rollup, hash-proven equal to
    a from-scratch recompute (the DuckDB oracle)."""
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit(IVM_CUTOFF).cast("date")
    standing = rollup_events(e.filter(F.to_date("ts") < cutoff))
    delta = rollup_events(e.filter(F.to_date("ts") >= cutoff))
    return ivm_merge(standing, delta)
