"""Stream-stream interval join: clicks joined to the purchases that
follow them within an attribution horizon.

The reference is strictly batch (ref: /root/reference/pypeline/Pype.py:31-80);
its incremental story is "re-run the pipeline".  A native engine needs
the genuinely streaming formulation: two unbounded inputs joined on key
+ event-time interval, with watermarks bounding the join state on both
sides.

Scale design:
- State on each side is bounded by (watermark lag + join horizon):
  Spark evicts a buffered click once the purchase-side watermark passes
  click_ts + horizon, so state is O(rate x horizon), independent of
  stream age.  An un-watermarked stream-stream join is an unbounded
  state leak and never production-safe.
- The join shuffles both streams by user_id once; within a partition the
  interval condition is a state-store range probe, not a cartesian scan.
- The batch formulation (``q_stream_join``) is the same DataFrame
  expression over the static table — plus a dedupe-free equality to the
  availableNow streaming run asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table
from pypeline_spark.streaming import await_finished

ATTRIBUTION_HORIZON = "30 minutes"


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def click_purchase_join(events: DataFrame, purchases_stream: DataFrame | None = None) -> DataFrame:
    """Attribute each purchase to every click by the same user in the
    preceding 30 minutes (interval join, works on static or streaming
    inputs — pass ``purchases_stream`` when the two sides are separate
    streams)."""
    clicks, purchases = _sides(events)
    if purchases_stream is not None:
        _, purchases = _sides(purchases_stream)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_HORIZON}"))
    )
    return clicks.join(purchases, cond).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True two-stream run: both sides are watermarked readStream file
    sources, joined on key + interval, drained with availableNow into a
    memory sink.  Tests assert equality with the batch formulation."""
    import os
    import shutil
    import tempfile
    import uuid

    src_dir = os.path.join(tempfile.gettempdir(), f"events_ssj_{uuid.uuid4().hex}")
    os.makedirs(src_dir)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), os.path.join(src_dir, "part-0.parquet")
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(src_dir).schema
    from pypeline_spark.session import _normalize_events_ts

    def _stream():
        return _normalize_events_ts(
            spark.readStream.schema(raw_schema).parquet(src_dir)
            # watermark bounds BOTH state stores: clicks may wait for
            # purchases up to horizon later, purchases for clicks up to
            # horizon earlier
        ).withWatermark("ts", ATTRIBUTION_HORIZON)

    joined = click_purchase_join(_stream(), purchases_stream=_stream())
    name = f"ssj_out_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    return spark.table(name)


@query(
    "q_stream_join",
    oracle="""
    SELECT c.user_id AS user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           ROUND(p.value, 2) AS purchase_value
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch formulation of the stream-stream click→purchase
    attribution join (same expression the streaming runner executes)."""
    return click_purchase_join(load_table(spark, sf_dir, "events"))


def unattributed_clicks(
    events: DataFrame, purchases_stream: DataFrame | None = None
) -> DataFrame:
    """Clicks with NO purchase in the attribution window — the LEFT
    OUTER side of the stream-stream join.

    Streaming semantics: an unmatched click can only emit once the
    purchase-side watermark passes click_ts + horizon (Spark must prove
    no future purchase can match).  State cost is identical to the
    inner join; the extra machinery is the null-emission timer.  The
    batch formulation (q_click_gaps) is the same expression over the
    static table.
    """
    clicks, purchases = _sides(events)
    if purchases_stream is not None:
        _, purchases = _sides(purchases_stream)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_HORIZON}"))
    )
    return (
        clicks.join(purchases, cond, "left_outer")
        .filter(F.col("purchase_id").isNull())
        .select("user_id", "click_id", "click_ts")
    )


@query(
    "q_click_gaps",
    oracle="""
    SELECT c.user_id AS user_id,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM events c
    LEFT JOIN events p
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_id IS NULL
    """,
)
def q_click_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the left-outer stream-stream join: clicks never
    followed by a purchase within the horizon."""
    return unattributed_clicks(load_table(spark, sf_dir, "events"))
