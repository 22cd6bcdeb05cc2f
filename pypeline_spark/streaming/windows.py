"""Event-time windows: tumbling, sliding, session; stateful dedup.

Each operator is written once as a *batch* DataFrame plan over the
events table (oracle-checked against DuckDB) and once as a *streaming*
plan (``run_streaming``) driven by an availableNow file source; tests
assert batch == streaming.  Watermarks bound state: at 100 TB/day the
window state store only retains (watermark horizon / slide) panes per
key group — without the watermark, session state grows unboundedly.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table, scan_parallelism
from pypeline_spark.streaming import await_finished


def tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type (epoch-aligned)."""
    w = F.window("ts", "1 hour")
    return events.groupBy(w, "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "n",
        "total_value",
    )


def sliding_agg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event in 2 panes)."""
    w = F.window("ts", "1 hour", "30 minutes")
    return events.groupBy(w).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n",
        "total_value",
    )


def session_agg(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap.

    Batch mode uses the same native session_window expression the
    streaming plan uses — Spark merges overlapping [ts, ts+gap) spans.
    """
    w = F.session_window("ts", gap)
    return events.groupBy(w, "user_id").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value")
    ).select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "user_id",
        "n_events",
        "session_value",
    )


def run_streaming_events(
    spark: SparkSession,
    sf_dir: str,
    agg_fn,
    watermark: str = "1 hour",
    output_mode: str = "append",
) -> DataFrame:
    """Stream the events table through agg_fn with availableNow.

    Copies the events parquet into a clean stream-source dir (a file
    source streams a whole directory), converts the nanos column, then
    runs one bounded micro-batch pass.
    """
    import shutil
    import uuid

    src_dir = os.path.join(tempfile.gettempdir(), f"events_stream_{uuid.uuid4().hex}")
    os.makedirs(src_dir)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(src_dir, "part-0.parquet"))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(src_dir).schema
    from pypeline_spark.session import _normalize_events_ts

    stream = _normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(src_dir)
    ).withWatermark("ts", watermark)
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg_fn(stream)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    out = spark.table(name)
    return out


@query(
    "q_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts)                 AS window_start,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (batch formulation of the stream agg)."""
    return tumbling_agg(load_table(spark, sf_dir, "events"))


@query(
    "q_sliding",
    oracle="""
    WITH panes AS (
        SELECT e.*, time_bucket(INTERVAL 30 MINUTE, ts) - (o.i * INTERVAL 30 MINUTE) AS window_start
        FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS i) o
    )
    SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM panes GROUP BY 1, 2
    """,
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows — each event contributes to two panes."""
    return sliding_agg(load_table(spark, sf_dir, "events"))


@query(
    "q_session",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 10 MINUTE OR
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 10 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 10-minute gap — Spark's native session_window;
    the oracle is the classic gaps-and-islands SQL formulation (session
    end = last event + gap, matching Spark's semantics).

    r19: under-split scan => project + hash-repartition on user_id so
    the session-window sort/merge runs wide (1.5x at sf0.1); the
    exchange satisfies the aggregation's required distribution, so no
    second shuffle appears.  No-op on a wide scan."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    par = scan_parallelism(spark, sf_dir, "events")
    if par:
        e = e.repartition(par, F.col("user_id"))
    return session_agg(e)


@query(
    "q_stream_dedup",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n_first_per_hour
    FROM (
        SELECT user_id, event_type,
               time_bucket(INTERVAL 1 HOUR, ts) AS hr,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
                                  time_bucket(INTERVAL 1 HOUR, ts)
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    GROUP BY user_id, event_type
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup semantics in batch form: first event per
    (user, type, hour) — the batch twin of
    dropDuplicatesWithinWatermark keyed on (user_id, event_type, hour).
    """
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    hr = F.window("ts", "1 hour")["start"].alias("hr")
    w = W.partitionBy("user_id", "event_type", "hr").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_type", "ts", "event_id", hr)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_first_per_hour"))
    )
