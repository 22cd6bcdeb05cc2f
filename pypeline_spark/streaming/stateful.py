"""Custom stateful streaming operator via applyInPandasWithState.

The genuinely stateful piece of the streaming surface (SURVEY.md §7
"hard parts"): a per-user running aggregate whose state survives across
micro-batches.  ``applyInPandasWithState`` is the PySpark primitive for
operators Structured Streaming doesn't ship — state is an explicit
tuple the operator reads/updates per key per batch, stored in the state
store (RocksDB/HDFS-backed on a cluster), with watermark-driven
timeouts bounding its size.

Parity strategy: the events fixture is split into K files streamed one
per micro-batch (maxFilesPerTrigger=1), so state genuinely crosses
batch boundaries; the final per-user totals must equal the one-shot
batch groupBy.  That is asserted in tests and the batch twin is the
oracle-checked q_running_totals.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pypeline_spark.registry import query
from pypeline_spark.session import load_table
from pypeline_spark.streaming import await_finished

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into (n, total) state and
    emit the updated running totals."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_totals_stream(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in explicit state."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_totals(
    spark: SparkSession, sf_dir: str, n_batches: int = 3
) -> DataFrame:
    """Drive the stateful operator through n_batches real micro-batches.

    Splits events into n_batches files by time range (so arrival order
    is realistic), streams them one file per trigger, and returns each
    user's LAST update — the running total after the final batch.
    """
    src_dir = os.path.join(tempfile.gettempdir(), f"ev_stateful_{uuid.uuid4().hex}")
    events = load_table(spark, sf_dir, "events")
    (
        events.select("user_id", "ts", "value")
        .repartitionByRange(n_batches, "ts")
        .write.mode("overwrite")
        .parquet(src_dir)
    )
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        running_totals_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    updates = spark.table(name)
    # update mode emits one row per (user, batch-with-changes); the
    # running total is monotone in n_events, so max(n) picks the final
    final = updates.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_value")).alias("s")
    )
    result = final.select(
        "user_id", F.col("s.n_events").alias("n_events"),
        F.col("s.total_value").alias("total_value"),
    )
    shutil.rmtree(src_dir, ignore_errors=True)
    return result


@query(
    "q_running_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful running-totals operator (the streaming
    run is parity-tested against this in tests/test_stateful.py)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value")
    )


# --- Timeout-evicted sessionization (bounded-state proof) ----------------

SESSION_GAP_SECS = 600  # same 10-minute gap as q_sessionize_sql

SESSION_OUTPUT = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, n_events bigint"
)
SESSION_STATE = "start_us bigint, end_us bigint, n bigint"


def _sessionize_evict(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap sessionizer whose state is ONE open session per user.

    Data call: fold the batch's (sorted) event times into sessions,
    emitting every session CLOSED by a gap and keeping only the open
    tail in state, with an event-time timeout at end + gap.  Timeout
    call: the watermark passed the open session's close point with no
    new data — emit it and CLEAR state.  That eviction is what bounds
    the store to |active users| regardless of history length.
    """
    gap_us = SESSION_GAP_SECS * 1_000_000
    out = {"user_id": [], "session_start_us": [], "session_end_us": [], "n_events": []}

    def emit(start: int, end: int, n: int) -> None:
        out["user_id"].append(key[0])
        out["session_start_us"].append(start)
        out["session_end_us"].append(end)
        out["n_events"].append(n)

    if state.hasTimedOut:
        start, end, n = state.get
        emit(start, end, n)
        state.remove()
    else:
        cur = state.get if state.exists else None
        times = []
        for pdf in pdfs:
            times.extend(int(v) for v in pdf["ts_us"])
        # applyInPandasWithState does NOT pre-filter late rows (unlike
        # windowed aggregations) — rows behind the watermark can reach
        # the fold when source files arrive out of order.  Folding one
        # into an open session would move its end BACKWARD; drop them,
        # the standard late-data semantics at this watermark delay.
        wm_us = state.getCurrentWatermarkMs() * 1000
        times = sorted(t for t in times if t > wm_us)
        for t in times:
            if cur is None:
                cur = (t, t, 0)
            start, end, n = cur
            if t - end > gap_us:
                emit(start, end, n)
                cur = (t, t, 1)
            else:
                cur = (start, t, n + 1)
        if cur is not None:
            state.update(cur)
            # evict when the watermark passes the session close point;
            # if the watermark already has (this key's data ran behind
            # other keys' event times), schedule for the next trigger —
            # Spark rejects deadlines behind the current watermark
            deadline_ms = (cur[1] + gap_us) // 1000
            state.setTimeoutTimestamp(
                max(deadline_ms, state.getCurrentWatermarkMs() + 1)
            )
    yield pd.DataFrame(out)


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Watermarked gap sessionization with timeout eviction."""
    prepared = events_stream.withWatermark("ts", "0 seconds").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_evict,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_stream(
    spark: SparkSession, sf_dir: str, n_batches: int = 3
) -> DataFrame:
    """Drive the evicting sessionizer through real micro-batches and
    return every emitted (closed or evicted) session."""
    src_dir = os.path.join(tempfile.gettempdir(), f"ev_sess_{uuid.uuid4().hex}")
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    # Write each time-range as its OWN sequential job: the parquet file
    # source orders files by modification time, and a single
    # repartitionByRange write stamps near-identical mtimes — ties
    # would let a later range process first, turning the earlier range
    # into late data the sessionizer rightly drops.
    from pyspark.sql import Window as _W

    ranked = events.withColumn(
        "__b", F.ntile(n_batches).over(_W.orderBy("ts", "user_id")) - 1
    )
    for b in range(n_batches):
        (
            ranked.filter(F.col("__b") == b)
            .drop("__b")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src_dir, f"f={b}"))
        )
    schema = spark.read.parquet(os.path.join(src_dir, "f=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src_dir, "f=*"))
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    result = spark.table(name)
    shutil.rmtree(src_dir, ignore_errors=True)
    return result


@query(
    "q_session_rollup",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {SESSION_GAP_SECS * 1_000_000}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    labeled AS (
        SELECT user_id, ts_us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
           CAST(MAX(ts_us) AS BIGINT) AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM labeled GROUP BY user_id, sid
    """,
)
def q_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the timeout-evicting streaming sessionizer: one
    row per (user, gap session) with start/end/count — the streaming
    op's emissions are parity-tested against exactly this rollup in
    tests/test_stateful.py.

    Scale: one user-keyed shuffle serves the gap flags, the running
    session label, and the rollup (same sort order throughout); the
    output unit is sessions, so downstream session analytics never
    re-touch raw events.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
            > SESSION_GAP_SECS * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    wl = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    labeled = flagged.withColumn("sid", F.sum("new_s").over(wl))
    return labeled.groupBy("user_id", "sid").agg(
        F.min("ts_us").cast("bigint").alias("session_start_us"),
        F.max("ts_us").cast("bigint").alias("session_end_us"),
        F.count("*").cast("bigint").alias("n_events"),
    ).drop("sid")
