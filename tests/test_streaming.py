"""Streaming parity: the availableNow streaming run of each windowed
aggregation must equal its batch formulation (SURVEY.md §2b streaming)."""

from pyspark.sql import functions as F

from pypeline_spark.session import load_table
from pypeline_spark.streaming.windows import (
    run_streaming_events,
    session_agg,
    sliding_agg,
    tumbling_agg,
)


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _watermark_cutoff(spark, sf_dir):
    """Append mode only emits windows finalized by the watermark: the
    last windows (end > max_ts - delay) stay in state.  Parity therefore
    compares against the batch result restricted to finalized windows."""
    import datetime

    e = load_table(spark, sf_dir, "events")
    max_ts = e.agg(F.max("ts").alias("m")).collect()[0].m
    return max_ts - datetime.timedelta(hours=1)


class TestStreamBatchParity:
    def test_tumbling(self, spark, sf_dir):
        cutoff = _watermark_cutoff(spark, sf_dir)
        batch = tumbling_agg(load_table(spark, sf_dir, "events")).filter(
            F.col("window_end") <= cutoff
        )
        stream = run_streaming_events(spark, sf_dir, tumbling_agg)
        cols = ["window_start", "window_end", "event_type", "n", "total_value"]
        canon_stream = _canon(stream, cols)
        canon_batch = _canon(batch, cols)
        assert canon_batch, "cutoff should leave finalized windows"
        # every finalized batch window was emitted by the stream, and the
        # stream emitted nothing the batch doesn't have
        assert set(canon_batch) <= set(canon_stream)
        assert set(canon_stream) <= set(_canon(tumbling_agg(load_table(spark, sf_dir, "events")), cols))

    def test_sliding(self, spark, sf_dir):
        cutoff = _watermark_cutoff(spark, sf_dir)
        batch = sliding_agg(load_table(spark, sf_dir, "events")).filter(
            F.col("window_end") <= cutoff
        )
        stream = run_streaming_events(spark, sf_dir, sliding_agg)
        cols = ["window_start", "window_end", "n", "total_value"]
        assert set(_canon(batch, cols)) <= set(_canon(stream, cols))

    def test_session(self, spark, sf_dir):
        cutoff = _watermark_cutoff(spark, sf_dir)
        batch = session_agg(load_table(spark, sf_dir, "events")).filter(
            F.col("session_end") <= cutoff
        )
        stream = run_streaming_events(spark, sf_dir, session_agg)
        cols = ["session_start", "session_end", "user_id", "n_events", "session_value"]
        assert set(_canon(batch, cols)) <= set(_canon(stream, cols))

    def test_late_data_dropped_by_watermark(self, spark, sf_dir):
        # with availableNow over a single static file the watermark
        # never advances mid-run, so nothing is dropped — assert the
        # invariant that makes the parity tests above meaningful
        e = load_table(spark, sf_dir, "events")
        n_batch = tumbling_agg(e).agg(F.sum("n").alias("s")).collect()[0].s
        assert n_batch == e.count()
