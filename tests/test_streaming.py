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

    def test_tumbling_on_rocksdb_state_store(self, spark, sf_dir):
        """Same tumbling aggregation on the RocksDB state store — the
        backend a 100 TB deployment runs (state spills to local disk
        instead of growing the executor heap) — must emit exactly what
        the default HDFS-backed store emits."""
        key = "spark.sql.streaming.stateStore.providerClass"
        default_run = run_streaming_events(spark, sf_dir, tumbling_agg)
        old = spark.conf.get(key, None)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            rocks_run = run_streaming_events(spark, sf_dir, tumbling_agg)
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
        cols = ["window_start", "window_end", "event_type", "n", "total_value"]
        assert _canon(rocks_run, cols) == _canon(default_run, cols)

    def test_sliding(self, spark, sf_dir):
        cutoff = _watermark_cutoff(spark, sf_dir)
        batch = sliding_agg(load_table(spark, sf_dir, "events")).filter(
            F.col("window_end") <= cutoff
        )
        stream = run_streaming_events(spark, sf_dir, sliding_agg)
        cols = ["window_start", "window_end", "n", "total_value"]
        assert set(_canon(batch, cols)) <= set(_canon(stream, cols))

    def test_drop_duplicates_within_watermark(self, spark, sf_dir):
        """The real streaming dedup operator must keep exactly one row
        per (user, type, hour) — the key set the batch formulation
        (q_stream_dedup) derives with row_number.  Which row survives
        depends on arrival order, so parity is on the key set."""

        def dedup(stream):
            return (
                stream.withColumn("hr", F.date_trunc("hour", "ts"))
                .dropDuplicatesWithinWatermark(["user_id", "event_type", "hr"])
                .select("user_id", "event_type", "hr")
            )

        streamed = run_streaming_events(spark, sf_dir, dedup)
        batch_keys = (
            load_table(spark, sf_dir, "events")
            .select("user_id", "event_type", F.date_trunc("hour", "ts").alias("hr"))
            .distinct()
        )
        assert _canon(streamed, ["user_id", "event_type", "hr"]) == _canon(
            batch_keys, ["user_id", "event_type", "hr"]
        )

    def test_stream_stream_join(self, spark, sf_dir):
        """Two watermarked streams joined on key + interval: with one
        availableNow pass over a static file both sides are fully
        present, so the inner interval join must emit exactly the batch
        result (watermarks only bound state eviction, not emission)."""
        from pypeline_spark.streaming.joins import (
            click_purchase_join,
            run_stream_stream_join,
        )

        batch = click_purchase_join(load_table(spark, sf_dir, "events"))
        stream = run_stream_stream_join(spark, sf_dir)
        cols = ["user_id", "click_id", "purchase_id", "purchase_value"]
        canon_batch = _canon(batch, cols)
        assert canon_batch, "fixture must produce attributed purchases"
        assert _canon(stream, cols) == canon_batch

    def test_stream_stream_left_outer_flushes_on_watermark(self, spark, sf_dir):
        """LEFT OUTER stream-stream join: an unmatched click may only
        emit once the watermark proves no purchase can still match.  A
        far-future sentinel purchase (processed as its own later batch)
        pushes the watermark past every click+horizon, so the streaming
        run must emit exactly the batch q_click_gaps result."""
        import datetime
        import os
        import uuid

        from pypeline_spark.streaming import await_finished
        from pypeline_spark.streaming.joins import (
            ATTRIBUTION_HORIZON,
            unattributed_clicks,
        )

        batch = unattributed_clicks(load_table(spark, sf_dir, "events"))
        cols = ["user_id", "click_id", "click_ts"]
        canon_batch = _canon(batch, cols)
        assert canon_batch, "fixture must contain unattributed clicks"

        import tempfile

        src = os.path.join(tempfile.gettempdir(), f"gaps_{uuid.uuid4().hex}")
        os.makedirs(src)
        import shutil

        # Re-write the events table normalized (ts → µs TIMESTAMP,
        # whatever the reader produced for the nanos column) so the
        # sentinel files below share one schema with the base file.
        tmp_base = os.path.join(src, "__base")
        load_table(spark, sf_dir, "events").coalesce(1).write.parquet(tmp_base)
        import glob as _glob

        part = _glob.glob(os.path.join(tmp_base, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, "a-data.parquet"))
        shutil.rmtree(tmp_base, ignore_errors=True)
        raw = spark.read.parquet(os.path.join(src, "a-data.parquet"))
        # Two sentinel files, 10 and 20 days after everything, each its
        # own batch, each holding a click AND a purchase: Catalyst
        # pushes the event_type filter below the watermark node, so
        # each side's watermark tracks only its own event type — a
        # purchase-only sentinel would advance the purchase side while
        # the click side (and the min-policy global watermark) stays at
        # the last real click and the final unmatched click never
        # flushes.  Two batches because null emission lags watermark
        # advancement by one batch.
        import time as _time

        for days, fname in ((10, "b-sent1"), (20, "c-sent2")):
            base = (
                raw.orderBy(F.col("ts").desc())
                .limit(1)
                .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {days} DAYS"))
                .withColumn("event_id", F.lit(-1))
            )
            sent = base.withColumn("event_type", F.lit("purchase")).unionByName(
                base.withColumn("event_type", F.lit("click"))
            )
            tmp_out = os.path.join(src, f"__{fname}")
            sent.coalesce(1).write.parquet(tmp_out)
            part = _glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(src, f"{fname}.parquet"))
            shutil.rmtree(tmp_out, ignore_errors=True)
        now = _time.time()
        for i, path in enumerate(sorted(_glob.glob(os.path.join(src, "*.parquet")))):
            os.utime(path, (now - 100 + i * 30, now - 100 + i * 30))

        def _stream():
            return (
                spark.readStream.schema(raw.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
                .withWatermark("ts", ATTRIBUTION_HORIZON)
            )

        out = unattributed_clicks(_stream(), purchases_stream=_stream())
        name = f"gaps_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_finished(q)
        streamed = spark.table(name).filter(F.col("click_id") != -1)
        assert _canon(streamed, cols) == canon_batch
        shutil.rmtree(src, ignore_errors=True)

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

    def test_late_event_dropped_across_micro_batches(self, spark, tmp_path):
        """True late-data semantics across real micro-batches.

        Spark filters late events with the watermark as of the
        PREVIOUS batch (SPARK-40925: watermarkForLateEvents lags
        watermarkForEviction by one batch), so the drop needs three
        batches: batch 0 advances event time, batch 1 commits that
        watermark, batch 2's stale event is then dropped — while a
        naive batch aggregate over all arrivals would count it.
        """
        import glob
        import os
        import shutil
        import time
        import uuid

        base = "2024-01-01 {:02d}:30:00"
        on_time = [(i, base.format(h), 1.0) for i, h in enumerate(range(11))]
        late1 = [(100, base.format(2), 1.0), (101, base.format(11), 1.0)]
        late2 = [(200, base.format(2), 1.0), (201, base.format(12), 1.0)]

        schema = "event_id long, ts_s string, value double"
        to_df = lambda rows: (  # noqa: E731
            spark.createDataFrame(rows, schema)
            .select(
                "event_id",
                F.col("ts_s").cast("timestamp").alias("ts"),
                F.lit("x").alias("event_type"),
                "value",
            )
        )
        src = str(tmp_path / "late_src")
        os.makedirs(src)
        for i, rows in enumerate((on_time, late1, late2)):
            tmp = str(tmp_path / f"w{i}")
            to_df(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
            dst = os.path.join(src, f"b{i}.parquet")
            shutil.copy(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
            t = time.time() - 200 + i * 50
            os.utime(dst, (t, t))

        stream = (
            spark.readStream.schema(to_df(on_time).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withWatermark("ts", "1 hour")
        )
        name = f"late_{uuid.uuid4().hex[:8]}"
        q = (
            tumbling_agg(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        dropped = sum(
            so["numRowsDroppedByWatermark"]
            for p in q.recentProgress
            for so in p["stateOperators"]
        )
        assert dropped == 1  # exactly the batch-2 stale event
        streamed = {
            r.window_start.hour: r.n
            for r in spark.table(name).collect()
            if r.window_start.day == 1
        }
        # hour-2 window: on-time event + batch-1 event (filter wm was
        # still unset then); batch-2's stale event excluded
        assert streamed[2] == 2
        # the naive batch aggregate over all arrivals counts all three
        all_rows = to_df(on_time + late1 + late2)
        batch = {
            r.window_start.hour: r.n for r in tumbling_agg(all_rows).collect()
        }
        assert batch[2] == 3
