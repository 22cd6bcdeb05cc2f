"""Stateful streaming, bucketed joins, and continuous keyed ingestion.

Each test drives the REAL streaming path (availableNow, multiple
micro-batches where state matters) and asserts parity with the one-shot
batch formulation that the oracle harness already checks.
"""

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from pypeline_spark.registry import load_all
from pypeline_spark.session import load_table


@pytest.fixture(scope="module")
def cases():
    return load_all()


class TestStatefulRunningTotals:
    def test_state_crosses_micro_batches(self, spark, sf_dir, cases):
        from pypeline_spark.streaming.stateful import run_stateful_totals

        streamed = {
            r.user_id: (r.n_events, r.total_value)
            for r in run_stateful_totals(spark, sf_dir, n_batches=3).collect()
        }
        batch = {
            r.user_id: (r.n_events, r.total_value)
            for r in cases["q_running_totals"].builder(spark, sf_dir).collect()
        }
        assert set(streamed) == set(batch)
        for uid, (n, total) in batch.items():
            sn, stotal = streamed[uid]
            assert sn == n, uid
            # running float sums may differ from one-shot sums in the
            # last ulp before rounding
            assert abs(stotal - total) <= 0.01, uid

    def test_multiple_batches_actually_ran(self, spark, sf_dir):
        """The parity above is vacuous if everything arrived in one
        micro-batch — verify a mid-stream user got >1 update row."""
        from pypeline_spark.streaming.stateful import (
            running_totals_stream,
        )
        from pypeline_spark.session import load_table as lt

        src_dir = os.path.join(tempfile.gettempdir(), f"ev_multi_{uuid.uuid4().hex}")
        events = lt(spark, sf_dir, "events")
        (
            events.select("user_id", "ts", "value")
            .repartitionByRange(3, "ts")
            .write.mode("overwrite")
            .parquet(src_dir)
        )
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        name = f"multi_{uuid.uuid4().hex[:8]}"
        q = (
            running_totals_stream(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        updates_per_user = (
            spark.table(name).groupBy("user_id").count().agg(F.max("count")).first()[0]
        )
        assert updates_per_user >= 2


class TestBucketedJoin:
    def test_join_has_no_exchange_below_it(self, spark, sf_dir, cases):
        df = cases["q_join_bucketed"].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the only exchange is the groupBy ABOVE the join: everything
        # from the join down is exchange-free (that's the co-location)
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part
        assert "Bucketed: true" in join_part

    def test_bucket_counts_must_match(self, spark, sf_dir):
        from pypeline_spark.sources.bucketed import write_bucketed

        nat = load_table(spark, sf_dir, "nation")
        reg = load_table(spark, sf_dir, "region")
        write_bucketed(nat, "bkt_nation_t", "n_regionkey", n_buckets=4)
        write_bucketed(reg, "bkt_region_t", "r_regionkey", n_buckets=8)
        j = (
            spark.table("bkt_nation_t")
            .hint("merge")
            .join(
                spark.table("bkt_region_t"),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # mismatched bucket counts: Spark must re-shuffle (or coalesce)
        # one side — co-location only holds when counts line up
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" in join_part or "REBALANCE" in join_part


class TestStreamUpsert:
    def test_streaming_merge_equals_batch_upsert(self, spark, sf_dir):
        from pypeline_spark.sinks.keyed import ParquetCatalog, upsert
        from pypeline_spark.streaming.ingest import stream_upsert

        # input: two waves of customer rows, later wave revises acctbal
        cust = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("id"),
            "c_name",
            "c_acctbal",
            F.lit(0).alias("wave"),
        )
        wave2 = cust.filter(F.col("id") % 3 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 1000
        ).withColumn("wave", F.lit(1))

        src_dir = os.path.join(tempfile.gettempdir(), f"ups_{uuid.uuid4().hex}")
        os.makedirs(src_dir)
        # the file source orders batches by modification time — write
        # one file per wave and pin mtimes so wave 2 arrives second
        import glob
        import shutil
        import time

        for i, wave_df in enumerate((cust, wave2)):
            tmp = src_dir + f".w{i}"
            wave_df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(src_dir, f"wave{i}.parquet")
            shutil.copy(part, dst)
            t = time.time() - 100 + i * 50
            os.utime(dst, (t, t))
            shutil.rmtree(tmp, ignore_errors=True)

        root = os.path.join(tempfile.gettempdir(), f"cat_{uuid.uuid4().hex}")
        catalog = ParquetCatalog(root)
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        q = stream_upsert(
            stream, catalog, "dim", key_columns=["id"], order_col="wave"
        )
        q.awaitTermination(300)

        got = {
            r.id: (r.c_acctbal, r.wave) for r in catalog.get("dim").collect()
        }
        expected_df = upsert(
            cust, wave2, key_columns=["id"], order_col="wave"
        )
        expected = {r.id: (r.c_acctbal, r.wave) for r in expected_df.collect()}
        assert got == expected
        # and the revised keys really did take wave 2's values
        assert any(w == 1 for (_, w) in got.values())


class TestTimeoutEviction:
    def test_closed_sessions_match_batch_sessionization(self, spark, sf_dir):
        """Every emitted session must match the batch gap-sessionizer
        exactly, and every NON-final session per user must be emitted
        (closed by data or evicted by timeout — either way, once)."""
        from pypeline_spark.streaming.stateful import (
            SESSION_GAP_SECS,
            run_sessionize_stream,
        )

        emitted = {
            (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
            for r in run_sessionize_stream(spark, sf_dir, n_batches=3).collect()
        }
        # reference = the oracle-checked batch twin q_session_rollup
        rows = [
            (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
            for r in load_all()["q_session_rollup"].builder(spark, sf_dir).collect()
        ]
        rows = [
            type("R", (), dict(user_id=u, start_us=s, end_us=e, n=n))()
            for u, s, e, n in rows
        ]
        batch = {(r.user_id, r.start_us): (r.end_us, r.n) for r in rows}
        finals = {}
        for r in rows:
            cur = finals.get(r.user_id)
            if cur is None or r.start_us > cur:
                finals[r.user_id] = r.start_us
        final_keys = {(uid, s) for uid, s in finals.items()}
        # everything emitted is a true session
        for key, val in emitted.items():
            assert batch[key] == val, key
        # every non-final session was emitted exactly once
        missing = (set(batch) - final_keys) - set(emitted)
        assert not missing, sorted(missing)[:5]

    def test_idle_user_session_is_evicted_by_timeout(self, spark, tmp_path):
        """A user with events ONLY in the first micro-batch can never be
        closed by the data path — if their session is emitted, the
        EventTimeTimeout eviction did it (the bounded-state claim)."""
        import pandas as pd

        from pypeline_spark.streaming import await_finished
        from pypeline_spark.streaming.stateful import sessionize_stream

        base = pd.Timestamp("2024-01-01")

        def ts(minutes):
            return (base + pd.Timedelta(minutes=minutes)).to_pydatetime()

        src = str(tmp_path / "src")
        # file 1: idle user 1 (2 events), plus user 2
        spark.createDataFrame(
            [(1, ts(0)), (1, ts(2)), (2, ts(1))], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(src + "/f=1")
        # files 2-3: only user 2, hours later — watermark sails past
        # user 1's close point
        spark.createDataFrame(
            [(2, ts(120))], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(src + "/f=2")
        spark.createDataFrame(
            [(2, ts(240))], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(src + "/f=3")
        schema = spark.read.parquet(src + "/f=1").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/f=*")
        )
        import uuid as _uuid

        name = f"evict_{_uuid.uuid4().hex[:8]}"
        q = (
            sessionize_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_finished(q)
        got = {
            (r.user_id, r.n_events)
            for r in spark.table(name).collect()
        }
        assert (1, 2) in got, got
