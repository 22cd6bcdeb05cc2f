"""Streaming CEP parity: the per-user pattern automaton, run across
real micro-batches (state carrying an in-flight candidate over batch
boundaries), must emit exactly the matches the batch window
formulation (oracle-checked q_pattern_var) finds."""

from pypeline_spark.registry import load_all
from pypeline_spark.streaming.cep import run_pattern_stream


def test_stream_matches_equal_batch_pattern(spark, sf_dir):
    streamed = {
        (r.user_id, r.view_id, r.purchase_id, r.n_clicks)
        for r in run_pattern_stream(spark, sf_dir, n_batches=3).collect()
    }
    batch = {
        (r.user_id, r.view_id, r.purchase_id, r.n_clicks)
        for r in load_all()["q_pattern_var"].builder(spark, sf_dir).collect()
    }
    assert streamed == batch
    assert len(batch) > 20  # non-degenerate (50 at the sf0.001 fixture)


def test_candidate_state_crosses_batch_boundary(spark, tmp_path):
    """A view in batch 1 completing with a purchase in batch 3 (clicks
    in batch 2) can only match if the candidate survived TWO
    boundaries."""
    import pandas as pd

    from pypeline_spark.streaming import await_finished
    from pypeline_spark.streaming.cep import pattern_stream

    base = pd.Timestamp("2024-01-01")

    def ts(m):
        return (base + pd.Timedelta(minutes=m)).to_pydatetime()

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, ts(0), 10, "view")], "user_id long, ts timestamp, event_id long, event_type string"
    ).coalesce(1).write.parquet(src + "/f=1")
    spark.createDataFrame(
        [(1, ts(1), 11, "click"), (1, ts(2), 12, "click")],
        "user_id long, ts timestamp, event_id long, event_type string",
    ).coalesce(1).write.parquet(src + "/f=2")
    spark.createDataFrame(
        [(1, ts(3), 13, "purchase")],
        "user_id long, ts timestamp, event_id long, event_type string",
    ).coalesce(1).write.parquet(src + "/f=3")
    schema = spark.read.parquet(src + "/f=1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/f=*")
    )
    import uuid as _uuid

    name = f"cepx_{_uuid.uuid4().hex[:8]}"
    q = (
        pattern_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    got = [
        (r.user_id, r.view_id, r.purchase_id, r.n_clicks)
        for r in spark.table(name).collect()
    ]
    assert got == [(1, 10, 13, 2)]
