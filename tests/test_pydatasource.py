"""Custom Python DataSource (Spark 4 API): JSONL shards round-trip
with per-file partition parallelism."""

import json
import os

from pyspark.sql import functions as F

from pypeline_spark.session import load_table
from pypeline_spark.sources.pydatasource import register

SF = "/root/testdata/sf0.001"


def _write_shards(spark, tmp_path, n_shards=4):
    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    rows = [r.asDict() for r in docs.collect()]
    d = tmp_path / "jsonl"
    d.mkdir()
    for i in range(n_shards):
        with open(d / f"shard-{i}.jsonl", "w", encoding="utf-8") as fh:
            for r in rows:
                if r["doc_id"] % n_shards == i:
                    fh.write(json.dumps(r) + "\n")
    return docs, str(d)


def test_jsonl_roundtrip_and_parallelism(spark, tmp_path):
    docs, path = _write_shards(spark, tmp_path)
    register(spark)
    got = (
        spark.read.format("pypeline_jsonl")
        .schema("doc_id bigint, text string, lang string")
        .load(path)
    )
    # one partition per shard file — the scale contract
    assert got.rdd.getNumPartitions() == 4
    want = sorted(tuple(r) for r in docs.collect())
    assert sorted(tuple(r) for r in got.collect()) == want


def test_filters_and_aggregates_compose(spark, tmp_path):
    _, path = _write_shards(spark, tmp_path)
    register(spark)
    got = (
        spark.read.format("pypeline_jsonl")
        .schema("doc_id bigint, text string, lang string")
        .load(path)
        .filter(F.col("lang") == "en")
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("s"))
        .collect()
    )
    want = (
        load_table(spark, SF, "documents")
        .filter(F.col("lang") == "en")
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("s"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stream_reader_tails_and_restarts_from_checkpoint(spark, tmp_path):
    """The streaming variant: an availableNow pass consumes the shards
    present, a restart on the same checkpoint after new shards land
    consumes ONLY those — the custom connector carries the same
    exactly-once file-offset contract as Spark's built-in file source."""
    docs, path = _write_shards(spark, tmp_path)
    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("pypeline_jsonl")
            .schema("doc_id bigint, text string, lang string")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()
    n_first = spark.read.parquet(out_dir).count()
    assert n_first == docs.count()

    # land a new shard while "down", restart the same checkpoint
    extra = [{"doc_id": 100000 + i, "text": f"late doc {i}", "lang": "en"} for i in range(7)]
    with open(os.path.join(path, "shard-9.jsonl"), "w", encoding="utf-8") as fh:
        for r in extra:
            fh.write(json.dumps(r) + "\n")
    run_once()

    got = spark.read.parquet(out_dir)
    assert got.count() == n_first + 7  # nothing replayed, nothing missed
    assert got.filter(F.col("doc_id") >= 100000).count() == 7
