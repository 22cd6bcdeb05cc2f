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
