"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full compute, no
driver collect, no disk write) after a warm-up of the session itself.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pypeline_spark.registry import load_all
from pypeline_spark.session import get_spark

HEADLINE = [
    "q_agg_pricing",     # TPC-H Q1: wide aggregate scan
    "q_filter_project",  # pushdown-heavy selective scan
    "q_join_multi",      # 5-table star join
    "q_window_topn",     # partitioned window
    "q_topk",            # global top-k
    "q_range_join",      # interval self-join
    "q_session",         # session windows
    "q_dedup_minhash",   # MinHash-LSH near-dup pipeline
    "q_topk_cosine",     # brute-force vector top-k
    "q_text_stats",      # per-doc text analysis
    "q_pipeline_etl",    # Layer A end-to-end pipeline
    "q_sample_hash",     # deterministic hash sampling
    "q_agg_salted",      # two-phase salted aggregation
    "q_stream_enrich",   # broadcast fact-dim enrichment
    "q_sessionize_pandas",  # applyInPandas custom operator
    "q_corpus_pipeline",  # composed corpus-cleaning pipeline
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Ambient host load BEFORE Spark spins up: sampled at the end it
    # would mostly measure the bench's own executors.  Recorded in the
    # output line for adjudicating run-to-run deltas — concurrent load
    # inflates totals ~10-25% uniformly (the recurring noise signature
    # in SCALE.md), so a reader can separate host noise from a real
    # regression without needing a separate idle replay.
    try:
        ambient_load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        ambient_load = None
    cases = load_all()
    spark = get_spark("pypeline_spark_bench")
    # The localCheckpoint-backed queries emit benign "Failed to update
    # accumulator" DAGScheduler ERRORs when the ContextCleaner collects
    # checkpoint blocks between timed runs (eager checkpoints would
    # silence them but cost ~50% extra wall-clock: the materialization
    # stops pipelining into the consuming job).  Real failures still
    # surface as exceptions / rc != 0, so drop that one logger's noise.
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.scheduler.DAGScheduler",
        jvm.org.apache.logging.log4j.Level.FATAL,
    )
    # Warm-up: JVM + whole-stage codegen + parquet reader + noop sink,
    # using the smallest SF so warm-up cost is negligible.  Timings
    # below then measure engine steady-state, not first-query JIT.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            cases[name].builder(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    # Steady-state timing: each query runs N times (default 3), the
    # minimum is reported — one run can absorb a GC pause, a codegen
    # compile for a plan shape the warm-up didn't cover, or a transient
    # host-contention window (observed: identical code measuring 12s vs
    # 22s total across runs minutes apart on a busy hypervisor).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        builder = cases[name].builder
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            df = builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if ambient_load is not None:
        out["load_avg_start"] = ambient_load
    print(json.dumps(out))


if __name__ == "__main__":
    main()
