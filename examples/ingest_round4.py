"""Round-4 ingestion tour: dedup-gated pipeline ingest, repeated-span
boilerplate signals, payload pHash near-dups, temperature mixture, and
the streaming Count-Min sketch.

    python examples/ingest_round4.py [sf_dir]

Each stage prints a one-line summary; everything here is the same code
path the registered queries run (and the driver hash-checks).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pypeline_spark.pipeline.queries import _DEDUP_CONFIG
from pypeline_spark.pipeline.runner import Pypeline
from pypeline_spark.pipeline.spec import PipelineConfig
from pypeline_spark.registry import load_all
from pypeline_spark.session import get_spark, register_tables
from pypeline_spark.streaming.sketch import run_cms_stream


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ingest_round4")
    cases = load_all()

    # 1. dedup-gated ingest as a declarative pipeline step
    register_tables(spark, sf_dir)
    pipe = Pypeline(spark, PipelineConfig.from_dict(_DEDUP_CONFIG))
    pipe.run("corpus_ingest")
    corpus = pipe.catalog.get("corpus")
    print(f"dedup-gated ingest: corpus={corpus.count()} rows")

    # 2. repeated-span boilerplate share (the doc-level trim signal)
    share = cases["q_span_dup_share"].builder(spark, sf_dir)
    flagged = share.filter(F.col("dup_bp") > 2000).count()
    print(f"span dup share: {flagged} docs exceed 20% duplicated spans")

    # 3. payload pHash near-dups (the multimodal dedup tier)
    pairs = cases["q_image_phash"].builder(spark, sf_dir)
    print(f"payload pHash: {pairs.count()} near-dup pairs at hamming<=3")

    # 4. temperature mixture (tau=0.5 language rebalance)
    mix = cases["q_mixture_temperature"].builder(spark, sf_dir)
    kept = mix.groupBy("lang").count().orderBy("lang").collect()
    print("temperature mix kept/lang:", {r.lang: r["count"] for r in kept})

    # 5. streaming CMS heavy hitters across real micro-batches
    grid = run_cms_stream(spark, sf_dir, n_batches=3)
    print(f"streaming CMS: {grid.count()} live counter cells")
    top = cases["q_cms_users"].builder(spark, sf_dir)
    print("heavy hitters (true vs sketch):")
    for r in top.orderBy(F.col("true_cnt").desc()).limit(5).collect():
        print(f"  user {r.user_id}: true={r.true_cnt} cms={r.cms_cnt}")

    spark.stop()


if __name__ == "__main__":
    main()
