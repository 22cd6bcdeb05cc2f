"""Run the corpus-cleaning path end to end on the fixtures.

    python examples/clean_corpus.py [sf_dir]

The LLM-data composition (the north-star extension on top of the
reference's ETL surface): quality + language gates -> exact dedup ->
MinHash-LSH near-dup removal -> near-dup cluster assignment ->
reproducible train-shard layout, printed as per-stage counts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pypeline_spark.functions.corpus import clean_corpus
from pypeline_spark.functions.dedup import (
    candidate_pairs,
    doc_shingle_arrays,
    jaccard_from_arrays,
    lsh_bands,
    minhash_signature,
    near_dup_clusters,
)
from pypeline_spark.functions.export import train_shards
from pypeline_spark.session import get_spark, load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example_corpus")
    docs = load_table(spark, sf_dir, "documents")
    print(f"raw docs:       {docs.count()}")

    cleaned = clean_corpus(docs)
    print(f"cleaned docs:   {cleaned.count()} (quality+lang gates, exact+near dedup)")

    arrs = doc_shingle_arrays(docs).localCheckpoint(eager=False)
    pairs = jaccard_from_arrays(
        candidate_pairs(lsh_bands(minhash_signature(docs, arrs=arrs))), arrs
    ).filter(F.col("jaccard") >= 0.5)
    clusters = near_dup_clusters(pairs, docs.select("doc_id"))
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(f"dup clusters:   {n_clusters} over {docs.count()} docs")

    shards = train_shards(cleaned)
    layout = shards.groupBy("shard").count().orderBy("shard").collect()
    print("shard layout:  ", {r.shard: r["count"] for r in layout})
    spark.stop()


if __name__ == "__main__":
    main()
