"""The round-4 tier end to end: keyword retrieval, semantic dedup,
batch inference, and graph analytics on the sf0.001 fixtures.

Run: python examples/corpus_search_graph.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pypeline_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pypeline_spark.functions.inference import q_batch_inference
    from pypeline_spark.functions.ir import q_bm25
    from pypeline_spark.functions.similarity import q_semantic_dedup
    from pypeline_spark.operators.graph import q_bfs_hops, q_pagerank

    spark = get_spark()

    print("== BM25 top hits for the probe query ==")
    q_bm25(spark, SF).show(5, truncate=False)

    print("== Semantic dedup decisions (dropped vectors) ==")
    sem = q_semantic_dedup(spark, SF)
    sem.filter("NOT keep").show(5)
    print("kept:", sem.filter("keep").count(), "of", sem.count())

    print("== Batch inference (integer probe) ==")
    q_batch_inference(spark, SF).show(5)

    print("== Supplier PageRank (top authorities) ==")
    q_pagerank(spark, SF).orderBy("rank_i", ascending=False).show(5)

    print("== BFS hops from the seed suppliers ==")
    q_bfs_hops(spark, SF).groupBy("dist").count().orderBy("dist").show()


if __name__ == "__main__":
    main()
