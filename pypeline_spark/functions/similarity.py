"""Vector similarity search over embedding columns (array<float>).

Two tiers, mirroring how ANN systems are actually deployed:

- brute force (q_topk_cosine): broadcast the query set, score every
  (query, candidate) pair with a JVM-side zip_with/aggregate dot
  product, take top-k per query via a window.  Exact; cost is
  |queries| x |corpus| — the correctness baseline and perfectly fine
  when the query set is small and broadcastable.
- IVF-style bucketed search (q_knn_ivf): partition the corpus by
  nearest "centroid" (deterministic seed vectors here, k-means in a
  real deployment), probe only the closest nprobe cells per query.
  Scales as |queries| x |corpus| x (nprobe / n_cells) with a recall
  tradeoff measured in tests against the brute-force baseline.

All arithmetic is double-precision, element order fixed, so results
are engine-portable; ties broken by vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

N_QUERIES = 10  # vec_id < 10 are the query vectors in fixture queries
TOP_K = 5
N_CELLS = 16  # IVF cells (centroid count)
N_PROBE = 4


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product (JVM, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = TOP_K,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "q_vec",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (broadcast cross-score).

    Rank on similarity rounded to 6 places with id tie-break so the
    result set is deterministic under float-summation differences.
    """
    par = corpus.sparkSession.sparkContext.defaultParallelism
    scored = corpus.repartition(par, F.col(c_id)).crossJoin(F.broadcast(queries)).select(
        F.col(q_id),
        F.col(c_id),
        F.round(cosine(F.col(q_vec), F.col(c_vec)), 6).alias("sim"),
    )
    scored = scored.filter(F.col(q_id) != F.col(c_id))
    w = W.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "sim", "rank")
    )


_COSINE_SQL = """
    list_dot_product(
        list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
        list_transform(c.embedding, x -> CAST(x AS DOUBLE)))
    / (sqrt(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                             list_transform(q.embedding, x -> CAST(x AS DOUBLE)))) *
       sqrt(list_dot_product(list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
                             list_transform(c.embedding, x -> CAST(x AS DOUBLE)))))
"""


@query(
    "q_topk_cosine",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
               ROUND({_COSINE_SQL}, 6) AS sim
        FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERIES}
         AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT q_id, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
        FROM scored
    )
    SELECT CAST(q_id AS BIGINT) AS q_id, vec_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 cosine neighbors for query vectors 0-9."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = brute_force_topk(queries, e.select("vec_id", "embedding"))
    return out.select(
        F.col("q_id").cast("bigint").alias("q_id"),
        "vec_id",
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


def assign_cells(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each vector to its max-cosine centroid (IVF build side).

    One broadcast join + window argmin — linear in corpus size; the
    result is the partition (cell) layout the probe side prunes on.
    """
    par = corpus.sparkSession.sparkContext.defaultParallelism
    scored = corpus.repartition(par, "vec_id").crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "embedding",
        F.col("cell_id"),
        cosine(F.col("embedding"), F.col("centroid")).alias("c_sim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("c_sim").desc(), F.col("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell_id")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = TOP_K,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """Probe the n_probe best cells per query, exact-score only those.

    The join is equi on cell_id: Catalyst shuffles the (small) probe
    set, the corpus side is hash-partitioned by cell — at 100 TB the
    corpus would be *stored* partitioned by cell_id so probes prune
    files, the moral equivalent of an IVF index.
    """
    cells = assign_cells(corpus, centroids)
    q_cells = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "q_id",
            "q_vec",
            "cell_id",
            cosine(F.col("q_vec"), F.col("centroid")).alias("c_sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(F.col("c_sim").desc(), F.col("cell_id"))
            ),
        )
        .filter(F.col("rn") <= n_probe)
        .select("q_id", "q_vec", "cell_id")
    )
    scored = q_cells.join(cells, "cell_id").filter(F.col("q_id") != F.col("vec_id")).select(
        "q_id",
        "vec_id",
        F.round(cosine(F.col("q_vec"), F.col("embedding")), 6).alias("sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "sim", "rank")
    )


@query("q_knn_ivf", oracle=None)  # approximate: graded by recall tests
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: centroids are the vectors with vec_id % 32 == 1
    (deterministic stand-ins for k-means centers), 4-probe search."""
    e = load_table(spark, sf_dir, "embeddings")
    centroids = (
        e.filter(F.col("vec_id") % 32 == 1)
        .limit(N_CELLS)
        .select(F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid"))
    )
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_topk(queries, e.select("vec_id", "embedding"), centroids)


DEDUP_SIM_THRESHOLD = 0.4  # fixture embeddings are near-random (max pair
# sim ~0.51), so a production-style 0.95 threshold would make the check
# trivially empty; 0.4 yields a real, non-empty pair set at every SF.


@query(
    "q_dedup_embedding",
    oracle=f"""
    SELECT q.vec_id AS id_a, c.vec_id AS id_b,
           ROUND({_COSINE_SQL}, 6) AS sim
    FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
    WHERE {_COSINE_SQL} >= {DEDUP_SIM_THRESHOLD}
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim >= threshold).

    Correctness baseline is the all-pairs form shown here; at corpus
    scale the same threshold runs over IVF cells (ivf_topk) so only
    same-cell/neighbor-cell pairs are scored.  The fixture corpus is
    small enough that the exact form is also the oracle.
    """
    e = load_table(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    # the pair expansion is quadratic in the cell — spread the stream
    # side so each core scores a slice of the (a, b) grid
    a = e.repartition(par, "vec_id").select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a")
    )
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("vec_a"), F.col("vec_b"))
    return (
        pairs.select("id_a", "id_b", sim.alias("sim_raw"))
        .filter(F.col("sim_raw") >= DEDUP_SIM_THRESHOLD)
        .select("id_a", "id_b", F.round("sim_raw", 6).alias("sim"))
    )


@query(
    "q_embedding_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           ROUND(AVG(sqrt(list_dot_product(
               list_transform(embedding, x -> CAST(x AS DOUBLE)),
               list_transform(embedding, x -> CAST(x AS DOUBLE))))), 4) AS avg_norm,
           CAST(MIN(len(embedding)) AS INT) AS min_dim,
           CAST(MAX(len(embedding)) AS INT) AS max_dim
    FROM embeddings GROUP BY label
    """,
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column hygiene stats: dim consistency, norm per label."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(norm(F.col("embedding"))), 4).alias("avg_norm"),
        F.min(F.size("embedding")).cast("int").alias("min_dim"),
        F.max(F.size("embedding")).cast("int").alias("max_dim"),
    )
