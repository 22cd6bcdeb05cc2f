r"""Iterative graph analytics on DataFrames: PageRank and multi-source BFS.

Complements the iterative label-propagation connected components in
functions/dedup.py (near-dup clusters) with the other canonical
fixed-point graph workload.  The graph is derived from the TPC-H-ish
fixture: supplier co-purchase edges (two suppliers that appear in the
same order), the same within-order self-join shape q_market_basket
mines — quadratic only inside one order (~4 line items), never across
the table.

**Integer-exact iteration.**  Float PageRank cannot hash-match across
engines: each power-iteration sums contributions in nondeterministic
order and three iterations amplify last-ulp drift past any safe
rounding.  Here ranks are bigints scaled by 1e9 and every step is
integer arithmetic — ``contrib = r div out_degree``, ``r' =
(15*SCALE) div 100 + (85*sum) div 100`` — so the fixed point is
bit-identical in any engine and the query is fully hash-checkable.
(Same determinism-by-integers move as the LSH signatures and the
rolling z-score stats.)

Scale (100 TB orders): edge derivation is one order-keyed equi
self-join (AQE-skew-safe), degree one aggregate; each iteration is an
equi-join on src + an aggregate on dst — two key-partitioned shuffles
per iteration, the textbook Pregel-on-MapReduce layout.  For deep
iteration counts you'd localCheckpoint per round to cut plan depth
(as near_dup_clusters does); 3 unrolled rounds stay well inside
codegen limits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

PR_SCALE = 1_000_000_000  # rank fixed-point scale (1e9)
PR_ITERS = 3
PR_BASE = (15 * PR_SCALE) // 100  # (1 - damping) * SCALE, damping = 0.85


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Directed supplier co-purchase edges (src, dst), symmetric by
    construction: s1->s2 and s2->s1 whenever both supplied one order."""
    li = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).distinct()
    return (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.sk") != F.col("b.sk")),
        )
        .select(F.col("a.sk").alias("src"), F.col("b.sk").alias("dst"))
        .distinct()
    )


def pagerank(nodes: DataFrame, edges: DataFrame, n_iter: int = PR_ITERS) -> DataFrame:
    """Integer fixed-point PageRank: ``nodes`` (node), ``edges``
    (src, dst).  Returns (node, rank_i) with rank_i on the 1e9 scale.
    Nodes without in-edges settle at the base rank; out-degree-0 nodes
    simply leak (standard simplified treatment, identical on both
    engines)."""
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("bigint").alias("r"))
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("r div d").alias("c"))
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(PR_BASE).cast("bigint")
                    + F.expr("85 * coalesce(s, 0L) div 100")
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_i"))


def _pagerank_oracle() -> str:
    iters = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
        SELECT n.node,
               CAST({PR_BASE} + (85 * COALESCE(SUM(r.r // d.d), 0)) // 100
                    AS BIGINT) AS r
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN {prev} r ON r.node = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY n.node
    )"""
        )
        prev = f"r{i}"
    iter_sql = ",\n    ".join(iters)
    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
    edges AS (
        SELECT DISTINCT a.sk AS src, b.sk AS dst
        FROM li a JOIN li b ON a.ok = b.ok AND a.sk != b.sk
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT s_suppkey AS node FROM supplier),
    r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
    {iter_sql}
    SELECT node, r AS rank_i FROM {prev}
    """


@query("q_pagerank", oracle=_pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier authority via {PR_ITERS}-round integer PageRank over the
    co-purchase graph — bit-exact fixed-point arithmetic (1e9 scale,
    damping 0.85), hash-checked against the unrolled SQL iteration."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    nodes = s.select(F.col("s_suppkey").alias("node"))
    return pagerank(nodes, copurchase_edges(li))


BFS_ROUNDS = 3
BFS_SEED_MOD = 50  # suppkey % 50 == 0 are the seed nodes
BFS_INF = 999  # unreached sentinel (hash-stable vs NULL-vs-NaN canon)


def bfs_hops(nodes: DataFrame, edges: DataFrame, seeds: DataFrame, n_iter: int = BFS_ROUNDS) -> DataFrame:
    """Multi-source BFS: minimum hop count from any seed, capped at
    ``n_iter`` rounds (unreached nodes report BFS_INF).  Pure integer
    min-propagation — one src-keyed join + one dst-keyed min aggregate
    per round, the same Pregel shuffle layout as pagerank()."""
    dist = nodes.join(seeds.withColumn("__s", F.lit(0)), "node", "left").select(
        "node", F.coalesce("__s", F.lit(BFS_INF)).cast("int").alias("dist")
    )
    for _ in range(n_iter):
        relaxed = (
            edges.join(dist.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("cand"))
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        dist = dist.join(relaxed, "node", "left").select(
            "node",
            F.least(F.col("dist"), F.coalesce("cand", F.lit(BFS_INF))).cast("int").alias("dist"),
        )
    return dist


def _bfs_oracle() -> str:
    iters = []
    prev = "d0"
    for i in range(1, BFS_ROUNDS + 1):
        iters.append(
            f"""d{i} AS (
        SELECT d.node,
               CAST(LEAST(d.dist,
                          COALESCE(MIN(p.dist + 1), {BFS_INF})) AS INT) AS dist
        FROM {prev} d
        LEFT JOIN edges e ON e.dst = d.node
        LEFT JOIN {prev} p ON p.node = e.src
        GROUP BY d.node, d.dist
    )"""
        )
        prev = f"d{i}"
    iter_sql = ",\n    ".join(iters)
    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
    edges AS (
        SELECT DISTINCT a.sk AS src, b.sk AS dst
        FROM li a JOIN li b ON a.ok = b.ok AND a.sk != b.sk
    ),
    nodes AS (SELECT s_suppkey AS node FROM supplier),
    d0 AS (
        SELECT node,
               CAST(CASE WHEN node % {BFS_SEED_MOD} = 0 THEN 0
                         ELSE {BFS_INF} END AS INT) AS dist
        FROM nodes
    ),
    {iter_sql}
    SELECT node, dist FROM {prev}
    """


@query("q_bfs_hops", oracle=_bfs_oracle())
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the supplier co-purchase graph: hop
    distance from the seed set (suppkey % {BFS_SEED_MOD} == 0), capped
    at {BFS_ROUNDS} rounds — integer min-propagation, hash-checked
    against the unrolled SQL iteration."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    nodes = s.select(F.col("s_suppkey").alias("node"))
    seeds = nodes.filter(F.col("node") % BFS_SEED_MOD == 0)
    return bfs_hops(nodes, copurchase_edges(li), seeds)
