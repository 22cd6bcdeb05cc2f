"""Property tests for the iterative graph operators (operators/graph.py)
and the CDC log apply (sinks/history.py) — invariants the DuckDB oracle
hash can't express by itself."""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.operators.graph import (
    BFS_INF,
    PR_BASE,
    PR_SCALE,
    bfs_hops,
    copurchase_edges,
    pagerank,
    q_bfs_hops,
    q_pagerank,
)
from pypeline_spark.session import load_table
from pypeline_spark.sinks.history import cdc_apply

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def graph(spark):
    li = load_table(spark, SF, "lineitem")
    s = load_table(spark, SF, "supplier")
    nodes = s.select(F.col("s_suppkey").alias("node"))
    edges = copurchase_edges(li).localCheckpoint()
    return nodes, edges


class TestPagerank:
    def test_ranks_bounded_and_complete(self, spark, graph):
        nodes, edges = graph
        pr = pagerank(nodes, edges).collect()
        assert len(pr) == nodes.count()  # every node scored exactly once
        for row in pr:
            assert row.rank_i >= PR_BASE  # damping floor
            assert row.rank_i < 100 * PR_SCALE

    def test_isolated_node_sits_at_base(self, spark, graph):
        nodes, edges = graph
        connected = {r.src for r in edges.select("src").distinct().collect()}
        pr = {r.node: r.rank_i for r in pagerank(nodes, edges).collect()}
        isolated = [n for n in pr if n not in connected]
        # edges are symmetric, so src-coverage == dst-coverage; nodes
        # outside the graph receive no contributions at any iteration
        for n in isolated:
            assert pr[n] == PR_BASE

    def test_deterministic_across_runs(self, spark, graph):
        nodes, edges = graph
        a = sorted(map(tuple, pagerank(nodes, edges).collect()))
        b = sorted(map(tuple, pagerank(nodes, edges).collect()))
        assert a == b

    def test_high_degree_outranks_isolated(self, spark, graph):
        nodes, edges = graph
        indeg = {r.dst: r["count"] for r in edges.groupBy("dst").count().collect()}
        if not indeg:
            pytest.skip("fixture graph has no edges")
        hub = max(indeg, key=indeg.get)
        pr = {r.node: r.rank_i for r in pagerank(nodes, edges).collect()}
        assert pr[hub] > PR_BASE


class TestBfs:
    def test_seeds_zero_neighbors_one(self, spark, graph):
        nodes, edges = graph
        seeds = nodes.filter(F.col("node") % 10 == 0)
        dist = {r.node: r.dist for r in bfs_hops(nodes, edges, seeds).collect()}
        seed_ids = {r.node for r in seeds.collect()}
        for n in seed_ids:
            assert dist[n] == 0
        for r in edges.collect():
            if r.src in seed_ids and r.dst not in seed_ids:
                assert dist[r.dst] == 1

    def test_triangle_inequality_over_edges(self, spark, graph):
        """Adjacent nodes' hop counts differ by at most 1 (both finite)."""
        nodes, edges = graph
        seeds = nodes.filter(F.col("node") % 10 == 0)
        dist = {r.node: r.dist for r in bfs_hops(nodes, edges, seeds).collect()}
        for r in edges.collect():
            a, b = dist[r.src], dist[r.dst]
            if a < BFS_INF and b < BFS_INF:
                assert abs(a - b) <= 1


class TestCdcApply:
    def _fixtures(self, spark):
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
        )
        ops = spark.createDataFrame(
            [
                (1, 10, "upsert", "a2"),   # overwritten below by seq 20
                (1, 20, "delete", None),   # final: delete key 1
                (2, 5, "upsert", "b2"),    # final: update key 2
                (4, 7, "upsert", "d"),     # final: insert key 4
            ],
            "k int, seq int, op string, v string",
        )
        return base, ops

    def test_last_op_wins_regardless_of_arrival_order(self, spark):
        base, ops = self._fixtures(spark)
        out = {r.k: r.v for r in cdc_apply(base, ops, ["k"]).collect()}
        assert out == {2: "b2", 3: "c", 4: "d"}  # 1 deleted, 3 untouched
        shuffled = ops.orderBy(F.col("seq").desc())
        out2 = {r.k: r.v for r in cdc_apply(base, shuffled, ["k"]).collect()}
        assert out2 == out

    def test_idempotent_replay(self, spark):
        base, ops = self._fixtures(spark)
        once = cdc_apply(base, ops, ["k"])
        twice = cdc_apply(once, ops, ["k"])
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, twice.collect())
        )


def test_registered_queries_run(spark):
    assert q_pagerank(spark, SF).count() > 0
    assert q_bfs_hops(spark, SF).count() > 0
