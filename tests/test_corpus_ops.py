"""Semantics of the round-5 corpus/stats operators beyond the oracle
hash: determinism under physical layout, permutation validity, epoch
decorrelation, clip-bound containment, and containment-vs-Jaccard
ordering."""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.registry import load_all


@pytest.fixture(scope="module")
def cases():
    return load_all()


class TestDomainCap:
    def test_kept_set_is_layout_independent(self, spark, sf_dir, cases):
        """The kept subset is a pure function of (source, doc_id) —
        identical under any physical partitioning."""
        a = cases["q_domain_cap"].builder(spark, sf_dir)
        b = a.repartition(7)
        rows = lambda df: sorted(  # noqa: E731
            (r.doc_id, r.source, r.rk, r.kept) for r in df.collect()
        )
        assert rows(a) == rows(b)

    def test_cap_is_exact_per_domain(self, spark, sf_dir, cases):
        from pypeline_spark.functions.export import DOMAIN_CAP

        out = cases["q_domain_cap"].builder(spark, sf_dir)
        per = (
            out.groupBy("source")
            .agg(
                F.sum("kept").alias("n_kept"),
                F.count("*").alias("n_docs"),
            )
            .collect()
        )
        for r in per:
            assert r.n_kept == min(DOMAIN_CAP, r.n_docs), r.source


class TestEpochShuffle:
    def test_positions_are_a_permutation_per_epoch_shard(self, spark, sf_dir, cases):
        out = cases["q_epoch_shuffle"].builder(spark, sf_dir)
        bad = (
            out.groupBy("epoch", "shard")
            .agg(
                F.count("*").alias("n"),
                F.min("pos").alias("lo"),
                F.max("pos").alias("hi"),
                F.countDistinct("pos").alias("d"),
            )
            .filter((F.col("lo") != 1) | (F.col("hi") != F.col("n")) | (F.col("d") != F.col("n")))
            .count()
        )
        assert bad == 0

    def test_epochs_are_decorrelated(self, spark, sf_dir, cases):
        """Different epochs must lay the corpus out differently: a
        substantial fraction of docs change (shard, pos) between
        epoch 0 and epoch 1."""
        out = cases["q_epoch_shuffle"].builder(spark, sf_dir)
        e0 = out.filter("epoch = 0").select("doc_id", "shard", "pos")
        e1 = out.filter("epoch = 1").select(
            "doc_id",
            F.col("shard").alias("s1"),
            F.col("pos").alias("p1"),
        )
        j = e0.join(e1, "doc_id")
        moved = j.filter(
            (F.col("shard") != F.col("s1")) | (F.col("pos") != F.col("p1"))
        ).count()
        total = j.count()
        assert moved > 0.5 * total, f"only {moved}/{total} docs moved between epochs"


class TestWinsorize:
    def test_winsorized_mean_sits_inside_clip_bounds(self, spark, sf_dir, cases):
        from pypeline_spark.session import load_table

        out = {r.c_mktsegment: r for r in cases["q_winsorize"].builder(spark, sf_dir).collect()}
        bounds = {
            r.c_mktsegment: (r.lo, r.hi)
            for r in load_table(spark, sf_dir, "customer")
            .groupBy("c_mktsegment")
            .agg(
                F.expr("percentile(c_acctbal, 0.05)").alias("lo"),
                F.expr("percentile(c_acctbal, 0.95)").alias("hi"),
            )
            .collect()
        }
        for seg, r in out.items():
            lo, hi = bounds[seg]
            mean = r.wins_cents / r.n / 100.0
            assert lo - 0.01 <= mean <= hi + 0.01, (seg, mean, lo, hi)


class TestCoverage:
    def test_head_docs_valid_and_no_larger_than_total(self, spark, sf_dir, cases):
        for r in cases["q_coverage_topk"].builder(spark, sf_dir).collect():
            assert 1 <= r.head_docs <= r.n_docs, tuple(r)


class TestContainment:
    def test_containment_dominates_jaccard_on_shared_pairs(self, spark, sf_dir, cases):
        """For any pair, containment (min-denominator) >= Jaccard
        (union-denominator) — cross-checks the two scorers against
        each other on the pairs both report."""
        cont = cases["q_containment"].builder(spark, sf_dir)
        jac = cases["q_dedup_minhash"].builder(spark, sf_dir)
        j = cont.join(jac, ["id_a", "id_b"])
        bad = j.filter(F.col("containment") < F.col("jaccard") - 1e-4).count()
        assert bad == 0
