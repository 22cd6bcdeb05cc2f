"""Invariants for the retrieval / inference / tokenizer tier beyond
the oracle hash: BM25 scoring properties, mapInPandas-vs-JVM parity
for the inference probe, BPE merge accounting."""

from pyspark.sql import functions as F

from pypeline_spark.functions.chunking import BPE_MERGES, q_bpe_apply
from pypeline_spark.functions.inference import (
    INF_SCALE,
    _probe_weights,
    q_batch_inference,
)
from pypeline_spark.functions.ir import BM25_TERMS, BM25_TOP, q_bm25
from pypeline_spark.session import load_table

SF = "/root/testdata/sf0.001"


class TestBm25:
    def test_topk_size_and_order(self, spark):
        rows = q_bm25(spark, SF).collect()
        assert 0 < len(rows) <= BM25_TOP
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))

    def test_every_hit_contains_a_query_term(self, spark):
        hits = {r.doc_id for r in q_bm25(spark, SF).collect()}
        d = load_table(spark, SF, "documents")
        with_term = {
            r.doc_id
            for r in d.filter(
                F.lower(F.col("text")).rlike("|".join(BM25_TERMS))
            ).collect()
        }
        assert hits <= with_term


class TestInferenceParity:
    def test_mapinpandas_matches_jvm_expression(self, spark):
        """The Arrow-batched numpy probe and a pure-Catalyst zip_with
        aggregate must produce IDENTICAL bigint logits — pinning that
        the Python boundary adds no numeric drift."""
        e = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
        got = {r.vec_id: (r.logit, r.pred) for r in q_batch_inference(spark, SF).collect()}
        w = F.array(*[F.lit(v) for v in _probe_weights()])
        jvm = e.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    w,
                    lambda x, y: F.floor(x.cast("double") * INF_SCALE).cast("bigint")
                    * y.cast("bigint"),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("logit"),
        )
        want = {r.vec_id: (r.logit, r.logit >= 0) for r in jvm.collect()}
        assert got == want


class TestBpeApply:
    def test_token_accounting(self, spark):
        rows = q_bpe_apply(spark, SF).collect()
        assert rows
        for r in rows:
            # merges only ever shrink the symbol count, never below 1
            # per word, and chars are conserved
            assert 0 < r.n_bpe_tokens <= r.n_chars
            assert r.chars_per_token >= 1.0

    def test_merges_actually_fire(self, spark):
        """At least one document must compress (chars_per_token > 1),
        otherwise the merge table is dead weight against this corpus."""
        assert (
            q_bpe_apply(spark, SF).filter(F.col("n_bpe_tokens") < F.col("n_chars")).count()
            > 0
        )
        assert len(BPE_MERGES) >= 4
