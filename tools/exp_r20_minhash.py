"""r20 A/B: r19 shingle-array checkpoint shape (inlined below) vs the
wide (sh + signature) checkpoint relation now in the registry, for
q_dedup_minhash and q_corpus_pipeline.

Usage: python tools/exp_r20_minhash.py [n] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pypeline_spark.session import get_spark, load_table
from pypeline_spark.registry import load_all
from pypeline_spark.functions.dedup import (
    JACCARD_THRESHOLD,
    candidate_pairs,
    doc_shingle_arrays,
    jaccard_from_arrays,
    lsh_bands,
    minhash_signature,
)
from pypeline_spark.functions.text import tokens


def old_minhash(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    arrs = doc_shingle_arrays(d).localCheckpoint(eager=False)
    sigs = minhash_signature(d, arrs=arrs)
    pairs = candidate_pairs(lsh_bands(sigs))
    return jaccard_from_arrays(pairs, arrs).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


def old_corpus(spark, sf_dir):
    from pyspark.sql import Window as W

    MIN_TOKENS, MAX_TOKENS = 20, 1000
    KEEP_LANGS = ("en", "es")
    d = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text")))
    kept = d.filter(
        F.col("lang").isin(*KEEP_LANGS) & n_toks.between(MIN_TOKENS, MAX_TOKENS)
    ).select("doc_id", "lang", "text", n_toks.alias("n_toks"))
    fp = kept.withColumn("f", F.md5(F.lower(F.trim(F.col("text")))))
    deduped = (
        fp.withColumn(
            "__rn", F.row_number().over(W.partitionBy("f").orderBy("doc_id"))
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn", "f")
        .localCheckpoint(eager=False)
    )
    arrs = doc_shingle_arrays(deduped).localCheckpoint(eager=False)
    sigs = minhash_signature(deduped, arrs=arrs)
    pairs = candidate_pairs(lsh_bands(sigs))
    verified = jaccard_from_arrays(pairs, arrs).filter(F.col("jaccard") >= 0.5)
    dupes = verified.select(F.col("id_b").alias("doc_id")).distinct()
    cleaned = deduped.join(dupes, "doc_id", "left_anti")
    return cleaned.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("exp_r20_minhash")
    cases = load_all()
    pairs = [
        ("minhash", old_minhash, cases["q_dedup_minhash"].builder),
        ("corpus", old_corpus, cases["q_corpus_pipeline"].builder),
    ]
    for label, old, new in pairs:
        a = sorted(map(tuple, old(spark, sf_dir).collect()))
        b = sorted(map(tuple, new(spark, sf_dir).collect()))
        print(f"{label}: identical={a == b} ({len(a)} rows)")
    for label, old, new in pairs:
        to, tn = [], []
        for _ in range(n):
            t0 = time.perf_counter()
            old(spark, sf_dir).write.format("noop").mode("overwrite").save()
            to.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            new(spark, sf_dir).write.format("noop").mode("overwrite").save()
            tn.append(time.perf_counter() - t0)
        to.sort(); tn.sort()
        wins = sum(1 for x, y in zip(sorted(to), sorted(tn)) if y < x)
        print(
            f"{label}: old min={to[0]:.3f} med={to[n//2]:.3f} | "
            f"new min={tn[0]:.3f} med={tn[n//2]:.3f} | "
            f"speedup med={to[n//2]/tn[n//2]:.2f} | "
            f"old={[round(t,3) for t in to]} new={[round(t,3) for t in tn]}"
        )


if __name__ == "__main__":
    main()
