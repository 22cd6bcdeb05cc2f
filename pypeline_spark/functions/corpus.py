r"""The north-star composition: an end-to-end training-corpus cleaning
pipeline — quality gate → language gate → exact dedup → near-dup
removal → per-language corpus stats — as one oracle-checked DataFrame
plan.

This is what the individual LLM-data operators exist *for*; composing
them proves the interfaces chain (each stage consumes the previous
stage's DataFrame, no materialization between stages needed — Catalyst
optimizes the whole chain as one plan).

Scale design per stage:
- quality + language gates: pure map-side filters, evaluated inside
  the scan stage before anything shuffles;
- exact dedup: one shuffle keyed by the 16-byte content digest
  (group-min keep policy — smallest doc_id survives);
- near-dup removal: the MinHash-LSH pair generator (functions/dedup.py:
  map-side signatures → band bucket join → candidate pairs →
  array_intersect verification ≥ t) — the genuine 100 TB path, and
  because the hash family is md5-derived it is deterministic, so the
  DuckDB oracle replays the *same* approximate decisions and the whole
  composed pipeline stays hash-checked (not merely rows-counted);
- drop policy: greedy keep-smallest — every pair's larger id is
  dropped (deterministic, one anti-join, no iterative clustering).
  Note the transitive-chain caveat: a~b, b~c drops b and c even when
  a!~c.  The cluster-correct policy (keep one per connected component)
  is `functions/dedup.py:near_dup_clusters` / q_dedup_clusters — use
  it when over-deletion matters more than plan simplicity;
- final stats: groupBy on lang, output cardinality = language count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.functions.dedup import (
    candidate_pairs,
    jaccard_from_arrays,
    lsh_bands,
    minhash_extend,
)
from pypeline_spark.functions.text import tokens
from pypeline_spark.registry import query
from pypeline_spark.session import load_table

MIN_TOKENS, MAX_TOKENS = 20, 1000
KEEP_LANGS = ("en", "es")
NEAR_DUP_THRESHOLD = 0.5


def clean_corpus(docs: DataFrame, carry_tokens: bool = False) -> DataFrame:
    """documents -> cleaned documents (doc_id, lang, text).

    ``carry_tokens=True`` appends the quality gate's token count as an
    ``n_toks`` column so downstream aggregates can reuse it instead of
    re-running the regex tokenizer over every surviving document
    (guide §1.2: don't recompute what a prior stage already paid for).

    PRECONDITION: ``doc_id`` must be unique in ``docs`` (the fixture
    table contract).  The exact-dedup step keeps the row_number-1 row
    per (fingerprint, doc_id) order; with duplicate doc_ids the choice
    among rows tying on doc_id (same normalized fingerprint, possibly
    different raw text/lang) would be nondeterministic, where the old
    semi-join formulation kept every tying row (ADVICE r19).
    """
    n_toks = F.size(tokens(F.col("text")))
    carried = [n_toks.alias("n_toks")] if carry_tokens else []
    kept = docs.filter(
        F.col("lang").isin(*KEEP_LANGS) & n_toks.between(MIN_TOKENS, MAX_TOKENS)
    ).select("doc_id", "lang", "text", *carried)

    # exact dedup: keep the smallest doc_id per content fingerprint,
    # via row_number over the fingerprint partition.  One shuffle like
    # the groupBy(min)+semi-join formulation it replaces, but the
    # gate+fingerprint subtree (regex tokenize + md5 over every doc) is
    # evaluated ONCE instead of twice — the semi-join's build and probe
    # sides each recomputed it (r19 interleaved A/B: 1.15-1.2x on
    # q_corpus_pipeline).
    from pyspark.sql import Window as W

    fp = kept.withColumn("f", F.md5(F.lower(F.trim(F.col("text")))))
    deduped = (
        fp.withColumn(
            "__rn", F.row_number().over(W.partitionBy("f").orderBy("doc_id"))
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn", "f")
    )

    # near-dup removal: MinHash-LSH candidates verified by exact
    # Jaccard >= threshold, greedy keep-smallest (drop every pair's
    # id_b).  ONE wide checkpointed relation (the deduped survivors
    # PLUS their shingle arrays and signature columns, r20) feeds the
    # band chain, both verification sides AND the final survivor
    # stream — one materialization instead of the previous two
    # (deduped, then arrays), with the shingle/signature compute
    # pipelined into the fingerprint window's output stage (no extra
    # exchange; the >=20-token quality gate guarantees every doc
    # shingles).  localCheckpoint (not .cache()): no session-global
    # cache state, blocks are GC-scoped to this plan.
    from pypeline_spark.functions.dedup import MINHASH_COLS

    Y = minhash_extend(deduped).localCheckpoint(eager=False)
    pairs = candidate_pairs(lsh_bands(Y))
    verified = jaccard_from_arrays(pairs, Y).filter(
        F.col("jaccard") >= NEAR_DUP_THRESHOLD
    )
    dupes = verified.select(F.col("id_b").alias("doc_id")).distinct()
    return Y.drop(*MINHASH_COLS).join(dupes, "doc_id", "left_anti")


@query(
    "q_corpus_pipeline",
    oracle=r"""
    WITH kept AS (
        SELECT doc_id, lang, text FROM documents
        WHERE lang IN ('en', 'es')
          AND len(string_split_regex(trim(text), '\s+')) BETWEEN 20 AND 1000
    ),
    fp AS (SELECT doc_id, lang, text, md5(lower(trim(text))) AS f FROM kept),
    deduped AS (
        SELECT p.doc_id, p.lang, p.text
        FROM fp p JOIN (SELECT f, MIN(doc_id) AS doc_id FROM fp GROUP BY f) g
          ON p.f = g.f AND p.doc_id = g.doc_id
    ),
    toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM deduped
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - 2),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    base AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS h
        FROM sh
    ),
    seeds AS (
        SELECT unnest(range(12)) AS seed,
               unnest([2,3,5,7,11,13,17,19,23,29,31,37]) AS a,
               unnest([41,43,47,53,59,61,67,71,73,79,83,89]) AS b
    ),
    mh AS (
        SELECT base.doc_id, s.seed, MIN((s.a * base.h + s.b) % 2147483647) AS h
        FROM base CROSS JOIN seeds s
        GROUP BY base.doc_id, s.seed
    ),
    bands AS (
        SELECT doc_id, seed // 3 AS band,
               string_agg(CAST(h AS VARCHAR), '_' ORDER BY seed) AS band_key
        FROM mh GROUP BY doc_id, seed // 3
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        JOIN cand c ON c.id_a = a.doc_id AND c.id_b = b.doc_id
        GROUP BY 1, 2
    ),
    dupes AS (
        SELECT DISTINCT id_b
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    ),
    final AS (
        SELECT * FROM deduped WHERE doc_id NOT IN (SELECT id_b FROM dupes)
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
               AS total_tokens
    FROM final GROUP BY lang
    """,
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full corpus-cleaning pipeline, per-language output stats.

    The final rollup sums the token counts CARRIED from the quality
    gate (``carry_tokens``) rather than re-tokenizing every surviving
    document in the last job — one fewer full regex pass over the
    corpus text, same declared result.
    """
    d = load_table(spark, sf_dir, "documents")
    cleaned = clean_corpus(d, carry_tokens=True)
    return cleaned.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
    )


HEAD_COVERAGE_BP = 5000  # head set must cover >= 50% of domain chars


@query(
    "q_coverage_topk",
    oracle=f"""
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER w AS rk,
               SUM(n_chars) OVER (PARTITION BY source) AS tot,
               SUM(n_chars) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
        FROM documents
        WINDOW w AS (PARTITION BY source ORDER BY n_chars DESC, doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(CASE WHEN 10000 * cum >= {HEAD_COVERAGE_BP} * tot
                         THEN rk END) AS BIGINT) AS head_docs
    FROM ranked GROUP BY source
    """,
)
def q_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-coverage selection per domain: the smallest prefix of
    documents (largest first) whose characters cover >= 50% of the
    domain — the concentration readout that tells a corpus curator
    whether a domain is a few giant pages or a long tail, and sizes
    head-only sampling strategies.

    Scale: one shuffle keyed by source; both window passes (running
    sum and domain total) reuse the same partitioning, and the rollup
    collapses to one row per domain before anything leaves the
    executors.  Integer basis-point comparison (10000*cum >= bp*tot)
    keeps the threshold exact in both engines.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.sum("n_chars").over(W.partitionBy("source")).alias("tot"),
        F.sum("n_chars")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
    )
    return ranked.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min(
            F.when(
                10000 * F.col("cum") >= HEAD_COVERAGE_BP * F.col("tot"),
                F.col("rk"),
            )
        )
        .cast("bigint")
        .alias("head_docs"),
    )
