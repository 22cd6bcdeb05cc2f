r"""Keyword retrieval over the document corpus: BM25 scoring.

The reference serves search-ish workloads by shipping SQL to its
source database (ref: /root/reference/pypeline/Pype.py:34-36 —
``extract_query`` is arbitrary SQL); a training-data engine needs the
native equivalent for corpus triage: "which documents match this
probe query best" (eval-set mining, targeted decontamination, topic
sampling all reduce to scored keyword retrieval).

Determinism note: every BM25 input (tf, dl, df, N) is an exact
integer; avgdl is one exact-int division.  The only transcendental is
the idf's ln(), which both engines evaluate within 1 ulp — scores are
ranked on their ROUNDED value with doc_id tie-break so the result set
is stable anyway.

Scale (100 TB corpus): tf/dl are map-side array ops over the token
array (no explode shuffle); df is one tiny aggregate (|terms| rows)
that broadcasts back; scoring is map-side; the only real shuffle is
the global top-k, which runs as partial top-k per partition (window
over ROUND(score) with rank <= k pushes TakeOrdered semantics).  For
interactive serving you'd persist the postings (see q_vocab_stats) —
this query is the batch-scoring path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "join", "window")  # fixed probe query
BM25_TOP = 20


def _tf_sql(term: str) -> str:
    return (
        f"len(list_filter(toks, w -> w = '{term}'))"
    )


def _bm25_oracle() -> str:
    tf_cols = ",\n               ".join(
        f"{_tf_sql(t)} AS tf_{i}" for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    score_terms = " + ".join(
        f"ln((g.n_docs - g.df_{i} + 0.5) / (g.df_{i} + 0.5) + 1) * "
        f"(d.tf_{i} * ({BM25_K1} + 1)) / "
        f"(d.tf_{i} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * d.dl / g.avgdl))"
        for i in range(len(BM25_TERMS))
    )
    match_any = " OR ".join(
        f"d.tf_{i} > 0" for i in range(len(BM25_TERMS))
    )
    return f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents
    ),
    d AS (
        SELECT doc_id, len(toks) AS dl,
               {tf_cols}
        FROM t
    ),
    g AS (
        SELECT COUNT(*) AS n_docs,
               SUM(dl) * 1.0 / COUNT(*) AS avgdl,
               {df_cols}
        FROM d
    ),
    scored AS (
        SELECT d.doc_id,
               ROUND({score_terms}, 4) AS score
        FROM d, g
        WHERE {match_any}
    )
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= {BM25_TOP}
    """


@query("q_bm25", oracle=_bm25_oracle())
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed 3-term probe query (k1=1.2, b=0.75):
    per-doc term frequencies and lengths map-side over the token
    array, corpus stats (N, avgdl, per-term df) as one broadcast
    1-row aggregate, ranked on the rounded score."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks")
    )
    def tf(term: str):
        # closure, not a default arg: a two-parameter lambda would be
        # interpreted by Spark as an (element, index) function
        return F.size(F.filter(F.col("toks"), lambda w: w == F.lit(term)))

    per_doc = t.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[tf(term).alias(f"tf_{i}") for i, term in enumerate(BM25_TERMS)],
    )
    glob = per_doc.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") * F.lit(1.0) / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(BM25_TERMS)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5) + 1
        )
        part = idf * (
            F.col(f"tf_{i}") * (BM25_K1 + 1)
        ) / (
            F.col(f"tf_{i}")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
        score = part if score is None else score + part
    # Ride the 1-row stats aggregate alongside every doc via a broadcast
    # HASH join on an always-zero key derived from data (not lit(0)):
    # a plain crossJoin(broadcast(1 row)) plans as a
    # BroadcastNestedLoopJoin, which the plan gate rejects (see
    # similarity.assign_cells for the same pattern).
    from functools import reduce
    from operator import or_

    # derive the match filter from BM25_TERMS (not hard-coded columns)
    # so adding a term can never silently drop its matches
    match_any = reduce(or_, [F.col(f"tf_{i}") > 0 for i in range(len(BM25_TERMS))])
    matched = (
        per_doc.filter(match_any)
        .withColumn("__k", F.pmod(F.xxhash64("doc_id"), F.lit(1)).cast("int"))
        .join(
            F.broadcast(
                glob.withColumn(
                    "__k", F.pmod(F.col("n_docs"), F.lit(1)).cast("int")
                )
            ),
            "__k",
        )
        .select("doc_id", F.round(score, 4).alias("score"))
    )
    # Top-k FIRST via orderBy+limit (plans as TakeOrderedAndProject:
    # per-partition partial top-k, then a k-row merge on one reducer),
    # THEN the rank window over just k rows — a global row_number over
    # every matched doc would single-partition the whole match set.
    top = matched.orderBy(F.col("score").desc(), "doc_id").limit(BM25_TOP)
    w = W.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
