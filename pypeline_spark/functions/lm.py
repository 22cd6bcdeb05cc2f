"""Statistical language-model quality scoring (CCNet-style).

The classic corpus-quality filter: fit a unigram model on the corpus
itself, score each document by its mean token log-probability, and
flag the tail — gibberish and boilerplate sit far from the corpus
distribution.  (CCNet uses a 5-gram KenLM; the unigram form keeps the
math exactly replayable in SQL while exercising the same pipeline
shape: model fit = one aggregation, scoring = one join + one
aggregation.)

Scale: the vocabulary aggregate shuffles (token, count) pairs — tokens,
not documents — and the scoring join is token-keyed with the (small)
vocabulary broadcast.  Nothing is quadratic; the whole filter is two
shuffles over linear data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table


def unigram_logprob_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, mean_logp): mean unigram log-probability of
    each document under the corpus's own token distribution."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n")).select(
        "n", F.pmod(F.col("n"), F.lit(1)).cast("int").alias("__k")
    )
    # log p(tok) = ln(cnt) - ln(N); N rides along via a 1-row broadcast
    # hash join on a data-derived always-zero key (lit keys would
    # constant-fold the join into a nested loop)
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .withColumn("__k", F.pmod(F.xxhash64("doc_id"), F.lit(1)).cast("int"))
        .join(F.broadcast(total), "__k")
        .select("doc_id", (F.log("cnt") - F.log("n")).alias("logp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("logp"), 4).alias("mean_logp"),
    )


@query(
    "q_lm_quality",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    total AS (SELECT SUM(cnt) AS n FROM vocab)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(ln(v.cnt) - ln(total.n)), 4) AS mean_logp
    FROM toks t JOIN vocab v USING (tok) CROSS JOIN total
    GROUP BY t.doc_id
    """,
)
def q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document (the LM quality
    filter's score column; low scores = out-of-distribution text)."""
    d = load_table(spark, sf_dir, "documents")
    return unigram_logprob_scores(d)
