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


BIGRAM_TOP = 3  # following-words kept per head word
BIGRAM_MIN = 5  # head word must occur at least this often


@query(
    "q_bigram_lm",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ),
    bg AS (
        SELECT t[i] AS head, t[i+1] AS nxt
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
        WHERE len(t) >= 2
    ),
    counted AS (
        SELECT head, nxt, COUNT(*) AS c FROM bg GROUP BY head, nxt
    ),
    heads AS (
        SELECT head, SUM(c) AS total FROM counted GROUP BY head
        HAVING SUM(c) >= {BIGRAM_MIN}
    ),
    ranked AS (
        SELECT c.head, c.nxt, c.c, h.total,
               ROW_NUMBER() OVER (PARTITION BY c.head
                                  ORDER BY c.c DESC, c.nxt) AS rk
        FROM counted c JOIN heads h USING (head)
    )
    SELECT head, nxt, CAST(c AS BIGINT) AS n,
           CAST(rk AS INT) AS rk,
           CAST((10000 * c) // total AS BIGINT) AS p_bp
    FROM ranked WHERE rk <= {BIGRAM_TOP}
    """,
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram next-word table: for every head word seen >= 5 times, the
    top-3 following words with integer-basis-point conditional
    probabilities — the count-based n-gram LM construction step (and
    the classic data-quality probe: a templated corpus shows p_bp
    spikes near 10000).

    Scale: bigrams are generated map-side with one zip of the token
    array against its tail (transform over indices, no self-join);
    the only row-level shuffle keys on (head, next) with map-side
    partial counts; the rank window runs over the already-aggregated
    count table, sized by vocabulary squared participation, not corpus
    tokens.
    """
    from pyspark.sql import Window as W

    from pypeline_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(tokens(F.col("text")).alias("t")).filter(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.col("t")[i].alias("head"), F.col("t")[i + 1].alias("nxt")
                ),
            )
        ).alias("p")
    ).select("p.head", "p.nxt")
    counted = pairs.groupBy("head", "nxt").agg(F.count("*").alias("c"))
    heads = (
        counted.groupBy("head")
        .agg(F.sum("c").alias("total"))
        .filter(F.col("total") >= BIGRAM_MIN)
    )
    w = W.partitionBy("head").orderBy(F.col("c").desc(), "nxt")
    ranked = counted.join(heads, "head").withColumn(
        "rk", F.row_number().over(w)
    )
    return ranked.filter(F.col("rk") <= BIGRAM_TOP).select(
        "head",
        "nxt",
        F.col("c").cast("bigint").alias("n"),
        F.col("rk").cast("int").alias("rk"),
        F.expr("(10000 * c) DIV total").cast("bigint").alias("p_bp"),
    )
