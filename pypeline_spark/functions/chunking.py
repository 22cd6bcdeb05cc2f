r"""Training-data preparation: document chunking, vocabulary statistics,
and mixture resampling over the ``documents`` corpus.

These extend the LLM-data tier (functions/text.py, functions/corpus.py)
with the steps that sit between a cleaned corpus and a tokenizer /
training run:

- **chunking** splits long documents into fixed-size token windows with
  overlap (the context-window packing precursor; see
  functions/export.py for the packing step itself);
- **vocabulary stats** computes per-token document frequency and IDF —
  the input to tokenizer training and stop-word lists;
- **mixture resampling** rebalances the corpus across source strata to
  a target mixture with a deterministic hash gate, the standard way a
  training mix is pinned (and reproduced) across runs.

Scale notes (100 TB corpus):
- Chunking is a map-side explode: ``split`` -> ``sequence`` ->
  ``explode`` -> ``slice`` all run inside WholeStageCodegen on the
  scan, no shuffle, no Python.  Output size is input size × overlap
  factor — the explode multiplies rows, not bytes-per-row, so file
  sizing is handled by AQE coalescing on the write.
- Vocabulary stats shuffle once on token (the unavoidable reduce);
  ``array_distinct`` BEFORE exploding turns per-doc repeats into one
  row, a map-side combine that cuts the shuffle by the in-doc repeat
  factor.  The driver never sees the long tail — top-k is a sort of
  the already-aggregated (small) token table.
- Mixture sampling broadcasts a per-stratum rate table (|sources|
  rows) onto the scan; the accept test is the same engine-portable
  md5 bucket used by q_sample_hash (operators/scale_ops.py:40), so
  every engine and every rerun selects the SAME rows — a pinned,
  reproducible training mix.

Reference connection: the reference's corpus surface is delegated SQL
(ref: /root/reference/pypeline/Pype.py:36); SURVEY.md §2b's LLM-data
extension makes these native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.operators.scale_ops import _HASH_BUCKET_SQL, hash_bucket
from pypeline_spark.registry import query
from pypeline_spark.session import load_table

CHUNK_TOKENS = 32  # tokens per chunk
CHUNK_STRIDE = 24  # tokens between chunk starts (8-token overlap)
VOCAB_TOP = 50  # vocabulary rows returned
MIX_BUCKETS = 10_000  # basis-point granularity of the accept gate


@query(
    "q_doc_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(start / {CHUNK_STRIDE} AS INT) AS chunk_id,
           CAST(len(list_slice(toks, start + 1, start + {CHUNK_TOKENS})) AS INT)
               AS n_tokens,
           array_to_string(list_slice(toks, start + 1, start + {CHUNK_TOKENS}), ' ')
               AS chunk_text
    FROM t, unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS g(start)
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunks: 32 tokens, stride 24 (8 overlap).

    Pure map-side explode — chunk starts come from ``sequence`` over
    the token count, the chunk text from ``slice`` + ``array_join``;
    the whole plan is one codegen stage on the scan.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return (
        d.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
            ).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.size(F.slice(F.col("toks"), F.col("start") + 1, CHUNK_TOKENS))
            .cast("int")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, CHUNK_TOKENS), " "
            ).alias("chunk_text"),
        )
    )


@query(
    "q_vocab_stats",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents
    ),
    c AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY token),
    n AS (SELECT COUNT(*) AS total FROM documents)
    SELECT token, df, ROUND(LN(total * 1.0 / df), 4) AS idf
    FROM c, n
    ORDER BY df DESC, token
    LIMIT {VOCAB_TOP}
    """,
)
def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token document-frequency + IDF, top 50 by df (token tiebreak).

    ``array_distinct`` before the explode is the map-side combine:
    per-document repeats never reach the shuffle.  The total-docs
    scalar rides in as an uncorrelated scalar subquery (a separate
    1-row job whose result is injected as a literal) — not a cross
    join, not a driver-side collect.
    """
    from pypeline_spark.session import register_tables

    register_tables(spark, sf_dir, only=("documents",))
    return spark.sql(
        f"""
        WITH tok AS (
            SELECT explode(array_distinct(split(text, ' '))) AS token
            FROM documents
        ),
        c AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY token)
        SELECT token, df,
               ROUND(LN((SELECT COUNT(*) FROM documents) * 1.0 / df), 4) AS idf
        FROM c
        ORDER BY df DESC, token
        LIMIT {VOCAB_TOP}
        """
    )


@query(
    "q_mixture_sample",
    oracle=f"""
    WITH c AS (SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
    m AS (SELECT MIN(cnt) AS mn FROM c),
    r AS (SELECT source, (mn * {MIX_BUCKETS}) // cnt AS rate_bp FROM c, m)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN r ON d.source = r.source
    WHERE {_HASH_BUCKET_SQL.format(cols="d.doc_id", buckets=MIX_BUCKETS)}
          < r.rate_bp
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-mixture resample: downsample every source stratum to the
    smallest one with a deterministic per-row hash gate.

    The per-stratum acceptance rate (basis points, integer arithmetic
    so both engines agree exactly) broadcasts onto the scan; the gate
    is the md5 bucket from q_sample_hash, so the selected subset is
    identical across engines, reruns, and partition layouts — a
    reproducible training mix.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("cnt"))
    # the min-count scalar rides on a window over the tiny per-stratum
    # counts table (|sources| rows), not a cross join against it
    rates = counts.select(
        "source",
        F.expr(f"(min(cnt) OVER ()) * {MIX_BUCKETS} div cnt").alias("rate_bp"),
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(hash_bucket(F.col("doc_id"), buckets=MIX_BUCKETS) < F.col("rate_bp"))
        .select("doc_id", "lang", "source")
    )


BPE_TOP = 30  # merge-candidate pairs returned


@query(
    "q_bpe_pairs",
    oracle=f"""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    p AS (
        SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t
    )
    SELECT toks[i] AS a, toks[i + 1] AS b, COUNT(*) AS n
    FROM p
    GROUP BY a, b
    ORDER BY n DESC, a, b
    LIMIT {BPE_TOP}
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token pair frequencies, top 30 — the merge-candidate
    count at the heart of BPE tokenizer training.

    The pair stream is built map-side: two shifted ``slice`` views of
    the token array zipped and exploded (no index join, no UDF); one
    hash aggregate on the pair.  BPE training iterates exactly this
    query, merging the winner into the vocab between rounds — at
    corpus scale the iteration state (the vocab) is a broadcast,
    while the heavy pair count stays this same shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    pairs = (
        d.select(toks.alias("toks"))
        .withColumn("a_arr", F.slice(F.col("toks"), 1, F.size("toks") - 1))
        .withColumn("b_arr", F.slice(F.col("toks"), 2, F.size("toks") - 1))
        .select(F.explode(F.arrays_zip("a_arr", "b_arr")).alias("p"))
        .select(F.col("p.a_arr").alias("a"), F.col("p.b_arr").alias("b"))
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "a", "b")
        .limit(BPE_TOP)
    )


# Ordered BPE merge table.  Chosen so no rule's left side collides with
# the suffix of a token an earlier rule created (e.g. no 'h e' after
# 't h'->'th' exists), which keeps plain substring replacement over the
# space-joined symbol sequence a faithful BPE step.
BPE_MERGES = (
    ("t h", "th"),
    ("th e", "the"),
    ("i n", "in"),
    ("a n", "an"),
    ("an d", "and"),
    ("o r", "or"),
)


@query(
    "q_bpe_apply",
    # Both engines: explode words, space-join the chars, apply the
    # merge table in order with plain (non-regex) replaces, count
    # resulting symbols.
    oracle=r"""
    WITH words AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents
    ),
    seq AS (
        SELECT doc_id,
               trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS s,
               LENGTH(w) AS n_chars
        FROM words
    ),
    merged AS (
        SELECT doc_id, n_chars,
               replace(replace(replace(replace(replace(replace(
                   s, 't h', 'th'), 'th e', 'the'), 'i n', 'in'),
                   'a n', 'an'), 'an d', 'and'), 'o r', 'or') AS m
        FROM seq
    )
    SELECT doc_id,
           CAST(SUM(n_chars) AS BIGINT)                       AS n_chars,
           CAST(SUM(len(string_split(m, ' '))) AS BIGINT)     AS n_bpe_tokens,
           ROUND(SUM(n_chars) * 1.0 /
                 SUM(len(string_split(m, ' '))), 4)           AS chars_per_token
    FROM merged GROUP BY doc_id
    """,
)
def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware counting: apply a fixed ordered BPE merge table
    to each word's character sequence and report per-doc subword token
    counts and compression (chars per token) — the statistic that
    decides packing lengths and per-doc training cost.

    Scale: pure column expressions after one word explode — the merge
    chain is {n} nested replaces inside WholeStageCodegen; the only
    shuffle is the per-doc rollup (map-side combined).  A production
    tokenizer swaps the merge table for its learned vocabulary; the
    plumbing (explode -> symbol sequence -> ordered merges -> count)
    is identical.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    )
    seq = words.select(
        "doc_id",
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("s"),
        F.length("w").alias("n_chars"),
    )
    m = F.col("s")
    for lhs, rhs in BPE_MERGES:
        m = F.replace(m, F.lit(lhs), F.lit(rhs))
    merged = seq.select("doc_id", "n_chars", m.alias("m"))
    n_tok = F.size(F.split(F.col("m"), " ", -1))
    return merged.groupBy("doc_id").agg(
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.sum(n_tok).cast("bigint").alias("n_bpe_tokens"),
        F.round(
            F.sum("n_chars") * F.lit(1.0) / F.sum(n_tok), 4
        ).alias("chars_per_token"),
    )


MIX_TAU_NUM, MIX_TAU_DEN = 1, 2  # temperature tau = 0.5 (sqrt scaling)


@query(
    "q_mixture_temperature",
    # rate_s = (min_cnt / cnt_s)^(1 - tau): tau=1 keeps natural
    # proportions, tau=0 is the uniform mix of q_mixture_sample.  The
    # power/sqrt is IEEE-correctly-rounded in both engines over the
    # same exact inputs, so the floor'd basis-point rate — and hence
    # the hash-gated subset — is identical.
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    m AS (SELECT MIN(cnt) AS mn FROM c),
    r AS (SELECT lang,
                 CAST(FLOOR({MIX_BUCKETS} * SQRT(CAST(mn AS DOUBLE)
                            / CAST(cnt AS DOUBLE))) AS BIGINT) AS rate_bp
          FROM c, m)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN r ON d.lang = r.lang
    WHERE {{gate}} < r.rate_bp
    """.format(gate=_HASH_BUCKET_SQL.format(cols="d.doc_id", buckets=MIX_BUCKETS)),
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resample (tau = 0.5): each language
    stratum keeps share proportional to cnt^tau — the multilingual
    training-mix standard (square-root scaling) that upweights small
    languages without flattening the mix entirely.

    Scale: identical shuffle shape to q_mixture_sample — one tiny
    per-stratum count aggregate, a window over |sources| rows for the
    min, and a broadcast of the rate table onto the scan; the accept
    gate is the same deterministic md5 bucket, so the subset is
    reproducible across engines, reruns, and partition layouts.
    Because rates only ever DOWN-sample (the smallest stratum is the
    1.0 anchor), no row duplication is needed; a tau wanting
    upsampling would switch the gate to ``explode(sequence(...))``
    repetition with the same integer-rate discipline.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    rates = counts.select(
        "lang",
        F.floor(
            MIX_BUCKETS
            * F.sqrt(
                F.expr("min(cnt) OVER ()").cast("double") / F.col("cnt").cast("double")
            )
        )
        .cast("bigint")
        .alias("rate_bp"),
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(hash_bucket(F.col("doc_id"), buckets=MIX_BUCKETS) < F.col("rate_bp"))
        .select("doc_id", "lang", "source")
    )


TOP_TERMS_K = 3


@query(
    "q_top_terms",
    # tf-idf-ish keyword extraction with a fully-integer score:
    # score = tf * 10000 // df (rarer-in-corpus terms rank higher at
    # equal tf) — both engines' integer division truncates identically,
    # and ties break on the term string, so the per-doc top-3 is
    # deterministic without any float idf.
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               (tf.tf * 10000) // df.df AS score
        FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(score AS BIGINT) AS score, CAST(rk AS INT) AS rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, term) AS rk
        FROM scored
    ) WHERE rk <= {TOP_TERMS_K}
    """,
)
def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 characteristic terms (integer tf*10000/df
    score) — the keyword-extraction primitive behind tagging, routing,
    and index summarization.

    Scale: tf is a (doc, term)-keyed aggregate, df a term-keyed one;
    the score join broadcasts df when the vocabulary is small and
    sort-merges on term otherwise — either way the ranking window
    shuffles once on doc_id.  The integer score avoids a float idf
    whose ln() could diverge between engines at the tie boundary.
    """
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    terms = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df_t, "term").withColumn(
        "score", F.expr("(tf * 10000) DIV df")
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_TERMS_K)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.col("score").cast("bigint").alias("score"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


@query(
    "q_lang_drift",
    # KL(source lang mix || corpus lang mix) in nats, ROUND 4 — the
    # ln() determinism precedent is q_lm_quality (same rounding, both
    # engines agree on these inputs); counts underneath are exact ints.
    oracle="""
    WITH per AS (
        SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
    ),
    src AS (SELECT source, SUM(n) AS ns FROM per GROUP BY source),
    corpus AS (SELECT lang, SUM(n) AS nc FROM per GROUP BY lang),
    total AS (SELECT SUM(n) AS nt FROM per)
    SELECT per.source,
           ROUND(SUM((per.n * 1.0 / src.ns)
                     * ln((per.n * 1.0 / src.ns)
                          / (corpus.nc * 1.0 / total.nt))), 4) AS kl_nats
    FROM per
    JOIN src USING (source)
    JOIN corpus USING (lang)
    CROSS JOIN total
    GROUP BY per.source
    """,
)
def q_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-mix drift: KL divergence of each source's
    language distribution from the corpus-wide mix — the monitor that
    catches one feed's composition shifting before it skews the
    training mixture.

    Scale: everything flows from ONE (source, lang) count aggregate;
    the three marginals derive from that tiny table, so the fact is
    scanned once and the KL arithmetic runs on |sources| x |langs|
    rows.  Zero-count (source, lang) cells contribute 0 by absence
    (the sum simply has no row), matching the KL convention
    0*ln(0/q) = 0.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    from pyspark.sql import Window as W

    ws = W.partitionBy("source")
    wl = W.partitionBy("lang")
    wt = W.partitionBy()
    enriched = (
        per.withColumn("ns", F.sum("n").over(ws))
        .withColumn("nc", F.sum("n").over(wl))
        .withColumn("nt", F.sum("n").over(wt))
    )
    p = F.col("n") / F.col("ns")
    q = F.col("nc") / F.col("nt")
    return enriched.groupBy("source").agg(
        F.round(F.sum(p * F.log(p / q)), 4).alias("kl_nats")
    )
