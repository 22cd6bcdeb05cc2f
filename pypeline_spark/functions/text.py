"""Text analysis for training-data pipelines: tokenization, quality
scoring, language heuristics, fingerprinting.

Everything here is pure column expressions — no Python UDFs — so the
whole stage stays inside WholeStageCodegen and scales linearly with
partitions: per-document work, no shuffle except the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

# Shared token definition: whitespace split of trimmed text.  The SQL
# twin is string_split_regex(trim(text), '\s+') — keep in sync.
def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# Tiny deterministic language markers for the heuristic classifier —
# marker words per language, scored by presence count.  (Real language
# ID would use char n-gram profiles; the harness corpus is synthetic,
# so the heuristic is deliberately simple and exactly mirrorable in
# SQL for the oracle.)
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "los"),
    "fr": ("le", "la", "les"),
    "de": ("der", "die", "das"),
}


@query(
    "q_text_stats",
    oracle=r"""
    SELECT doc_id, lang, source, n_chars,
           LENGTH(text)                                        AS len_chars,
           len(string_split_regex(trim(text), '\s+'))          AS n_tokens,
           ROUND(LENGTH(replace(text, ' ', '')) * 1.0 /
                 len(string_split_regex(trim(text), '\s+')), 4) AS avg_token_len,
           len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_unique_tokens,
           ROUND(len(list_distinct(string_split_regex(trim(text), '\s+'))) * 1.0 /
                 len(string_split_regex(trim(text), '\s+')), 4) AS ttr
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats: char/token counts, avg token length,
    type-token ratio (vocabulary richness)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_toks = F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("text").alias("len_chars"),
        n_toks.alias("n_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) * F.lit(1.0) / n_toks, 4
        ).alias("avg_token_len"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.round(F.size(F.array_distinct(toks)) * F.lit(1.0) / n_toks, 4).alias("ttr"),
    )


@query(
    "q_token_count",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_ish,
           len(string_split_regex(trim(text), '\s+'))                   AS n_ws
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex
    (word-chars runs or single punctuation marks)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), F.lit(0))
        ).alias("n_bpe_ish"),
        F.size(tokens(F.col("text"))).alias("n_ws"),
    )


@query(
    "q_quality_score",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, n_chars,
               string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           ROUND(len(list_filter(toks, w -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it'], lower(w)))) * 1.0
                 / len(toks), 4)                              AS stopword_ratio,
           CAST(len(toks) BETWEEN 20 AND 1000 AS BOOLEAN)     AS len_ok,
           ROUND(LEAST(1.0, len(toks) / 100.0) * 0.5 +
                 LEAST(1.0, len(list_filter(toks, w -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it'], lower(w)))) * 5.0
                 / len(toks)) * 0.5, 4)                       AS quality
    FROM t
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: stopword ratio + length band — the
    standard cheap pre-filter before expensive model-based scoring."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, F.lower(w))))
    n_toks = F.size(toks)
    stop_ratio = n_stop * F.lit(1.0) / n_toks
    return d.select(
        "doc_id",
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        n_toks.between(20, 1000).cast("boolean").alias("len_ok"),
        F.round(
            F.least(F.lit(1.0), n_toks / F.lit(100.0)) * 0.5
            + F.least(F.lit(1.0), stop_ratio * 5.0) * 0.5,
            4,
        ).alias("quality"),
    )


@query(
    "q_lang_id",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang,
               string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               len(list_filter(toks, w -> list_contains(['the','and','of'], w))) AS s_en,
               len(list_filter(toks, w -> list_contains(['el','la','los'], w)))  AS s_es,
               len(list_filter(toks, w -> list_contains(['le','la','les'], w)))  AS s_fr,
               len(list_filter(toks, w -> list_contains(['der','die','das'], w))) AS s_de
        FROM t
    )
    SELECT doc_id, lang,
           CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                WHEN s_en >= GREATEST(s_es, s_fr, s_de) THEN 'en'
                WHEN s_es >= GREATEST(s_fr, s_de) THEN 'es'
                WHEN s_fr >= s_de THEN 'fr'
                ELSE 'de' END AS lang_guess
    FROM scored
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID heuristic with a deterministic argmax
    tie-break order (en > es > fr > de)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    def marker_count(markers: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(m) for m in markers])
        # closure, not a default arg: a two-parameter lambda would be
        # interpreted by Spark as an (element, index) function
        return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))

    scores = {lang: marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    guess = (
        F.when(best == 0, "und")
        .when(scores["en"] >= F.greatest(scores["es"], scores["fr"], scores["de"]), "en")
        .when(scores["es"] >= F.greatest(scores["fr"], scores["de"]), "es")
        .when(scores["fr"] >= scores["de"], "fr")
        .otherwise("de")
    )
    return d.select("doc_id", "lang", guess.alias("lang_guess"))


@query(
    "q_lang_filter",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE lang IN ('en', 'es') GROUP BY lang
    """,
)
def q_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language filtering + per-language corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("lang").isin("en", "es"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("bigint").alias("total_chars"))
    )


@query(
    "q_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(lower(trim(text)))                                   AS content_md5,
           md5(array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' '))
                                                                    AS normalized_md5
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: raw-content md5 and whitespace-normalized
    md5 (the exact-dedup keys)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5"),
        F.md5(F.array_join(tokens(F.lower(F.col("text"))), " ")).alias("normalized_md5"),
    )
