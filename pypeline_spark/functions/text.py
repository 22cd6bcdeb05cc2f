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
from pypeline_spark.session import load_table, scan_parallelism

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
    type-token ratio (vocabulary richness).

    r19: under-split scan => hash-repartition so the regex tokenization
    runs on every core rather than inside the one-task scan (1.1x at
    sf0.1; no-op on a wide scan)."""
    d = load_table(spark, sf_dir, "documents")
    par = scan_parallelism(spark, sf_dir, "documents")
    if par:
        d = d.repartition(par, F.col("doc_id"))
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



def stopword_ratio_expr(toks: Column) -> Column:
    """Stopword share of the token array — shared signal component."""
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, F.lower(w))))
    return n_stop * F.lit(1.0) / F.size(toks)


def quality_expr(toks: Column) -> Column:
    """THE quality score formula (rounded 4dp) — single source shared
    by q_quality_score and q_quality_deciles so the decile calibration
    can never drift from the score it stratifies."""
    n_toks = F.size(toks)
    return F.round(
        F.least(F.lit(1.0), n_toks / F.lit(100.0)) * 0.5
        + F.least(F.lit(1.0), stopword_ratio_expr(toks) * 5.0) * 0.5,
        4,
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
    return d.select(
        "doc_id",
        F.round(stopword_ratio_expr(toks), 4).alias("stopword_ratio"),
        F.size(toks).between(20, 1000).cast("boolean").alias("len_ok"),
        quality_expr(toks).alias("quality"),
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


# --- corpus hygiene: PII scrubbing, decontamination, repetition ---

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"


def scrub_pii(text_col: Column) -> Column:
    """Redact emails and phone numbers (patterns chosen to parse
    identically under Java regex and RE2 so the oracle replays them)."""
    return F.regexp_replace(
        F.regexp_replace(text_col, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


@query(
    "q_pii_scrub",
    # The synthetic fixture has no PII, which would make the scrub a
    # vacuous no-op — so both sides inject one deterministic email +
    # phone per doc, then scrub, then count redactions.  The operator
    # under test is the scrub, the injection just gives it real work.
    oracle=r"""
    WITH dirty AS (
        SELECT doc_id,
               text || ' contact_' || doc_id || '@example.com or +001-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                              '<EMAIL>', 'g'),
               '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean_text,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones
    FROM dirty
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails/phones) + per-doc redaction counts —
    standard pre-training scrub, pure regexp column expressions."""
    d = load_table(spark, sf_dir, "documents")
    dirty = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact_"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +001-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return dirty.select(
        "doc_id",
        scrub_pii(F.col("text")).alias("clean_text"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PHONE_RE), 0)).alias("n_phones"),
    )


@query(
    "q_decontaminate",
    # Benchmark set = docs 0-19 (stand-in for an eval suite); a corpus
    # doc is contaminated when it shares ANY 3-gram with the benchmark.
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - 2),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20)
    SELECT s.doc_id,
           COUNT(DISTINCT s.shingle) AS n_hits
    FROM sh s JOIN bench b ON s.shingle = b.shingle
    WHERE s.doc_id >= 20
    GROUP BY s.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any 3-gram with
    the benchmark set, with overlap counts.

    Scale: the benchmark shingle set is small and broadcasts; the
    corpus side streams through map-side shingling (the same
    doc_shingle_arrays relation as dedup) and one semi-ish equi-join —
    no corpus self-join anywhere.
    """
    from pypeline_spark.functions.dedup import shingle_rows

    d = load_table(spark, sf_dir, "documents")
    rows = shingle_rows(d)
    bench = (
        rows.filter(F.col("doc_id") < 20).select("shingle").distinct()
    )
    return (
        rows.filter(F.col("doc_id") >= 20)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_hits"))
    )


@query(
    "q_gopher_rules",
    # The full Gopher-style rule battery (Rae et al. 2021, public):
    # word-count band, mean-word-length band, alphabetic-word fraction,
    # stopword presence.  Thresholds tuned down to the synthetic corpus
    # (docs are ~30-40 words) so both branches of every gate are
    # exercised; production values are noted inline.
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               len(toks) AS n_words,
               ROUND(list_sum(list_transform(toks, w -> LENGTH(w))) * 1.0
                     / len(toks), 4) AS mean_wlen,
               ROUND(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
                     * 1.0 / len(toks), 4) AS alpha_frac,
               len(list_filter(toks, w -> list_contains(
                   ['the','a','an','and','or','of','to','in','is','it'],
                   lower(w)))) AS n_stop
        FROM t
    )
    SELECT doc_id, n_words, mean_wlen, alpha_frac, n_stop,
           (n_words BETWEEN 20 AND 1000) AS words_ok,
           (mean_wlen BETWEEN 2 AND 10)  AS wlen_ok,
           (alpha_frac >= 0.80)          AS alpha_ok,
           (n_stop >= 1)                 AS stop_ok,
           ((n_words BETWEEN 20 AND 1000) AND (mean_wlen BETWEEN 2 AND 10)
            AND alpha_frac >= 0.80 AND n_stop >= 1) AS keep
    FROM sig
    """,
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate battery: word-count band (prod:
    50-100k, fixture: 20-1000), mean word length 2-10 (prod: 3-10),
    >=80% words containing an alphabetic char, >=1 stopword (prod: 2).
    Emits each signal, each gate, and the combined keep decision.

    Scale: one projection over the token array — zero shuffles, whole
    battery in one WholeStageCodegen span; the keep flag is the standard
    first-pass filter before any model-scored stage touches the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    n_words = F.size("toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    sig = t.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(
            F.aggregate(
                F.col("toks"), F.lit(0), lambda acc, w: acc + F.length(w)
            )
            * F.lit(1.0)
            / n_words,
            4,
        ).alias("mean_wlen"),
        F.round(
            F.size(F.filter(F.col("toks"), lambda w: w.rlike("[A-Za-z]")))
            * F.lit(1.0)
            / n_words,
            4,
        ).alias("alpha_frac"),
        F.size(
            F.filter(F.col("toks"), lambda w: F.array_contains(stop_arr, F.lower(w)))
        ).alias("n_stop"),
    )
    words_ok = F.col("n_words").between(20, 1000)
    wlen_ok = F.col("mean_wlen").between(2, 10)
    alpha_ok = F.col("alpha_frac") >= 0.80
    stop_ok = F.col("n_stop") >= 1
    return sig.select(
        "doc_id",
        "n_words",
        "mean_wlen",
        "alpha_frac",
        "n_stop",
        words_ok.alias("words_ok"),
        wlen_ok.alias("wlen_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stop_ok"),
        (words_ok & wlen_ok & alpha_ok & stop_ok).alias("keep"),
    )


@query(
    "q_url_extract",
    # The fixture corpus carries no URLs, so (as with q_pii_scrub) both
    # sides inject one deterministic URL per doc before extraction —
    # the operator under test is the regex extract + domain parse + the
    # per-domain rollup, which is what a crawl-corpus domain filter runs.
    oracle=r"""
    WITH dirty AS (
        SELECT doc_id,
               text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
                    || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                    || ' and http://cdn.example.net/a' AS text
        FROM documents
    ),
    urls AS (
        SELECT doc_id,
               unnest(regexp_extract_all(text, 'https?://[^\s]+')) AS url
        FROM dirty
    )
    SELECT regexp_extract(url, '^https?://([^/\s]+)', 1) AS domain,
           COUNT(*) AS n_urls,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM urls
    GROUP BY domain
    """,
)
def q_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-domain rollup — the domain-level blocklist /
    frequency filter every crawl pipeline runs before quality scoring.
    Regex domain parse (not parse_url) so the oracle replays it verbatim.

    Scale: extraction is map-side; the only shuffle is the domain
    rollup, whose cardinality is domains (tiny), with map-side partial
    aggregation absorbing the per-URL fan-out.
    """
    d = load_table(spark, sf_dir, "documents")
    dirty = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" and http://cdn.example.net/a"),
        ).alias("text"),
    )
    urls = dirty.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit(r"https?://[^\s]+"), 0)).alias("url"),
    )
    return (
        urls.select(
            "doc_id", F.regexp_extract("url", r"^https?://([^/\s]+)", 1).alias("domain")
        )
        .groupBy("domain")
        .agg(F.count("*").alias("n_urls"), F.countDistinct("doc_id").alias("n_docs"))
    )


@query(
    "q_boilerplate",
    # Corpus-global boilerplate: 3-grams shared by >= 5 distinct docs
    # (nav bars, license footers, template text in a real crawl).  Per
    # doc: what fraction of its distinct shingles are boilerplate.
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - 2),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    global_cnt AS (
        SELECT shingle, COUNT(*) AS n_docs FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN g.n_docs >= 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler,
           ROUND(SUM(CASE WHEN g.n_docs >= 5 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS boiler_frac
    FROM sh s JOIN global_cnt g ON s.shingle = g.shingle
    GROUP BY s.doc_id
    """,
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global boilerplate detection: count how many distinct docs
    carry each 3-gram, mark shingles present in >=5 docs as boilerplate,
    and score each doc by its boilerplate-shingle fraction — the
    template/footer signal used to strip repeated chrome from crawls.

    Scale: reuses the shared shingle relation (map-side expansion), one
    shuffle keyed by shingle for the global count, one keyed by doc for
    the rollup; the shingle->count join is shuffle-on-shingle with
    map-side combine — never a corpus self-join.
    """
    from pypeline_spark.functions.dedup import shingle_rows

    d = load_table(spark, sf_dir, "documents")
    rows = shingle_rows(d)
    global_cnt = rows.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    return (
        rows.join(global_cnt, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("n_docs") >= 5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_boiler"),
            F.round(
                F.sum(F.when(F.col("n_docs") >= 5, 1).otherwise(0))
                * F.lit(1.0)
                / F.count("*"),
                4,
            ).alias("boiler_frac"),
        )
    )


@query(
    "q_repetition",
    # Gopher-style repetition signals: top-token frequency share and
    # duplicate-3-gram fraction; docs failing either gate are flagged.
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ),
    tok_rows AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    top_tok AS (
        SELECT doc_id, MAX(cnt) AS max_cnt, SUM(cnt) AS n_toks
        FROM (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok_rows GROUP BY 1, 2)
        GROUP BY doc_id
    ),
    sh AS (
        SELECT doc_id, len(t) - 2 AS n_sh,
               len(list_distinct(list_transform(
                   generate_series(1, len(t) - 2),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS n_uniq
        FROM toks WHERE len(t) >= 3
    )
    SELECT tt.doc_id,
           ROUND(tt.max_cnt * 1.0 / tt.n_toks, 4) AS top_token_share,
           ROUND(1.0 - sh.n_uniq * 1.0 / sh.n_sh, 4) AS dup_trigram_frac,
           (tt.max_cnt * 1.0 / tt.n_toks > 0.20
            OR 1.0 - sh.n_uniq * 1.0 / sh.n_sh > 0.30) AS flagged
    FROM top_tok tt JOIN sh USING (doc_id)
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (Gopher-style): most-frequent-token
    share and duplicate-trigram fraction, with a flag for docs over
    either threshold.  All column math over the token array — the only
    shuffle is the per-doc token count aggregate."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.lower(F.col("text"))).alias("t"))
    tok_rows = toks.select("doc_id", F.explode("t").alias("tok"))
    top_tok = (
        tok_rows.groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("max_cnt"), F.sum("count").alias("n_toks"))
    )
    sh = toks.filter(F.size("t") >= 3).select(
        "doc_id",
        (F.size("t") - 2).alias("n_sh"),
        F.size(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 3),
                    lambda i: F.array_join(F.slice(F.col("t"), i + 1, 3), " "),
                )
            )
        ).alias("n_uniq"),
    )
    top_share = F.col("max_cnt") / F.col("n_toks")
    dup_frac = F.lit(1.0) - F.col("n_uniq") / F.col("n_sh")
    return (
        top_tok.join(sh, "doc_id")
        .select(
            "doc_id",
            F.round(top_share, 4).alias("top_token_share"),
            F.round(dup_frac, 4).alias("dup_trigram_frac"),
            ((top_share > 0.20) | (dup_frac > 0.30)).alias("flagged"),
        )
    )


@query(
    "q_dedup_url",
    # Crawl dedup step 1: canonicalize the URL (lowercase scheme+host,
    # strip tracking params and fragments), then collapse by canonical
    # key.  The fixture corpus has no URLs, so both sides inject one
    # deterministic messy URL per doc (case noise in scheme/host, a
    # utm_ tracking param, a fragment); doc_id mod arithmetic makes
    # canonical keys collide in groups of 5.
    oracle=r"""
    WITH dirty AS (
        SELECT doc_id,
               'HTTPS://Site' || CAST(doc_id % 20 AS VARCHAR)
                   || '.Example.org/p/' || CAST(doc_id % 50 AS VARCHAR)
                   || '?id=' || CAST(doc_id % 50 AS VARCHAR)
                   || '&utm_source=x' || CAST(doc_id AS VARCHAR)
                   || '#frag' || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(url, '#.*$', ''),
                   '[?&]utm_[^&#]*', '', 'g') AS stripped
        FROM dirty
    ),
    keyed AS (
        SELECT doc_id,
               lower(regexp_extract(stripped, '^([^/]*//[^/]*)', 1))
                   || regexp_extract(stripped, '^[^/]*//[^/]*(.*)$', 1)
                   AS canonical_url
        FROM canon
    )
    SELECT canonical_url,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           COUNT(*) AS n_docs
    FROM keyed GROUP BY canonical_url
    """,
)
def q_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalized dedup: lowercase the scheme+authority, strip
    tracking (utm_*) params and fragments, group by the canonical URL
    keeping the smallest doc_id — pure regex column math, the cheapest
    dedup tier (runs before any content hash touches the page body).

    Scale: canonicalization is map-side; the only shuffle is keyed by
    the canonical URL string, group sizes = duplicate multiplicity."""
    d = load_table(spark, sf_dir, "documents")
    dirty = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://Site"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".Example.org/p/"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit("?id="),
            (F.col("doc_id") % 50).cast("string"),
            F.lit("&utm_source=x"),
            F.col("doc_id").cast("string"),
            F.lit("#frag"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    stripped = F.regexp_replace(
        F.regexp_replace(F.col("url"), "#.*$", ""), r"[?&]utm_[^&#]*", ""
    )
    canonical = F.concat(
        F.lower(F.regexp_extract(stripped, "^([^/]*//[^/]*)", 1)),
        F.regexp_extract(stripped, "^[^/]*//[^/]*(.*)$", 1),
    )
    return (
        dirty.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
            F.count("*").alias("n_docs"),
        )
    )


@query(
    "q_quality_deciles",
    # NTILE is deterministic given a total order: quality ties break
    # by doc_id.  The quality signal reuses q_quality_score's formula.
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang,
               string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ),
    q AS (
        SELECT doc_id, lang,
               ROUND(LEAST(1.0, len(toks) / 100.0) * 0.5 +
                     LEAST(1.0, len(list_filter(toks, w -> list_contains(
                     ['the','a','an','and','or','of','to','in','is','it'],
                     lower(w)))) * 5.0 / len(toks)) * 0.5, 4) AS quality
        FROM t
    )
    SELECT doc_id, lang, quality,
           CAST(NTILE(10) OVER (PARTITION BY lang
                                ORDER BY quality DESC, doc_id) AS INT) AS decile
    FROM q
    """,
)
def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality deciles: rank every doc into NTILE(10)
    buckets within its language — the calibration step that turns a
    raw quality score into sampling strata (`q_mixture_sample`
    consumes exactly this kind of bucket).

    Scale: the window partitions by lang, so each language sorts
    independently across the cluster — no global single-partition
    sort (contrast q_rfm's global NTILE, which is over a small
    per-customer rollup).  Languages are low-cardinality but huge:
    at 100 TB you'd sub-salt the sort via range partitioning, which
    Spark's window exchange already does per partition key.
    """
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    q = d.select("doc_id", "lang", quality_expr(tokens(F.col("text"))).alias("quality"))
    win = W.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    return q.select(
        "doc_id", "lang", "quality", F.ntile(10).over(win).cast("int").alias("decile")
    )


@query(
    "q_langid_confusion",
    # wraps the exact q_lang_id SELECT as a subquery — predictor
    # logic stays single-sourced in spirit (same marker lists/tie
    # order); any drift breaks BOTH hash checks
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
    ),
    pred AS (
        SELECT doc_id, lang,
               CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                    WHEN s_en >= GREATEST(s_es, s_fr, s_de) THEN 'en'
                    WHEN s_es >= GREATEST(s_fr, s_de) THEN 'es'
                    WHEN s_fr >= s_de THEN 'fr'
                    ELSE 'de' END AS lang_guess
        FROM scored
    )
    SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY lang, lang_guess
    """,
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the
    fixture's ground-truth lang column — the classifier-evaluation
    readout a pipeline runs before trusting a cheap detector as a
    filter gate (q_lang_filter's upstream).

    Scale: the predictor is the same map-side marker-count argmax as
    q_lang_id; the confusion rollup is a |langs| x |guesses| key
    aggregate — evaluation costs one scan, no joins, because the
    ground truth rides the same row.
    """
    cases_df = q_lang_id(spark, sf_dir)
    return cases_df.groupBy("lang", "lang_guess").agg(
        F.count("*").cast("bigint").alias("n")
    )


@query(
    "q_token_entropy",
    # Shannon entropy in nats, rounded to 4 dp: the per-term p*ln(p)
    # products are identical doubles in both engines; their sum can
    # differ in the last ulps with aggregation order, which 4-dp
    # rounding absorbs (same policy as the corr/stddev oracles).
    oracle=r"""
    WITH tok AS (
        SELECT d.source, unnest(string_split_regex(trim(lower(d.text)), '\s+')) AS t
        FROM documents d
    ),
    tf AS (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t),
    tot AS (SELECT source, SUM(c) AS n FROM tf GROUP BY source)
    SELECT tf.source,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(MAX(tot.n) AS BIGINT) AS n_tokens,
           ROUND(-SUM((tf.c * 1.0 / tot.n) * LN(tf.c * 1.0 / tot.n)), 4)
               AS entropy_nats
    FROM tf JOIN tot USING (source)
    GROUP BY tf.source
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per source domain — the
    diversity signal corpus curators read next to raw size: a domain
    with huge token volume but low entropy is templated/boilerplate
    text that contributes far less than its byte count suggests.

    Scale: explode -> (source, term) count -> per-source rollup; the
    term-frequency shuffle carries one row per DISTINCT (source, term)
    after map-side partial aggregation, not one per token.  The total
    joins back via the tiny per-source relation (broadcast).
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("source", "t")
        .agg(F.count("*").alias("c"))
    )
    tot = tf.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        tf.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.max("n").cast("bigint").alias("n_tokens"),
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy_nats"),
        )
    )
