r"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the point of each variant):

- exact: hash-groupBy on a fingerprint — one shuffle keyed by md5, no
  pairwise work.  At 100 TB, group by the 16-byte digest, never the text.
- n-gram Jaccard: the exact pairwise similarity — shingle-explode +
  equi-join on shingle.  Cost is sum over shingles of (docs sharing
  it)^2: fine when shingles are selective, quadratic when not — which
  is exactly why the LSH variant exists.
- MinHash-LSH: signature = k minima of per-seed hashes over the
  shingle set; band the signature so docs agree on a band with
  probability 1-(1-j^r)^b; candidate pairs come from a groupBy on
  (band, band_key) — shuffle is linear in docs, pairwise work only
  inside buckets.  Hashes are md5-based and engine-portable, so the
  whole pipeline (signatures -> bands -> candidates -> verified
  Jaccard) is differentially tested against DuckDB, not just smoked.
- SimHash: 64-bit weighted-bit fingerprint; near-dups differ in few
  bits; bucket by 16-bit quadrants (Hamming<=3 within a quadrant match
  guarantee via pigeonhole at 4 quadrants).

Reference connection: the reference has no dedup surface at all — its
delete-key set-dedup (ref: /root/reference/pypeline/Pype.py:184) is the
closest native op; these extend SURVEY.md §2b per the north-star brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

N_HASHES = 12  # MinHash signature length
BAND_ROWS = 3  # rows per LSH band => 4 bands
JACCARD_THRESHOLD = 0.5


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct n-token shingles from an already-materialized token
    array column.  Docs shorter than n tokens yield an empty set (guard
    required: sequence(0, negative) would generate a descending range).

    IMPORTANT: ``toks`` must be a *column reference*, not the split
    expression itself — Catalyst inlines a shared expression into every
    lambda use, re-running the regex split per shingle element and
    turning the op quadratic per document (measured 20x slower).
    """
    k = F.size(toks) - (n - 1)
    sh = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.array_distinct(F.when(k > 0, sh).otherwise(F.array().cast("array<string>")))


def _shingles_sql(toks_col: str, n: int = 3) -> str:
    """``shingles_from_tokens`` rendered as SQL text over a column NAME,
    parsed server-side in ONE round trip.  The Column-lambda form costs
    hundreds of py4j calls per use (~0.5s of driver time per builder
    here); the parsed expression analyzes identically (same CASE /
    transform / array_distinct tree, fresh lambda-variable ids only)."""
    k = f"(size({toks_col}) - {n - 1})"
    sh = (
        f"transform(sequence(0, {k} - 1), "
        f"i -> array_join(slice({toks_col}, i + 1, {n}), ' '))"
    )
    return (
        f"array_distinct(CASE WHEN {k} > 0 THEN {sh} "
        f"ELSE CAST(array() AS ARRAY<STRING>) END)"
    )


def doc_shingle_arrays(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sh: array<string>) — one distinct-shingle set per document.

    Two projections: tokenize first (one regex split per doc), then
    window into shingles over the materialized array column.

    The per-doc *array* form is the scale-preferred base relation: the
    whole MinHash signature computes inside the scan stage (map-side,
    zero shuffle) via array_min over it, where the exploded form costs
    a shuffle of every (doc, shingle) row just to re-group by doc.

    The explicit repartition spreads the compute-bound expansion
    (shingle windows, array_distinct, downstream md5s) over every
    core: the fixture is a single-row-group parquet file, so without
    it the whole chain runs inside the one-task scan stage.  At
    warehouse scale the same holds per-file — hashing is cheap to
    shuffle early (tokens ≈ text size) and expensive to leave skewed.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    toksed = docs.select(
        F.col(id_col), F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks")
    ).repartition(par, F.col(id_col))
    return toksed.select(F.col(id_col), F.expr(_shingles_sql("__toks")).alias("sh"))


def shingle_rows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) exploded rows — the base relation for set
    equi-joins (the exact n-gram Jaccard path).

    ``explode_outer`` + post-generate null filter, NOT plain explode:
    InferFiltersFromGenerate turns a plain explode into a pushed-down
    ``size(sh) > 0`` predicate that re-evaluates the entire shingle
    subtree below the parallelizing exchange — serial per-doc
    array_distinct in the one-task scan stage (same failure mode the
    minhash path guards against).  The outer variant infers nothing;
    empty-shingle docs surface as one null row and drop right here,
    above the exchange.
    """
    return (
        doc_shingle_arrays(docs, id_col, text_col)
        .select(F.col(id_col), F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


# Universal hash family over the md5-derived base hash:
# h_s(x) = (A[s] * (md5_60(x) mod P) + B[s]) mod P, P = 2^31 - 1.
# One md5 per shingle (not per seed) — the family expansion is integer
# arithmetic, exactly replayable in any engine (products stay < 2^62,
# no bigint overflow anywhere).  md5 (not murmur/xxhash) so signatures
# are portable across engines and Spark versions: dedup decisions must
# be replayable.
MINHASH_P = 2147483647
MINHASH_A = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37]
MINHASH_B = [41, 43, 47, 53, 59, 61, 67, 71, 73, 79, 83, 89]


def minhash_signature(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    arrs: DataFrame | None = None,
) -> DataFrame:
    """id -> mh_0..mh_{k-1}: per-seed minima over the shingle set.

    Entirely map-side: one md5 per shingle into a materialized hash
    array, then k array_min passes of integer arithmetic — no explode,
    no shuffle.  (The md5 array sits in its own projection so Catalyst
    does not inline the hash subtree into each of the k array_min
    lambdas — CollapseProject keeps multi-referenced non-cheap
    expressions materialized.)  Docs with no shingles (< n tokens) are
    excluded, matching the explode-based formulation.  Pass ``arrs``
    to reuse an already-built shingle-array relation.
    """
    if arrs is None:
        # Gate short docs with the CHEAP equivalent predicate (>= 3
        # tokens <=> >= 1 shingle) *before* shingling: a size(sh) > 0
        # filter on the built relation gets predicate-pushed below the
        # parallelizing exchange, where Catalyst re-evaluates the whole
        # shingle subtree (window + array_distinct per doc) inside the
        # single-task scan stage — measured 2.5x on the signature job.
        gated = docs.filter(
            F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")) >= 3
        )
        hashed = doc_shingle_arrays(gated, id_col, text_col)
    else:
        # externally-built relation (often a localCheckpoint, where
        # pushdown below the checkpoint is impossible anyway): keep the
        # direct emptiness filter
        hashed = arrs.filter(F.size("sh") > 0)
    # Expressions rendered as SQL text and parsed server-side (one
    # round trip per column) instead of built through py4j Column
    # lambdas (~0.5s of driver time per builder call) — same pattern as
    # the LSH hyperplane / simhash rewrites; analyzed trees identical
    # modulo lambda-variable ids.
    hashed = hashed.select(
        F.col(id_col),
        F.expr(
            "transform(sh, s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) "
            f"AS BIGINT) % {MINHASH_P})"
        ).alias("hs"),
    )
    sig_cols = [
        F.expr(
            f"array_min(transform(hs, h -> ({MINHASH_A[s]} * h + {MINHASH_B[s]}) "
            f"% {MINHASH_P}))"
        ).alias(f"mh_{s}")
        for s in range(N_HASHES)
    ]
    return hashed.select(F.col(id_col), *sig_cols)


#: the md5 hash array / per-seed minimum expressions shared by the
#: wide-relation builders below (rendered once, parsed server-side)
_HS_SQL = (
    "transform(sh, s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) "
    f"AS BIGINT) % {MINHASH_P}) AS hs"
)
_SIG_SQL = [
    f"array_min(transform(hs, h -> ({MINHASH_A[s]} * h + {MINHASH_B[s]}) "
    f"% {MINHASH_P})) AS mh_{s}"
    for s in range(N_HASHES)
]
MINHASH_COLS = ("sh", *(f"mh_{s}" for s in range(N_HASHES)))


def minhash_extend(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the shingle array and MinHash signature columns to an
    EXISTING relation, carrying every input column through — the
    composition form of :func:`minhash_wide` for pipelines whose input
    is already gated (>= 3 tokens) and already distributed (e.g. the
    corpus pipeline's post-window output): no extra exchange, one wide
    relation serves the band chain, the verification joins AND the
    survivor stream, so ONE checkpoint replaces two."""
    toksed = docs.selectExpr(
        "*", f"split(trim(lower({text_col})), '\\\\s+') AS __toks"
    )
    hashed = (
        toksed.selectExpr("*", _shingles_sql("__toks") + " AS sh")
        .drop("__toks")
        .selectExpr("*", _HS_SQL)
    )
    return hashed.selectExpr("*", *_SIG_SQL).drop("hs")


def minhash_wide(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gate: bool = True,
) -> DataFrame:
    """(id, sh, mh_0..mh_{k-1}): shingle arrays AND MinHash signature
    columns in ONE map pass — the relation the LSH queries checkpoint.

    r20 (guide §1.2): the per-query shape used to checkpoint only the
    shingle arrays, so the band self-join evaluated the md5-per-shingle
    signature subtree on BOTH join sides above the checkpoint.  Folding
    the signature columns into the checkpointed relation computes the
    hashes once, in the same parallelized stage that builds the
    shingles, for 12 extra bigints per doc of checkpoint storage and
    zero added shuffles.  Construction batches expressions into
    ``selectExpr`` calls (guide §4.3: one py4j round trip + server-side
    parse per projection, not one per column method).

    ``gate=False`` skips the >=3-token gate when the caller's input
    already guarantees it (e.g. the corpus pipeline's >=20-token
    quality gate).  Gated docs have no shingles and no signature, so
    excluding them changes neither the bands nor any verified pair.
    The md5 array sits in its own projection so Catalyst does not
    inline the hash subtree into each of the k array_min lambdas
    (CollapseProject keeps multi-referenced non-cheap expressions
    materialized), and likewise the shingle CASE below it.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    src = docs
    if gate:
        # cheap equivalent predicate (>= 3 tokens <=> >= 1 shingle),
        # evaluated at the scan before anything shuffles — see
        # minhash_signature for why a size(sh) > 0 filter on the built
        # relation is the wrong place
        src = docs.where(
            f"size(split(trim(lower({text_col})), '\\\\s+')) >= 3"
        )
    toksed = src.selectExpr(
        id_col, f"split(trim(lower({text_col})), '\\\\s+') AS __toks"
    ).repartition(par, F.col(id_col))
    hashed = toksed.selectExpr(
        id_col, _shingles_sql("__toks") + " AS sh"
    ).selectExpr(id_col, "sh", _HS_SQL)
    return hashed.selectExpr(id_col, "sh", *_SIG_SQL)


def lsh_bands(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Signature -> (id, band, band_key) rows; docs sharing a band_key
    within a band are candidate pairs.

    Single posexplode pass (not a union of per-band selects, which
    would re-evaluate the signature subtree once per band).  Rendered
    as ONE selectExpr (guide §4.3: one py4j round trip + server-side
    parse instead of ~40 Column-method calls); the analyzed tree is
    identical to the Column form.
    """
    n_bands = N_HASHES // BAND_ROWS
    keys = ", ".join(
        "concat_ws('_', "
        + ", ".join(f"mh_{b * BAND_ROWS + r}" for r in range(BAND_ROWS))
        + ")"
        for b in range(n_bands)
    )
    return signatures.selectExpr(
        id_col, f"posexplode(array({keys})) AS (band, band_key)"
    )


def candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any band bucket.

    Self-join within (band, band_key) buckets: shuffle keyed on the
    bucket, pairwise expansion only inside buckets (the LSH payoff).

    Formulation note (measured, r5): the one-shuffle alternative —
    groupBy bucket + collect_set + array-comprehension pair expansion —
    is ~15% SLOWER here despite one fewer exchange: collect_set forces
    ObjectHashAggregate out of whole-stage codegen, while AQE turns
    this join's build side into a broadcast at observed sizes (one real
    exchange either way).  At cluster scale with a corpus-sized bands
    relation the aggregate variant halves shuffle volume and becomes
    the right trade — switch there, keep the join under AQE here.
    """
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_from_arrays(
    pairs: DataFrame, arrs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard for given pairs via per-doc shingle arrays.

    Two joins of the (small) pair list against the array relation,
    then size(array_intersect)/size(union) per pair — no shingle-level
    self-join at all.  The candidate set is tiny relative to the
    corpus, so both joins broadcast the pairs side and the array
    relation is never shuffled.
    """
    aa = arrs.selectExpr(f"{id_col} AS id_a", "sh AS sh_a")
    bb = arrs.selectExpr(f"{id_col} AS id_b", "sh AS sh_b")
    return (
        aa.join(F.broadcast(pairs), "id_a")
        .join(bb, "id_b")
        .selectExpr(
            "id_a",
            "id_b",
            "round(size(array_intersect(sh_a, sh_b)) / (size(sh_a) + "
            "size(sh_b) - size(array_intersect(sh_a, sh_b))), 4) AS jaccard",
        )
    )


def jaccard_for_pairs(
    pairs: DataFrame, rows: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard for given pairs via shingle-set intersection.

    Prunes the shingle relation to candidate docs *before* the
    shingle self-join — the candidate set is tiny relative to the
    corpus, so the quadratic step only ever sees near-dup docs.
    """
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    rows_c = rows.join(F.broadcast(cand_ids), id_col, "left_semi")
    # set sizes are only needed for pair members — compute them over the
    # pruned relation, not the full corpus
    sizes = rows_c.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    inter = (
        rows_c.alias("ra")
        .join(rows_c.alias("rb"), F.col("ra.shingle") == F.col("rb.shingle"))
        .select(
            F.col(f"ra.{id_col}").alias("id_a"), F.col(f"rb.{id_col}").alias("id_b")
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .join(F.broadcast(pairs), ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ).alias("jaccard"),
        )
    )


# SQL building blocks shared by the DuckDB oracles (kept textually in
# sync with the column expressions above).
_SQL_SHINGLES = r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - 2),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS shingle
        FROM toks WHERE len(t) >= 3
    )
"""


@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content fingerprint, keep the smallest id.

    Scale: the only shuffle is keyed by the 32-hex digest — never the
    document text; group sizes are the duplicate multiplicities.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", F.md5(F.lower(F.trim(F.col("text")))))
        .groupBy("fp")
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


@query(
    "q_ngram_jaccard",
    oracle=_SQL_SHINGLES
    + """
    , sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise 3-gram Jaccard >= 0.2 (the ground truth the
    approximate variants are judged against)."""
    d = load_table(spark, sf_dir, "documents")
    rows = shingle_rows(d)
    sizes = rows.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        rows.alias("a")
        .join(rows.alias("b"), F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    jac = (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= 0.2)
    )
    return jac.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


# MinHash CTE chain + verified-pair select, shared between the
# q_dedup_minhash oracle and the clustering oracle (kept as one string
# each so the two replays can never drift apart).
_SQL_MINHASH_BODY = """
    , base AS (
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
    )
"""

# The threshold is applied to the ROUNDED jaccard — the Spark side
# filters jaccard_from_arrays' 4dp output, so every oracle that pairs
# with it must round before comparing or a pair with true jaccard in
# [0.49995, 0.5) would be admitted by one engine only.
_SQL_MINHASH_PAIRS_SELECT = """
    SELECT id_a, id_b,
           ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
"""


@query(
    "q_dedup_minhash",
    oracle=_SQL_SHINGLES + _SQL_MINHASH_BODY + _SQL_MINHASH_PAIRS_SELECT,
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pipeline: signatures -> bands -> candidate
    pairs -> exact-Jaccard verification >= 0.5.

    The full scale path: no all-pairs comparison ever happens — the
    band groupBy bounds pairwise work to hash buckets.  Deterministic
    (md5), so the DuckDB oracle replays it exactly.
    """
    d = load_table(spark, sf_dir, "documents")
    # ONE wide relation (shingle arrays + signature columns) feeds the
    # band chain and the verify step; everything up to the band groupBy
    # is map-side (no explode, no per-shingle shuffle).  Materialized
    # once via localCheckpoint rather than .cache(): no session-global
    # catalog state to leak or unpersist (blocks are GC-scoped to this
    # plan), and repeated builder calls can't trip "already cached"
    # churn.  At warehouse scale the arrays/signatures would be
    # persisted tables.
    X = minhash_wide(d).localCheckpoint(eager=False)
    pairs = candidate_pairs(lsh_bands(X))
    return jaccard_from_arrays(pairs, X).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


SIMHASH_BITS = 60  # 15 md5 hex chars -> fits a signed bigint


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash over token unigrams, JVM-side.

    Bit i of the fingerprint is the sign of sum over distinct tokens of
    (+1 if bit i of md5(token) else -1).  Uses the first 15 hex chars
    of md5 (60 bits — 16 would overflow signed bigint) via conv();
    aggregation is an explode + groupBy(id) with 60 sums folded into a
    packed bigint.
    """
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    par = docs.sparkSession.sparkContext.defaultParallelism
    rows = docs.repartition(par, F.col(id_col)).select(
        F.col(id_col), F.explode(toks).alias("tok")
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("bigint")
    rows = rows.select(id_col, h.alias("h"))
    # The 60 per-bit aggregates and the fingerprint fold are built as
    # SQL strings parsed server-side (61 parses total) instead of ~10
    # py4j round trips per bit per Column method: identical analyzed
    # expressions, ~1.5 s less driver time per call at any scale.
    sums = rows.groupBy(id_col).agg(
        *[
            F.expr(
                "sum(CASE WHEN (shiftright(h, {i}) & 1) = 1 "
                "THEN 1 ELSE -1 END) AS b{i}".format(i=i)
            )
            for i in range(SIMHASH_BITS)
        ]
    )
    fp_sql = " ^ ".join(
        "shiftleft(CASE WHEN b{i} > 0 THEN CAST(1 AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END, {i})".format(i=i)
        for i in range(SIMHASH_BITS)
    )
    return sums.select(F.col(id_col), F.expr(fp_sql).alias("simhash"))


@query(
    "q_simhash",
    # The oracle brute-forces all pairs; the Spark side prunes via
    # quadrant buckets.  Results are identical by pigeonhole: any pair
    # within Hamming distance 3 agrees exactly on >=1 of 4 quadrants.
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS tok
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM toks
    ),
    bits AS (
        SELECT doc_id, i,
               CASE WHEN SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) > 0
                    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS b
        FROM hashed CROSS JOIN (SELECT unnest(range(60)) AS i)
        GROUP BY doc_id, i
    ),
    fps AS (SELECT doc_id, SUM(b << i) AS simhash FROM bits GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + near-dup pairs within Hamming distance 3,
    bucketed by 15-bit quadrant (pigeonhole: any pair within distance 3
    agrees on at least one of 4 quadrants)."""
    d = load_table(spark, sf_dir, "documents")
    fps = simhash64(d)
    quads = None
    for qd in range(4):
        part = fps.select(
            "doc_id",
            "simhash",
            F.lit(qd).alias("quad"),
            F.shiftright(F.col("simhash"), qd * 15).bitwiseAND(F.lit(0x7FFF)).alias("qkey"),
        )
        quads = part if quads is None else quads.unionByName(part)
    a = quads.alias("a")
    b = quads.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.quad") == F.col("b.quad"))
            & (F.col("a.qkey") == F.col("b.qkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= 3
    )


CC_CKPT_EVERY = 3  # label-propagation rounds per localCheckpoint barrier
N_CC_ITERS = 6  # min-label propagation hops; near-dup clusters are tiny
# (fixture max diameter 1, max size 4) so 6 reaches fixpoint with wide
# margin — the fixpoint itself is asserted in tests/test_llm_ops.py.


def near_dup_clusters(
    pairs: DataFrame, ids: DataFrame, id_col: str = "doc_id", n_iter: int = N_CC_ITERS
) -> DataFrame:
    """Connected components over near-dup pairs: (id, cluster_id).

    The keep-one-per-cluster policy real dedup uses (greedy pair-drop
    over-deletes chains: a~b, b~c drops b AND c even when a!~c).
    Min-label propagation: every node starts as its own label; each
    iteration takes the min label over itself and its neighbors.  After
    k iterations labels are min-over-k-hops; clusters here have tiny
    diameter so N_CC_ITERS reaches the full-closure fixpoint that the
    DuckDB recursive-CTE oracle computes.  Each iteration is one small
    join + groupBy over the pair graph (linear in edges, never in
    corpus); every CC_CKPT_EVERY-th round localCheckpoints so plan
    depth stays bounded.  Cluster representative = min doc_id, so
    "keep one per cluster" is ``doc_id == cluster_id``.

    Checkpoint spacing (r20, guide §5): a barrier per round paid 6
    plan-analysis + materialization round trips per query; labels feed
    two consumers per round (the neighbor join and the union), so an
    UNcheckpointed round recomputes its subtree up to twice — the
    measured optimum on the fixture is a barrier every 3rd round
    (min 3.79 s -> 2.24-2.60 s on q_dedup_clusters' chain, identical
    labels; every-4+ tips into recompute blowup, 2x worse by every-6).
    Checkpoint placement never changes values, only evaluation count.
    """
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    labels = ids.select(F.col(id_col).alias("node"), F.col(id_col).alias("lbl"))
    for i in range(n_iter):
        nbr = edges.join(labels, edges.dst == labels.node).select(
            F.col("src").alias("node"), "lbl"
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        if i % CC_CKPT_EVERY == CC_CKPT_EVERY - 1 or i == n_iter - 1:
            labels = labels.localCheckpoint(eager=False)
    return labels.select(
        F.col("node").alias(id_col), F.col("lbl").cast("bigint").alias("cluster_id")
    )


@query(
    "q_dedup_clusters",
    oracle=_SQL_SHINGLES.replace("WITH", "WITH RECURSIVE", 1)
    + _SQL_MINHASH_BODY
    + ", verified AS ("
    + _SQL_MINHASH_PAIRS_SELECT
    + """
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM verified
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM verified
    ),
    reach AS (
        SELECT doc_id, doc_id AS r FROM documents
        UNION
        SELECT reach.doc_id, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id
    FROM reach GROUP BY doc_id
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment for every document: MinHash-LSH
    verified pairs -> connected components (min-label), singletons
    cluster as themselves.  Oracle replays the closure with a
    recursive CTE over the same deterministic pair set."""
    d = load_table(spark, sf_dir, "documents")
    X = minhash_wide(d).localCheckpoint(eager=False)
    pairs = candidate_pairs(lsh_bands(X))
    verified = jaccard_from_arrays(pairs, X).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    return near_dup_clusters(verified, d.select("doc_id"))


def dedup_representatives(
    scored: DataFrame, clusters: DataFrame, id_col: str = "doc_id",
    score_col: str = "__score",
) -> DataFrame:
    """Keep-BEST-per-cluster selection (r17 directive #5): the
    representative of each near-dup cluster is the member with the
    highest score (quality, LM perplexity rank, recency — the
    caller's column), ties broken by smallest id so the choice is
    deterministic.  This is the policy production corpus pipelines
    actually want — min-id keep-one discards a well-formed page in
    favour of its boilerplate-ridden twin whenever the twin's id
    sorts lower.

    ``scored`` is (id, score); ``clusters`` is the
    :func:`near_dup_clusters` output (id, cluster_id).  Returns one
    row per cluster: (cluster_id, rep_id, n_members, rep_score).

    Scale: one join keyed by id, then a groupBy keyed by cluster_id —
    ``max_by(id, struct(score, -id))`` aggregates with a map-side
    partial (no window, no per-cluster sort), so the selection is two
    shuffles linear in the corpus however the cluster sizes skew."""
    j = clusters.join(scored, id_col)
    return j.groupBy("cluster_id").agg(
        F.expr(
            f"max_by({id_col}, struct({score_col}, -{id_col}))"
        ).cast("bigint").alias("rep_id"),
        F.count("*").cast("bigint").alias("n_members"),
        F.max(score_col).alias("rep_score"),
    )


@query(
    "q_dedup_representative",
    # The SAME recursive-CTE closure as q_dedup_clusters, then a
    # first-principles arg-max replay: per cluster the rep is the
    # highest-quality member (q_quality_score's exact formula), ties
    # to the smallest doc_id; singleton clusters are dropped (no
    # dedup decision to make).
    oracle=_SQL_SHINGLES.replace("WITH", "WITH RECURSIVE", 1)
    + _SQL_MINHASH_BODY
    + ", verified AS ("
    + _SQL_MINHASH_PAIRS_SELECT
    + r"""
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM verified
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM verified
    ),
    reach AS (
        SELECT doc_id, doc_id AS r FROM documents
        UNION
        SELECT reach.doc_id, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src
    ),
    clusters AS (
        SELECT doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY doc_id
    ),
    q AS (
        SELECT doc_id,
               COALESCE(ROUND(
                   LEAST(1.0, len(string_split_regex(trim(text), '\s+')) / 100.0) * 0.5
                   + LEAST(1.0, len(list_filter(string_split_regex(trim(text), '\s+'),
                         w -> list_contains(
                             ['the','a','an','and','or','of','to','in','is','it'],
                             lower(w)))) * 5.0
                     / len(string_split_regex(trim(text), '\s+'))) * 0.5,
                   4), -1.0) AS quality
        FROM documents
    ),
    ranked AS (
        SELECT c.cluster_id, c.doc_id, q.quality,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY q.quality DESC, c.doc_id) AS rn
        FROM clusters c JOIN q ON c.doc_id = q.doc_id
    )
    SELECT cluster_id,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(CASE WHEN rn = 1 THEN quality END) AS rep_quality
    FROM ranked GROUP BY cluster_id
    HAVING COUNT(*) >= 2
    """,
)
def q_dedup_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative dedup with KEEP-BEST selection: MinHash-
    LSH verified pairs -> connected components -> per cluster keep the
    member with the highest heuristic quality score (ties to the
    smallest doc_id) instead of blindly keeping min-id.  Output is one
    row per multi-member cluster with its chosen representative —
    the decision table a corpus pipeline joins back to select
    survivors.

    Scale: inherits the banded LSH shape (no all-pairs); the
    selection itself adds one id-keyed join plus one cluster-keyed
    groupBy with map-side partial aggregation — no windows, no skew
    sensitivity to giant clusters."""
    from pypeline_spark.functions.text import quality_expr, tokens

    d = load_table(spark, sf_dir, "documents")
    X = minhash_wide(d).localCheckpoint(eager=False)
    pairs = candidate_pairs(lsh_bands(X))
    verified = jaccard_from_arrays(pairs, X).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    clusters = near_dup_clusters(verified, d.select("doc_id"))
    scored = d.select(
        "doc_id",
        F.coalesce(quality_expr(tokens(F.col("text"))), F.lit(-1.0)).alias(
            "__score"
        ),
    )
    reps = dedup_representatives(scored, clusters)
    return reps.filter(F.col("n_members") >= 2).select(
        "cluster_id",
        "rep_id",
        "n_members",
        F.col("rep_score").alias("rep_quality"),
    )


INCR_SPLIT = 300  # fixture split: doc_id < 300 = standing corpus, rest = new batch


def incremental_near_dups(
    kept: DataFrame, batch: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """New-batch docs that near-duplicate the STANDING corpus.

    The ingestion-time shape of near-dedup: the standing corpus's
    signatures/bands are a persisted index that each incoming batch
    probes — candidates come from a bands(batch) x bands(kept) join
    (never batch x batch here, and never a corpus rescan beyond the
    band index), then exact Jaccard verifies.  Output: one row per
    (new_id, kept_id) verified pair.  At 100 TB the kept-side band
    table is bucketed by (band, band_key) so a batch probe shuffles
    only the batch.
    """
    arrs_kept = minhash_wide(kept, id_col).localCheckpoint(eager=False)
    arrs_new = minhash_wide(batch, id_col).localCheckpoint(eager=False)
    bands_kept = lsh_bands(arrs_kept, id_col)
    bands_new = lsh_bands(arrs_new, id_col)
    cand = (
        bands_new.alias("n")
        .join(
            bands_kept.alias("k"),
            (F.col("n.band") == F.col("k.band"))
            & (F.col("n.band_key") == F.col("k.band_key")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"), F.col(f"k.{id_col}").alias("kept_id")
        )
        .distinct()
    )
    nn = arrs_new.select(F.col(id_col).alias("new_id"), F.col("sh").alias("sh_n"))
    kk = arrs_kept.select(F.col(id_col).alias("kept_id"), F.col("sh").alias("sh_k"))
    n_inter = F.size(F.array_intersect("sh_n", "sh_k"))
    return (
        nn.join(F.broadcast(cand), "new_id")
        .join(kk, "kept_id")
        .select(
            "new_id",
            "kept_id",
            F.round(n_inter / (F.size("sh_n") + F.size("sh_k") - n_inter), 4).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@query(
    "q_dedup_incremental",
    # Same CTE chain as q_dedup_minhash with the pair predicate swapped:
    # a (id_a) ranges over the NEW batch, b (id_b) over the standing
    # corpus — the replace rewrites both the band-join and the
    # shingle-intersection join in one stroke, keeping the chain
    # textually identical to the Spark path otherwise.
    oracle=_SQL_SHINGLES
    + _SQL_MINHASH_BODY.replace(
        "AND a.doc_id < b.doc_id",
        f"AND b.doc_id < {INCR_SPLIT} AND a.doc_id >= {INCR_SPLIT}",
    )
    + f"""
    SELECT id_a AS new_id, id_b AS kept_id,
           ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup probe: docs >= INCR_SPLIT (the new batch)
    checked against docs < INCR_SPLIT (the standing corpus)."""
    d = load_table(spark, sf_dir, "documents")
    kept = d.filter(F.col("doc_id") < INCR_SPLIT)
    batch = d.filter(F.col("doc_id") >= INCR_SPLIT)
    return incremental_near_dups(kept, batch)


@query(
    "q_dedup_recall",
    # Meta-evaluation of the approximate tier: banding recall against
    # the exact-Jaccard ground truth at the SAME 0.5 threshold.
    # Precision is 1.0 by construction (candidates are exact-verified
    # before they're emitted), so missed pairs are the only error
    # mode; recall ships as integer basis points (exact div).
    oracle=_SQL_SHINGLES
    + _SQL_MINHASH_BODY
    + """
    , found AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    ),
    truth_inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT id_a, id_b FROM truth_inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
           CAST(COUNT(f.id_a) AS BIGINT) AS n_found,
           CAST(CASE WHEN COUNT(*) = 0 THEN 10000
                     ELSE (10000 * COUNT(f.id_a)) // COUNT(*) END
                AS BIGINT) AS recall_bp
    FROM truth t
    LEFT JOIN found f ON t.id_a = f.id_a AND t.id_b = f.id_b
    """,
)
def q_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the MinHash-LSH banding against the exact all-pairs
    Jaccard ground truth at threshold 0.5 — the evaluation every
    approximate-dedup deployment runs on a sample before trusting the
    banded tier at full scale.  (The ground-truth side is quadratic by
    intent, like q_ngram_jaccard; at 100 TB you run it on a sampled
    stratum, while the banded side is the production path.)
    """
    found = q_dedup_minhash(spark, sf_dir).select("id_a", "id_b")
    truth = (
        q_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("id_a", "id_b")
    )
    joined = truth.alias("t").join(
        found.withColumn("__hit", F.lit(1)).alias("f"), ["id_a", "id_b"], "left"
    )
    return joined.agg(
        F.count("*").cast("bigint").alias("n_truth"),
        F.count("__hit").cast("bigint").alias("n_found"),
        F.expr(
            "CAST(CASE WHEN count(*) = 0 THEN 10000 "
            "ELSE (10000 * count(__hit)) div count(*) END AS BIGINT)"
        ).alias("recall_bp"),
    )


LINK_MAX_DIST = 2  # Levenshtein acceptance threshold


@query(
    "q_record_linkage",
    # Entity resolution between the customer table and a deterministic
    # "dirty" copy (suffix perturbation on every 3rd key).  The block
    # key is the NAME STEM — everything but the last two characters —
    # which (a) survives the last-char perturbation, and (b) stays
    # selective on TPC-H-style names, where a fixed-length prefix would
    # be degenerate (every customer shares 'Customer#...', so prefix
    # blocking collapses to per-nation all-pairs).  Exact integer
    # Levenshtein <= 2 inside the block.
    oracle=f"""
    WITH dirty AS (
        SELECT c_custkey AS d_custkey, c_nationkey AS d_nationkey,
               CASE WHEN c_custkey % 3 = 0
                    THEN substr(c_name, 1, LENGTH(c_name) - 1) || 'X'
                    ELSE c_name END AS d_name
        FROM customer
    ),
    blocked AS (
        SELECT c.c_custkey, d.d_custkey,
               levenshtein(c.c_name, d.d_name) AS dist
        FROM customer c
        JOIN dirty d
          ON c.c_nationkey = d.d_nationkey
         AND substr(c.c_name, 1, LENGTH(c.c_name) - 2)
             = substr(d.d_name, 1, LENGTH(d.d_name) - 2)
         AND c.c_custkey != d.d_custkey
    )
    SELECT c_custkey, d_custkey, CAST(dist AS INT) AS dist
    FROM blocked WHERE dist <= {LINK_MAX_DIST}
    """,
)
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: link clean customer records to a perturbed
    copy via blocking (nation + name stem) and integer Levenshtein
    distance <= {LINK_MAX_DIST} — the blocked fuzzy-match shape every
    record-linkage pipeline uses, with the edit distance exact in both
    engines (no float similarity to diverge).

    Scale: the block key carries the equi-join (one shuffle per side);
    Levenshtein runs only inside blocks, so pairwise cost is bounded
    by block occupancy.  The stem key keeps occupancy tiny (~keys
    sharing all but 2 trailing chars) where a fixed-length prefix on
    templated names would degenerate to per-nation all-pairs — block
    key choice IS the scale knob in record linkage.  Skewed blocks
    split under AQE like any hot join key.
    """
    c = load_table(spark, sf_dir, "customer")
    dirty = c.select(
        F.col("c_custkey").alias("d_custkey"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.expr("substr(c_name, 1, length(c_name) - 1)"), F.lit("X")
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("d_name"),
    )
    blocked = c.join(
        dirty,
        (F.col("c_nationkey") == F.col("d_nationkey"))
        & (
            F.expr("substr(c_name, 1, length(c_name) - 2)")
            == F.expr("substr(d_name, 1, length(d_name) - 2)")
        )
        & (F.col("c_custkey") != F.col("d_custkey")),
    )
    return blocked.select(
        "c_custkey",
        "d_custkey",
        F.levenshtein("c_name", "d_name").cast("int").alias("dist"),
    ).filter(F.col("dist") <= LINK_MAX_DIST)


# --- Repeated-span (substring-level) dedup -------------------------------
# The "Deduplicating Training Data Makes Language Models Better" (Lee et
# al., 2022) failure mode: verbatim spans repeated ACROSS documents that
# document-level dedup (exact, MinHash) can't see because the containing
# documents differ.  Production systems use suffix arrays; the
# shuffle-friendly formulation is fixed-length token windows — every
# k-token span, grouped by content, flagged when it recurs in >=2 docs.

SPAN_K = 10  # tokens per span

# shared tokenizer + span generator, kept in ONE place per engine so the
# Spark expression and the DuckDB oracle can't drift (same convention as
# _SQL_SHINGLES above)
_SPAN_TOKENS = r"string_split_regex(trim(lower(text)), '\s+')"
_SQL_SPANS = rf"""
    WITH toks AS (
        SELECT doc_id, {_SPAN_TOKENS} AS t FROM documents
    ),
    spans AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(t) - {SPAN_K - 1}),
                   i -> array_to_string(list_slice(t, i, i + {SPAN_K - 1}), ' ')))
                   AS span
        FROM toks WHERE len(t) >= {SPAN_K}
    )
"""


def span_rows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, span) — one row per k-token window position (stride 1,
    duplicates within a doc KEPT: span dedup counts occurrences, unlike
    shingle sets).  Map-side only: tokenize, transform, explode."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    spans = F.expr(
        f"transform(sequence(1, greatest(size(__t) - {SPAN_K - 1}, 0)), "
        f"i -> concat_ws(' ', slice(__t, i, {SPAN_K})))"
    )
    return (
        docs.select(F.col(id_col), toks.alias("__t"))
        .filter(F.size("__t") >= SPAN_K)
        .select(F.col(id_col), F.explode(spans).alias("span"))
    )


@query(
    "q_span_dedup",
    oracle=_SQL_SPANS
    + """
    SELECT span,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM spans
    GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated spans: every 10-token window occurring in
    at least two distinct documents, with its document and occurrence
    counts.

    Scale: span generation is map-side (tokenize -> transform ->
    explode, pure codegen); the single shuffle is keyed by span
    content.  At 100 TB the span strings themselves should not ride
    the wire — key the exchange by xxhash64(span) and keep one witness
    string per group (collision odds at 64 bits are negligible, and a
    second md5 check can confirm); kept as the raw string here so the
    DuckDB oracle replays bit-for-bit.  Stride-1 windows cost k rows
    per token; production suffix-array pipelines amortize with stride
    s and re-expand hits, trading recall at span boundaries.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        span_rows(d)
        .groupBy("span")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "q_span_dup_share",
    oracle=_SQL_SPANS
    + """
    , dup AS (
        SELECT span FROM spans GROUP BY span
        HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_spans,
           CAST((10000 * SUM(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END))
               // COUNT(*) AS BIGINT) AS dup_bp
    FROM spans s LEFT JOIN (SELECT DISTINCT span FROM dup) d USING (span)
    GROUP BY s.doc_id
    """,
)
def q_span_dup_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span share — the actionable filter signal
    (drop or trim documents whose text is mostly boilerplate seen
    elsewhere), in integer basis points.

    Scale: reuses the one span-keyed shuffle to build the duplicated
    set, then a second span-keyed join marks each occurrence — same
    key, so AQE reuses the partitioning; the per-doc rollup shuffles
    on doc_id.  The share is integer DIV — no float division to
    diverge between engines.
    """
    spans = span_rows(load_table(spark, sf_dir, "documents"))
    dup = (
        spans.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("span")
    )
    marked = spans.join(
        dup.withColumn("__isdup", F.lit(1)), "span", "left_outer"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum(F.coalesce(F.col("__isdup"), F.lit(0)))
            .cast("bigint")
            .alias("n_dup_spans"),
        )
        .withColumn("dup_bp", F.expr("(10000 * n_dup_spans) DIV n_spans"))
    )


# --- Prefix-filtered exact similarity join (AllPairs/PPJoin family) ------

PREFIX_JACCARD_T = 0.5  # exact-join threshold (matches JACCARD_THRESHOLD)


@query(
    "q_jaccard_prefix",
    # Brute-force oracle: same CTE chain as q_ngram_jaccard at t=0.5.
    # The Spark side produces the IDENTICAL pair set through prefix
    # filtering — the hash match is the correctness proof of the
    # pruning theorem's implementation, not just of the arithmetic.
    oracle=_SQL_SHINGLES
    + f"""
    , sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= {PREFIX_JACCARD_T}
    """,
)
def q_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.5 join via prefix filtering (AllPairs/PPJoin):
    the scalable exact tier between the brute-force token join
    (q_ngram_jaccard) and the approximate banded tiers (MinHash LSH).

    Order every shingle by ascending global document frequency
    (rarest first); a set with |A| shingles keeps a prefix of
    floor((1-t)*|A|)+1.  Two sets with Jaccard >= t MUST collide
    inside their prefixes under that shared order, so the candidate
    join runs over prefix rows only — rarest-token keys, which also
    makes the join keys the LEAST skewed ones — and exact Jaccard
    verifies the survivors.  Hash-matching the brute-force oracle
    proves no qualifying pair was pruned.

    Scale: the frequency table shares the shingle shuffle key with the
    candidate join; per-doc prefix ranking is one doc-keyed window.
    Candidate volume scales with prefix collisions (rare tokens), not
    token matches — on skewed corpora this is the difference between
    a stop-word-driven quadratic blowup and a near-linear pass.
    """
    d = load_table(spark, sf_dir, "documents")
    rows = shingle_rows(d)
    sizes = rows.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    freq = rows.groupBy("shingle").agg(F.count("*").alias("df"))
    from pyspark.sql import Window as W

    ranked = (
        rows.join(freq, "shingle")
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .join(sizes, "doc_id")
    )
    prefix = ranked.filter(
        F.col("rk")
        <= F.floor((1 - PREFIX_JACCARD_T) * F.col("n_sh")).cast("int") + 1
    ).select("doc_id", "shingle")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    arrs = doc_shingle_arrays(d).localCheckpoint(eager=False)
    aa = arrs.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    bb = arrs.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_inter / (F.size("sh_a") + F.size("sh_b") - n_inter)
    return (
        cand.join(aa, "id_a")
        .join(bb, "id_b")
        .filter(jac >= PREFIX_JACCARD_T)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


@query(
    "q_lsh_efficiency",
    # LEFT JOIN from cand (not inter): a banding collision with zero
    # shared shingles is still a candidate the rescorer paid for, and
    # the Spark side counts it (jaccard 0) — the oracle must too.
    oracle=_SQL_SHINGLES
    + _SQL_MINHASH_BODY
    + """
    , scored AS (
        SELECT c.id_a, c.id_b,
               ROUND(COALESCE(i.n_inter, 0) * 1.0
                     / (sa.n_sh + sb.n_sh - COALESCE(i.n_inter, 0)), 4) AS j
        FROM cand c
        LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        JOIN sizes sa ON c.id_a = sa.doc_id
        JOIN sizes sb ON c.id_b = sb.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_verified,
           CAST((10000 * SUM(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END)) // COUNT(*)
               AS BIGINT) AS precision_bp
    FROM scored
    """,
)
def q_lsh_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding efficiency of the MinHash-LSH tier: candidate volume,
    verified near-dups, and candidate precision in basis points — THE
    tuning readout for the bands x rows trade (too few bands starves
    recall, too many drowns the rescorer in false candidates; this
    measures the second failure mode, q_dedup_recall the first).

    Scale: candidate count is a by-product of the band join the dedup
    tier already runs; the precision denominator is exactly the number
    of exact-verify units of work — at 100 TB this number times the
    per-pair rescore cost IS the dedup bill, which is why it gets a
    first-class query.
    """
    d = load_table(spark, sf_dir, "documents")
    X = minhash_wide(d).localCheckpoint(eager=False)
    cand = candidate_pairs(lsh_bands(X))
    jac = jaccard_from_arrays(cand, X)
    return jac.agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        F.sum(F.when(F.col("jaccard") >= JACCARD_THRESHOLD, 1).otherwise(0))
        .cast("bigint")
        .alias("n_verified"),
    ).withColumn("precision_bp", F.expr("(10000 * n_verified) DIV n_candidates"))


@query(
    "q_cluster_sizes",
    # same recursive closure as q_dedup_clusters, rolled up to the
    # cluster-size histogram
    oracle=_SQL_SHINGLES.replace("WITH", "WITH RECURSIVE", 1)
    + _SQL_MINHASH_BODY
    + ", verified AS ("
    + _SQL_MINHASH_PAIRS_SELECT
    + """
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM verified
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM verified
    ),
    reach AS (
        SELECT doc_id, doc_id AS r FROM documents
        UNION
        SELECT reach.doc_id, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src
    ),
    clusters AS (
        SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
    ),
    csizes AS (
        SELECT cluster_id, COUNT(*) AS csize FROM clusters GROUP BY cluster_id
    )
    SELECT CAST(csize AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(csize * COUNT(*) AS BIGINT) AS n_docs
    FROM csizes GROUP BY csize
    """,
)
def q_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size distribution — the dedup REPORT (how much
    of the corpus is duplicated, and in how big clumps) that decides
    keep-one-per-cluster savings before anything is deleted.

    Scale: two tiny rollups over the cluster assignment q_dedup_clusters
    already computes; the histogram's key space is the largest cluster
    size.  A heavy tail here (one giant cluster) is the signal to
    inspect boilerplate/templates before trusting keep-min-id.
    """
    clusters = q_dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("csize"))
    return sizes.groupBy("csize").agg(
        F.count("*").cast("bigint").alias("n_clusters")
    ).select(
        F.col("csize").cast("bigint").alias("cluster_size"),
        "n_clusters",
        (F.col("csize") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
    )


CONTAINMENT_T = 0.8  # n_inter / min(|A|,|B|) — near-containment cutoff


@query(
    "q_containment",
    oracle=_SQL_SHINGLES
    + _SQL_MINHASH_BODY
    + """
    SELECT id_a, id_b,
           ROUND(n_inter * 1.0 / LEAST(sa.n_sh, sb.n_sh), 4) AS containment
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE ROUND(n_inter * 1.0 / LEAST(sa.n_sh, sb.n_sh), 4) >= 0.8
    """,
)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-CONTAINMENT pairs: shingle-set overlap divided by
    the SMALLER set — the quote/excerpt/snippet detector Jaccard misses
    (a 50-token doc fully embedded in a 1000-token doc has Jaccard
    ~0.05 but containment 1.0).

    Scale: same zero-shuffle-signature -> banded-candidates ->
    broadcast-verify shape as q_dedup_minhash; only the verification
    formula changes (min-size denominator instead of union size).
    Recall caveat, stated rather than hidden: MinHash banding is tuned
    for symmetric Jaccard, so a small-in-large pair whose Jaccard is
    far below the banding's S-curve can evade candidacy — at
    production scale the containment tier uses the repeated-span index
    (q_span_dedup) as its candidate source instead.
    """
    d = load_table(spark, sf_dir, "documents")
    arrs = minhash_wide(d).localCheckpoint(eager=False)
    pairs = candidate_pairs(lsh_bands(arrs))
    aa = arrs.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    bb = arrs.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    cont = F.round(n_inter / F.least(F.size("sh_a"), F.size("sh_b")), 4)
    return (
        aa.join(F.broadcast(pairs), "id_a")
        .join(bb, "id_b")
        .select("id_a", "id_b", cont.alias("containment"))
        .filter(F.col("containment") >= CONTAINMENT_T)
    )
