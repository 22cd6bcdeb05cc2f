r"""Scale-pattern operators: deterministic sampling, unpivot, salted
aggregation, and stream-static enrichment.

These are the patterns a 100 TB deployment leans on daily:

- hash sampling: reproducible subsets without a full shuffle or an
  engine-specific RNG — the sample is a *pushed-down filter* on a
  content hash, so every engine (and every rerun) selects the same
  rows.  TABLESAMPLE is nondeterministic across engines and excluded
  from the differential harness for exactly that reason.
- unpivot (wide -> long): Spark's native ``DataFrame.unpivot`` —
  one projection, no shuffle, no UDF.
- salted aggregation: the standard two-phase fix for skewed group
  keys.  Phase 1 aggregates on (key, salt) so one hot key spreads
  over N reducers; phase 2 combines the N partials.  The result is
  provably identical to the direct groupBy (sums/counts are
  commutative monoids) — which is what the oracle checks.
- stream-static enrichment join: the canonical streaming pattern
  (fact stream x broadcast dimension); written once over the batch
  relation (oracle-checked) and reused by the streaming parity test.

Reference connection: the reference delegates all of this to its
source database as raw SQL (ref: /root/reference/pypeline/Pype.py:36);
these make the delegated surface native per SURVEY.md §2b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table, scan_parallelism

SAMPLE_PCT = 5  # keep rows whose hash bucket (0..99) is < 5


def hash_bucket(*cols, buckets: int = 100):
    """Deterministic, engine-portable bucket in [0, buckets) from the
    md5 of the '_'-joined key columns (same md5-prefix trick as the
    MinHash family — conv of 15 hex chars stays inside a signed
    bigint)."""
    key = F.concat_ws("_", *cols)
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint") % buckets


_HASH_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(concat_ws('_', {cols})), 1, 15)) AS BIGINT) % {buckets}"
)


@query(
    "q_sample_hash",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE {_HASH_BUCKET_SQL.format(cols="l_orderkey, l_linenumber", buckets=100)}
          < {SAMPLE_PCT}
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% sample of lineitem keyed on the line identity.

    Scale: the predicate is a plain filter over per-row expressions —
    no shuffle, no state, embarrassingly parallel, and stable across
    reruns/engines (unlike TABLESAMPLE/rand()).  Sampling rate changes
    are monotone: the 5% sample is a superset of the 1% sample.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bucket = hash_bucket(F.col("l_orderkey"), F.col("l_linenumber"))
    par = scan_parallelism(spark, sf_dir, "lineitem")
    if par:
        # Under-split scan: Catalyst pushes the (non-source-pushable) md5
        # predicate below any plain repartition, so the hashing would
        # still run inside the one-task scan stage.  The predicate is
        # kept above the exchange by folding a value-neutral
        # NONDETERMINISTIC term into it (spark_partition_id() * 0 —
        # always adds zero, so the kept rows are identical on any
        # placement or task retry): Catalyst neither pushes nor splits
        # a nondeterministic predicate, so the md5 evaluates wide,
        # post-shuffle, in the SAME pipelined job — r20, replacing the
        # r19 lazy-localCheckpoint barrier, which cost a separate
        # plan-analysis + RDD materialization per run (interleaved A/B
        # 1.37x, identical rows).  On a wide scan (par == 0) filtering
        # AT the scan is the right shape — prune before anything moves
        # — so the fence is skipped entirely.
        fenced = (bucket + F.spark_partition_id() * F.lit(0)) < SAMPLE_PCT
        return (
            li.select("l_orderkey", "l_linenumber", "l_extendedprice")
            .repartition(par, F.col("l_orderkey"), F.col("l_linenumber"))
            .filter(fenced)
        )
    return li.filter(bucket < SAMPLE_PCT).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


STRATA_PCT = {"BUILDING": 20, "AUTOMOBILE": 10}  # other segments: 2%


@query(
    "q_sample_stratified",
    oracle=f"""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE {_HASH_BUCKET_SQL.format(cols="c_custkey", buckets=100)}
          < CASE c_mktsegment WHEN 'BUILDING' THEN 20
                              WHEN 'AUTOMOBILE' THEN 10
                              ELSE 2 END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-segment rates (20% / 10%
    / 2%) from one hash predicate — the portable replacement for
    ``df.sampleBy`` when samples must be replayable across engines.

    Scale: still a pure map-side filter (no shuffle, no per-stratum
    pass); rebalancing rates re-uses the same buckets, so a raised
    rate strictly grows the previous sample.
    """
    c = load_table(spark, sf_dir, "customer")
    rate = F.when(F.col("c_mktsegment") == "BUILDING", F.lit(STRATA_PCT["BUILDING"]))
    rate = rate.when(F.col("c_mktsegment") == "AUTOMOBILE", F.lit(STRATA_PCT["AUTOMOBILE"]))
    rate = rate.otherwise(F.lit(2))
    return c.filter(hash_bucket(F.col("c_custkey")) < rate).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )


@query(
    "q_events_pruned",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY event_type
    """,
)
def q_events_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded events aggregate whose bound PRUNES THE SCAN.

    Uses load_events (filter on the raw nanos long before the micros
    conversion) so the [since, until) predicate lands in PushedFilters
    — on a 100 TB time-partitioned events table this is the difference
    between reading ten days and reading everything.  Plan-gated in
    tests/test_plans.py.
    """
    from pypeline_spark.session import load_events

    e = load_events(spark, sf_dir, since="2024-01-10", until="2024-01-20")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


N_SALTS = 16


@query(
    "q_agg_salted",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a deliberately skewed key
    (l_returnflag has 3 values — every row hits one of 3 reducers in a
    naive plan).

    Phase 1 groups by (key, salt in [0,16)) so each hot key spreads
    over 16 reducers; phase 2 combines partials per key.  Sums and
    counts re-aggregate losslessly (decimal until the final cast, so
    summation order can't move the double).  The oracle is the direct
    single-phase GROUP BY — identical results is the correctness claim
    for the salting rewrite.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # xxhash64, not the md5 hash_bucket: the salt only places rows, it
    # never reaches the result, so it needs no cross-engine portability
    # — just speed (md5 here measured ~3x the whole query's agg cost)
    salt = F.pmod(
        F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber")), F.lit(N_SALTS)
    ).alias("salt")
    partial = (
        li.select(
            "l_returnflag",
            salt,
            F.col("l_extendedprice").cast("decimal(18,2)").alias("price_d"),
            F.col("l_quantity").cast("decimal(18,2)").alias("qty_d"),
        )
        .groupBy("l_returnflag", "salt")
        .agg(
            F.count("*").alias("n_p"),
            F.sum("price_d").alias("price_p"),
            F.sum("qty_d").alias("qty_p"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("n_p").alias("n"),
        F.sum("price_p").cast("double").alias("sum_price"),
        F.sum("qty_p").cast("double").alias("sum_qty"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_by: list[str],
    n_salt: int = N_SALTS,
) -> DataFrame:
    """Equi-join with explicit key salting: the fact side gets a
    deterministic salt in [0, n_salt) from non-key columns, the dim
    side is replicated once per salt value, and the join key becomes
    (key, salt) — a hot key's rows spread over n_salt reducers.

    This is the manual fallback for skew AQE can't fix: AQE splits
    skewed *shuffle partitions* of a sort-merge join, but can't help
    when the join must preserve a partitioning for a downstream stage,
    or in stream-static joins where there is no runtime re-plan.  The
    salt changes only row placement, never the result (oracle-checked
    against the plain join).  Cost: dim side inflates n_salt× — only
    salt against small-to-medium dims.
    """
    # xxhash64 salt: placement-only (never in the result), so JVM-cheap
    # beats the md5 hash_bucket reserved for replayable sampling
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_by]), F.lit(n_salt))
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    return f.join(d, on + ["__salt"]).drop("__salt")


@query(
    "q_join_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join (shuffle-hash forced so the salt actually
    governs placement; with broadcast the salt would be moot).  The
    oracle is the unsalted join — identical results is the correctness
    claim for the salting rewrite."""
    li = load_table(spark, sf_dir, "lineitem")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_totalprice"
        )
    )
    joined = salted_join(
        li.hint("shuffle_hash"),
        o,
        on=["l_orderkey"],
        salt_by=["l_orderkey", "l_linenumber"],
    )
    return joined.select("l_orderkey", "l_linenumber", "o_orderdate", "o_totalprice")


def enrich_events(
    events: DataFrame, customer: DataFrame, include_distinct: bool = True
) -> DataFrame:
    """Fact-stream x dimension broadcast join + per-segment rollup.

    Works identically on a batch or streaming `events` relation —
    stream-static equi-joins are supported natively by Structured
    Streaming, and the broadcast hint keeps the dimension on every
    executor (no shuffle of the fact side at any scale).  Streaming
    callers pass include_distinct=False (exact COUNT DISTINCT is not
    incrementally computable; the streaming variant would use
    approx_count_distinct).
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    aggs = [
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ]
    if include_distinct:
        aggs.append(F.countDistinct("user_id").alias("n_users"))
    return events.join(F.broadcast(dim), "user_id").groupBy("c_mktsegment").agg(*aggs)


@query(
    "q_stream_enrich",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment in batch form (the streaming parity
    test drives the same ``enrich_events`` plan with readStream)."""
    return enrich_events(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bin,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (25k bins).

    Scale: binning is a map-side expression; the aggregate shuffles
    only (bin -> partial stats), i.e. output cardinality = bin count,
    independent of input size.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bin", F.floor(F.col("o_totalprice") / 25000).cast("bigint")
        )
        .groupBy("bin")
        .agg(
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q_unpivot",
    oracle="""
    WITH base AS (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-09-01'
    )
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS val FROM base
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM base
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM base
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM base
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long unpivot of the four lineitem measures (recent
    shipments only, so the filter pushes down below the unpivot).

    Scale: ``unpivot`` is a generate-style projection — 4x rows out
    but zero shuffle; the melt happens inside the scan stage.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1998-09-01").cast("timestamp"))
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            variableColumnName="measure",
            valueColumnName="val",
        )
    )


WEIGHTED_TARGET = 200  # expected sample size (rows), scale-free


@query(
    "q_sample_weighted",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE {_HASH_BUCKET_SQL.format(cols="o_orderkey", buckets=10**9)}
          < o_totalprice
            / CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
                   AS DOUBLE)
            * {WEIGHTED_TARGET} * 1000000000.0
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sample: P(keep) ~ o_totalprice,
    expected size WEIGHTED_TARGET — the importance-sampling primitive
    for value-weighted corpus subsets (sample documents ~ quality
    score, orders ~ revenue, ...).

    Determinism across engines is the design constraint:
    - randomness is the md5 hash of the row key (same trick as
      q_sample_hash) — a uniform integer in [0, 1e9), replayable;
    - the weight TOTAL is summed as DECIMAL, not DOUBLE: decimal
      addition is exact and order-independent, so the inclusion
      threshold w/W doesn't wobble with partition/summation order;
    - the per-row threshold uses only +,*,/ on doubles (correctly
      rounded IEEE ops — identical everywhere), never pow/log, so the
      classic u^(1/w) exp-sort formulation is deliberately avoided.

    Scale: one scalar-subquery aggregate (map-side partial sum) +
    a map-side filter — no shuffle of the kept rows, and the sample
    is a pushed-down predicate like every sampler in this module.
    """
    o = load_table(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM {{o}}
        WHERE CAST(conv(substr(md5(concat_ws('_', o_orderkey)), 1, 15), 16, 10)
                   AS BIGINT) % 1000000000
              < o_totalprice
                / CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        FROM {{o2}}) AS DOUBLE)
                * {WEIGHTED_TARGET} * 1000000000.0
        """,
        o=o,
        o2=o,
    )


SKEW_TOP = 10


@query(
    "q_key_skew",
    # Exact-integer diagnostics: share/skew are single divisions of
    # exact counts, so 6dp rounding is engine-stable.
    oracle=f"""
    WITH per_key AS (
        SELECT o_custkey AS custkey, COUNT(*) AS cnt
        FROM orders GROUP BY o_custkey
    ),
    g_stats AS (
        SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS total
        FROM per_key
    )
    SELECT p.custkey, p.cnt,
           ROUND(p.cnt * 1.0 / g.total, 6)          AS share,
           ROUND(p.cnt * 1.0 * g.n_keys / g.total, 6) AS skew_factor
    FROM per_key p, g_stats g
    ORDER BY p.cnt DESC, p.custkey
    LIMIT {SKEW_TOP}
    """,
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic: the {SKEW_TOP} hottest order
    custkeys with their row share and skew factor (count over the
    uniform-key expectation) — the measurement that decides whether a
    key needs salting (q_agg_salted / q_join_salted) or AQE skew-join
    handles it.

    Scale: one partial-aggregated count per key, a 1-row global
    rollup broadcast-hash-joined back (always-zero derived key — same
    no-BNLJ pattern as q_bm25), and a TakeOrdered top-{SKEW_TOP}; no
    full sort, no window over the key table.
    """
    o = load_table(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("cnt")
    )
    glob = per_key.agg(
        F.count("*").alias("n_keys"), F.sum("cnt").cast("bigint").alias("total")
    )
    return (
        per_key.withColumn("__k", F.pmod(F.xxhash64("custkey"), F.lit(1)).cast("int"))
        .join(
            F.broadcast(
                glob.withColumn("__k", F.pmod(F.col("n_keys"), F.lit(1)).cast("int"))
            ),
            "__k",
        )
        .select(
            "custkey",
            "cnt",
            F.round(F.col("cnt") * F.lit(1.0) / F.col("total"), 6).alias("share"),
            F.round(
                F.col("cnt") * F.lit(1.0) * F.col("n_keys") / F.col("total"), 6
            ).alias("skew_factor"),
        )
        .orderBy(F.col("cnt").desc(), "custkey")
        .limit(SKEW_TOP)
    )
