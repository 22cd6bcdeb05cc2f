"""Data-quality profiling: per-column null/distinct/min/max in ONE pass.

The standard pre-training hygiene step (and the engine-side half of
ANALYZE/statistics collection): profile every column of a table without
one scan per column.  Spark shape: a single wide aggregate computes all
metrics for all columns in one scan + one reduce, then a ``stack``
unpivot turns the 1-row wide result into (column, metric...) rows —
the unpivot is a zero-shuffle projection of a 1-row relation, so the
whole profile costs exactly one scan regardless of column count.

Min/max are emitted as strings so heterogeneous column types fit one
schema (the same trick every profiler uses).  Double columns are NOT
profiled here: engines disagree on float-to-string rendering
(1e7 vs 10000000.0), which would break the differential harness on
formatting, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per col,
    computed in one scan / one aggregate.

    Scale note: N exact countDistinct aggregates make Catalyst Expand
    the input N ways; at warehouse scale swap them for
    approx_count_distinct (HLL sketch, no Expand) — exact distincts
    here keep the profile oracle-checkable.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, __nn, n_distinct, min_val, max_val)",
        "__n",
    ).select(
        "column",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_val",
        "max_val",
    )


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]


@query(
    "q_column_profile",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column, COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_val,
           CAST(MAX({c}) AS VARCHAR) AS max_val
    FROM orders
    """
        for c in _PROFILE_COLS
    ),
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of orders (nulls, cardinality, range)."""
    o = load_table(spark, sf_dir, "orders")
    return profile_columns(o, _PROFILE_COLS)


def _check(name: str, violations: F.Column, total: F.Column):
    return (name, violations, total)


@query(
    "q_dq_checks",
    oracle="""
    SELECT 'customer_pk_unique' AS check_name,
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS violations,
           COUNT(*) AS total
    FROM customer
    UNION ALL
    SELECT 'orders_fk_customer' AS check_name,
           CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
               AS violations,
           COUNT(*) AS total
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_qty_in_domain' AS check_name,
           CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                AS BIGINT) AS violations,
           COUNT(*) AS total
    FROM lineitem
    UNION ALL
    SELECT 'events_user_not_null' AS check_name,
           CAST(COUNT(*) - COUNT(user_id) AS BIGINT) AS violations,
           COUNT(*) AS total
    FROM events
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit: PK uniqueness, FK integrity, value domain,
    non-null — one row per check with violation and total counts.

    The data-quality gate a pipeline runs BEFORE a merge (the
    reference trusts its DBs' constraints; ref: Pype.py:97-148 relies
    on ON CONFLICT against a real PK — an object-store lakehouse has
    no such enforcement, so the engine provides it).  Each check is a
    single scan + aggregate; the FK check is one equi-join whose
    dimension side broadcasts.  Checks over the same table could share
    a scan (as profile_columns does); they stay separate here so each
    check's cost is attributable.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")

    pk = c.agg(
        F.lit("customer_pk_unique").alias("check_name"),
        (F.count("*") - F.countDistinct("c_custkey")).cast("bigint").alias("violations"),
        F.count("*").alias("total"),
    )
    fk = (
        o.join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"), "left")
        .agg(
            F.lit("orders_fk_customer").alias("check_name"),
            F.count(F.when(F.col("c_custkey").isNull(), 1)).cast("bigint").alias("violations"),
            F.count("*").alias("total"),
        )
    )
    dom = li.agg(
        F.lit("lineitem_qty_in_domain").alias("check_name"),
        F.count(F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1))
        .cast("bigint")
        .alias("violations"),
        F.count("*").alias("total"),
    )
    nn = e.agg(
        F.lit("events_user_not_null").alias("check_name"),
        (F.count("*") - F.count("user_id")).cast("bigint").alias("violations"),
        F.count("*").alias("total"),
    )
    return pk.unionByName(fk).unionByName(dom).unionByName(nn)


DP_BOUND = 10  # noise drawn uniformly from [-DP_BOUND, +DP_BOUND]
DP_SEED = "dp-r5-seed"


@query(
    "q_dp_counts",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS true_n,
           CAST(CAST(('0x' || substr(md5('{DP_SEED}|' || c_mktsegment), 1, 8))
                AS BIGINT) % {2 * DP_BOUND + 1} - {DP_BOUND} AS BIGINT) AS noise,
           CAST(COUNT(*)
                + CAST(('0x' || substr(md5('{DP_SEED}|' || c_mktsegment), 1, 8))
                  AS BIGINT) % {2 * DP_BOUND + 1} - {DP_BOUND}
                AS BIGINT) AS noisy_n
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noise-added group counts — the privacy-release plumbing
    (bounded additive noise per published aggregate) with the noise
    drawn DETERMINISTICALLY from a seeded hash of the group key.

    Honest caveat, stated not hidden: seeded hash noise is replayable
    (that is what makes it differentially testable and what a release
    pipeline's dry-run mode wants); actual differential privacy
    requires fresh randomness and a calibrated mechanism — swap the
    hash draw for a Laplace/geometric sampler at release time.  The
    true count is emitted alongside for the audit tier; the published
    projection drops it.

    Scale: noise is a map-side expression over the aggregated rows —
    cost is the groupBy that was already being paid.
    """
    c = load_table(spark, sf_dir, "customer")
    noise = (
        F.conv(F.substring(F.md5(F.concat(F.lit(DP_SEED + "|"), F.col("c_mktsegment"))), 1, 8), 16, 10)
        .cast("bigint")
        % (2 * DP_BOUND + 1)
        - DP_BOUND
    ).cast("bigint")
    return (
        c.groupBy("c_mktsegment")
        .agg(F.count("*").alias("true_n"))
        .select(
            "c_mktsegment",
            "true_n",
            noise.alias("noise"),
            (F.col("true_n") + noise).cast("bigint").alias("noisy_n"),
        )
    )


K_ANON = 5  # groups smaller than this are re-identification risks


@query(
    "q_kanon",
    oracle=f"""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
               AS rows_at_risk
    FROM g GROUP BY c_nationkey
    """,
)
def q_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (nation, market segment): per nation, how many QI groups exist,
    how many fall below k=5 members, and how many rows those small
    groups expose — the suppression worklist a privacy review runs
    before any row-level data release.

    Scale: two stacked aggregates, the second over group-level rows
    (cardinality = |QI space|, tiny); nothing row-level leaves the
    first shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("n"))
    return g.groupBy("c_nationkey").agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum((F.col("n") < K_ANON).cast("int")).cast("bigint").alias("n_small"),
        F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
    )


# Cohorts split by day-of-month parity: both sides populated at every
# fixture scale (a fixed date cutoff left one side empty at sf0.001).


@query(
    "q_schema_drift",
    oracle=f"""
    WITH tagged AS (
        SELECT CAST(day(CAST(ts AS DATE)) % 2 AS INT) AS late,
               user_id, event_type, value
        FROM events
    ),
    per AS (
        SELECT c.col,
               CAST(SUM(CASE WHEN late = 0 THEN 1 ELSE 0 END) AS BIGINT) AS early_n,
               CAST(SUM(CASE WHEN late = 1 THEN 1 ELSE 0 END) AS BIGINT) AS late_n,
               CAST(SUM(CASE WHEN late = 0 AND (CASE c.col
                    WHEN 'user_id' THEN user_id IS NULL
                    WHEN 'event_type' THEN event_type IS NULL
                    ELSE value IS NULL END) THEN 1 ELSE 0 END) AS BIGINT) AS early_null,
               CAST(SUM(CASE WHEN late = 1 AND (CASE c.col
                    WHEN 'user_id' THEN user_id IS NULL
                    WHEN 'event_type' THEN event_type IS NULL
                    ELSE value IS NULL END) THEN 1 ELSE 0 END) AS BIGINT) AS late_null,
               CAST(COUNT(DISTINCT CASE WHEN late = 0 THEN (CASE c.col
                    WHEN 'user_id' THEN CAST(user_id AS VARCHAR)
                    WHEN 'event_type' THEN event_type
                    ELSE CAST(value AS VARCHAR) END) END) AS BIGINT) AS early_distinct,
               CAST(COUNT(DISTINCT CASE WHEN late = 1 THEN (CASE c.col
                    WHEN 'user_id' THEN CAST(user_id AS VARCHAR)
                    WHEN 'event_type' THEN event_type
                    ELSE CAST(value AS VARCHAR) END) END) AS BIGINT) AS late_distinct
        FROM tagged CROSS JOIN (
            SELECT unnest(['user_id', 'event_type', 'value']) AS col) c
        GROUP BY c.col
    )
    SELECT col,
           early_n, late_n, early_null, late_null,
           early_distinct, late_distinct,
           CAST(ABS((10000 * early_null) // early_n
                    - (10000 * late_null) // late_n) AS BIGINT)
               AS null_drift_bp
    FROM per
    """,
)
def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level drift audit between two row cohorts (split by
    day-of-month parity here; any period predicate in production): per
    audited column, row/null/distinct counts per cohort plus the null-rate
    shift in basis points — the check that catches an upstream producer
    quietly starting to emit NULLs or collapsing a category's
    cardinality (schema drift that type checks never see).

    Scale: ONE scan — the period tag is a map-side flag and every
    per-column stat is a conditional aggregate over the same pass
    (values stringified into a common type for the distinct sketch; at
    100 TB swap COUNT(DISTINCT ...) for approx_count_distinct with the
    banded-oracle pattern).
    """
    e = load_table(spark, sf_dir, "events")
    late = (F.dayofmonth(F.to_date("ts")) % 2).cast("int")
    tagged = e.select(
        late.alias("late"),
        F.col("user_id").cast("string").alias("user_id"),
        "event_type",
        F.col("value").cast("string").alias("value"),
    )
    # ONE aggregate over one scan: all per-column conditional stats are
    # computed side by side in a single .agg(), then unpivoted with
    # stack() — previously this built one whole-table aggregate per
    # audited column and unioned them (3 scans of events).
    cols = ("user_id", "event_type", "value")
    aggs = [
        F.sum((F.col("late") == 0).cast("long")).cast("bigint").alias("early_n"),
        F.sum((F.col("late") == 1).cast("long")).cast("bigint").alias("late_n"),
    ]
    for col in cols:
        c = F.col(col)
        aggs += [
            F.sum(((F.col("late") == 0) & c.isNull()).cast("long"))
            .cast("bigint")
            .alias(f"{col}__early_null"),
            F.sum(((F.col("late") == 1) & c.isNull()).cast("long"))
            .cast("bigint")
            .alias(f"{col}__late_null"),
            F.countDistinct(F.when(F.col("late") == 0, c))
            .cast("bigint")
            .alias(f"{col}__early_distinct"),
            F.countDistinct(F.when(F.col("late") == 1, c))
            .cast("bigint")
            .alias(f"{col}__late_distinct"),
        ]
    wide = tagged.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__early_null, {col}__late_null, "
        f"{col}__early_distinct, {col}__late_distinct"
        for col in cols
    )
    out = wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col, early_null, late_null, early_distinct, late_distinct)"
        ),
        "early_n",
        "late_n",
    ).select(
        "col", "early_n", "late_n", "early_null", "late_null",
        "early_distinct", "late_distinct",
    )
    return out.withColumn(
        "null_drift_bp",
        F.abs(
            F.expr("(10000 * early_null) DIV early_n")
            - F.expr("(10000 * late_null) DIV late_n")
        ).cast("bigint"),
    )
