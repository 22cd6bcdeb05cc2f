"""Window functions: ranking, navigation, running frames, top-k.

All ranking orders include a unique tie-break key so results are
deterministic across engines and across Spark's own task retries.

Scale: a window over ``partitionBy(k)`` is one hash exchange on k plus a
per-partition sort; no global sort.  Global top-k (q_topk) uses
TakeOrderedAndProject — per-partition heaps, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table, scan_parallelism


@query(
    "q_window_topn",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number + filter).

    r19: on an under-split scan, project to the 3 needed columns and
    hash-repartition on the window key first — the window's required
    ClusteredDistribution is satisfied by that exchange (still exactly
    ONE Exchange hashpartitioning, plan-gated), but the sort runs on
    every core instead of downstream of a one-task scan (1.35x at
    sf0.1).  On a wide scan the window's own exchange does this already.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    par = scan_parallelism(spark, sf_dir, "orders")
    if par:
        o = o.repartition(par, F.col("o_custkey"))
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders WHERE o_custkey <= 200
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) spend per customer in order-date order."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation within each customer's order history."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "q_window_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer WHERE c_custkey <= 400
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile within market segment."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    wt = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(wt).alias("quartile"),
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume,
           NTH_VALUE(c_acctbal, 2) OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_highest_bal
    FROM customer WHERE c_custkey <= 400
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value distribution analytics.

    Scale: one shuffle keyed by the partition column; the nth_value
    frame is unbounded-both so it evaluates as a per-partition
    constant, not a per-row scan.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("c_acctbal", 2).over(wf).alias("second_highest_bal"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate, ROUND(SUM(o_totalprice), 2) AS day_rev
        FROM orders GROUP BY o_orderdate
    )
    SELECT o_orderdate, day_rev,
           ROUND(SUM(day_rev) OVER (ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2) AS rev_7d
    FROM daily
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing revenue via a RANGE frame over pre-aggregated days.

    Scale: pre-aggregating to one row per day first keeps the (global)
    range window tiny; the expensive part stays a partial-agg groupBy.
    """
    from pypeline_spark.session import register_tables

    register_tables(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        WITH daily AS (
            SELECT o_orderdate, ROUND(SUM(o_totalprice), 2) AS day_rev
            FROM orders GROUP BY o_orderdate
        )
        SELECT o_orderdate, day_rev,
               ROUND(SUM(day_rev) OVER (ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2) AS rev_7d
        FROM daily
        """
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with an explicit full frame for last."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price.

    Scale: orderBy+limit compiles to TakeOrderedAndProject — each
    partition keeps a 10-row heap, the driver merges heaps; no global
    sort, no full shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    ORDER BY c_custkey LIMIT 20 OFFSET 50
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination — the native form of the reference's
    vestigial OFFSET suffix (ref: /root/reference/pypeline/Pype.py:174-175)."""
    c = load_table(spark, sf_dir, "customer")
    return c.orderBy("c_custkey").offset(50).limit(20).select("c_custkey", "c_name")


@query(
    "q_interpolate",
    # Gaps are synthesized deterministically (every 7th event_id loses
    # its value); interior gaps linear-interpolate between the nearest
    # non-null neighbors, boundary gaps stay NULL.  Identical
    # expression shape both sides: pv + (nv - pv) * ((t - pt)/(nt - pt))
    # over integer microsecond deltas, rounded to 4.
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
               epoch_us(ts) AS t
        FROM events WHERE user_id < 20
    ),
    n AS (
        SELECT user_id, event_id, ts, v, t,
               last_value(v IGNORE NULLS) OVER w_prev AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
                   OVER w_prev AS pt,
               first_value(v IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
                   OVER w_next AS nt
        FROM g
        WINDOW w_prev AS (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               w_next AS (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id,
           ROUND(COALESCE(v, pv + (nv - pv) * ((t - pt) * 1.0 / (nt - pt))), 4)
               AS value_filled,
           (v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS was_interpolated
    FROM n
    """,
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation of missing values.

    Interior NULLs fill as pv + (nv-pv)*frac between the nearest
    non-null neighbors (last/first with ignorenulls over asymmetric
    frames); boundary NULLs stay NULL.  One shuffle on user_id covers
    both window frames — the standard sensor-data repair op.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    v = F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double")).otherwise(
        F.col("value")
    )
    t = F.unix_micros(F.col("ts"))
    g = e.select("user_id", "event_id", "ts", v.alias("v"), t.alias("t"))
    w_prev = (
        W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, -1)
    )
    w_next = (
        W.partitionBy("user_id").orderBy("ts").rowsBetween(1, W.unboundedFollowing)
    )
    tv = F.when(F.col("v").isNotNull(), F.col("t"))
    n = g.select(
        "user_id",
        "event_id",
        "v",
        "t",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(tv, ignorenulls=True).over(w_prev).alias("pt"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(tv, ignorenulls=True).over(w_next).alias("nt"),
    )
    frac = (F.col("t") - F.col("pt")) * F.lit(1.0) / (F.col("nt") - F.col("pt"))
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    return n.select(
        "user_id",
        "event_id",
        F.round(F.coalesce(F.col("v"), interp), 4).alias("value_filled"),
        (
            F.col("v").isNull() & F.col("pv").isNotNull() & F.col("nv").isNotNull()
        ).alias("was_interpolated"),
    )


@query(
    "q_period_growth",
    # Month-over-month revenue growth in basis points.  Revenue stays
    # DECIMAL through the sum and converts to integer hundredths of a
    # cent — x10000 clears the product's full scale-4, so the cast is
    # exact on both engines (x100 would leave fractional digits that
    # Spark truncates and DuckDB rounds).  The growth ratio is integer
    # DIV — Spark's DIV and DuckDB's // both truncate toward zero
    # (verified on negatives), so declining months hash-match too.
    oracle="""
    WITH monthly AS (
        SELECT date_trunc('month', l_shipdate) AS month,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    * 10000 AS BIGINT) AS rev_cq
        FROM lineitem GROUP BY month
    )
    SELECT month, rev_cq,
           LAG(rev_cq) OVER (ORDER BY month) AS prev_cq,
           (10000 * (rev_cq - LAG(rev_cq) OVER (ORDER BY month)))
               // LAG(rev_cq) OVER (ORDER BY month) AS growth_bp
    FROM monthly
    """,
)
def q_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the period-over-period readout
    every revenue dashboard runs, with the ratio in integer basis
    points.

    Scale: the heavy work is the monthly rollup (map-side partial sums
    into a |months|-row table); the LAG window then runs over that
    tiny aggregate in a single partition BY DESIGN — windowing the
    aggregate, never the fact table.  The growth arithmetic is integer
    end-to-end (decimal cents, truncating DIV).
    """
    from pypeline_spark.operators.relational import _disc_price

    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("month")
    ).agg((F.sum(_disc_price()) * 10000).cast("bigint").alias("rev_cq"))
    w = W.orderBy("month")
    return (
        monthly.withColumn("prev_cq", F.lag("rev_cq").over(w))
        .withColumn(
            "growth_bp",
            F.expr("(10000 * (rev_cq - prev_cq)) DIV prev_cq"),
        )
    )
