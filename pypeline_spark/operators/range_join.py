"""Range (interval) joins and as-of joins over the events table.

Spark has no native as-of/range join operator; these compose it from
equi-join + range predicate (bounded per-key fan-out) and from a
union + window "last known value" plan — both shuffle once on the key
and never fall back to a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table, scan_parallelism


@query(
    "q_range_join",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_pairs,
           ROUND(SUM(b.value - a.value), 2) AS delta_sum
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    GROUP BY a.user_id
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: event pairs per user within 10 minutes.

    Scale: the equi-key (user_id) bounds the join — one sort-merge
    exchange on user_id, then the range predicate filters within each
    key group.  Never a cross product; skewed users are split by AQE
    skew-join handling.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    # Under-split scan (single-row-group fixture): the probe side of the
    # per-key join otherwise runs inside the one-task scan stage —
    # spreading it first measured 2.5x at sf0.1.  scan_parallelism
    # returns 0 on a wide scan, where the join's own exchange (or AQE)
    # already owns the placement.
    par = scan_parallelism(spark, sf_dir, "events")
    a = (e.repartition(par, F.col("user_id")) if par else e).alias("a")
    b = e.alias("b")
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    return joined.groupBy(F.col("a.user_id").alias("user_id")).agg(
        F.count("*").alias("n_pairs"),
        F.round(F.sum(F.col("b.value") - F.col("a.value")), 2).alias("delta_sum"),
    )


@query(
    "q_asof_join",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type = 'view' THEN ts END AS view_ts,
               event_type
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    filled AS (
        SELECT user_id, ts, event_id, value, event_type,
               MAX(view_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
        FROM tagged
    )
    SELECT event_id, user_id, ts, last_view_ts,
           CAST(date_diff('second', last_view_ts, ts) AS BIGINT) AS secs_since_view
    FROM filled WHERE event_type = 'purchase'
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent prior-or-equal view
    by the same user.

    Implemented as the classic union + running-max plan: tag view rows
    with their own ts, take the running max per user in time order, keep
    purchase rows.  One shuffle on user_id, one sort — same cost shape
    as a window function, vs. the naive per-row subquery which is a
    range self-join.  (pandas merge_asof per group via applyInPandas is
    the fallback for non-SQL as-of semantics like nearest/backward
    tolerance.)
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = e.withColumn(
        "view_ts", F.when(F.col("event_type") == "view", F.col("ts"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = tagged.withColumn("last_view_ts", F.max("view_ts").over(w))
    return filled.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        "last_view_ts",
        (F.unix_timestamp("ts") - F.unix_timestamp("last_view_ts"))
        .cast("bigint")
        .alias("secs_since_view"),
    )


@query(
    "q_asof_forward",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'purchase' THEN ts END AS purchase_ts
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    filled AS (
        SELECT user_id, ts, event_id, event_type,
               MIN(purchase_ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_purchase_ts
        FROM tagged
    )
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           epoch_us(next_purchase_ts) AS next_purchase_us,
           (epoch_us(next_purchase_ts) - epoch_us(ts)) // 1000000
               AS secs_until_purchase
    FROM filled WHERE event_type = 'view'
    """,
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each view, the next at-or-after purchase
    by the same user (the conversion-lag direction; q_asof_join is the
    backward mirror).

    Scale: same union + running-extreme plan as q_asof_join — one
    shuffle on user_id, one in-partition sort, the extreme taken over
    the FOLLOWING frame.  No self-join, no fan-out.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = e.withColumn(
        "purchase_ts", F.when(F.col("event_type") == "purchase", F.col("ts"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    filled = tagged.withColumn("next_purchase_ts", F.min("purchase_ts").over(w))
    return filled.filter(F.col("event_type") == "view").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("next_purchase_ts").alias("next_purchase_us"),
        F.expr(
            "(unix_micros(next_purchase_ts) - unix_micros(ts)) DIV 1000000"
        ).alias("secs_until_purchase"),
    )


ASOF_TOL_SECS = 300  # nearest-match tolerance: 5 minutes


@query(
    "q_asof_nearest",
    oracle=f"""
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'view' THEN ts END AS view_ts
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    filled AS (
        SELECT user_id, ts, event_id, event_type,
               MAX(view_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_view_ts,
               MIN(view_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_view_ts
        FROM tagged
    ),
    scored AS (
        SELECT event_id, user_id, ts,
               date_diff('second', prev_view_ts, ts) AS back_secs,
               date_diff('second', ts, next_view_ts) AS fwd_secs,
               prev_view_ts, next_view_ts
        FROM filled WHERE event_type = 'purchase'
    )
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           epoch_us(CASE
             WHEN back_secs IS NOT NULL AND back_secs <= {ASOF_TOL_SECS}
                  AND (fwd_secs IS NULL OR back_secs <= fwd_secs
                       OR fwd_secs > {ASOF_TOL_SECS})
               THEN prev_view_ts
             WHEN fwd_secs IS NOT NULL AND fwd_secs <= {ASOF_TOL_SECS}
               THEN next_view_ts
           END) AS nearest_view_us,
           CAST(CASE
             WHEN back_secs IS NOT NULL AND back_secs <= {ASOF_TOL_SECS}
                  AND (fwd_secs IS NULL OR back_secs <= fwd_secs
                       OR fwd_secs > {ASOF_TOL_SECS})
               THEN back_secs
             WHEN fwd_secs IS NOT NULL AND fwd_secs <= {ASOF_TOL_SECS}
               THEN fwd_secs
           END AS BIGINT) AS nearest_secs
    FROM scored
    """,
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join with tolerance: for each purchase, the closest
    view by the same user within 5 minutes in EITHER direction
    (pandas ``merge_asof(direction='nearest', tolerance=...)``
    semantics); backward wins distance ties.

    Scale: one user_id shuffle and one sort serve BOTH direction fills
    (running max over preceding, running min over following) — the
    nearest pick is then a row-local CASE.  Nothing about the
    tolerance or tie-break touches the shuffle shape; a self-join
    formulation would fan out per candidate instead.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = e.withColumn(
        "view_ts", F.when(F.col("event_type") == "view", F.col("ts"))
    )
    order = ["ts", "event_id"]
    back = W.partitionBy("user_id").orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    fwd = W.partitionBy("user_id").orderBy(*order).rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    filled = tagged.withColumn("prev_view_ts", F.max("view_ts").over(back)).withColumn(
        "next_view_ts", F.min("view_ts").over(fwd)
    )
    scored = filled.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp("prev_view_ts")).alias("back_secs"),
        (F.unix_timestamp("next_view_ts") - F.unix_timestamp("ts")).alias("fwd_secs"),
        "prev_view_ts",
        "next_view_ts",
    )
    back_ok = F.col("back_secs").isNotNull() & (F.col("back_secs") <= ASOF_TOL_SECS)
    back_wins = back_ok & (
        F.col("fwd_secs").isNull()
        | (F.col("back_secs") <= F.col("fwd_secs"))
        | (F.col("fwd_secs") > ASOF_TOL_SECS)
    )
    fwd_ok = F.col("fwd_secs").isNotNull() & (F.col("fwd_secs") <= ASOF_TOL_SECS)
    return scored.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros(
            F.when(back_wins, F.col("prev_view_ts")).when(
                fwd_ok, F.col("next_view_ts")
            )
        ).alias("nearest_view_us"),
        F.when(back_wins, F.col("back_secs"))
        .when(fwd_ok, F.col("fwd_secs"))
        .cast("bigint")
        .alias("nearest_secs"),
    )
