r"""Behavioral event analytics: conversion funnel, cohort retention,
and statistical outlier detection over the ``events`` table.

These are the product-analytics queries the reference serves by
shipping raw SQL to its source database (ref:
/root/reference/pypeline/Pype.py:36 — ``extract_query`` is arbitrary
SQL); here each is a native Catalyst plan per SURVEY.md §2b.

Scale notes (100 TB events):
- The funnel anchors every user at their FIRST view and checks the
  other steps inside a fixed window after it.  The expensive part is
  the per-user anchor join: it is an **equi-join on user_id** (the
  window predicate is a post-join filter within the key group), so it
  shuffles both sides once on user_id — never a cartesian.  AQE
  handles hot users (bot traffic) via skew-split; the
  ``test_plans.py`` nested-loop sweep covers this query too.
- Cohort retention is two hash aggregates over one scan pattern
  (first-touch per user, then distinct users per (cohort, offset)).
  countDistinct shuffles (cohort_day, day_offset, user_id) — the
  right layout, since user_id is already the finest grain.
- Outlier scoring broadcasts a 5-row per-type stats table back onto
  the stream of events: one scan + one tiny shuffle for the stats,
  map-side z-score, no second full shuffle.
- All window arithmetic is integer microseconds (``unix_micros`` /
  ``epoch_us``) — the engine-portable form this repo uses everywhere
  for time gaps (see operators/windows.py:254,290).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

FUNNEL_WINDOW_US = 3_600_000_000  # 1 hour after the anchor view
RETENTION_MAX_DAY = 13  # two weeks of daily cohort offsets
Z_CUTOFF = 2.5
BASKET_TOP = 20  # co-occurrence pairs returned


@query(
    "q_funnel",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id, MIN(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    flags AS (
        SELECT f.user_id,
               MAX(CASE WHEN e.event_type = 'click'
                         AND e.ts > f.first_view
                         AND epoch_us(e.ts) - epoch_us(f.first_view)
                             <= {FUNNEL_WINDOW_US}
                        THEN 1 ELSE 0 END) AS clicked,
               MAX(CASE WHEN e.event_type = 'purchase'
                         AND e.ts > f.first_view
                         AND epoch_us(e.ts) - epoch_us(f.first_view)
                             <= {FUNNEL_WINDOW_US}
                        THEN 1 ELSE 0 END) AS purchased
        FROM firsts f JOIN events e ON f.user_id = e.user_id
        GROUP BY f.user_id
    )
    SELECT 'view' AS step, CAST(COUNT(*) AS BIGINT) AS users FROM flags
    UNION ALL
    SELECT 'view_click' AS step,
           CAST(SUM(clicked) AS BIGINT) AS users FROM flags
    UNION ALL
    SELECT 'view_click_purchase' AS step,
           CAST(SUM(CASE WHEN clicked = 1 AND purchased = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS users
    FROM flags
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchored conversion funnel: view -> click -> purchase within 1 h.

    Every user is anchored at their FIRST view; later steps count if
    they occur strictly after the anchor and within the window.  The
    funnel is monotone by construction (a purchase only counts for
    users who also clicked), so the three counts never invert.
    """
    e = load_table(spark, sf_dir, "events")
    firsts = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("first_view"))
    in_window = (F.col("ts") > F.col("first_view")) & (gap <= FUNNEL_WINDOW_US)
    step_hit = lambda t: F.max(  # noqa: E731
        F.when((F.col("event_type") == t) & in_window, 1).otherwise(0)
    )
    flags = (
        firsts.join(e, "user_id")  # equi-join on user_id; window is a post-filter
        .groupBy("user_id")
        .agg(step_hit("click").alias("clicked"), step_hit("purchase").alias("purchased"))
    )
    counts = flags.agg(
        F.count("*").cast("bigint").alias("views"),
        F.sum("clicked").cast("bigint").alias("clicks"),
        F.sum(F.when((F.col("clicked") == 1) & (F.col("purchased") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("conversions"),
    )
    return counts.selectExpr(
        "stack(3, 'view', views, 'view_click', clicks,"
        " 'view_click_purchase', conversions) AS (step, users)"
    )


@query(
    "q_cohort_retention",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INT)
               AS day_offset,
           COUNT(DISTINCT e.user_id) AS users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    WHERE date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
          <= {RETENTION_MAX_DAY}
    GROUP BY f.cohort_day, day_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention: users active N days after first touch.

    Cohort = date of a user's first event; a cell (cohort_day, k)
    counts distinct cohort members active exactly k days later, for
    the first two weeks.
    """
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    offset = F.datediff(F.to_date("ts"), F.col("cohort_day")).cast("int")
    return (
        e.join(firsts, "user_id")
        .withColumn("day_offset", offset)
        .filter(F.col("day_offset") <= RETENTION_MAX_DAY)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("users"))
    )


@query(
    "q_outliers",
    oracle=f"""
    WITH stats AS (
        SELECT event_type,
               AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.mu) / s.sigma, 2) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE ABS((e.value - s.mu) / s.sigma) > {Z_CUTOFF}
    """,
)
def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers: |value - mean| > 2.5 sigma.

    The per-type stats table is tiny (one row per event_type) and
    broadcast back onto the events scan, so scoring is map-side; the
    only shuffle is the stats aggregate itself.
    """
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > Z_CUTOFF)
        .select("event_id", "event_type", "value", F.round(z, 2).alias("z"))
    )


@query(
    "q_market_basket",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT {BASKET_TOP}
    """,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise co-occurrence mining: parts bought together, top 20.

    The pair generation is a SELF-EQUI-JOIN on l_orderkey (the basket
    id); the ``part_a < part_b`` canonicalization is a post-filter
    inside the key group, so fanout is C(basket_size, 2) per order —
    bounded by basket size, never by table size.  This is the frequent-
    itemset (k=2) building block; higher k iterates the same join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(BASKET_TOP)
    )


@query(
    "q_rfm",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS frequency,
               ROUND(SUM(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT custkey, last_order, frequency, monetary,
           NTILE(4) OVER (ORDER BY last_order DESC, custkey) AS r_q,
           NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f_q,
           NTILE(4) OVER (ORDER BY monetary DESC, custkey) AS m_q
    FROM base
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartiles per
    customer.

    One aggregate over orders, then three NTILE windows over the
    (much smaller) per-customer table.  Ties are broken by custkey so
    quartile assignment is total-ordered — identical across engines
    and partition layouts.  Money stays DECIMAL through the sum
    (engine-exact), rounded once at the end.

    Scale note: a global NTILE is a single-partition sort of the
    PER-CUSTOMER table — fine while |customers| << |orders| (the fact
    table never passes through it).  If the dimension itself outgrows
    one partition, swap NTILE for approx_percentile cutoffs broadcast
    onto the base (rank-exactness traded for distribution).
    """
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    return base.select(
        "custkey",
        "last_order",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(W.orderBy(F.col("last_order").desc(), "custkey"))
        .alias("r_q"),
        F.ntile(4)
        .over(W.orderBy(F.col("frequency").desc(), "custkey"))
        .alias("f_q"),
        F.ntile(4)
        .over(W.orderBy(F.col("monetary").desc(), "custkey"))
        .alias("m_q"),
    )


@query(
    "q_rolling_dau",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    contrib AS (
        SELECT unnest(generate_series(day, day + INTERVAL 6 DAY,
                                      INTERVAL 1 DAY)) AS target_day,
               user_id
        FROM daily
    )
    SELECT CAST(target_day AS DATE) AS day,
           COUNT(DISTINCT user_id) AS wau
    FROM contrib
    WHERE CAST(target_day AS DATE) <= (SELECT MAX(CAST(ts AS DATE)) FROM events)
    GROUP BY day
    """,
)
def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — WITHOUT a range join.

    A rolling COUNT(DISTINCT) admits no window frame (distinct isn't
    decomposable), and the naive day-range self-join is a nested loop.
    The scalable formulation INVERTS the window: each (day, user) row
    is exploded to the 7 target days it contributes to, then one hash
    aggregate per target day counts distincts.  Map-side explode ×7 on
    the (days × users) table, one shuffle — survives any scale where
    daily actives fit a shuffle, which is the same condition the
    metric itself needs.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    # scalar bound rides in as a subquery (no driver collect); the
    # DataFrames bind as parameterized table refs — no temp-view
    # side effect on the shared session catalog
    return spark.sql(
        """
        SELECT target_day AS day, COUNT(DISTINCT user_id) AS wau
        FROM (
            SELECT explode(sequence(day, day + INTERVAL 6 DAY)) AS target_day,
                   user_id
            FROM {daily}
        )
        WHERE target_day <= (SELECT MAX(d) FROM {event_days})
        GROUP BY target_day
        """,
        daily=daily,
        event_days=e.select(F.to_date("ts").alias("d")),
    )


EWMA_ALPHA = 0.3


@query(
    "q_ewma_smooth",
    # List-carrying recursion: the naive form (recursion re-JOINING the
    # full ordered CTE each level to fetch rn+1) is O(n·depth) — >560 s
    # for the oracle alone at sf0.1 (r7 sweep finding) while the engine
    # side is linear.  Carrying the per-type value list in the
    # recursion state makes each level O(types); measured 17 s at
    # sf0.1, and the per-step expression `a*vals[rn+1] + b*ewma` is the
    # IDENTICAL IEEE operation order, verified bit-for-bit equal to the
    # join form at sf0.01 before the swap.
    oracle=f"""
    WITH RECURSIVE ordered AS (
        SELECT event_id, event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    lists AS (
        SELECT event_type,
               list(value ORDER BY rn) AS vals,
               list(event_id ORDER BY rn) AS ids,
               COUNT(*) AS n
        FROM ordered GROUP BY event_type
    ),
    r AS (
        SELECT event_type, vals, ids, n, 1 AS rn, vals[1] AS ewma
        FROM lists
        UNION ALL
        SELECT event_type, vals, ids, n, rn + 1,
               {EWMA_ALPHA} * vals[rn + 1] + {1 - EWMA_ALPHA} * ewma
        FROM r WHERE rn < n
    )
    SELECT ids[rn] AS event_id, event_type, vals[rn] AS value,
           ROUND(ewma, 6) AS ewma
    FROM r
    """,
)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per event_type — a
    sequential-state operator no window frame expresses.

    Spark side: applyInPandas per type; the recurrence
    ``y = a*x + (1-a)*y_prev`` runs as an explicit loop with the SAME
    IEEE operation order as the DuckDB recursive-CTE oracle, so the
    match is exact, not approximate.  Total order within a group is
    (ts, event_id).

    Scale note: EWMA state is inherently sequential per key, so the
    unit of parallelism is the KEY — fine when keys are plentiful
    (devices, users); for few huge keys, shard by (key, day) and
    chain boundary values, or run the streaming twin
    (applyInPandasWithState, see streaming/stateful.py) which carries
    state across micro-batches instead of one giant group.
    """
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "ts"
    )

    def smooth(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        vals = pdf["value"].to_numpy()
        out = vals.copy()
        prev = None
        for i, x in enumerate(vals):
            prev = float(x) if prev is None else EWMA_ALPHA * float(x) + (1 - EWMA_ALPHA) * prev
            out[i] = prev
        pdf["ewma"] = out
        return pdf[["event_id", "event_type", "value", "ewma"]]

    par = max(spark.sparkContext.defaultParallelism, 8)
    return (
        e.repartition(par, "event_type")  # pandas groups sized by key, not AQE
        .groupBy("event_type")
        .applyInPandas(
            smooth, schema="event_id long, event_type string, value double, ewma double"
        )
        .withColumn("ewma", F.round("ewma", 6))
    )


ANOM_FRAME = 20  # trailing events per user feeding the rolling stats
ANOM_MIN_N = 10  # minimum trailing points before a z-score is emitted
ANOM_Z = 2.5


@query(
    "q_anomaly_zscore",
    # All rolling stats derive from EXACT integer sums over
    # cent-quantized values (floor(value*100)): a windowed AVG/STDDEV of
    # doubles differs between engines in the last ulp (summation order),
    # which flips ROUND at 4dp boundaries; n*Σc² - (Σc)² is exact
    # bigint math, and the final divide/sqrt are single IEEE ops —
    # bit-identical in both engines.
    oracle=f"""
    WITH scored AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               SUM(CAST(floor(value * 100) AS BIGINT)) OVER w           AS s1,
               SUM(CAST(floor(value * 100) AS BIGINT)
                   * CAST(floor(value * 100) AS BIGINT)) OVER w         AS s2,
               COUNT(*) OVER w                                          AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {ANOM_FRAME} PRECEDING AND 1 PRECEDING)
    ),
    stats AS (
        SELECT user_id, event_id, ts_us, cents, n,
               s1 * 1.0 / n AS mean_c,
               sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1))) AS std_c
        FROM scored WHERE n >= {ANOM_MIN_N} AND n * s2 > s1 * s1
    )
    SELECT user_id, event_id, ts_us, cents,
           ROUND(mean_c, 4) AS mean_c,
           ROUND(std_c, 4)  AS std_c,
           ROUND((cents - mean_c) / std_c, 4) + 0.0 AS z,
           (ABS((cents - mean_c) / std_c) > {ANOM_Z}) AS is_anomaly
    FROM stats
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling per-user anomaly detection: each event's value scored
    against the mean/stddev of that user's previous {ANOM_FRAME} events
    — the self-adapting complement to q_outliers' static per-type
    z-score (a user whose baseline drifts isn't permanently flagged).
    Stats come from exact integer sums over cent-quantized values so
    the decision replays identically on any engine (see oracle note).

    Scale: one shuffle on user_id for the window sort; the trailing
    frame is rows-bounded so state per row is O(frame), and users are
    the natural partition key at 100 TB (skew absorbed by AQE; a bot
    user with millions of events degrades to a single-key sort, the
    same cost any sessionization pays).
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOM_FRAME, -1)
    )
    cents = F.floor(F.col("value") * 100).cast("bigint")
    scored = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        cents.alias("cents"),
        F.sum(cents).over(w).alias("s1"),
        F.sum(cents * cents).over(w).alias("s2"),
        F.count("*").over(w).alias("n"),
    )
    mean_c = F.col("s1") * F.lit(1.0) / F.col("n")
    std_c = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        * F.lit(1.0)
        / (F.col("n") * (F.col("n") - 1))
    )
    z = (F.col("cents") - mean_c) / std_c
    return (
        scored.filter(
            (F.col("n") >= ANOM_MIN_N)
            & (F.col("n") * F.col("s2") > F.col("s1") * F.col("s1"))
        )
        .select(
            "user_id",
            "event_id",
            "ts_us",
            "cents",
            F.round(mean_c, 4).alias("mean_c"),
            F.round(std_c, 4).alias("std_c"),
            # + 0.0 normalizes IEEE negative zero: the engines' ROUND
            # implementations disagree on the SIGN of a tiny negative
            # rounding to zero (observed at sf0.1: Spark -0.0 vs DuckDB
            # 0.0 for z = -1.3e-5), and -0.0 != 0.0 under a string canon
            (F.round(z, 4) + F.lit(0.0)).alias("z"),
            (F.abs(z) > ANOM_Z).alias("is_anomaly"),
        )
    )


AB_Z_CRIT = 1.96  # two-sided 95%


@query(
    "q_ab_test",
    # Welch z from EXACT integer sums over cent-quantized values (same
    # determinism move as q_anomaly_zscore): n, sum(c), sum(c^2) are
    # exact bigints per arm, so mean/variance/z are fixed chains of
    # single IEEE ops — bit-identical across engines.  The variance
    # products are computed in DOUBLE (see builder comment) so whole-arm
    # aggregates can't overflow int64 at production row counts.
    oracle=f"""
    WITH assigned AS (
        SELECT event_type,
               user_id % 2 AS arm,
               CAST(floor(value * 100) AS BIGINT) AS c
        FROM events
    ),
    per_arm AS (
        SELECT event_type, arm,
               COUNT(*) AS n,
               CAST(SUM(c) AS BIGINT) AS s1,
               CAST(SUM(c * c) AS BIGINT) AS s2
        FROM assigned GROUP BY event_type, arm
    ),
    wide AS (
        SELECT a.event_type,
               a.n AS n_a, a.s1 AS s1_a, a.s2 AS s2_a,
               b.n AS n_b, b.s1 AS s1_b, b.s2 AS s2_b
        FROM per_arm a JOIN per_arm b
          ON a.event_type = b.event_type AND a.arm = 0 AND b.arm = 1
    )
    SELECT event_type, n_a, n_b,
           ROUND(s1_a * 1.0 / n_a, 4) AS mean_a,
           ROUND(s1_b * 1.0 / n_b, 4) AS mean_b,
           ROUND((s1_a * 1.0 / n_a - s1_b * 1.0 / n_b)
                 / sqrt(((n_a * (s2_a * 1.0) - (s1_a * 1.0) * (s1_a * 1.0))
                         / ((n_a * 1.0) * (n_a - 1))) / n_a
                      + ((n_b * (s2_b * 1.0) - (s1_b * 1.0) * (s1_b * 1.0))
                         / ((n_b * 1.0) * (n_b - 1))) / n_b),
                 4) + 0.0 AS z,
           ABS((s1_a * 1.0 / n_a - s1_b * 1.0 / n_b)
               / sqrt(((n_a * (s2_a * 1.0) - (s1_a * 1.0) * (s1_a * 1.0))
                       / ((n_a * 1.0) * (n_a - 1))) / n_a
                    + ((n_b * (s2_b * 1.0) - (s1_b * 1.0) * (s1_b * 1.0))
                       / ((n_b * 1.0) * (n_b - 1))) / n_b))
               > {AB_Z_CRIT} AS significant
    FROM wide
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B comparison per event type: users hash into arms,
    Welch z-statistic computed from exact integer sums over
    cent-quantized values (deterministic on any engine), with a 95%
    significance flag — the experiment-readout query every product
    pipeline serves.

    Scale: one partial-aggregated pass keyed by (event_type, arm) —
    three bigint accumulators per group — then a tiny self-join on
    event_type; nothing else shuffles.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    per_arm = (
        e.select(
            "event_type",
            (F.col("user_id") % 2).alias("arm"),
            cents.alias("c"),
        )
        .groupBy("event_type", "arm")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").cast("bigint").alias("s1"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
        )
    )
    a = per_arm.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("s1").alias("s1_a"),
        F.col("s2").alias("s2_a"),
    )
    b = per_arm.filter(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("s1").alias("s1_b"),
        F.col("s2").alias("s2_b"),
    )
    wide = a.join(b, "event_type")
    mean_a = F.col("s1_a") * F.lit(1.0) / F.col("n_a")
    mean_b = F.col("s1_b") * F.lit(1.0) / F.col("n_b")
    # Variance products run in DOUBLE (sums promoted via * 1.0), never
    # bigint: n*s2 and s1*s1 overflow int64 at ~1e6 rows of 1e5-cent
    # values, where Spark would wrap silently and DuckDB would raise.
    # int64->double conversion and double multiply are single IEEE ops,
    # identical in both engines, so the hash contract is unchanged.
    var_a = (
        (F.col("n_a") * (F.col("s2_a") * F.lit(1.0))
         - (F.col("s1_a") * F.lit(1.0)) * (F.col("s1_a") * F.lit(1.0)))
        / ((F.col("n_a") * F.lit(1.0)) * (F.col("n_a") - 1))
    )
    var_b = (
        (F.col("n_b") * (F.col("s2_b") * F.lit(1.0))
         - (F.col("s1_b") * F.lit(1.0)) * (F.col("s1_b") * F.lit(1.0)))
        / ((F.col("n_b") * F.lit(1.0)) * (F.col("n_b") - 1))
    )
    z = (mean_a - mean_b) / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    return wide.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(mean_a, 4).alias("mean_a"),
        F.round(mean_b, 4).alias("mean_b"),
        # + 0.0: negative-zero normalization (see q_anomaly_zscore)
        (F.round(z, 4) + F.lit(0.0)).alias("z"),
        (F.abs(z) > AB_Z_CRIT).alias("significant"),
    )


ATTR_WINDOW_SECS = 1800  # last-touch lookback: 30 minutes


@query(
    "q_attribution",
    oracle=f"""
    WITH e AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ),
    filled AS (
        SELECT user_id, ts, event_id, event_type,
               last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER w AS last_click_ts,
               last_value(CASE WHEN event_type = 'click' THEN k END IGNORE NULLS)
                   OVER w AS last_click_k,
               last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
                   OVER w AS last_view_ts,
               last_value(CASE WHEN event_type = 'view' THEN k END IGNORE NULLS)
                   OVER w AS last_view_k
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CASE
             WHEN last_click_ts IS NOT NULL
                  AND date_diff('second', last_click_ts, ts) <= {ATTR_WINDOW_SECS}
               THEN 'click'
             WHEN last_view_ts IS NOT NULL
                  AND date_diff('second', last_view_ts, ts) <= {ATTR_WINDOW_SECS}
               THEN 'view'
             ELSE 'direct'
           END AS channel,
           CASE
             WHEN last_click_ts IS NOT NULL
                  AND date_diff('second', last_click_ts, ts) <= {ATTR_WINDOW_SECS}
               THEN last_click_k
             WHEN last_view_ts IS NOT NULL
                  AND date_diff('second', last_view_ts, ts) <= {ATTR_WINDOW_SECS}
               THEN last_view_k
           END AS credited_k
    FROM filled WHERE event_type = 'purchase'
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    click within the 30-minute lookback, falling back to the most
    recent view, else 'direct' — the channel-priority waterfall of a
    marketing attribution pipeline.

    Scale: ONE user_id shuffle and one in-partition sort serve all
    four ignore-null running fills (last click/view ts and their
    credited key); the waterfall itself is a row-local CASE.  This is
    the as-of-join family expressed as window fills — the self-join
    formulation would fan out per (purchase x candidate touch).
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    e = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    def _last(kind: str, col: str):
        return F.last(
            F.when(F.col("event_type") == kind, F.col(col)), ignorenulls=True
        ).over(w)

    filled = (
        e.withColumn("last_click_ts", _last("click", "ts"))
        .withColumn("last_click_k", _last("click", "k"))
        .withColumn("last_view_ts", _last("view", "ts"))
        .withColumn("last_view_k", _last("view", "k"))
    )
    click_ok = F.col("last_click_ts").isNotNull() & (
        F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts") <= ATTR_WINDOW_SECS
    )
    view_ok = F.col("last_view_ts").isNotNull() & (
        F.unix_timestamp("ts") - F.unix_timestamp("last_view_ts") <= ATTR_WINDOW_SECS
    )
    return filled.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.when(click_ok, F.lit("click"))
        .when(view_ok, F.lit("view"))
        .otherwise(F.lit("direct"))
        .alias("channel"),
        F.when(click_ok, F.col("last_click_k"))
        .when(view_ok, F.col("last_view_k"))
        .alias("credited_k"),
    )


@query(
    "q_weekday_profile",
    # Seasonality profile with NO floats anywhere: per (type, weekday)
    # the count, exact cent sum, and the integer variance numerator
    # n*SUM(c^2) - SUM(c)^2 (variance = that / n^2) — cent-quantized
    # squares stay ~5e13, far inside bigint, so the profile is
    # partition-order independent and needs no rounding convention.
    oracle="""
    SELECT event_type,
           CAST(isodow(ts) - 1 AS INT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS sum_cents,
           CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS BIGINT) AS var_num
    FROM (
        SELECT event_type, ts, CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
    )
    GROUP BY event_type, dow
    """,
)
def q_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week (Monday=0; Spark weekday == DuckDB isodow-1 — the
    1-based dayofweek builtins disagree on the week start) seasonality
    profile per event type: count, exact
    cent sum, and the integer variance numerator — the baseline table
    a seasonal anomaly detector compares fresh traffic against
    (variance = var_num / n^2, computed by the consumer).

    Scale: one map-side partial aggregate into a |types| x 7 key
    space; the variance comes from moment sums, not a second pass or
    a float accumulator — same single-pass discipline as
    q_linear_trend, same reason: exact bigint moments commute across
    partitions.
    """
    e = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("bigint")
    return (
        e.select("event_type", F.weekday("ts").cast("int").alias("dow"), c.alias("c"))
        .groupBy("event_type", "dow")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("sum_cents"),
            (
                F.count("*") * F.sum(F.col("c") * F.col("c"))
                - F.sum("c") * F.sum("c")
            )
            .cast("bigint")
            .alias("var_num"),
        )
    )


PATTERN_SPAN_SECS = 172_800  # whole pattern completes within 48h (fixture
# events run ~20/user/month, so sub-hour spans are vacuous here; a
# clickstream deployment sets minutes)


@query(
    "q_pattern_match",
    # CEP / MATCH_RECOGNIZE shape: STRICTLY CONSECUTIVE view -> click
    # -> purchase per user, whole span inside 48 hours.  Integer-us
    # span; (ts, event_id) ordering — the repo's canonical total order
    # on events.
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               LEAD(event_type, 1) OVER w AS t1,
               LEAD(event_type, 2) OVER w AS t2,
               LEAD(event_id, 1) OVER w AS id1,
               LEAD(event_id, 2) OVER w AS id2,
               LEAD(epoch_us(ts), 2) OVER w AS ts2_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS view_id, id1 AS click_id, id2 AS purchase_id,
           (ts2_us - ts_us) // 1000000 AS span_secs
    FROM seq
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      AND ts2_us - ts_us <= {PATTERN_SPAN_SECS * 1_000_000}
    """,
)
def q_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (the MATCH_RECOGNIZE / CEP shape):
    strictly consecutive view -> click -> purchase runs per user
    completing within 48 hours — the "did the funnel happen as an
    uninterrupted sequence" question, stricter than q_funnel's
    anchored any-order-within-window semantics.

    Scale: fixed-length strict patterns compile to LEAD lookaheads on
    ONE user-keyed sort — no self-joins, no state machine; every
    event is examined once.  Variable-length patterns (A B* C) are
    where this form runs out and the streaming state-machine operator
    (applyInPandasWithState, as in streaming/stateful.py) takes over.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        ts_us.alias("ts_us"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("event_id", 1).over(w).alias("id1"),
        F.lead("event_id", 2).over(w).alias("id2"),
        F.lead(ts_us, 2).over(w).alias("ts2_us"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
            & (F.col("ts2_us") - F.col("ts_us") <= PATTERN_SPAN_SECS * 1_000_000)
        )
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("id1").alias("click_id"),
            F.col("id2").alias("purchase_id"),
            F.expr("(ts2_us - ts_us) DIV 1000000").alias("span_secs"),
        )
    )


@query(
    "q_pattern_var",
    # Variable-length CEP: view (click)* purchase, strictly consecutive.
    # The Kleene star needs no state machine in batch: each event's
    # NEXT NON-CLICK position is a conditional MIN over the FOLLOWING
    # frame, and a view matches iff that position holds a purchase —
    # everything between is a click by construction.
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    nnc AS (
        SELECT *, MIN(CASE WHEN event_type <> 'click' THEN rn END)
                    OVER (PARTITION BY user_id ORDER BY rn
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                      AS next_nc
        FROM seq
    )
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           CAST(p.rn - v.rn - 1 AS BIGINT) AS n_clicks,
           (p.ts_us - v.ts_us) // 1000000 AS span_secs
    FROM nnc v JOIN nnc p ON p.user_id = v.user_id AND p.rn = v.next_nc
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
)
def q_pattern_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length sequence pattern — ``view (click)* purchase``,
    strictly consecutive per user (the Kleene-star case fixed-lookahead
    LEAD cannot express).

    Scale: the star compiles to ONE extra window pass — a conditional
    MIN over the following frame yields each event's next non-click
    position, and the single (user, position) equi self-join stitches
    the match endpoints; intermediate clicks are counted by position
    arithmetic, never enumerated.  Still no state machine and no
    per-pattern-length blowup; arbitrary regular patterns beyond one
    star graduate to the streaming stateful operator.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.row_number().over(w).alias("rn"),
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(1, W.unboundedFollowing)
    )
    nnc = seq.withColumn(
        "next_nc",
        F.min(F.when(F.col("event_type") != "click", F.col("rn"))).over(wf),
    )
    v = nnc.alias("v")
    p = nnc.alias("p")
    return (
        v.join(
            p,
            (F.col("p.user_id") == F.col("v.user_id"))
            & (F.col("p.rn") == F.col("v.next_nc")),
        )
        .filter(
            (F.col("v.event_type") == "view")
            & (F.col("p.event_type") == "purchase")
        )
        .select(
            F.col("v.user_id").alias("user_id"),
            F.col("v.event_id").alias("view_id"),
            F.col("p.event_id").alias("purchase_id"),
            (F.col("p.rn") - F.col("v.rn") - 1).cast("bigint").alias("n_clicks"),
            F.expr("(p.ts_us - v.ts_us) DIV 1000000").alias("span_secs"),
        )
    )


MAD_K2 = 3  # flag |value - median| > 3 * MAD


@query(
    "q_outliers_mad",
    # Robust (median/MAD) outlier counts with NO floats: medians of
    # integers interpolate to halves, so 2*median and 2*median(|2c-m2|)
    # are exact integers in both engines (integer sums and /2 are exact
    # IEEE); the flag |c-med| > 3*MAD rewrites to 2*d > 3*mad4.
    oracle=f"""
    WITH c AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
    ),
    med AS (
        SELECT event_type, CAST(2 * median(c) AS BIGINT) AS m2
        FROM c GROUP BY event_type
    ),
    dev AS (
        SELECT c.event_type, c.c, ABS(2 * c.c - med.m2) AS d
        FROM c JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type, CAST(2 * median(d) AS BIGINT) AS mad4
        FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(med.m2) AS med2_cents,
           MAX(mad.mad4) AS mad4_cents,
           CAST(SUM(CASE WHEN 2 * dev.d > {MAD_K2} * mad.mad4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev
    JOIN med ON med.event_type = dev.event_type
    JOIN mad ON mad.event_type = dev.event_type
    GROUP BY dev.event_type
    """,
)
def q_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type via median/MAD — the
    heavy-tail-safe complement to q_outliers' mean/stddev z-score (one
    wild value inflates a stddev and hides its neighbors; the median
    absolute deviation doesn't move).

    Scale: two exact-percentile passes over (type)-partitioned data
    plus a broadcast of the |types|-row median tables between them;
    at unbounded group cardinality both medians switch to
    percentile_approx like q_percentile_approx.  The doubled/
    quadrupled integer encoding (m2 = 2*median, mad4 = 4*MAD) keeps
    every interpolated half exact, so the robust statistics — and the
    outlier flags at the threshold boundary — are hash-checkable.
    """
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("c")
    )
    med = c.groupBy("event_type").agg(
        (2 * F.expr("percentile(c, 0.5)")).cast("bigint").alias("m2")
    )
    dev = c.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(2 * F.col("c") - F.col("m2"))
    )
    mad = dev.groupBy("event_type").agg(
        (2 * F.expr("percentile(d, 0.5)")).cast("bigint").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.max("m2").alias("med2_cents"),
            F.max("mad4").alias("mad4_cents"),
            F.sum(
                F.when(2 * F.col("d") > MAD_K2 * F.col("mad4"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "q_time_weighted_avg",
    # All-integer arithmetic: value in cents, gaps in whole seconds
    # (floor division of the micros delta), products and sums in
    # BIGINT — the float-summation-order trap never opens.
    oracle="""
    WITH pts AS (
        SELECT user_id,
               epoch_us(ts) AS us,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(SUM((next_us - us) // 1000000) AS BIGINT) AS total_s,
           CAST(SUM(cents * ((next_us - us) // 1000000)) AS BIGINT)
               AS weighted_sum,
           CAST(SUM(cents * ((next_us - us) // 1000000))
                // SUM((next_us - us) // 1000000) AS BIGINT) AS twa_cents
    FROM pts
    WHERE next_us IS NOT NULL
    GROUP BY user_id
    HAVING SUM((next_us - us) // 1000000) > 0
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average purchase value per user — each observation
    weighted by how long it was 'current' (until the next event), the
    irregular-time-series mean that a plain AVG silently gets wrong
    (TimescaleDB's time_weight, continuous-aggregate style).

    Scale: one shuffle keyed by user_id serves the LEAD window and the
    rollup; integer cents x whole-second gaps keep every engine's sum
    bit-identical (a double formulation would hash-diverge on
    summation order).
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pts = e.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dt_s = F.floor((F.col("next_us") - F.col("us")) / 1_000_000).cast("bigint")
    agg = pts.groupBy("user_id").agg(
        F.sum(dt_s).cast("bigint").alias("total_s"),
        F.sum(F.col("cents") * dt_s).cast("bigint").alias("weighted_sum"),
    )
    return agg.filter(F.col("total_s") > 0).select(
        "user_id",
        "total_s",
        "weighted_sum",
        F.floor(F.col("weighted_sum") / F.col("total_s")).cast("bigint").alias("twa_cents"),
    )


@query(
    "q_ohlc",
    # Deterministic open/close via a zero-padded (epoch-us, event_id)
    # string key: min_by/arg_min need a totally-ordered tiebreak, and
    # the composite doesn't fit a bigint without collision.
    oracle="""
    WITH pts AS (
        SELECT event_type,
               date_trunc('hour', ts) AS bar,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                   || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
        FROM events WHERE event_type IN ('purchase', 'view')
    )
    SELECT event_type, bar,
           COUNT(*) AS n,
           CAST(arg_min(cents, ord) AS BIGINT) AS open_c,
           CAST(MAX(cents) AS BIGINT) AS high_c,
           CAST(MIN(cents) AS BIGINT) AS low_c,
           CAST(arg_max(cents, ord) AS BIGINT) AS close_c
    FROM pts GROUP BY event_type, bar
    """,
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars per event type — the
    canonical time-series downsample, as ONE aggregate pass instead of
    the window-rank-filter detour.

    Scale: min_by/max_by fold the open/close inside the same partial
    aggregate as min/max — one shuffle keyed by (type, hour), no
    per-row window sort, no second pass.  Hour bars at whole-second
    boundaries are timestamp-portable across engines (cf. q_time_rollup).
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    ordk = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    pts = e.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar"),
        cents.alias("cents"),
        ordk.alias("ord"),
    )
    return pts.groupBy("event_type", "bar").agg(
        F.count("*").alias("n"),
        F.min_by("cents", "ord").cast("bigint").alias("open_c"),
        F.max("cents").cast("bigint").alias("high_c"),
        F.min("cents").cast("bigint").alias("low_c"),
        F.max_by("cents", "ord").cast("bigint").alias("close_c"),
    )
