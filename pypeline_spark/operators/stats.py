"""Statistical aggregates: exact percentiles, correlation/covariance,
approximate distinct counts, grouping sets.

Approximation policy: ``approx_count_distinct`` (HyperLogLog++) and
``percentile_approx`` are the scale path — sketches merge across
partitions with bounded error and constant memory, where exact distinct
counts shuffle every distinct value.  Approx results differ by engine,
so their queries carry tolerance-banded oracles: the exact twin columns
hash-check against DuckDB and 1/0 band flags assert the sketch landed
inside its guarantee (the oracle's flags are literal 1s).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table, register_tables


@query(
    "q_percentile",
    oracle="""
    SELECT c_mktsegment,
           ROUND(quantile_cont(c_acctbal, 0.5), 2)  AS p50_bal,
           ROUND(quantile_cont(c_acctbal, 0.9), 2)  AS p90_bal,
           ROUND(quantile_cont(c_acctbal, 0.99), 2) AS p99_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per segment (both engines linearly
    interpolate, so values match bit-for-bit modulo rounding)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 2).alias("p50_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 2).alias("p90_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.99)"), 2).alias("p99_bal"),
    )


@query(
    "q_corr",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4)      AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / sample covariance per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
    )


@query(
    "q_approx_distinct",
    # Tolerance-banded oracle: raw HLL++ estimates are engine-specific
    # and can never value-hash, so the BAND CHECK is the output — Spark
    # emits the exact distincts (fully hash-checked against DuckDB)
    # plus 1/0 flags asserting its own sketch landed within 5% of
    # exact (rsd 0.01 => 5 sigma); the oracle's flags are literal 1s.
    # A broken sketch therefore flips a hash-checked column.
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
           1 AS parts_ok, 1 AS supps_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) per return flag, differentially
    tested via a tolerance band: the exact counts hash-check against
    DuckDB and the sketch must agree with exact to within 5%.

    Scale: the exact countDistinct here is the AUDIT side (run on a
    sampled slice at 100 TB); the sketch is the production path — one
    map-side HLL per partition, merged, no distinct shuffle of the
    raw keys."""
    li = load_table(spark, sf_dir, "lineitem")
    band = 0.05
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("exact_parts"),
        F.countDistinct("l_suppkey").cast("bigint").alias("exact_supps"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("a_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("a_supps"),
    )
    ok = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= band * F.col(e)
    ).cast("int")
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        ok("a_parts", "exact_parts").alias("parts_ok"),
        ok("a_supps", "exact_supps").alias("supps_ok"),
    )


@query(
    "q_percentile_approx",
    # Banded oracle: percentile_approx returns a dataset element whose
    # RANK is guaranteed within 1/accuracy of the target — so the
    # portable assertion is rank-based, not value-based.  Exact
    # interpolated quantiles (bit-identical across engines, cf.
    # q_percentile) carry the value hash; the 1/0 flags assert the
    # sketch element's empirical rank sits inside a generous band
    # (target ± ~0.02-0.03, absorbing tie mass at the element).
    # Integer-cents output (FLOOR(x*100+0.5), not ROUND(x,2)): both
    # engines interpolate the same double, but their decimal ROUND
    # paths disagree on exact .xx5 midpoints (observed at sf0.001);
    # FLOOR on the shared double is IEEE-deterministic.
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(FLOOR(quantile_cont(l_extendedprice, 0.5)  * 100 + 0.5)
                AS BIGINT) AS p50_cents,
           CAST(FLOOR(quantile_cont(l_extendedprice, 0.95) * 100 + 0.5)
                AS BIGINT) AS p95_cents,
           1 AS p50_rank_ok, 1 AS p95_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (constant-memory t-digest-style quantiles),
    differentially tested via a rank band: the approx element's
    empirical CDF position must sit within the sketch's guarantee,
    while the exact interpolated quantiles hash-check against DuckDB.

    Scale: the rank-audit join broadcasts the 3-row summary back over
    the fact table — one extra scan, no extra shuffle; at 100 TB the
    audit runs on a sampled slice while the sketch is the product."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.floor(F.expr("percentile(l_extendedprice, 0.5)") * 100 + 0.5)
        .cast("bigint")
        .alias("p50_cents"),
        F.floor(F.expr("percentile(l_extendedprice, 0.95)") * 100 + 0.5)
        .cast("bigint")
        .alias("p95_cents"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("a95"),
    )
    ranks = (
        li.join(F.broadcast(s.select("l_returnflag", "a50", "a95")), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum((F.col("l_extendedprice") <= F.col("a50")).cast("long")).alias("r50"),
            F.sum((F.col("l_extendedprice") <= F.col("a95")).cast("long")).alias("r95"),
        )
    )
    frac = lambda r: F.col(r) / F.col("n_rows")  # noqa: E731
    return (
        s.join(ranks, "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            "p50_cents",
            "p95_cents",
            frac("r50").between(0.48, 0.53).cast("int").alias("p50_rank_ok"),
            frac("r95").between(0.93, 0.97).cast("int").alias("p95_rank_ok"),
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT n_name, c_mktsegment, COUNT(*) AS n,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_seg
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() disambiguation columns
    (distinguishes rollup nulls from data nulls)."""
    register_tables(spark, sf_dir, only=("customer", "nation"))
    return spark.sql(
        """
        SELECT n_name, c_mktsegment, COUNT(*) AS n,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               CAST(GROUPING(c_mktsegment) AS INT) AS g_seg
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        """
    )


@query(
    "q_conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2)
               AS finished_value,
           CAST(MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS INT) AS has_open
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered / conditional aggregation (FILTER clause + CASE sums)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count(F.when(F.col("o_totalprice") > 300000, 1)).alias("n_big"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)),
            2,
        ).alias("finished_value"),
        F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).cast("int").alias("has_open"),
    )


@query(
    "q_time_rollup",
    # Hour and day grains in ONE aggregate pass via GROUPING SETS over
    # pre-derived buckets — the continuous-aggregate / hypertable
    # rollup shape.  Equality predicate keeps the comparison exact:
    # date_trunc is deterministic in both engines under UTC.
    oracle="""
    SELECT event_type,
           CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS grain,
           COALESCE(h, d) AS bucket,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM (
        SELECT event_type, value,
               date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts <  TIMESTAMP '2024-01-13 00:00:00'
    )
    GROUP BY GROUPING SETS ((event_type, h), (event_type, d))
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (hour + day) in one pass.

    Scale: both grains share ONE scan and one shuffle (Expand feeds the
    grouping sets into the same partial aggregate); the time bound
    prunes the scan via load_events.  This is the continuous-aggregate
    pattern: at 100 TB you'd MERGE this output into a rollup table per
    window instead of re-scanning raw events per grain.
    """
    from pypeline_spark.session import load_events

    e = load_events(spark, sf_dir, since="2024-01-10", until="2024-01-13")
    src = e.select(
        "event_type",
        "value",
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
    )
    # parameterized table ref — no temp-view side effect on the catalog
    return spark.sql(
        """
        SELECT event_type,
               CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS grain,
               COALESCE(h, d) AS bucket,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM {src}
        GROUP BY GROUPING SETS ((event_type, h), (event_type, d))
        """,
        src=src,
    )


@query(
    "q_hll_rollup",
    # Banded oracle (was rows-only through r4): the weekly exact
    # distinct-user counts hash-check against DuckDB, and the 1/0 flag
    # asserts the sketch-merged weekly estimate landed within 5% of
    # exact (default lgConfigK=12 => rsd ~1.6%, so 5% is ~3 sigma;
    # small weeks sit in HLL sparse mode and are exact).
    oracle="""
    SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days_merged,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           1 AS approx_ok
    FROM events GROUP BY week
    """,
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: daily HLL sketches of distinct users,
    UNIONED upward to weekly estimates without rescanning raw events.

    This is the continuous-aggregate pattern for COUNT(DISTINCT): a
    distinct count is NOT decomposable (yesterday's count + today's
    count ≠ the union), but its HLL SKETCH is — ``hll_union_agg`` over
    stored per-day sketches yields any coarser grain from the fine
    one.  At 100 TB you persist the daily sketch table (a few KB per
    day) and never touch raw events again for distinct-user rollups
    at ANY granularity.

    Differential policy (upgraded from rows-only in r5): exact weekly
    distincts hash-check against DuckDB; the sketch-merged estimate is
    asserted within a 5% band via the ``approx_ok`` flag (plus the
    tighter accuracy bound in tests/test_stats_sketches.py).
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    weekly = (
        daily.withColumn("week", F.date_trunc("week", "day").cast("date"))
        .groupBy("week")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("bigint")
            .alias("approx_users"),
            F.count("*").alias("days_merged"),
        )
    )
    exact = (
        e.select(
            F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
            "user_id",
        )
        .groupBy("week")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_users"))
    )
    return weekly.join(exact, "week").select(
        "week",
        "days_merged",
        "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= 0.05 * F.col("exact_users"))
        .cast("int")
        .alias("approx_ok"),
    )


# --- Count-Min Sketch heavy hitters --------------------------------------

CMS_D = 4  # hash rows
CMS_W = 128  # counters per row
CMS_TOP = 20  # heavy hitters reported


def _cms_bucket_sql(r: int, col: str) -> str:
    """Row-r CMS bucket of ``col`` — the engine-portable md5 bucket
    (same trick as _HASH_BUCKET_SQL) salted with the row index."""
    return (
        f"CAST(('0x' || substr(md5(concat_ws('_', 'cms{r}', {col})), 1, 15)) "
        f"AS BIGINT) % {CMS_W}"
    )


def _cms_bucket(r: int, col, buckets: int = CMS_W) -> F.Column:
    from pypeline_spark.operators.scale_ops import hash_bucket

    return hash_bucket(F.lit(f"cms{r}"), col, buckets=buckets)


def _cms_oracle() -> str:
    counters = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, {_cms_bucket_sql(r, 'bg')} AS b, SUM(n) AS total "
        f"FROM counts GROUP BY b"
        for r in range(CMS_D)
    )
    lookups = ", ".join(
        f"(SELECT total FROM counters WHERE r = {r} AND b = {_cms_bucket_sql(r, 'top.bg')})"
        for r in range(CMS_D)
    )
    return f"""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    p AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t),
    counts AS (
        SELECT toks[i] || ' ' || toks[i + 1] AS bg, COUNT(*) AS n
        FROM p GROUP BY bg
    ),
    counters AS (
        {counters}
    ),
    top AS (
        SELECT bg, n FROM counts ORDER BY n DESC, bg LIMIT {CMS_TOP}
    )
    SELECT top.bg, CAST(top.n AS BIGINT) AS true_cnt,
           CAST(LEAST({lookups}) AS BIGINT) AS cms_cnt,
           CAST(LEAST({lookups}) - top.n AS BIGINT) AS overest
    FROM top
    """


@query("q_heavy_hitters_cms", oracle=_cms_oracle())
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch heavy hitters: the top-20 token bigrams with
    their exact counts AND their CMS estimates (4 rows x 128 md5
    counters), so the sketch's one-sided overestimation is visible —
    and hash-checked, because the md5 bucket functions are
    engine-portable (no RNG, unlike HLL's rows-only policy).

    Scale: a CMS is the streaming answer to "how often does key X
    occur" when the key space outgrows memory — counters are a fixed
    d x w integer grid that merges by addition across partitions and
    micro-batches.  Here the grid is built FROM the exact counts
    (sum-by-bucket: numerically identical to per-occurrence increments,
    one aggregate cheaper); a true streaming deployment increments per
    row and never materializes exact counts.  The estimate lookup is a
    broadcast join of the 20 probes against d tiny counter tables.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    pairs = (
        d.select(toks.alias("toks"))
        .withColumn("a_arr", F.slice(F.col("toks"), 1, F.size("toks") - 1))
        .withColumn("b_arr", F.slice(F.col("toks"), 2, F.size("toks") - 1))
        .select(F.explode(F.arrays_zip("a_arr", "b_arr")).alias("p"))
        .select(
            F.concat_ws(" ", F.col("p.a_arr"), F.col("p.b_arr")).alias("bg")
        )
    )
    counts = pairs.groupBy("bg").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.col("n").desc(), "bg").limit(CMS_TOP)
    out = top
    for r in range(CMS_D):
        counter = (
            counts.groupBy(_cms_bucket(r, F.col("bg")).alias(f"b{r}"))
            .agg(F.sum("n").alias(f"total{r}"))
        )
        out = out.withColumn(f"__b{r}", _cms_bucket(r, F.col("bg"))).join(
            F.broadcast(counter), F.col(f"__b{r}") == F.col(f"b{r}")
        )
    est = F.least(*[F.col(f"total{r}") for r in range(CMS_D)])
    return out.select(
        "bg",
        F.col("n").cast("bigint").alias("true_cnt"),
        est.cast("bigint").alias("cms_cnt"),
        (est - F.col("n")).cast("bigint").alias("overest"),
    )


# --- Per-group linear trend (integer-exact least squares) ----------------

TREND_T0_US = 1_704_067_200_000_000  # epoch micros of 2024-01-01 (fixture start)
TREND_HOUR_US = 3_600_000_000


@query(
    "q_linear_trend",
    # slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) with x = whole hours
    # since the fixture epoch and y = integer cents: every sum and
    # cross term is exact bigint (bounds ~1e14 << 2^63), and the one
    # final division is the same IEEE op on the same two integers in
    # both engines.
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               (epoch_us(ts) - {TREND_T0_US}) // {TREND_HOUR_US} AS x,
               CAST(ROUND(value * 100) AS BIGINT) AS y
        FROM events
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_hr,
           ROUND((CAST(sy AS DOUBLE) - ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 4) AS intercept_cents
    FROM s
    """,
)
def q_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type least-squares trend of event value over time — the
    drift detector behind metric monitoring, fitted in ONE aggregate
    pass from exact integer moment sums (no covariance UDF, no
    two-pass mean-centering).

    Scale: map-side partial sums of (x, y, xy, xx) collapse almost all
    rows before the |event_types|-keyed exchange; the closed-form
    slope/intercept then divide on a handful of rows.  Numerical
    discipline: hour-resolution x and cent-resolution y keep every
    cross term within bigint (~1e14), so the moments — unlike float
    covariance sums — are partition-order independent and the fit is
    hash-checkable.
    """
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        F.expr(f"(unix_micros(ts) - {TREND_T0_US}) DIV {TREND_HOUR_US}").alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
        6,
    )
    intercept = F.round(
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("n").cast("double"),
        4,
    )
    return s.select(
        "event_type",
        "n",
        slope.alias("slope_cents_per_hr"),
        intercept.alias("intercept_cents"),
    )


@query(
    "q_mode",
    oracle="""
    SELECT l_returnflag, CAST(qty AS BIGINT) AS mode_qty,
           CAST(cnt AS BIGINT) AS n
    FROM (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
               COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY COUNT(*) DESC,
                                           CAST(l_quantity AS BIGINT)) AS rk
        FROM lineitem GROUP BY l_returnflag, qty
    ) WHERE rk = 1
    """,
)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent quantity per return flag) with a
    deterministic smallest-value tiebreak — the ordered-set aggregate
    the ANSI MODE() function computes.

    Scale: a (group, value) count aggregate then a window over the
    aggregated (small) table — the fact is scanned once and the
    ranking never sees raw rows.  Spark's native mode() breaks ties
    arbitrarily, so the explicit count+rank form is what a
    deterministic pipeline actually deploys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window as W

    counts = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("qty")
    ).agg(F.count("*").alias("cnt"))
    w = W.partitionBy("l_returnflag").orderBy(F.col("cnt").desc(), "qty")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_qty"),
            F.col("cnt").cast("bigint").alias("n"),
        )
    )


@query(
    "q_benford",
    oracle="""
    SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                AS INT) AS lead_digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST((10000 * COUNT(*)) // SUM(COUNT(*)) OVER () AS BIGINT)
               AS share_bp
    FROM orders
    WHERE o_totalprice >= 1
    GROUP BY lead_digit
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order totals — the Benford's-law
    audit fraud/ETL-corruption screens run on money columns (synthetic
    or truncated data shows up as a flat or spiked digit histogram).

    Scale: leading digit is string arithmetic on the floor'd integer
    (explicit FLOOR: bare double->bigint casts round in DuckDB but
    truncate in Spark), one 9-key aggregate; the share is integer basis
    points over the window total of the aggregated table.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    from pyspark.sql import Window as W

    digits = o.select(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("lead_digit")
    )
    counts = digits.groupBy("lead_digit").agg(F.count("*").cast("bigint").alias("n"))
    return counts.withColumn(
        "share_bp", F.expr("(10000 * n) DIV (SUM(n) OVER ())").cast("bigint")
    )


@query(
    "q_latency_bands",
    # P50/P95 per (type, hour) — the observability dashboard readout.
    # Percentiles ship as floor'd integer cents (the q_median_iqr
    # convention: interpolated fractions of a cent round
    # engine-dependently; floor of the identical IEEE double doesn't).
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(FLOOR(quantile_cont(value, 0.50) * 100) AS BIGINT) AS p50_cents,
           CAST(FLOOR(quantile_cont(value, 0.95) * 100) AS BIGINT) AS p95_cents
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY event_type, hour
    """,
)
def q_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile bands per (event type, hour) — the P50/P95-by-bucket
    readout every latency/value dashboard is built from.

    Scale: exact percentiles sort within (type, hour) groups — bounded
    by the bucket's row count, so this stays exact at any corpus size
    as long as buckets are bounded (they are: they're time slices);
    unbounded-bucket variants switch to percentile_approx sketches.
    The time bound prunes the scan via load_events' raw-nanos pushdown.
    """
    from pypeline_spark.session import load_events

    e = load_events(spark, sf_dir, since="2024-01-10", until="2024-01-12")
    return e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.floor(F.expr("percentile(value, 0.50)") * 100)
        .cast("bigint")
        .alias("p50_cents"),
        F.floor(F.expr("percentile(value, 0.95)") * 100)
        .cast("bigint")
        .alias("p95_cents"),
    )


N_EQ_BUCKETS = 8  # equi-depth histogram buckets

_EQ_FRACS = ", ".join(str(i / N_EQ_BUCKETS) for i in range(1, N_EQ_BUCKETS))


@query(
    "q_equidepth_hist",
    # Boundary comparison is on the SHARED interpolated double (both
    # engines compute identical quantile doubles, cf. q_percentile);
    # output prices are integer cents via the FLOOR(x*100+0.5)
    # convention (decimal ROUND ties diverge across engines).
    oracle=f"""
    WITH bs AS (
        SELECT quantile_cont(o_totalprice, [{_EQ_FRACS}]) AS b FROM orders
    )
    SELECT CAST(len(list_filter(bs.b, x -> o.o_totalprice > x)) AS INT)
               AS bucket,
           COUNT(*) AS n,
           CAST(MIN(FLOOR(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS lo_cents,
           CAST(MAX(FLOOR(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS hi_cents
    FROM orders o CROSS JOIN bs
    GROUP BY bucket
    """,
)
def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of order totals — the
    statistic CBOs and data-skipping layouts want (equal-width
    histograms starve the dense region; q_histogram is the equi-width
    twin).

    Scale: the naive formulation is NTILE over a GLOBAL sort — one
    reducer owns every row.  This plan instead computes the bucket
    BOUNDARIES with one aggregate (exact interpolated percentile here;
    percentile_approx at 100 TB — same plan shape), broadcasts the
    7-element boundary array, and assigns buckets map-side with an
    array fold — no global sort, no shuffle beyond the final 8-key
    rollup.
    """
    o = load_table(spark, sf_dir, "orders")
    # The 1-row boundary relation joins as a broadcast nested loop by
    # construction (Catalyst folds any literal equi-key away) — that is
    # the scalar-subquery shape, O(n) with a 7-double build side, and
    # q_equidepth_hist is on the plan sweep's INTENTIONAL list for it.
    bounds = o.agg(
        F.expr(f"percentile(o_totalprice, array({_EQ_FRACS}))").alias("b")
    )
    bucket = F.aggregate(
        F.col("b"),
        F.lit(0),
        lambda acc, x: acc + F.when(F.col("o_totalprice") > x, 1).otherwise(0),
    ).cast("int")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), F.col("o_totalprice"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min(cents).alias("lo_cents"),
            F.max(cents).alias("hi_cents"),
        )
    )


@query(
    "q_equidepth_hist_approx",
    # Banded oracle (the q_percentile_approx pattern): the bucket
    # boundaries come from percentile_approx, so per-bucket membership
    # is not portably reproducible — what IS checkable is the
    # equi-depth CONTRACT: 8 buckets present, the exact total row count
    # hash-matched, and each bucket's depth within a generous band of
    # n_total/8 (sketch rank error at accuracy 10000 is <= n/10000 per
    # boundary; the 5% band also absorbs tie mass).
    oracle=f"""
    SELECT CAST(unnest(generate_series(0, {N_EQ_BUCKETS - 1})) AS INT) AS bucket,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_total,
           1 AS depth_ok
    """,
)
def q_equidepth_hist_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram on the 100 TB path: bucket boundaries from
    percentile_approx (constant-memory mergeable sketch) instead of the
    exact interpolated percentile — q_equidepth_hist's exact boundary
    pass holds each group's column in memory (SCALE.md flags it), this
    twin is the formulation that survives arbitrary scale.

    Scale: one partial-aggregated sketch pass for the 7 boundaries, the
    1-row boundary array broadcast back, map-side bucket assignment via
    an array fold, one 8-key rollup.  No global sort, no full column in
    memory anywhere.
    """
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.percentile_approx(
            "o_totalprice", F.array(*[F.lit(i / N_EQ_BUCKETS) for i in range(1, N_EQ_BUCKETS)]), 10000
        ).alias("b")
    )
    bucket = F.aggregate(
        F.col("b"),
        F.lit(0),
        lambda acc, x: acc + F.when(F.col("o_totalprice") > x, 1).otherwise(0),
    ).cast("int")
    counts = (
        o.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    # Join the counts onto a full 0..N-1 bucket spine: duplicate
    # percentile_approx boundaries (tie-heavy or tiny data) make a
    # bucket index unreachable, and emitting only non-empty buckets
    # would then row-count-mismatch the oracle's fixed 8-row contract.
    # The spine is N_EQ_BUCKETS rows — both join sides are tiny
    # aggregates, so this costs nothing at any scale.
    spine = spark.range(N_EQ_BUCKETS).select(F.col("id").cast("int").alias("bucket"))
    per_bucket = spine.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("n", F.lit(0)).alias("n")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy()
    n_total = F.sum("n").over(w)
    return per_bucket.select(
        "bucket",
        n_total.cast("bigint").alias("n_total"),
        (
            F.abs(F.col("n") - n_total / N_EQ_BUCKETS)
            <= n_total * 0.05 + F.lit(2)
        )
        .cast("int")
        .alias("depth_ok"),
    )


@query(
    "q_winsorize",
    # Clip bounds are interpolated quantile doubles (bit-identical
    # across engines); sums run over FLOOR(x*100+0.5) integer cents so
    # double-summation order can never flip the hash.
    oracle="""
    WITH b AS (
        SELECT c_mktsegment,
               quantile_cont(c_acctbal, 0.05) AS lo,
               quantile_cont(c_acctbal, 0.95) AS hi
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS raw_cents,
           CAST(SUM(CAST(FLOOR(LEAST(GREATEST(c.c_acctbal, b.lo), b.hi)
                                * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS wins_cents
    FROM customer c JOIN b USING (c_mktsegment)
    GROUP BY c.c_mktsegment
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized totals per segment: clip account balances at the
    in-group [p05, p95] before summing — the robust-statistics
    treatment that stops a few extreme rows from owning a mean (the
    additive counterpart of the MAD outlier filter in q_outliers_mad).

    Scale: same two-pass shape as q_percentile_approx — one aggregate
    for the clip bounds per group (percentile_approx at 100 TB), the
    tiny bounds relation broadcast back over the fact table, clipping
    map-side, one rollup.  No row-level sort anywhere.
    """
    c = load_table(spark, sf_dir, "customer")
    b = c.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.05)").alias("lo"),
        F.expr("percentile(c_acctbal, 0.95)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi"))
    cents = lambda x: F.floor(x * 100 + 0.5).cast("bigint")  # noqa: E731
    return (
        c.join(F.broadcast(b), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("c_acctbal"))).cast("bigint").alias("raw_cents"),
            F.sum(cents(clipped)).cast("bigint").alias("wins_cents"),
        )
    )
