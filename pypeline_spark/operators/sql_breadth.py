"""SQL breadth: null-safe joins, ordered string aggregation, robust
statistics, and calendar gap-filling.

Four patterns every SQL-delegating user of the reference (ref:
/root/reference/pypeline/Pype.py:36 — arbitrary extract_query) reaches
for, made native:

- null-safe equality (`<=>` / IS NOT DISTINCT FROM): the only equality
  that matches NULL groups to each other — required when the join key
  is a derived, nullable expression;
- ordered string_agg: deterministic listagg (sort before join, never
  rely on collect_list order, which is partition-arrival order);
- median / IQR: rank-based statistics over numeric columns;
- calendar gap-fill: generate a complete date spine and left-join facts
  onto it, so missing periods appear as explicit zeros (time-series
  reports break without this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table


@query(
    "q_nullsafe_join",
    oracle="""
    WITH a AS (
        SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
               COUNT(*) AS n_customers
        FROM customer GROUP BY 1
    ),
    b AS (
        SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
               ROUND(AVG(c_acctbal), 2) AS avg_bal
        FROM customer WHERE c_acctbal > 0 GROUP BY 1
    )
    SELECT a.seg, a.n_customers, b.avg_bal
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join on a derived nullable key with null-safe equality — the
    NULL group (BUILDING mapped to NULL) must match itself."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    a = c.select(seg).groupBy("seg").agg(F.count("*").alias("n_customers"))
    b = (
        c.filter(F.col("c_acctbal") > 0)
        .select(seg, "c_acctbal")
        .groupBy("seg")
        .agg(F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )
    return a.join(b, a["seg"].eqNullSafe(b["seg"])).select(
        a["seg"].alias("seg"), "n_customers", "avg_bal"
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic listagg: sort the collected set, then join.
    collect_list alone is partition-arrival order — never comparable
    across engines or even across runs."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "q_median_iqr",
    oracle="""
    SELECT l_returnflag,
           ROUND(median(l_quantity), 2)              AS med_qty,
           ROUND(quantile_cont(l_quantity, 0.25), 2) AS q1_qty,
           ROUND(quantile_cont(l_quantity, 0.75), 2) AS q3_qty,
           CAST(floor(median(l_extendedprice) * 100) AS BIGINT) AS med_price_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_median_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank statistics per group (median + quartiles).

    The price median ships as integer CENTS via floor: an even-count
    median interpolates to a half-cent (x.245) whose decimal ROUND is
    engine-dependent (HALF_UP on the binary double truncates
    differently in Spark vs DuckDB), while floor of the identical IEEE
    double is deterministic.  Quantities are small integers whose
    quartile fractions (.25/.5/.75) are exact binary — plain ROUND is
    safe there.

    Scale: exact percentiles sort within each group partition — fine
    for bounded group counts; unbounded cardinality switches to
    percentile_approx (q_percentile_approx) whose t-digest merges
    map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 2).alias("med_qty"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 2).alias("q1_qty"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 2).alias("q3_qty"),
        F.floor(F.expr("percentile(l_extendedprice, 0.5)") * 100)
        .cast("bigint")
        .alias("med_price_cents"),
    )


@query(
    "q_date_gap_fill",
    oracle="""
    WITH spine AS (
        SELECT unnest(generate_series(DATE '1995-01-01', DATE '1998-12-01',
                                      INTERVAL 1 MONTH))::DATE AS month
    ),
    fact AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT s.month, COALESCE(f.n_orders, 0) AS n_orders,
           COALESCE(f.revenue, 0.0) AS revenue
    FROM spine s LEFT JOIN fact f ON s.month = f.month
    """,
)
def q_date_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order rollup joined onto a generated date spine —
    months with no orders appear as explicit zero rows.

    The spine is a ``sequence`` literal exploded on the fly (a few
    dozen rows).  The BUILD side of the outer join is the aggregated
    fact (months x metrics — tiny at any scale, and a left-outer join
    can only broadcast its non-preserved side), so the join never
    shuffles anything.
    """
    o = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1998-12-01").cast("date"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month")
    )
    fact = (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    return spine.join(F.broadcast(fact), "month", "left").select(
        "month",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )


@query(
    "q_lateral",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) o
    WHERE c.c_custkey <= 200
    """,
)
def q_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table: each customer's two largest
    orders, written as raw SQL through the ``spark.sql`` entry point —
    the literal form of the reference's arbitrary ``extract_query``
    surface (ref: /root/reference/pypeline/Pype.py:36).

    Scale: Catalyst decorrelates the lateral subquery into a ranked
    window over a single equi-shuffle — the executed plan has no
    nested-loop per-row re-execution (same shape as q_window_topn).
    """
    from pypeline_spark.session import register_tables

    register_tables(spark, sf_dir, only=("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        WHERE c.c_custkey <= 200
        """
    )


@query(
    "q_recursive_cte",
    # DuckDB's integer division spells // where Spark SQL spells div;
    # everything else is the same ANSI recursive CTE text.
    oracle="""
    WITH RECURSIVE walk(custkey, node, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey <= 500
        UNION ALL
        SELECT custkey, node // 2, depth + 1 FROM walk WHERE node > 1
    )
    SELECT custkey,
           CAST(MAX(depth) AS INT)    AS depth,
           CAST(COUNT(*) AS BIGINT)   AS n_steps,
           CAST(SUM(node) AS BIGINT)  AS path_sum
    FROM walk GROUP BY custkey
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native recursive CTE (Spark 4's WITH RECURSIVE): walk each
    customer key up the implicit binary-tree hierarchy (parent =
    key div 2) to the root, emitting walk depth and path aggregates —
    the transitive-closure SQL surface (org charts, BOM explosions,
    referral chains) that previously required driver-side iteration.

    Scale: each recursion level is one self-union step over the
    frontier; depth is log2(max key), so the plan is ~18 narrow
    levels at warehouse key ranges — the same work the iterative
    label-propagation in functions/dedup.py does, but expressed
    declaratively.
    """
    from pypeline_spark.session import register_tables

    register_tables(spark, sf_dir, only=("customer",))
    return spark.sql(
        """
        WITH RECURSIVE walk(custkey, node, depth) AS (
            SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey <= 500
            UNION ALL
            SELECT custkey, node div 2, depth + 1 FROM walk WHERE node > 1
        )
        SELECT custkey,
               CAST(MAX(depth) AS INT)    AS depth,
               CAST(COUNT(*) AS BIGINT)   AS n_steps,
               CAST(SUM(node) AS BIGINT)  AS path_sum
        FROM walk GROUP BY custkey
        """
    )


@query(
    "q_variant_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT)    AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT)    AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type:
    parse_json once into the shredded binary encoding, then typed
    variant_get extraction feeding a per-type rollup — the modern
    replacement for per-access get_json_object string re-parsing
    (q_json_props is the classic form).

    Scale: VARIANT parses each document once at the scan and stores a
    shredded binary; repeated typed extractions are pointer chases,
    not string parses — at 100 TB of event payloads that is the
    difference between one JSON parse per row and one per access.
    The rollup is an ordinary partial-aggregated groupBy.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )
