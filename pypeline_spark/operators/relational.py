"""Scans, filters, projections, joins, aggregations, subqueries, CTEs.

These are the operator classes a pypeline user writes into
``extract_query`` (ref: /root/reference/pypeline/Pype.py:36); each is
declared here as a native DataFrame plan.  Scale notes per query in the
docstrings: what shuffles, what broadcasts, what pushes down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table, scan_parallelism

# Money arithmetic in DECIMAL, not DOUBLE: price (2 true decimals) times
# discount (2 true decimals) yields exactly-4-decimal values, so rounding
# the double product to 2 places lands on .xx5 ties that Spark and other
# engines resolve differently.  Decimal keeps the product and its sums
# exact; the final cast to double is then deterministic everywhere.
PRICE_DEC = "decimal(12,2)"
RATE_DEC = "decimal(4,2)"


def _disc_price() -> F.Column:
    """l_extendedprice * (1 - l_discount) as an exact decimal."""
    return F.col("l_extendedprice").cast(PRICE_DEC) * (
        F.lit(1).cast(RATE_DEC) - F.col("l_discount").cast(RATE_DEC)
    )


@query(
    "q_scan",
    oracle="SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders FROM lineitem",
)
def q_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan + count.

    Scale: count(*) is computed from parquet row-group metadata where
    possible; countDistinct is a two-phase hash aggregate (partial
    per-partition, then one exchange on the grouping key — none here, so
    a single final aggregate of partial distinct sets).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "q_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection, TPC-H Q6-shaped.

    Scale: all four predicates and the 6-column projection push down to
    the parquet scan (PushedFilters/ReadSchema); no shuffle at all —
    embarrassingly parallel over row groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            _disc_price().cast("double").alias("revenue"),
        )
    )


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders x customer.

    Scale: customer is the small dimension — broadcast it so the fact
    side never shuffles.  At 100 TB the orders side stays partitioned;
    only the dim ships to every executor.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q_join_multi",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM region r
    JOIN nation n    ON n.n_regionkey = r.r_regionkey
    JOIN customer c  ON c.c_nationkey = n.n_nationkey
    JOIN orders o    ON o.o_custkey = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table star join (TPC-H Q5 shape), revenue per nation.

    Scale: region/nation/customer are broadcast dims (region filter
    prunes first, shrinking the nation/customer broadcast transitively);
    the only shuffle is lineitem<->orders, both hash-partitioned on the
    order key, then one exchange for the final groupBy on n_name (25
    groups — map-side partial aggregation makes it tiny).
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey <= 300
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no qualifying orders."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, o.o_custkey == c.c_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name
    FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey <= 300
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join — the mirror of q_join_left, preserving the
    customer side.

    Scale: Spark plans right-outer with the *left* side as build when
    broadcastable (BroadcastHashJoin RightOuter builds left), so the
    filtered orders subset broadcasts and the preserved side streams.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, o.o_custkey, o.n_orders
    FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey BETWEEN 200 AND 400) c
    FULL OUTER JOIN (
        SELECT o_custkey, count(*) AS n_orders FROM orders
        WHERE o_custkey BETWEEN 300 AND 500 GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two keyed subsets (nulls on both sides).

    Scale: full outer cannot broadcast — both sides hash-exchange on the
    key; AQE coalesces the post-shuffle partitions.
    """
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").between(200, 400))
        .select("c_custkey", "c_acctbal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").between(300, 500))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        "c_custkey", "c_acctbal", "o_custkey", "n_orders"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT n.n_name, r.r_name FROM nation n CROSS JOIN region r
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny dims (25 x 5) — broadcast nested loop."""
    n = load_table(spark, sf_dir, "nation").select("n_name")
    r = load_table(spark, sf_dir, "region").select("r_name")
    return n.crossJoin(F.broadcast(r))


@query(
    "q_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers having a big order.

    Scale: semi joins never duplicate the probe side; with the build side
    filtered first it broadcasts and the customer scan stays shuffle-free.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(F.broadcast(o), c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(F.broadcast(o), c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_agg_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                AS DOUBLE)                                             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
                    (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))
                AS DOUBLE)                                             AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 2)      AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 2) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*), 4)       AS avg_disc,
           COUNT(*)                                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the flagship pricing-summary aggregate.

    Scale: 6 groups — partial (map-side) aggregation reduces each
    partition to ≤6 rows before the single tiny exchange.  Whole plan is
    one WholeStageCodegen span over the scan.

    r19: when the scan is under-split (scan_parallelism), project to the
    7 needed columns and hash-repartition before aggregating, so the
    decimal arithmetic runs on every core instead of inside a
    single-row-group scan task (measured 1.27x at sf0.1; the guard
    returns 0 on a wide scan, keeping the map-side-only shape at scale).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    par = scan_parallelism(spark, sf_dir, "lineitem")
    if par:
        li = li.select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_orderkey",
        ).repartition(par, F.col("l_orderkey"))
    qty_dec = F.col("l_quantity").cast(PRICE_DEC)
    price_dec = F.col("l_extendedprice").cast(PRICE_DEC)
    disc_dec = F.col("l_discount").cast(RATE_DEC)
    charge = _disc_price() * (F.lit(1).cast(RATE_DEC) + F.col("l_tax").cast(RATE_DEC))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty_dec).cast("double").alias("sum_qty"),
        F.sum(price_dec).cast("double").alias("sum_base_price"),
        F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.round(F.sum(qty_dec).cast("double") / F.count("*"), 2).alias("avg_qty"),
        F.round(F.sum(price_dec).cast("double") / F.count("*"), 2).alias("avg_price"),
        F.round(F.sum(disc_dec).cast("double") / F.count("*"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple count(distinct) in one aggregate.

    Scale: Catalyst expands multi-distinct into an Expand + two-phase
    aggregate; distinct sets are partial-deduped map-side before the
    exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT c_mktsegment,
           ROUND(STDDEV_SAMP(c_acctbal), 2) AS sd_bal,
           ROUND(VAR_SAMP(c_acctbal), 2)    AS var_bal,
           ROUND(MIN(c_acctbal), 2)         AS min_bal,
           ROUND(MAX(c_acctbal), 2)         AS max_bal,
           COUNT(*)                         AS n
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/min/max) per segment."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.stddev_samp("c_acctbal"), 2).alias("sd_bal"),
        F.round(F.var_samp("c_acctbal"), 2).alias("var_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.count("*").alias("n"),
    )


@query(
    "q_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 15
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by with HAVING (post-aggregation filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .filter(F.col("n_orders") > 15)
    )


@query(
    "q_rollup",
    oracle="""
    SELECT n.n_name, c.c_mktsegment, COUNT(*) AS n_cust,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (nation -> segment -> grand total)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


@query(
    "q_exists_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) > 15
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst to a join).

    Expressed through spark.sql to exercise the SQL entry path — the
    reference's extract_query surface (ref: Pype.py:36).
    """
    from pypeline_spark.session import register_tables

    register_tables(spark, sf_dir, only=("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) > 15
        """
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_totalprice > 430000
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (rewritten to a semi join)."""
    from pypeline_spark.session import register_tables

    register_tables(spark, sf_dir, only=("customer", "orders"))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND o_totalprice > 430000
        """
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) + 2000 FROM customer)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery broadcast as a literal at runtime."""
    from pypeline_spark.session import register_tables

    register_tables(spark, sf_dir, only=("customer",))
    return spark.sql(
        """
        SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) + 2000 FROM customer)
        """
    )


@query(
    "q_cte",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS DOUBLE) AS total_rev
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev > (SELECT AVG(total_rev) FROM revenue)
    """,
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + scalar subquery over it (TPC-H Q15 shape)."""
    from pypeline_spark.session import register_tables

    register_tables(spark, sf_dir, only=("lineitem", "supplier"))
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                            (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                        AS DOUBLE) AS total_rev
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev > (SELECT AVG(total_rev) FROM revenue)
        """
    )


@query(
    "q_predicates",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_name LIKE 'Customer#00000%'
      AND c_name NOT LIKE '%99'
      AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
      AND c_acctbal IS NOT NULL
    """,
)
def q_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate breadth: LIKE prefix/suffix patterns, IN-list, null
    checks — the remaining scan-predicate family from SURVEY.md §2b.

    Scale: the LIKE prefix compiles to StringStartsWith and the IN-list
    to In — both push into the parquet scan (PushedFilters), so row
    groups whose column stats can't match are never read.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_name").like("Customer#00000%")
        & ~F.col("c_name").like("%99")
        & F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE")
        & F.col("c_acctbal").isNotNull()
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@query(
    "q_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue for one segment, top 10.

    Scale: the segment filter prunes customer BEFORE it broadcasts
    (customer is the true dimension here); orders is a FACT table — no
    broadcast hint, AQE picks broadcast at small SF and sort-merge at
    warehouse scale where a forced broadcast would OOM the executors.
    Both fact scans carry their date predicates; LIMIT folds into
    TakeOrderedAndProject, so the global sort never materializes.
    Ties broken by l_orderkey for a deterministic top-10.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.

    Scale: return-flag and date predicates push into the two fact
    scans; customer/nation (true dims) broadcast; orders is a fact —
    unhinted, so AQE broadcasts it only while it actually fits; one
    shuffle for the aggregate on c_custkey; TakeOrderedAndProject for
    the limit.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q_not_in_nulls",
    oracle="""
    SELECT 'no_null_in_set' AS branch, c_custkey FROM customer
    WHERE c_custkey <= 200
      AND c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    UNION ALL
    SELECT 'null_in_set' AS branch, c_custkey FROM customer
    WHERE c_custkey <= 200
      AND c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_totalprice > 400000
          UNION ALL SELECT NULL)
    """,
)
def q_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN under three-valued logic (null-aware anti join).

    The classic correctness trap: one NULL in the subquery result makes
    ``x NOT IN (...)`` UNKNOWN for every row, so the second branch must
    return ZERO rows while the first (same set, no NULL) returns the
    complement.  Spark plans this as a null-aware anti join; both
    branches run through spark.sql so Catalyst's NAAJ handling — not a
    hand-rewritten join — is what's under test.
    """
    from pypeline_spark.session import register_tables

    register_tables(spark, sf_dir, only=("customer", "orders"))
    return spark.sql(
        """
        SELECT 'no_null_in_set' AS branch, c_custkey FROM customer
        WHERE c_custkey <= 200
          AND c_custkey NOT IN (
              SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        UNION ALL
        SELECT 'null_in_set' AS branch, c_custkey FROM customer
        WHERE c_custkey <= 200
          AND c_custkey NOT IN (
              SELECT o_custkey FROM orders WHERE o_totalprice > 400000
              UNION ALL SELECT NULL)
        """
    )


@query(
    "q_regional_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier
    share the nation, one region, one year.

    Scale: the join graph has TWO fact tables (orders, lineitem) and
    four true dimensions.  region -> nation -> supplier prunes the
    supplier side BEFORE it reaches lineitem (dimension filters flow
    down the broadcast chain); the c_nationkey = s_nationkey
    requirement rides the customer join as an extra equi-key, not a
    separate pass.  Facts are never broadcast-hinted — AQE picks the
    strategy per actual size.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@query(
    "q_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                      AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                   AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional PROMO volume per
    year — an 8-relation join graph.

    Scale: the two selective dimension filters (region name, part
    type) prune their broadcast sides first, which is what collapses
    the fact-fact join's input; the share division happens AFTER the
    aggregate, on a |years|-row table.  Decimal volume all the way to
    the final double division (engine-exact money math, see module
    conventions).
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _disc_price().alias("volume"),
            F.col("nation"),
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0))
            .cast("double")
            / F.sum("volume").cast("double"),
            4,
        ).alias("mkt_share")
    )


@query(
    "q_large_orders",
    # TPC-H Q18 shape (large-quantity orders and their customers).
    # l_quantity is integral-valued, so SUM is exact in double on both
    # engines; cast to BIGINT for a type-stable hash.
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds the
    threshold, with their customer and order rollup.

    Scale: the IN-subquery is an aggregate on l_orderkey (map-side
    partial sums) semi-joined back to orders — both sides shuffle on
    the order key once; the customer attach is a dim join AQE
    broadcasts.  No row explosion: the final aggregate reuses the
    order-key partitioning.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
    )


@query(
    "q_priority_lateness",
    # TPC-H Q4 shape adapted to this schema (no commit/receipt dates):
    # an order is "late-shipped" when any of its line items shipped
    # more than 60 days after the order date.
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders in a half-year
    window with at least one line item shipped >60 days after order
    date — correlated EXISTS with a non-equi date predicate.

    Scale: the EXISTS compiles to a LEFT SEMI hash join on the order
    key with the date comparison as a residual predicate inside the
    key group — one shuffle per side, never a nested loop; the
    half-year filter prunes the probe side at the scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders")
    )
