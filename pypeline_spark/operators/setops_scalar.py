"""Set operations, scalar function families, pivot, and JSON access.

The JSON functions are the native form of the reference's JSON funnel
(it ships every batch through ``json.dumps`` + ``json_populate_recordset``,
ref: /root/reference/pypeline/Pype.py:107,126,147).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table


@query(
    "q_union_all",
    oracle="""
    SELECT c_custkey AS key, 'building' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT o_custkey AS key, 'bigorder' AS src FROM orders WHERE o_totalprice > 450000
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"), F.lit("building").alias("src"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("key"), F.lit("bigorder").alias("src"))
    )
    return c.unionAll(o)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 450000
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set union — one hash exchange for the distinct)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("key"))
    )
    return c.union(o).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("key"))
    )
    return c.intersect(o)


@query(
    "q_except",
    oracle="""
    SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct difference).

    ``subtract`` is SQL EXCEPT exactly: any key present in the right
    side disappears entirely.  (``exceptAll().distinct()`` is NOT the
    same operator — it only removes one occurrence per right-side row,
    so a key with more left than right occurrences would survive.)
    """
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("key"))
    )
    return c.subtract(o)


@query(
    "q_except_all",
    oracle="""
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
    EXCEPT ALL
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 350000
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiset difference over a key with real duplicates
    (customers place many orders) — each right occurrence cancels
    exactly one left occurrence.

    Scale: implemented as a counted anti-semantics aggregate, not a
    sort — one shuffle per side keyed on the value.
    """
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("key"))
    b = o.filter(F.col("o_totalprice") > 350000).select(F.col("o_custkey").alias("key"))
    return a.exceptAll(b)


@query(
    "q_intersect_all",
    oracle="""
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
    INTERSECT ALL
    SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: multiset intersection — each key keeps
    min(left count, right count) occurrences."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("key"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("key")
    )
    return a.intersectAll(b)


@query(
    "q_scalar_str",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                                   AS name_upper,
           LOWER(c_mktsegment)                             AS seg_lower,
           LENGTH(c_name)                                  AS name_len,
           SUBSTR(c_name, 1, 8)                            AS name_prefix,
           CONCAT(c_name, ':', c_mktsegment)               AS name_seg,
           TRIM(CONCAT(' ', c_name, ' '))                  AS name_trim,
           REPLACE(c_name, 'Customer', 'Cust')             AS name_replaced,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1)           AS name_digits
    FROM customer WHERE c_custkey <= 200
    """,
)
def q_scalar_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (upper/lower/length/substr/concat/trim/
    replace/regexp_extract)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_replaced"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
    )


@query(
    "q_scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)     AS yr,
           CAST(MONTH(o_orderdate) AS INT)    AS mo,
           CAST(DAY(o_orderdate) AS INT)      AS dy,
           CAST(QUARTER(o_orderdate) AS INT)  AS qtr,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE)          AS order_date,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
    FROM orders WHERE o_orderkey <= 500
    """,
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family (year/month/day/quarter/trunc/last_day/
    interval arithmetic)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dy"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


@query(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                       AS price_r1,
           CAST(ABS(l_discount - 0.05) AS DOUBLE)          AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT)                AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT)               AS qty_floor,
           ROUND(POWER(l_quantity, 2), 2)                  AS qty_sq,
           ROUND(LN(l_extendedprice), 4)                   AS price_ln,
           ROUND(SQRT(l_extendedprice), 4)                 AS price_sqrt,
           CAST(CAST(l_orderkey AS BIGINT) % 7 AS BIGINT)  AS key_mod
    FROM lineitem WHERE l_orderkey <= 300
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (round/abs/ceil/floor/pow/ln/sqrt/mod)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).cast("double").alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        (F.col("l_orderkey").cast("bigint") % 7).cast("bigint").alias("key_mod"),
    )


@query(
    "q_case_coalesce",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal >= 7500 THEN 'platinum'
                WHEN c_acctbal >= 5000 THEN 'gold'
                WHEN c_acctbal >= 0    THEN 'standard'
                ELSE 'delinquent' END                 AS tier,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
           CAST(c_acctbal > 5000 AS BOOLEAN)          AS is_high
    FROM customer
    """,
)
def q_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE / COALESCE / NULLIF / boolean expr."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") >= 7500, "platinum")
        .when(F.col("c_acctbal") >= 5000, "gold")
        .when(F.col("c_acctbal") >= 0, "standard")
        .otherwise("delinquent")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        (F.col("c_acctbal") > 5000).cast("boolean").alias("is_high"),
    )


@query(
    "q_json_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events WHERE event_id <= 2000
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar access over the events.props column — the native form
    of the reference's JSON wire format (ref: Pype.py:147)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


@query(
    "q_array_ops",
    oracle="""
    SELECT doc_id,
           len(string_split(trim(text), ' '))                               AS n_tokens,
           CAST(len(list_filter(string_split(trim(text), ' '),
                                w -> len(w) > 4)) AS INT)                   AS n_long_tokens,
           string_split(trim(text), ' ')[1]                                AS first_token,
           CAST(list_contains(string_split(trim(text), ' '), 'spark') AS BOOLEAN) AS has_spark
    FROM documents WHERE doc_id <= 200
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split/size/lambda filter/element_at/array_contains.

    Lambda higher-order functions run JVM-side (no Python UDF).
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    toks = F.split(F.trim(F.col("text")), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.length(w) > 4)).cast("int").alias("n_long_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "spark").cast("boolean").alias("has_spark"),
    )


@query(
    "q_explode",
    oracle="""
    SELECT e.event_id, t.word
    FROM events e, unnest(string_split(e.event_type, '')) AS t(word)
    WHERE e.event_id <= 50
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (table-generating function) of a derived array."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 50)
    return e.select("event_id", F.explode(F.split("event_type", "")).alias("word")).filter(
        F.col("word") != ""
    )


@query(
    "q_map_ops",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           'k' AS first_key
    FROM events WHERE event_id <= 100
    """,
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: from_json to map, map_keys, element_at."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 100)
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@query(
    "q_to_json",
    oracle="""
    SELECT o_orderkey,
           CONCAT('{"key":', CAST(o_orderkey AS VARCHAR),
                  ',"status":"', o_orderstatus, '"}') AS payload
    FROM orders WHERE o_orderkey <= 200
    """,
)
def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row -> JSON string (native analogue of the reference's batch
    serialization via json.dumps, ref: Pype.py:147)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(F.col("o_orderkey").alias("key"), F.col("o_orderstatus").alias("status"))
        ).alias("payload"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_O,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list => no extra
    distinct-values job)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2))
    )
    return p.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@query(
    "q_try_cast",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(TRY_CAST(substr(c_name, 10, 3) AS INT)) AS n_numeric,
           CAST(SUM(COALESCE(TRY_CAST(substr(c_name, 10, 3) AS INT), 0)) AS BIGINT)
               AS numeric_sum,
           COUNT(TRY_CAST(c_name AS DOUBLE)) AS n_bogus_doubles
    FROM customer
    """,
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe casting over dirty-ish strings: TRY_CAST yields NULL
    instead of failing the job — the data-hygiene primitive the
    reference's JSON funnel (ref: /root/reference/pypeline/Pype.py:147)
    left to Postgres coercion errors.

    Scale: per-row expression, no shuffle; under ANSI mode a plain
    CAST would kill the task on the first malformed value — TRY_CAST
    is how a 100 TB ingest survives a handful of bad rows.
    """
    c = load_table(spark, sf_dir, "customer")
    digits = F.expr("try_cast(substr(c_name, 10, 3) AS INT)")
    return c.agg(
        F.count("*").alias("n_rows"),
        F.count(digits).alias("n_numeric"),
        F.sum(F.coalesce(digits, F.lit(0))).cast("bigint").alias("numeric_sum"),
        F.count(F.expr("try_cast(c_name AS DOUBLE)")).alias("n_bogus_doubles"),
    )


@query(
    "q_arg_minmax",
    oracle="""
    SELECT c_mktsegment,
           max_by(c_name, c_custkey) AS newest_customer,
           min_by(c_name, c_custkey) AS oldest_customer,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by argument aggregates (keyed on the unique
    custkey, so the answer is deterministic — never key them on a
    tie-able column).

    Scale: single hash aggregate with map-side partials carrying
    (value, key) pairs — replaces the window + filter idiom when only
    the extreme row's single column is needed.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", "c_custkey").alias("newest_customer"),
        F.min_by("c_name", "c_custkey").alias("oldest_customer"),
        F.max("c_custkey").cast("bigint").alias("max_key"),
    )


@query(
    "q_union_evolve",
    oracle="""
    SELECT id, name, acctbal, segment FROM (
        SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
               c_mktsegment AS segment
        FROM customer WHERE c_custkey <= 100
        UNION ALL BY NAME
        SELECT s_suppkey AS id, s_name AS name, s_acctbal AS acctbal
        FROM supplier
    )
    """,
)
def q_union_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: combine two relations whose column sets
    differ (supplier rows have no segment), missing columns null-filled
    by NAME — the ingest shape when a source adds columns mid-stream.

    Scale: ``unionByName(allowMissingColumns=True)`` is pure plan
    surgery (project + union, no shuffle); positional UNION would
    silently misalign columns and a strict union would reject the
    batch.  This is also the read-side contract for parquet
    mergeSchema directories.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s, allowMissingColumns=True)
