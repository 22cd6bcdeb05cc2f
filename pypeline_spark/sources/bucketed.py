"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders) is
shuffling both sides by the join key on every query.  Bucketing
pre-shuffles ONCE at write time: each side is hash-clustered into the
same number of buckets on the join key, so Catalyst plans a
SortMergeJoin with NO Exchange on either side — the join runs
bucket-by-bucket on co-located splits.  (This is the batch analogue of
the reference delegating joins to its database's indexes — ref:
/root/reference/pypeline/Pype.py:36 — made native.)

Rules encoded here:
- bucket count must MATCH on both sides (or divide evenly) or Spark
  falls back to re-shuffling one side;
- bucketBy requires saveAsTable (metastore tracks the clustering);
- sort within buckets at write time so the merge join skips its sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

N_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Persist df as a managed table hash-clustered (and sorted) by
    bucket_col.  Overwrites any previous version of the table."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the session catalog is in-memory: a table dir left by a previous
    # process isn't known to DROP TABLE, so clear the location as well
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_join_revenue(spark: SparkSession) -> DataFrame:
    """Per-order-priority revenue over the bucketed fact tables.

    Both scans are bucketed on the join key -> the physical plan is a
    SortMergeJoin with no Exchange below it (asserted in tests).  The
    'merge' hint pins SMJ so a broadcast decision can't hide the
    co-location property being demonstrated.
    """
    li = spark.table("bkt_lineitem")
    o = spark.table("bkt_orders")
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "q_join_bucketed",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join: bucket both tables by the join key,
    then join without shuffling either side.  The oracle is the plain
    join — bucketing must not change results, only the plan."""
    write_bucketed(load_table(spark, sf_dir, "lineitem"), "bkt_lineitem", "l_orderkey")
    write_bucketed(load_table(spark, sf_dir, "orders"), "bkt_orders", "o_orderkey")
    return bucketed_join_revenue(spark)
