"""Partition pruning over the hive layout (`sinks/layout.py::
write_partitioned`): static pruning must show up as PartitionFilters
(directories skipped before any footer read), and a dim-filtered join
on the partition key must trigger DYNAMIC partition pruning — the two
mechanisms that keep a date/tenant-partitioned 100 TB fact from being
listed, let alone scanned, in full."""

import pytest

from pyspark.sql import functions as F

from pypeline_spark.plans.inspect import physical_plan
from pypeline_spark.session import load_table
from pypeline_spark.sinks.layout import write_partitioned


@pytest.fixture(scope="module")
def part_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orders_by_year"))
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    write_partitioned(orders, path, ["o_year"])
    return path


def test_layout_is_hive_partitioned(part_dir):
    import os

    years = [d for d in os.listdir(part_dir) if d.startswith("o_year=")]
    assert len(years) >= 5, years


def test_static_partition_pruning(spark, part_dir):
    df = spark.read.parquet(part_dir).filter(F.col("o_year") == 1997)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan
    assert "o_year" in plan.split("PartitionFilters")[1].splitlines()[0]
    # the pruned read returns only 1997 rows
    assert df.select(F.min("o_year"), F.max("o_year")).first() == (1997, 1997)


def test_dynamic_partition_pruning_on_dim_join(spark, part_dir):
    """A filter that reaches the fact only THROUGH the join (the dim
    side is filtered, the fact is not) must inject a runtime pruning
    subquery on the partition column."""
    fact = spark.read.parquet(part_dir)
    dim = spark.createDataFrame(
        [(1996, "covered"), (1997, "covered"), (1998, "covered")],
        "d_year int, coverage string",
    ).filter(F.col("coverage") == "covered")
    joined = fact.join(dim, fact.o_year == dim.d_year).groupBy("o_year").count()
    plan = physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    got = {r.o_year for r in joined.collect()}
    assert got == {1996, 1997, 1998}
