"""Format round-trip tests: csv/json/orc/parquet preserve data; bad
formats fail fast; partitioned writes lay out prunable directories."""

import os

import pytest
from pyspark.sql import functions as F

from pypeline_spark.session import load_table
from pypeline_spark.sources import read_source, write_sink


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


class TestRoundTrip:
    @pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
    def test_roundtrip(self, spark, nation, tmp_path, fmt):
        path = str(tmp_path / fmt)
        write_sink(nation, fmt, path)
        schema = "n_nationkey int, n_name string, n_regionkey int"
        back = read_source(spark, fmt, path, schema=schema)
        assert _canon(back.select("n_nationkey", "n_name", "n_regionkey")) == _canon(nation)

    def test_partitioned_write_prunes(self, spark, nation, tmp_path):
        path = str(tmp_path / "part")
        write_sink(nation, "parquet", path, partition_by=["n_regionkey"])
        # hive-style layout exists
        assert any(d.startswith("n_regionkey=") for d in os.listdir(path))
        back = read_source(spark, "parquet", path).filter(F.col("n_regionkey") == 2)
        plan = back._jdf.queryExecution().executedPlan().toString()
        # partition filter prunes directories at planning, not row filter
        assert back.count() == nation.filter("n_regionkey = 2").count()
        assert "PartitionFilters: [isnotnull(n_regionkey" in plan or "n_regionkey=2" in plan

    def test_unknown_format_fails_fast(self, spark, nation, tmp_path):
        with pytest.raises(ValueError, match="unsupported"):
            write_sink(nation, "avro", str(tmp_path / "x"))
        with pytest.raises(ValueError, match="unsupported"):
            read_source(spark, "avro", str(tmp_path / "x"))

    def test_jdbc_partitioning_validation(self, spark):
        with pytest.raises(ValueError, match="bounds"):
            read_source(
                spark,
                "jdbc",
                "jdbc:postgresql://example/db",
                options={"dbtable": "t"},
                partition_column="id",
            )
