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


class TestJdbcDerby:
    """Live JDBC round-trip against embedded Derby (shipped in Spark's
    classpath for the Hive metastore) — proves the reference's actual
    extract/load surface over a real driver: batched executor-parallel
    INSERTs on write (ref: Pype.py:147-148 bulk loop), range-partitioned
    parallel extraction on read (bulk_size -> fetchsize, ref: Pype.py:41).
    """

    DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

    @pytest.fixture()
    def url(self, tmp_path):
        return f"jdbc:derby:{tmp_path}/derbydb;create=true"

    def test_write_then_partitioned_parallel_read(self, spark, sf_dir, url):
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
        ).filter(F.col("c_custkey") <= 200)
        write_sink(
            cust,
            "jdbc",
            url,
            options={"dbtable": "cust", "driver": self.DRIVER},
            bulk_size=50,  # reference bulk_size -> JDBC batchsize
        )
        back = read_source(
            spark,
            "jdbc",
            url,
            options={"dbtable": "cust", "driver": self.DRIVER},
            bulk_size=50,  # -> fetchsize
            partition_column="c_custkey",
            bounds=(1, 200),
            num_partitions=4,
        )
        # the extract is genuinely parallel: one task per key range
        assert back.rdd.getNumPartitions() == 4
        assert _canon(back) == _canon(cust)

    def test_append_accumulates_and_predicate_pushes_down(self, spark, url):
        df = spark.range(1, 51).selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS v")
        write_sink(df, "jdbc", url, options={"dbtable": "t2", "driver": self.DRIVER})
        write_sink(
            df.selectExpr("k + 100 AS k", "v"),
            "jdbc",
            url,
            mode="append",
            options={"dbtable": "t2", "driver": self.DRIVER},
        )
        back = read_source(
            spark, "jdbc", url, options={"dbtable": "t2", "driver": self.DRIVER}
        )
        assert back.count() == 100
        filtered = back.filter(F.col("k") > 100)
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        # the filter ships to the database as a PushedFilters predicate,
        # not a post-scan row filter — the JDBC scan must not read all rows
        assert "PushedFilters" in plan and "k" in plan.split("PushedFilters")[1][:80]
        assert filtered.count() == 50
