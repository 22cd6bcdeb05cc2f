"""Manifest-committed table: atomicity, snapshot isolation,
exactly-once batch replay, time travel, and vacuum retention."""

import os

import pytest
from pyspark.sql import functions as F

from pypeline_spark.session import load_table
from pypeline_spark.sinks.manifest import ManifestTable


@pytest.fixture()
def table(tmp_path):
    return ManifestTable(str(tmp_path / "tbl"))


@pytest.fixture()
def customers(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_commit_then_read_roundtrip(spark, table, customers):
    v = table.commit_overwrite(customers)
    assert v == 1
    assert _canon(table.read(spark)) == _canon(customers)


def test_unpublished_files_are_invisible(spark, table, customers):
    """Crash simulation: data files written but manifest never swapped
    must leave readers on the old version."""
    table.commit_overwrite(customers.filter(F.col("c_custkey") <= 100))
    before = _canon(table.read(spark))
    # write a fileset exactly as a commit would, then 'crash' pre-publish
    table._write_fileset(customers.filter(F.col("c_custkey") > 100))
    assert _canon(table.read(spark)) == before
    assert table.version() == 1


def test_snapshot_isolation_across_commits(spark, table, customers):
    table.commit_overwrite(customers.filter(F.col("c_custkey") <= 100))
    snapshot = table.read(spark)  # reader opens version 1
    expected = _canon(snapshot)
    table.commit_overwrite(customers)  # version 2 lands afterwards
    # the open reader still scans exactly the version-1 file list
    assert _canon(snapshot) == expected
    # and a new reader sees version 2
    assert len(_canon(table.read(spark))) == customers.count()


def test_merge_commit_and_exactly_once_replay(spark, table, customers):
    base = customers.filter(F.col("c_custkey") <= 1000)
    table.commit_overwrite(base, batch_id="b0")
    updates = (
        customers.filter(F.col("c_custkey").between(800, 1200))
        .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
    )
    v1 = table.commit_merge(spark, updates, ("c_custkey",), batch_id="b1")
    after_first = _canon(table.read(spark))
    # replaying the same batch id must be a detected no-op
    v2 = table.commit_merge(spark, updates, ("c_custkey",), batch_id="b1")
    assert v2 == v1
    assert _canon(table.read(spark)) == after_first
    assert table.applied_batch_ids() == {"b0", "b1"}


def test_time_travel_reads_old_version(spark, table, customers):
    small = customers.filter(F.col("c_custkey") <= 50)
    table.commit_overwrite(small)
    table.commit_overwrite(customers)
    assert _canon(table.read(spark, version=1)) == _canon(small)


def test_vacuum_drops_only_unreferenced(spark, table, customers):
    table.commit_overwrite(customers.filter(F.col("c_custkey") <= 50))
    table.commit_overwrite(customers.filter(F.col("c_custkey") <= 100))
    table.commit_overwrite(customers)
    removed = table.vacuum(keep_versions=1)
    assert removed > 0
    # newest version fully readable; vacuumed version raises
    assert len(_canon(table.read(spark))) == customers.count()
    with pytest.raises(ValueError):
        table.read(spark, version=1)
    # no dangling files: everything in data/ is referenced by a manifest
    import json

    live = set()
    for f in os.listdir(table.root):
        if f.startswith("_manifest.v"):
            with open(os.path.join(table.root, f)) as fh:
                live.update(json.load(fh)["files"])
    on_disk = set(os.listdir(table.data_dir))
    assert on_disk == live
