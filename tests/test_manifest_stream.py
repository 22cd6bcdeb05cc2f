"""Streaming source over the manifest change feed: exactly-once
version-cursor offsets across restarts, per-file partitions, typed
rows, read-through of reorg (compact/OPTIMIZE) commits, and
content-rewrite refusal."""

import os

import pytest
from pyspark.sql import functions as F

from pypeline_spark.session import load_table
from pypeline_spark.sinks.manifest import ManifestTable
from pypeline_spark.sources.manifest_stream import register


@pytest.fixture()
def cust(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )


def _drain(spark, root, out_dir, ckpt, since=1):
    """One availableNow pass of the stream into a parquet sink."""
    register(spark)
    q = (
        spark.readStream.format("manifest_changes")
        .option("path", root)
        .option("since_version", since)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_matches_feed_and_restart_is_exactly_once(
    spark, tmp_path, cust
):
    k = F.col("c_custkey")
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = ManifestTable(root)
    t.commit_overwrite(cust.filter(k % 3 != 0), batch_id="seed")  # v1
    t.commit_delta(
        cust.filter(k % 2 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 100.0
        ),
        ["c_custkey"], batch_id="d1", cdc=True,
    )  # v2
    t.commit_delta(
        None, ["c_custkey"], batch_id="d2",
        deletes=cust.filter(k % 4 == 1),
    )  # v3
    _drain(spark, root, out, ckpt)
    got = spark.read.parquet(out)
    assert set(got.columns) == {
        "c_custkey", "c_acctbal", "_commit_version", "_change_type"
    }
    feed = t.changes(spark, since_version=1)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in feed.select(*got.columns).collect()
    )
    types = {
        (r.v, r.ct)
        for r in got.select(
            F.col("_commit_version").alias("v"),
            F.col("_change_type").alias("ct"),
        ).distinct().collect()
    }
    assert types == {(2, "insert"), (2, "update"), (3, "delete")}
    # restart with the SAME checkpoint after one more commit: only the
    # new version's rows are appended (exactly-once offsets)
    before = got.count()
    u4 = cust.filter(k % 5 == 2).withColumn("c_acctbal", F.lit(7.0))
    t.commit_delta(u4, ["c_custkey"], batch_id="d3")  # v4
    _drain(spark, root, out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.count() == before + u4.count()
    assert (
        got2.filter(F.col("_commit_version") == 4).count() == u4.count()
    )
    # idempotent re-drain with nothing new: zero additional rows
    _drain(spark, root, out, ckpt)
    assert spark.read.parquet(out).count() == before + u4.count()


def test_stream_reads_through_reorg_but_content_rewrite_fails(
    spark, tmp_path, cust
):
    """Maintenance commits (compact / OPTIMIZE) are reorg-tagged and a
    live stream reads straight THROUGH them — scheduled compaction no
    longer kills consumers (r14).  A CONTENT rewrite (CoW merge /
    overwrite / restore) still fails the stream loudly."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    k = F.col("c_custkey")
    root = str(tmp_path / "tbl2")
    out, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")
    t = ManifestTable(root)
    t.commit_overwrite(cust.filter(k % 2 == 0), batch_id="seed")  # v1
    t.commit_delta(cust.filter(k % 2 == 1), ["c_custkey"],
                   batch_id="d1")  # v2
    _drain(spark, root, out, ckpt)
    before = spark.read.parquet(out).count()
    t.compact(spark, batch_id="c1")  # v3: reorg
    t.commit_delta(cust.limit(5), ["c_custkey"], batch_id="d2")  # v4
    t.optimize(spark, target_rows=10_000, batch_id="o1")  # v5: reorg
    _drain(spark, root, out, ckpt)  # reads THROUGH v3 and v5
    got = spark.read.parquet(out)
    assert got.count() == before + 5
    assert got.filter(F.col("_commit_version") == 4).count() == 5
    # a genuine content rewrite still fails the stream
    t.commit_merge(spark, cust.limit(3), ["c_custkey"],
                   batch_id="m1")  # v6: CoW content rewrite
    t.commit_delta(cust.limit(2), ["c_custkey"], batch_id="d3")  # v7
    with pytest.raises(StreamingQueryException, match="rewrote"):
        _drain(spark, root, out, ckpt)


def test_schema_derivation_and_explicit_override(spark, tmp_path, cust):
    root = str(tmp_path / "tbl3")
    t = ManifestTable(root)
    t.commit_overwrite(cust.limit(50), batch_id="seed")
    register(spark)
    df = (
        spark.readStream.format("manifest_changes")
        .option("path", root)
        .load()
    )
    assert df.schema.simpleString() == (
        "struct<c_custkey:bigint,c_acctbal:double,"
        "_commit_version:bigint,_change_type:string>"
    )
    df2 = (
        spark.readStream.format("manifest_changes")
        .option("path", root)
        .option(
            "schema",
            "c_custkey bigint, _commit_version bigint, _change_type string",
        )
        .load()
    )
    assert df2.columns == ["c_custkey", "_commit_version", "_change_type"]


def test_explicit_schema_with_misplaced_meta_cols_rejected(
    spark, tmp_path, cust
):
    """Rows are emitted positionally as (data..., version, type): a
    schema that doesn't keep the meta columns last would silently
    shear columns — rejected up front."""
    root = str(tmp_path / "order")
    t = ManifestTable(root)
    t.commit_overwrite(cust.limit(20), batch_id="seed")
    t.commit_delta(cust.limit(5), ["c_custkey"], batch_id="d1")
    register(spark)
    df = (
        spark.readStream.format("manifest_changes")
        .option("path", root)
        .option(
            "schema",
            "_commit_version bigint, c_custkey bigint, _change_type string",
        )
        .load()
    )
    q = (
        df.writeStream.format("parquet")
        .option("path", str(tmp_path / "o"))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="must be"):
        q.awaitTermination(120)


def test_stream_reads_through_schema_evolution(spark, tmp_path, cust):
    """evolve_schema is a metadata-only commit: the stream skips it,
    and a consumer (re)started after it derives the EVOLVED superset
    schema — pre-evolution delta files null-fill the new column."""
    k = F.col("c_custkey")
    root = str(tmp_path / "tblevo")
    out, ckpt = str(tmp_path / "oevo"), str(tmp_path / "cevo")
    t = ManifestTable(root)
    t.commit_overwrite(cust.filter(k % 2 == 0), batch_id="seed")  # v1
    t.commit_delta(cust.limit(10), ["c_custkey"], batch_id="d1")  # v2
    _drain(spark, root, out, ckpt)
    assert spark.read.parquet(out).count() == 10
    t.evolve_schema("tier string", batch_id="e1")  # v3: metadata-only
    d2 = cust.limit(4).withColumn("tier", F.lit("gold"))
    t.commit_delta(d2, ["c_custkey"], batch_id="d2")  # v4
    # restart against the same checkpoint: the fresh reader derives
    # the evolved schema and resumes at the committed offset (v2 done)
    register(spark)
    df = (
        spark.readStream.format("manifest_changes")
        .option("path", root).option("since_version", 1).load()
    )
    assert df.columns == [
        "c_custkey", "c_acctbal", "tier",
        "_commit_version", "_change_type",
    ]
    _drain(spark, root, out, ckpt)
    got = spark.read.option("mergeSchema", "true").parquet(out)
    assert got.count() == 14  # 10 (v2, already delivered) + 4 (v4)
    assert got.filter(
        (F.col("_commit_version") == 4) & (F.col("tier") == "gold")
    ).count() == 4
    assert got.filter(
        (F.col("_commit_version") == 2) & F.col("tier").isNotNull()
    ).count() == 0


def test_rate_limit_caps_each_micro_batch(spark, tmp_path, cust):
    """max_files_per_batch (the Delta maxFilesPerTrigger shape):
    drive the reader's offset protocol directly — a 6-commit backlog
    of 1-file deltas under a 2-file cap drains as 3 bounded batches,
    version boundaries respected, no offset regression, and a single
    oversized commit still flows (progress guarantee)."""
    from pyspark.sql.types import _parse_datatype_string

    from pypeline_spark.sources.manifest_stream import (
        ManifestChangesDataSource,
    )

    k = F.col("c_custkey")
    root = str(tmp_path / "tbl")
    t = ManifestTable(root)
    t.commit_overwrite(cust.filter(k % 3 != 0), batch_id="seed")  # v1
    for i in range(6):
        t.commit_delta(
            cust.filter(k % 7 == i).coalesce(1).withColumn(
                "c_acctbal", F.lit(float(i))
            ),
            ["c_custkey"], batch_id=f"d{i}",
        )  # v2..v7, one file each
    opts = {
        "path": root,
        "since_version": "1",
        "max_files_per_batch": "2",
    }
    ds = ManifestChangesDataSource(opts)
    reader = ds.streamReader(_parse_datatype_string(ds.schema()))
    start = reader.initialOffset()
    assert start == {"version": 1}
    seen = []
    while True:
        end = reader.latestOffset()
        if end == start:
            break
        parts = reader.partitions(start, end)
        seen.append((start["version"], end["version"], len(parts)))
        reader.commit(end)
        start = end
    # 6 one-file versions under a 2-file cap = 3 batches of 2
    assert seen == [(1, 3, 2), (3, 5, 2), (5, 7, 2)]
    # a single commit bigger than the cap still flows whole
    t.commit_delta(
        cust.limit(40).repartition(4), ["c_custkey"], batch_id="big"
    )  # v8: 4 files > cap
    end = reader.latestOffset()
    assert end == {"version": 8}
    assert len(reader.partitions(start, end)) == 4
    reader.commit(end)
    # dv DML commits count their CDC files against the cap, and reorg
    # commits count zero (read through)
    t.compact(spark, batch_id="fold")  # v9: reorg, 0 feed files
    t.delete_where(spark, "c_custkey < 5", batch_id="dv", mode="dv")  # v10
    t.commit_delta(
        cust.limit(3).coalesce(1), ["c_custkey"], batch_id="tail"
    )  # v11: 1 file
    n_cdc = len(t._manifest_at(10).get("cdc_files", []))
    end = reader.latestOffset()
    assert end["version"] >= 10  # monotone, never regressing
    parts = reader.partitions({"version": 8}, end)
    if end["version"] == 11:
        # everything fit: the walk admitted cdc + tail under the cap
        assert n_cdc + 1 <= 2
        assert len(parts) == n_cdc + 1
    else:
        # the cap stopped at the dv commit's version boundary
        assert end["version"] == 10
        assert len(parts) == n_cdc


def test_rate_limited_stream_end_to_end(spark, tmp_path, cust):
    """The capped source still drains correctly through a real
    streaming query (exactly-once rows, just in more batches)."""
    k = F.col("c_custkey")
    root = str(tmp_path / "tbl2")
    out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    t = ManifestTable(root)
    t.commit_overwrite(cust.filter(k % 3 != 0), batch_id="seed")  # v1
    expected = 0
    for i in range(4):
        n = 5 + i
        t.commit_delta(
            cust.limit(n).coalesce(1).withColumn(
                "c_acctbal", F.lit(float(i))
            ),
            ["c_custkey"], batch_id=f"d{i}",
        )
        expected += n
    register(spark)
    # one availableNow pass per cap window until drained — each run's
    # target offset is itself cap-bounded, so loop to the tip
    for _ in range(8):
        q = (
            spark.readStream.format("manifest_changes")
            .option("path", root)
            .option("since_version", 1)
            .option("max_files_per_batch", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        if got.count() >= expected:
            break
    got = spark.read.parquet(out)
    assert got.count() == expected  # every row exactly once
    assert got.select("_commit_version").distinct().count() == 4


class TestRateLimitProtocolProperty:
    """Model check for max_files_per_batch: over random commit
    histories (multi-file deltas, dv DML, metadata, reorg) and random
    caps, the offset walk must partition the backlog into contiguous
    batches whose planned file count respects the cap unless a single
    commit alone exceeds it — and the union of batches must plan every
    feed file exactly once."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(
        ops=st.lists(
            st.tuples(st.integers(0, 3), st.integers(1, 3)),
            min_size=2, max_size=7,
        ),
        cap=st.integers(1, 4),
    )
    def test_protocol_respects_cap_and_partitions(
        self, spark, tmp_path, ops, cap
    ):
        import uuid as _uuid

        from pyspark.sql.types import _parse_datatype_string

        from pypeline_spark.sources.manifest_stream import (
            ManifestChangesDataSource,
        )

        root = str(tmp_path / f"rl-{_uuid.uuid4().hex}")
        t = ManifestTable(root)
        base = spark.range(0, 60).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0).alias("v"),
        )
        t.commit_overwrite(base.repartition(2), batch_id="seed",
                           stats_cols=["k"])
        feed_files: dict[int, int] = {}  # version -> planned files
        for i, (op, n) in enumerate(ops):
            if op == 0:  # delta with n files
                t.commit_delta(
                    base.limit(4 + i).repartition(n), ["k"],
                    batch_id=f"d{i}",
                )
                v = t.version()
                feed_files[v] = len(t._manifest_at(v)["deltas"][-1])
            elif op == 1:  # dv DML (needs a compacted table)
                t.compact(spark, batch_id=f"cc{i}", stats_cols=["k"])
                t.delete_where(
                    spark, f"k % 17 = {i % 17}", batch_id=f"dv{i}",
                    mode="dv",
                )
                v = t.version()
                m = t._manifest_at(v)
                if m.get("dml"):  # matched something
                    feed_files[v] = len(m.get("cdc_files", []))
            elif op == 2:
                t.evolve_schema(f"x{i} string", batch_id=f"e{i}")
            else:
                t.optimize(spark, target_rows=50, batch_id=f"o{i}",
                           stats_cols=["k"])
        tip = t.version()
        opts = {
            "path": root, "since_version": "1",
            "max_files_per_batch": str(cap),
        }
        ds = ManifestChangesDataSource(opts)
        reader = ds.streamReader(_parse_datatype_string(ds.schema()))
        start = reader.initialOffset()
        batches = []
        guard = 0
        while True:
            end = reader.latestOffset()
            if end == start:
                break
            parts = reader.partitions(start, end)
            batches.append((start["version"], end["version"], len(parts)))
            reader.commit(end)
            start = end
            guard += 1
            assert guard <= tip, "protocol failed to converge"
        # contiguous, monotone partition of (1, tip]
        assert all(lo < hi for lo, hi, _n in batches)
        assert [b[0] for b in batches][1:] == [b[1] for b in batches][:-1]
        if batches:
            assert batches[0][0] == 1 and batches[-1][1] == tip
        # every feed file planned exactly once
        assert sum(n for _l, _h, n in batches) == sum(feed_files.values())
        # the cap: a batch may only exceed it when a SINGLE commit does
        for lo, hi, _n in batches:
            planned = sum(
                feed_files.get(v, 0) for v in range(lo + 1, hi + 1)
            )
            contributing = [
                v for v in range(lo + 1, hi + 1) if feed_files.get(v, 0)
            ]
            assert planned <= cap or len(contributing) == 1, (
                f"batch ({lo},{hi}] planned {planned} files over cap "
                f"{cap} across {len(contributing)} commits"
            )
