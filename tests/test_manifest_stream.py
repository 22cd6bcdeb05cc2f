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


def _feed_bytes(t, v):
    """Planned (files, bytes) for version v of the feed — the same
    filemeta the admission walk consults."""
    m = t._manifest_at(v)
    prev = t._manifest_at(v - 1)
    kind = ManifestTable._commit_kind(prev, m)
    if kind == "delta":
        names = m["deltas"][-1]
    elif kind == "dml":
        names = m.get("cdc_files", [])
    else:
        names = []
    fm = m.get("filemeta", {})
    return len(names), sum(
        int((fm.get(f) or {}).get("bytes") or 0) for f in names
    )


def test_bytes_cap_protocol(spark, tmp_path, cust):
    """max_bytes_per_batch (the Delta maxBytesPerTrigger twin):
    version-boundary rounding, >=1-version progress on an oversized
    commit, offsets never regress, every feed file planned exactly
    once — driven straight through the offset protocol with expected
    boundaries computed from the SAME filemeta the walk reads."""
    from pyspark.sql.types import _parse_datatype_string

    from pypeline_spark.sources.manifest_stream import (
        ManifestChangesDataSource,
    )

    k = F.col("c_custkey")
    root = str(tmp_path / "btbl")
    t = ManifestTable(root)
    t.commit_overwrite(cust.filter(k % 3 != 0), batch_id="seed")  # v1
    for i in range(6):
        t.commit_delta(
            cust.limit(6 + i).coalesce(1).withColumn(
                "c_acctbal", F.lit(float(i))
            ),
            ["c_custkey"], batch_id=f"d{i}",
        )  # v2..v7, one file each
    tip = t.version()
    per_v = {v: _feed_bytes(t, v) for v in range(2, tip + 1)}
    # a cap of two average files: admits ~2 versions per batch
    two_files = sorted(b for _n, b in per_v.values())[0] * 2 + 1
    opts = {
        "path": root,
        "since_version": "1",
        "max_bytes_per_batch": str(two_files),
    }
    ds = ManifestChangesDataSource(opts)
    reader = ds.streamReader(_parse_datatype_string(ds.schema()))
    start = reader.initialOffset()
    batches = []
    while True:
        end = reader.latestOffset()
        if end == start:
            break
        assert end["version"] > start["version"]  # never regress
        parts = reader.partitions(start, end)
        batches.append((start["version"], end["version"], len(parts)))
        reader.commit(end)
        start = end
    # contiguous cover of (1, tip], every file exactly once
    assert batches[0][0] == 1 and batches[-1][1] == tip
    assert [b[0] for b in batches][1:] == [b[1] for b in batches][:-1]
    assert sum(n for _l, _h, n in batches) == sum(
        n for n, _b in per_v.values()
    )
    # the byte cap holds unless a single commit alone exceeds it
    for lo, hi, _n in batches:
        planned = sum(per_v.get(v, (0, 0))[1] for v in range(lo + 1, hi + 1))
        contributing = [
            v for v in range(lo + 1, hi + 1) if per_v.get(v, (0, 0))[0]
        ]
        assert planned <= two_files or len(contributing) == 1
    # >= 2 batches: the cap actually bit
    assert len(batches) >= 2
    # progress guarantee: a 1-byte cap still admits one version/batch
    ds2 = ManifestChangesDataSource(
        {"path": root, "since_version": "1", "max_bytes_per_batch": "1"}
    )
    r2 = ds2.streamReader(_parse_datatype_string(ds2.schema()))
    start = r2.initialOffset()
    steps = 0
    while True:
        end = r2.latestOffset()
        if end == start:
            break
        assert end["version"] == start["version"] + 1  # one at a time
        r2.partitions(start, end)
        r2.commit(end)
        start = end
        steps += 1
    assert steps == tip - 1


def test_bytes_cap_end_to_end(spark, tmp_path, cust):
    """The byte-capped source drains a real streaming query
    exactly-once, just in more availableNow passes."""
    k = F.col("c_custkey")
    root = str(tmp_path / "btbl2")
    out, ckpt = str(tmp_path / "bout"), str(tmp_path / "bckpt")
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
    for _ in range(8):
        q = (
            spark.readStream.format("manifest_changes")
            .option("path", root)
            .option("since_version", 1)
            .option("max_bytes_per_batch", 1)  # one commit per pass
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


def test_cursor_sidecar_caps_first_batch_after_restart(spark, tmp_path, cust):
    """r16 directive #6: with cursor_sidecar set, the FIRST
    latestOffset() of a fresh reader (a process restart: in-memory
    cursor gone, initialOffset not called) is rate-limited from the
    persisted cursor — and the continued drain loses/duplicates
    nothing.  Without the sidecar the first post-restart batch is the
    old documented uncapped trade."""
    from pyspark.sql.types import _parse_datatype_string

    from pypeline_spark.sources.manifest_stream import (
        ManifestChangesDataSource,
    )

    k = F.col("c_custkey")
    root = str(tmp_path / "sctbl")
    sidecar = str(tmp_path / "ckdir" / "cursor.json")
    t = ManifestTable(root)
    t.commit_overwrite(cust.filter(k % 3 != 0), batch_id="seed")  # v1
    for i in range(6):
        t.commit_delta(
            cust.limit(4).coalesce(1).withColumn(
                "c_acctbal", F.lit(float(i))
            ),
            ["c_custkey"], batch_id=f"d{i}",
        )  # v2..v7, one file each
    opts = {
        "path": root,
        "since_version": "1",
        "max_files_per_batch": "2",
        "cursor_sidecar": sidecar,
    }
    ds = ManifestChangesDataSource(opts)
    r1 = ds.streamReader(_parse_datatype_string(ds.schema()))
    start = r1.initialOffset()
    end = r1.latestOffset()
    assert end == {"version": 3}  # capped: 2 files
    n1 = len(r1.partitions(start, end))
    r1.commit(end)
    assert os.path.exists(sidecar)
    # --- process restart: fresh reader, NO initialOffset call -------
    ds2 = ManifestChangesDataSource(dict(opts))
    r2 = ds2.streamReader(_parse_datatype_string(ds2.schema()))
    end2 = r2.latestOffset()
    assert end2 == {"version": 5}  # capped from the persisted cursor
    # continued drain from Spark's checkpointed start: no loss, no dup
    total = n1
    start = {"version": 3}
    while True:
        if start == end2:
            end2 = r2.latestOffset()
            if end2 == start:
                break
        total += len(r2.partitions(start, end2))
        r2.commit(end2)
        start = end2
    assert total == 6  # six one-file commits, each planned exactly once
    # control: the SAME restart without a sidecar is uncapped (the
    # documented pre-r16 trade)
    ds3 = ManifestChangesDataSource(
        {k2: v for k2, v in opts.items() if k2 != "cursor_sidecar"}
    )
    r3 = ds3.streamReader(_parse_datatype_string(ds3.schema()))
    assert r3.latestOffset() == {"version": 7}  # straight to the tip


def test_cursor_sidecar_end_to_end_restart(spark, tmp_path, cust):
    """Restarted streaming query (same checkpoint, fresh reader):
    the catch-up batch respects the cap via the sidecar and the final
    output is exactly-once."""
    k = F.col("c_custkey")
    root = str(tmp_path / "sctbl2")
    out, ckpt = str(tmp_path / "scout"), str(tmp_path / "scckpt")
    sidecar = os.path.join(ckpt, "manifest_cursor.json")
    t = ManifestTable(root)
    t.commit_overwrite(cust.filter(k % 3 != 0), batch_id="seed")  # v1
    expected = 0
    for i in range(2):
        t.commit_delta(
            cust.limit(3).coalesce(1), ["c_custkey"], batch_id=f"a{i}"
        )
        expected += 3
    register(spark)

    def run():
        q = (
            spark.readStream.format("manifest_changes")
            .option("path", root)
            .option("since_version", 1)
            .option("max_files_per_batch", 1)
            .option("cursor_sidecar", sidecar)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for _ in range(4):  # drain the first backlog
        run()
        if spark.read.parquet(out).count() >= expected:
            break
    assert spark.read.parquet(out).count() == expected
    # downtime: a new backlog lands while the query is stopped
    for i in range(3):
        t.commit_delta(
            cust.limit(2).coalesce(1), ["c_custkey"], batch_id=f"b{i}"
        )
        expected += 2
    # restart: the first pass must be CAPPED (one file) thanks to the
    # sidecar — without it the whole 3-commit backlog would land in
    # one batch
    run()
    got = spark.read.parquet(out)
    assert got.count() == expected - 4  # exactly one capped batch in
    for _ in range(4):  # drain the rest
        run()
        if spark.read.parquet(out).count() >= expected:
            break
    got = spark.read.parquet(out)
    assert got.count() == expected  # no loss, no dup
    assert got.select("_commit_version").distinct().count() == 5


def test_since_timestamp_option(spark, tmp_path, cust):
    """since_timestamp (the Delta startingTimestamp shape): the stream
    starts after the latest commit at-or-before ts — resolved via the
    monotone commit stamps; exclusive with since_version."""
    from pyspark.sql.types import _parse_datatype_string

    from pypeline_spark.sources.manifest_stream import (
        ManifestChangesDataSource,
    )

    k = F.col("c_custkey")
    root = str(tmp_path / "tstbl")
    t = ManifestTable(root)
    t.commit_overwrite(cust.filter(k % 3 != 0), batch_id="seed")  # v1
    t.commit_delta(
        cust.limit(4).coalesce(1), ["c_custkey"], batch_id="d1"
    )  # v2
    ts_after_v2 = t._manifest_at(2)["committed_at"]
    t.commit_delta(
        cust.limit(6).coalesce(1), ["c_custkey"], batch_id="d2"
    )  # v3
    opts = {"path": root, "since_timestamp": str(ts_after_v2)}
    ds = ManifestChangesDataSource(opts)
    r = ds.streamReader(_parse_datatype_string(ds.schema()))
    start = r.initialOffset()
    assert start == {"version": 2}  # v2's content is the baseline
    end = r.latestOffset()
    parts = r.partitions(start, end)
    assert end == {"version": 3} and len(parts) == 1  # v3 only
    with pytest.raises(Exception, match="not both"):
        ManifestChangesDataSource(
            {**opts, "since_version": "1"}
        ).streamReader(_parse_datatype_string(ds.schema()))
