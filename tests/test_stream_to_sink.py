"""End-to-end: a micro-batched stream committed per-batch into the
keyed upsert sink — the reference's actual deployment shape
(ref: /root/reference/pypeline/Pype.py:147-148 — fetch a batch, merge,
commit, repeat).

What the reference gets from per-batch DB transactions, this engine
gets from foreachBatch + an IDEMPOTENT keyed merge: Structured
Streaming replays a batch after a failure with the same batch_id and
same rows, and upsert(last-writer-wins by key) makes the replay a
no-op — the exactly-once story these tests pin:

1. streaming the updates in N micro-batches lands the same final
   table as one batch merge (order/batching independence);
2. re-applying any batch (simulated checkpoint-replay) changes
   nothing (idempotence).
"""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.session import load_table
from pypeline_spark.sinks.keyed import ParquetCatalog, upsert


@pytest.fixture()
def catalog(tmp_path):
    return ParquetCatalog(str(tmp_path / "target_db"))


def _target_and_updates(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    target = c.filter(F.col("c_custkey") <= 1000)
    updates = (
        c.filter(F.col("c_custkey").between(800, 1200))
        .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
        .withColumn("c_name", F.upper("c_name"))
    )
    return target, updates


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_of_batches_matches_single_merge(spark, sf_dir, catalog):
    """Rate-source micro-batches foreachBatch'd through upsert ==
    one-shot upsert of the whole update set."""
    target, updates = _target_and_updates(spark, sf_dir)
    catalog.put("customer", target)

    # one-shot reference result
    expected = _canon(upsert(target, updates, key_columns=("c_custkey",)))

    # split updates into 4 deterministic micro-batches and replay them
    # through the same merge path a foreachBatch sink would run
    batches = [
        updates.filter(F.pmod(F.col("c_custkey"), 4) == i) for i in range(4)
    ]

    def commit_batch(batch_df, _batch_id):
        current = catalog.get("customer")
        merged = upsert(current, batch_df, key_columns=("c_custkey",))
        catalog.put("customer", merged)

    stream_dir = catalog.root + "/__stream_in__"
    for i, b in enumerate(batches):
        b.write.mode("overwrite").parquet(f"{stream_dir}/b{i}")

    q = (
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/b*")
        .writeStream.foreachBatch(commit_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", catalog.root + "/__ckpt__"
        )
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in time"

    assert _canon(catalog.get("customer")) == expected


def test_batch_replay_is_a_noop(spark, sf_dir, catalog):
    """Re-committing an already-applied batch (what a post-crash
    checkpoint replay does) must not change the table."""
    target, updates = _target_and_updates(spark, sf_dir)
    catalog.put("customer", target)

    batch = updates.filter(F.col("c_custkey") <= 1100)
    for _ in range(3):  # apply, then replay twice
        current = catalog.get("customer")
        catalog.put("customer", upsert(current, batch, key_columns=("c_custkey",)))

    once = upsert(target, batch, key_columns=("c_custkey",))
    assert _canon(catalog.get("customer")) == _canon(once)


def test_manifest_stream_upsert_end_to_end(spark, sf_dir, tmp_path):
    """Stream -> foreachBatch -> ManifestTable: final state equals a
    one-shot merge, every batch commit bumped the version atomically,
    and batch ids are in the ledger."""
    from pypeline_spark.sinks.manifest import ManifestTable
    from pypeline_spark.streaming.ingest import stream_upsert_manifest

    target, updates = _target_and_updates(spark, sf_dir)
    table = ManifestTable(str(tmp_path / "mtbl"))
    table.commit_overwrite(target, batch_id="seed")

    stream_dir = str(tmp_path / "in")
    for i in range(3):
        updates.filter(F.pmod(F.col("c_custkey"), 3) == i).write.mode(
            "overwrite"
        ).parquet(f"{stream_dir}/b{i}")

    q = stream_upsert_manifest(
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/b*"),
        table,
        key_columns=("c_custkey",),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300), "stream did not finish in time"

    expected = _canon(upsert(target, updates, key_columns=("c_custkey",)))
    assert _canon(table.read(spark)) == expected
    assert table.version() == 1 + 3  # seed + one atomic commit per batch
    assert {b for b in table.applied_batch_ids() if b.startswith("stream-")} == {
        "stream-0",
        "stream-1",
        "stream-2",
    }


def test_stream_restart_from_checkpoint_processes_only_new_data(spark, sf_dir, tmp_path):
    """Stop a checkpointed stream, land MORE source files, restart a
    NEW query on the SAME checkpoint: the restart resumes batch ids
    where the first run stopped, applies only the new files (nothing
    reprocessed, nothing skipped), and the final table equals a
    one-shot merge of everything — the streaming analogue of the
    batch-pipeline restartability contract (ref: Pype.py:148)."""
    from pypeline_spark.sinks.manifest import ManifestTable
    from pypeline_spark.streaming.ingest import stream_upsert_manifest

    target, updates = _target_and_updates(spark, sf_dir)
    table = ManifestTable(str(tmp_path / "mtbl"))
    table.commit_overwrite(target, batch_id="seed")
    stream_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return stream_upsert_manifest(
            spark.readStream.schema(updates.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_dir}/b*"),
            table,
            key_columns=("c_custkey",),
            checkpoint_dir=ckpt,
        )

    parts = [updates.filter(F.pmod(F.col("c_custkey"), 4) == i) for i in range(4)]
    # run 1: first two files, then the query terminates (availableNow)
    for i in (0, 1):
        parts[i].write.mode("overwrite").parquet(f"{stream_dir}/b{i}")
    assert start().awaitTermination(300)
    v_after_run1 = table.version()
    assert v_after_run1 == 1 + 2  # seed + one commit per file

    # land new data while "down", then restart from the same checkpoint
    for i in (2, 3):
        parts[i].write.mode("overwrite").parquet(f"{stream_dir}/b{i}")
    assert start().awaitTermination(300)

    # exactly two NEW commits — the first two files were not replayed
    assert table.version() == v_after_run1 + 2
    expected = _canon(upsert(target, updates, key_columns=("c_custkey",)))
    assert _canon(table.read(spark)) == expected
    # batch ids continued from the checkpoint instead of restarting at 0
    applied = sorted(
        int(b.split("-")[1])
        for b in table.applied_batch_ids()
        if b.startswith("stream-")
    )
    assert applied == [0, 1, 2, 3]


def test_cdc_stream_matches_one_shot_apply(spark, sf_dir, catalog):
    """A sequenced upsert/delete change log streamed in seq-ordered
    micro-batches (within-batch arrival order arbitrary — Debezium's
    per-key ordering contract) through cdc_apply == one-shot apply of
    the whole log; replaying the final batch is a no-op."""
    from pypeline_spark.sinks.history import cdc_apply

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    base = c.filter(F.col("c_custkey") <= 1000).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    ops = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 5 == 0, "delete").otherwise("upsert").alias("op"),
        F.round(F.col("o_totalprice"), 2).alias("acctbal"),
    )
    expected = _canon(cdc_apply(base, ops, ["custkey"]))

    catalog.put("t", base)
    # seq-range batches (ordered across batches), shuffled within
    bounds = ops.approxQuantile("seq", [0.34, 0.67], 0.001) + [float("inf")]
    lo = float("-inf")
    applied = []
    for hi in bounds:
        batch = ops.filter((F.col("seq") > lo) & (F.col("seq") <= hi)).orderBy(
            F.md5(F.col("seq").cast("string"))  # arbitrary within-batch order
        )
        applied.append(batch)
        catalog.put("t", cdc_apply(catalog.get("t"), batch, ["custkey"]))
        lo = hi
    assert _canon(catalog.get("t")) == expected

    # checkpoint-replay of the final batch: idempotent
    catalog.put("t", cdc_apply(catalog.get("t"), applied[-1], ["custkey"]))
    assert _canon(catalog.get("t")) == expected


def test_stream_upsert_into_live_database(spark, sf_dir, tmp_path):
    """stream_upsert with a JdbcMergeCatalog: each micro-batch lands as
    one server-side MERGE into Derby — the streaming form of the
    reference's per-batch commit into a live target (Pype.py:148) —
    and the final table equals a one-shot merge."""
    from pypeline_spark.sinks.jdbc_merge import JdbcMergeCatalog
    from pypeline_spark.streaming.ingest import stream_upsert

    target, updates = _target_and_updates(spark, sf_dir)
    cat = JdbcMergeCatalog(
        spark,
        f"jdbc:derby:{tmp_path}/streamdb;create=true",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    cat.put("customer", target)
    stream_dir = str(tmp_path / "in")
    for i in range(3):
        updates.filter(F.pmod(F.col("c_custkey"), 3) == i).write.mode(
            "overwrite"
        ).parquet(f"{stream_dir}/b{i}")
    q = stream_upsert(
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/b*"),
        cat,
        "customer",
        key_columns=("c_custkey",),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    expected = _canon(upsert(target, updates, key_columns=("c_custkey",)))
    assert _canon(cat.get("customer")) == expected


def test_manifest_stream_delta_merge_on_read_end_to_end(spark, sf_dir, tmp_path):
    """Stream -> foreachBatch -> merge-on-read delta commits: base
    files are never rewritten while the stream runs, the resolved view
    equals a one-shot merge, and a scheduled compaction folds the
    deltas without changing content — the high-frequency-sink shape
    copy-on-write cannot afford."""
    from pypeline_spark.sinks.manifest import ManifestTable
    from pypeline_spark.streaming.ingest import stream_delta_manifest

    target, updates = _target_and_updates(spark, sf_dir)
    table = ManifestTable(str(tmp_path / "mtbl"))
    table.commit_overwrite(target, batch_id="seed")
    base_files = list(table._read_manifest()["files"])

    stream_dir = str(tmp_path / "in")
    for i in range(3):
        updates.filter(F.pmod(F.col("c_custkey"), 3) == i).write.mode(
            "overwrite"
        ).parquet(f"{stream_dir}/b{i}")

    q = stream_delta_manifest(
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/b*"),
        table,
        key_columns=("c_custkey",),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300), "stream did not finish in time"

    m = table._read_manifest()
    assert m["files"] == base_files  # zero base rewrites during ingestion
    assert len(m["deltas"]) == 3  # one O(batch) append per micro-batch
    expected = _canon(upsert(target, updates, key_columns=("c_custkey",)))
    assert _canon(table.read_resolved(spark)) == expected

    # maintenance-schedule compaction: content identical, deltas folded
    table.compact(spark)
    assert table._read_manifest()["deltas"] == []
    assert _canon(table.read(spark)) == expected


def test_stream_autocompact_bounds_filesets_every_version(spark, sf_dir, tmp_path):
    """The auto-compaction policy (``max_delta_filesets``): streaming 5
    micro-batches with a threshold of 2 must fire the maintenance
    commit MID-STREAM (twice, after batches 1 and 3), keep the
    outstanding-fileset count <= 2 across EVERY retained version (not
    just the final one — an unattended stream's resolution cost is the
    max, not the end state), preserve ledger/key_columns/stats through
    the maintenance commits, and skip a simulated checkpoint replay of
    both the delta and the maintenance commit via their ledger ids."""
    import json
    import os

    from pypeline_spark.sinks.manifest import ManifestTable
    from pypeline_spark.streaming.ingest import stream_delta_manifest

    target, updates = _target_and_updates(spark, sf_dir)
    table = ManifestTable(str(tmp_path / "mtbl"))
    table.commit_overwrite(target, batch_id="seed", stats_cols=("c_custkey",))

    stream_dir = str(tmp_path / "in")
    for i in range(5):
        updates.filter(F.pmod(F.col("c_custkey"), 5) == i).write.mode(
            "overwrite"
        ).parquet(f"{stream_dir}/b{i}")

    q = stream_delta_manifest(
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/b*"),
        table,
        key_columns=("c_custkey",),
        checkpoint_dir=str(tmp_path / "ckpt"),
        stats_cols=("c_custkey",),
        max_delta_filesets=2,
    )
    assert q.awaitTermination(300), "stream did not finish in time"

    # policy fired mid-stream: after batches 1 and 3 the outstanding
    # count hit the threshold, so exactly those maintenance ids exist
    applied = set(table.applied_batch_ids())
    assert {"stream-maint-1", "stream-maint-3"} <= applied
    assert "stream-maint-0" not in applied  # below threshold: no fire
    assert "stream-maint-4" not in applied

    # the bound holds across EVERY retained version, not just the tip
    # (materialized through the commit log — records store diffs)
    per_version = {
        v: len(mf.get("deltas", []))
        for v, _rec, mf in table._scan_log()
        if mf is not None
    }
    assert per_version, "no retained manifest versions found"
    assert max(per_version.values()) <= 2, per_version
    # 5 delta commits + 2 maintenance commits on top of the seed
    assert table.version() == max(per_version)
    assert len(per_version) == 1 + 5 + 2

    # content unharmed; key_columns and per-file stats survived
    expected = _canon(upsert(target, updates, key_columns=("c_custkey",)))
    assert _canon(table.read_resolved(spark)) == expected
    m = table._read_manifest()
    assert m["key_columns"] == ["c_custkey"]
    assert all(
        "c_custkey" in m["stats"].get(f, {}) for f in m["files"]
    ), "maintenance rewrite dropped the recorded stats"

    # simulated checkpoint replay of the trigger that fired the policy:
    # both the delta commit and the maintenance commit are ledger-skipped
    v = table.version()
    batch3 = spark.read.parquet(f"{stream_dir}/b3")
    assert table.commit_delta(batch3, ["c_custkey"], batch_id="stream-3") == v
    assert table.compact(spark, batch_id="stream-maint-3") == v
    assert table.version() == v
    assert _canon(table.read_resolved(spark)) == expected


def test_stream_autocompact_optimize_variant_and_validation(spark, sf_dir, tmp_path):
    """``compact_target_rows`` upgrades the policy's maintenance commit
    to a bin-packing OPTIMIZE (deltas folded AND the table re-packed);
    a threshold below 1 is rejected at entry — 0 would turn every
    trigger into a full rewrite."""
    import pytest as _pytest

    from pypeline_spark.sinks.manifest import ManifestTable
    from pypeline_spark.streaming.ingest import stream_delta_manifest

    target, updates = _target_and_updates(spark, sf_dir)
    table = ManifestTable(str(tmp_path / "mtbl"))
    table.commit_overwrite(target.repartition(4), batch_id="seed")

    with _pytest.raises(ValueError, match="max_delta_filesets"):
        stream_delta_manifest(
            updates, table, key_columns=("c_custkey",), max_delta_filesets=0
        )

    stream_dir = str(tmp_path / "in")
    for i in range(2):
        updates.filter(F.pmod(F.col("c_custkey"), 2) == i).write.mode(
            "overwrite"
        ).parquet(f"{stream_dir}/b{i}")
    expected = _canon(upsert(target, updates, key_columns=("c_custkey",)))
    target_rows = max(1, len(expected) // 2)
    q = stream_delta_manifest(
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/b*"),
        table,
        key_columns=("c_custkey",),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_delta_filesets=2,
        compact_target_rows=target_rows,
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    m = table._read_manifest()
    assert m["deltas"] == []  # policy fired on the second trigger
    assert len(m["files"]) == -(-len(expected) // target_rows)  # bin-packed
    assert _canon(table.read(spark)) == expected


def test_stream_autocompact_clustered_maintenance(spark, sf_dir, tmp_path):
    """``cluster_by`` on the auto-compaction policy: every maintenance
    commit is a CLUSTERED rewrite, so the streamed table keeps narrow
    per-file envelopes on the cluster key instead of losing them to a
    round-robin repack each time the policy fires; content stays
    exactly-once.  cluster_by without a bin-packing target is
    rejected."""
    import pytest as _pytest

    from pypeline_spark.sinks.manifest import ManifestTable
    from pypeline_spark.streaming.ingest import stream_delta_manifest

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    table = ManifestTable(str(tmp_path / "mtbl"))
    seed = o.filter(F.col("k") % 2 == 0)
    table.commit_overwrite(seed.repartition(8), batch_id="seed",
                           stats_cols=("ck", "cents"))

    with _pytest.raises(ValueError, match="compact_target_rows"):
        stream_delta_manifest(
            o, table, key_columns=("k",),
            max_delta_filesets=2, cluster_by=("ck", "cents"),
        )

    stream_dir = str(tmp_path / "in")
    upd = o.filter(F.col("k") % 2 == 1)
    for i in range(2):
        upd.filter(F.pmod(F.col("k"), 4) == 2 * i + 1).write.mode(
            "overwrite"
        ).parquet(f"{stream_dir}/b{i}")
    n_total = o.count()
    target = max(1, n_total // 10)
    q = stream_delta_manifest(
        spark.readStream.schema(upd.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/b*"),
        table,
        key_columns=("k",),
        checkpoint_dir=str(tmp_path / "ckpt"),
        stats_cols=("ck", "cents"),
        max_delta_filesets=2,
        compact_target_rows=target,
        cluster_by=("ck", "cents"),
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    m = table._read_manifest()
    assert m["deltas"] == []  # policy fired on the second trigger
    # the maintenance rewrite was CLUSTERED: files carry the tag and
    # both single-column range probes skip
    assert all(
        m["filemeta"][f].get("clustered") == ["ck", "cents"]
        for f in m["files"]
    )
    total = len(m["files"])
    for col, rng in (("ck", (10, 60)), ("cents", (1_000_000, 2_000_000))):
        files, tot = table.prune_plan_multi({col: rng})
        assert tot == total and len(files) < total, col
    # content exactly-once: resolved == one-shot upsert
    expected = _canon(upsert(seed, upd, key_columns=("k",)))
    assert _canon(table.read(spark)) == expected


def test_streaming_ingest_then_optimize_maintenance(spark, sf_dir, tmp_path):
    """The full small-file lifecycle: streaming ingestion fragments the
    table (one delta fileset per micro-batch — the layout debt every
    high-frequency sink accrues), a scheduled ``optimize`` folds deltas
    AND bin-packs the whole table to ceil(rows/target) files, and
    ingestion resumes afterwards with the batch-id ledger intact."""
    from pypeline_spark.sinks.manifest import ManifestTable
    from pypeline_spark.streaming.ingest import stream_delta_manifest

    target, updates = _target_and_updates(spark, sf_dir)
    table = ManifestTable(str(tmp_path / "mtbl"))
    table.commit_overwrite(target.repartition(5), batch_id="seed")

    stream_dir = str(tmp_path / "in")
    for i in range(3):
        updates.filter(F.pmod(F.col("c_custkey"), 3) == i).write.mode(
            "overwrite"
        ).parquet(f"{stream_dir}/b{i}")
    q = stream_delta_manifest(
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/b*"),
        table,
        key_columns=("c_custkey",),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    assert len(table._read_manifest()["deltas"]) == 3

    expected = _canon(upsert(target, updates, key_columns=("c_custkey",)))
    n_rows = len(expected)
    target_rows = max(1, n_rows // 2)
    table.optimize(spark, target_rows=target_rows, batch_id="maint1")
    m = table._read_manifest()
    assert m["deltas"] == []
    assert len(m["files"]) == -(-n_rows // target_rows)  # bin-packed
    assert _canon(table.read(spark)) == expected

    # ingestion resumes: key_columns survived, ledger still exact-once
    # (keys <= 5 exist at every fixture SF; the `updates` range does not)
    late = target.filter(F.col("c_custkey") <= 5).withColumn(
        "c_acctbal", F.lit(-1.0)
    )
    n_late = late.count()
    assert n_late > 0
    v = table.commit_delta(late, ["c_custkey"], batch_id="late1")
    assert table.commit_delta(late, ["c_custkey"], batch_id="late1") == v
    resolved = {r.c_custkey: r.c_acctbal for r in table.read_resolved(spark).collect()}
    assert sum(1 for b in resolved.values() if b == -1.0) == n_late
