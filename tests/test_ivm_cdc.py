"""Feed-driven IVM: FeedRollupMaintainer follows a merge-on-read
manifest table through upserts / group moves / deletes, equals a
from-scratch recompute after EVERY sync, stays incremental across
reorg (compact/OPTIMIZE) boundaries, and handles content-rewrite
boundaries (restore/overwrite/CoW merge) via the documented
fallback."""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.operators.ivm import FeedRollupMaintainer
from pypeline_spark.session import load_table
from pypeline_spark.sinks.manifest import ManifestTable


@pytest.fixture()
def cust(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )


def _recompute(table, spark):
    cur = table.read_resolved(spark)
    return sorted(
        tuple(r)
        for r in cur.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
        )
        .collect()
    )


def _rollup(m):
    return sorted(tuple(r) for r in m.rollup.collect())


def test_every_sync_equals_recompute(spark, tmp_path, cust):
    k = F.col("c_custkey")
    t = ManifestTable(str(tmp_path / "t"))
    t.commit_overwrite(cust.filter(k % 3 != 0), batch_id="seed")
    m = FeedRollupMaintainer(t, ["c_custkey"], "c_mktsegment", "c_acctbal")
    m.sync(spark)
    assert _rollup(m) == _recompute(t, spark)
    # upserts with a group move
    u = cust.filter(k % 2 == 0).select(
        "c_custkey",
        F.when(k % 10 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        (F.col("c_acctbal") + 50.0).alias("c_acctbal"),
    )
    t.commit_delta(u, ["c_custkey"], batch_id="d1", cdc=True)
    m.sync(spark)
    assert _rollup(m) == _recompute(t, spark)
    assert m.full_refreshes == 0  # maintained from the feed alone
    # delete-only commit (tombstones carry no group column)
    t.commit_delta(None, ["c_custkey"], batch_id="d2",
                   deletes=cust.filter(k % 4 == 1))
    m.sync(spark)
    assert _rollup(m) == _recompute(t, spark)
    assert m.full_refreshes == 0
    # no-op sync: nothing committed since the cursor
    r = _rollup(m)
    m.sync(spark)
    assert _rollup(m) == r


def test_group_emptied_by_deletes_drops_out(spark, tmp_path, cust):
    k = F.col("c_custkey")
    t = ManifestTable(str(tmp_path / "drop"))
    seg = cust.select("c_mktsegment").first().c_mktsegment
    t.commit_overwrite(cust, batch_id="seed")
    m = FeedRollupMaintainer(t, ["c_custkey"], "c_mktsegment", "c_acctbal")
    m.sync(spark)
    dead = cust.filter(F.col("c_mktsegment") == seg)
    t.commit_delta(None, ["c_custkey"], batch_id="d1", deletes=dead)
    m.sync(spark)
    groups = {r.c_mktsegment for r in m.rollup.collect()}
    assert seg not in groups
    assert _rollup(m) == _recompute(t, spark)


def test_reorg_boundaries_stay_incremental_content_rewrites_fall_back(
    spark, tmp_path, cust
):
    """Compaction is reorg-tagged and the feed reads THROUGH it (r14),
    and a RESTORE synthesizes its own events (r15) — syncs crossing
    either stay pure-feed; only a genuinely underivable content
    rewrite (CoW merge / overwrite) costs a snapshot recompute."""
    k = F.col("c_custkey")
    t = ManifestTable(str(tmp_path / "bound"))
    t.commit_overwrite(cust.filter(k % 2 == 0), batch_id="seed")  # v1
    m = FeedRollupMaintainer(t, ["c_custkey"], "c_mktsegment", "c_acctbal")
    m.sync(spark)
    t.commit_delta(cust.filter(k % 2 == 1), ["c_custkey"], batch_id="d1")
    t.compact(spark, batch_id="c1")  # reorg inside the range
    m.sync(spark)
    assert m.full_refreshes == 0  # read through the compaction
    assert _rollup(m) == _recompute(t, spark)
    t.optimize(spark, target_rows=10_000, batch_id="o1")  # reorg
    m.sync(spark)
    assert m.full_refreshes == 0  # read through OPTIMIZE too
    assert _rollup(m) == _recompute(t, spark)
    t.commit_delta(
        cust.filter(k % 5 == 0).withColumn("c_acctbal", F.lit(1.0)),
        ["c_custkey"], batch_id="d2",
    )
    m.sync(spark)
    assert m.full_refreshes == 0  # pure feed
    t.restore(t.version() - 1, batch_id="undo")  # r15: feed-derivable
    m.sync(spark)
    assert m.full_refreshes == 0  # restore events synthesized, no refresh
    assert _rollup(m) == _recompute(t, spark)
    t.commit_merge(
        spark,
        cust.filter(k % 11 == 0).withColumn("c_acctbal", F.lit(4.0)),
        ["c_custkey"], batch_id="cow",
    )  # genuinely underivable CoW content rewrite
    m.sync(spark)
    assert m.full_refreshes == 1
    assert _rollup(m) == _recompute(t, spark)


def test_empty_table_raises(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "empty"))
    m = FeedRollupMaintainer(t, ["k"], "g", "v")
    with pytest.raises(ValueError, match="no data"):
        m.sync(spark)


def test_durable_maintainer_restart_resumes_exactly_once(
    spark, tmp_path, cust
):
    """DurableRollupMaintainer persists (rollup, cursor) atomically in
    its MV ManifestTable: a fresh instance resumes from the persisted
    cursor, a no-change sync commits nothing (ledger dedup), and the
    resumed rollup equals a from-scratch recompute."""
    from pypeline_spark.operators.ivm import DurableRollupMaintainer

    k = F.col("c_custkey")
    t = ManifestTable(str(tmp_path / "src"))
    mv_root = str(tmp_path / "mv")
    t.commit_overwrite(cust.filter(k % 3 != 0), batch_id="seed")  # v1
    m1 = DurableRollupMaintainer(
        t, mv_root, ["c_custkey"], "c_mktsegment", "c_acctbal"
    )
    m1.sync(spark)
    t.commit_delta(
        cust.filter(k % 2 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 100.0
        ),
        ["c_custkey"], batch_id="d1", cdc=True,
    )  # v2
    m1.sync(spark)
    assert m1.mv.table_properties()["mv_cursor"] == 2
    # restart: a fresh instance sees the persisted cursor
    m2 = DurableRollupMaintainer(
        t, mv_root, ["c_custkey"], "c_mktsegment", "c_acctbal"
    )
    assert m2.cursor == 2
    v_before = m2.mv.version()
    m2.sync(spark)  # nothing new: ledger-deduped, no MV commit
    assert m2.mv.version() == v_before
    # new commits after the restart splice incrementally
    t.commit_delta(None, ["c_custkey"], batch_id="d2",
                   deletes=cust.filter(k % 4 == 1))  # v3
    m3 = DurableRollupMaintainer(
        t, mv_root, ["c_custkey"], "c_mktsegment", "c_acctbal"
    )
    got = sorted((r.c_mktsegment, r.n_rows, r.sum_cents)
                 for r in m3.sync(spark).collect())
    assert got == _recompute(t, spark)
    assert m3.full_refreshes == 0  # pure feed, even across the restart
    assert m3.mv.table_properties()["mv_cursor"] == 3
    # the persisted MV content IS the rollup (durable artifact)
    persisted = sorted((r.c_mktsegment, r.n_rows, r.sum_cents)
                       for r in m3.mv.read(spark).collect())
    assert persisted == got
    # replayed sync at the same tip from yet another instance: no-op
    v = m3.mv.version()
    m4 = DurableRollupMaintainer(
        t, mv_root, ["c_custkey"], "c_mktsegment", "c_acctbal"
    )
    m4.sync(spark)
    assert m4.mv.version() == v


def test_durable_maintainer_as_stream_consumer(spark, tmp_path, cust):
    """run_streaming: the maintainer follows the source table as a
    manifest_changes foreachBatch consumer — the stream triggers
    syncs, the persisted cursor guarantees exactly-once state."""
    from pypeline_spark.operators.ivm import DurableRollupMaintainer

    k = F.col("c_custkey")
    t = ManifestTable(str(tmp_path / "src2"))
    mv_root = str(tmp_path / "mv2")
    t.commit_overwrite(cust.filter(k % 2 == 0), batch_id="seed")  # v1
    t.commit_delta(cust.filter(k % 2 == 1), ["c_custkey"],
                   batch_id="d1")  # v2
    m = DurableRollupMaintainer(
        t, mv_root, ["c_custkey"], "c_mktsegment", "c_acctbal"
    )
    q = m.run_streaming(spark, str(tmp_path / "ck1"))
    q.awaitTermination(120)
    assert not q.isActive
    assert sorted((r.c_mktsegment, r.n_rows, r.sum_cents)
                  for r in m.mv.read(spark).collect()) == _recompute(t, spark)
    assert m.mv.table_properties()["mv_cursor"] == 2
    # more commits, then a RESTARTED consumer catches up
    t.commit_delta(
        cust.filter(k % 5 == 0).withColumn("c_acctbal", F.lit(3.0)),
        ["c_custkey"], batch_id="d2",
    )  # v3
    m2 = DurableRollupMaintainer(
        t, mv_root, ["c_custkey"], "c_mktsegment", "c_acctbal"
    )
    q2 = m2.run_streaming(spark, str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    assert sorted((r.c_mktsegment, r.n_rows, r.sum_cents)
                  for r in m2.mv.read(spark).collect()) == _recompute(t, spark)
    assert m2.mv.table_properties()["mv_cursor"] == 3


def test_durable_maintainer_crash_before_persist_recovers(
    spark, tmp_path, cust
):
    """Crash DURING the (rollup, cursor) publish: durable state is
    untouched (the publish is atomic), and a fresh maintainer
    re-derives the identical splice — re-deriving REPLACES affected
    groups, so recovery cannot double-count."""
    from pypeline_spark.operators.ivm import DurableRollupMaintainer

    k = F.col("c_custkey")
    t = ManifestTable(str(tmp_path / "src3"))
    mv_root = str(tmp_path / "mv3")
    args = (t, mv_root, ["c_custkey"], "c_mktsegment", "c_acctbal")
    t.commit_overwrite(cust.filter(k % 2 == 0), batch_id="seed")  # v1
    m1 = DurableRollupMaintainer(*args)
    m1.sync(spark)  # mv v1, cursor 1
    t.commit_delta(
        cust.filter(k % 3 == 0).withColumn("c_acctbal", F.lit(7.0)),
        ["c_custkey"], batch_id="d1",
    )  # v2

    def boom(*_a, **_k):
        raise RuntimeError("simulated crash during MV publish")

    m1.mv.commit_overwrite = boom
    with pytest.raises(RuntimeError, match="simulated crash"):
        m1.sync(spark)
    # the atomic publish never happened: durable state is still (v1)
    m2 = DurableRollupMaintainer(*args)
    assert m2.cursor == 1
    assert m2.mv.version() == 1
    got = sorted((r.c_mktsegment, r.n_rows, r.sum_cents)
                 for r in m2.sync(spark).collect())
    assert got == _recompute(t, spark)
    assert m2.mv.table_properties()["mv_cursor"] == 2
    persisted = sorted((r.c_mktsegment, r.n_rows, r.sum_cents)
                       for r in m2.mv.read(spark).collect())
    assert persisted == got


def test_multi_agg_spec_parity_across_reorg_evolution_and_dml(
    spark, tmp_path, cust
):
    """r15 directive 6: a 3-aggregate spec (count / sum / min — min is
    NOT delta-mergeable, proving the affected-group rescan carries
    arbitrary aggregates) maintained across deltas, a compaction
    reorg, a metadata schema evolution, and predicate DML — every sync
    hash-equals a from-scratch recompute, with zero full refreshes."""
    k = F.col("c_custkey")
    t = ManifestTable(str(tmp_path / "magg"))
    t.commit_overwrite(cust.filter(k % 2 == 0), batch_id="seed")  # v1
    aggs = [
        ("count", None, "n_rows"),
        ("sum", "c_acctbal", "bal_sum"),
        ("min", "c_acctbal", "bal_min"),
    ]
    m = FeedRollupMaintainer(t, ["c_custkey"], "c_mktsegment", aggs=aggs)

    def recompute():
        return sorted(
            tuple(r)
            for r in t.read_resolved(spark)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("c_acctbal").alias("bal_sum"),
                F.min("c_acctbal").alias("bal_min"),
            )
            .collect()
        )

    m.sync(spark)
    # delete the row holding some group's MIN: only a rescan can
    # recover the new minimum
    seg0 = t.read_resolved(spark).first()["c_mktsegment"]
    victim = (
        t.read_resolved(spark)
        .filter(F.col("c_mktsegment") == seg0)
        .orderBy("c_acctbal")
        .first()["c_custkey"]
    )
    t.commit_delta(
        None, ["c_custkey"],
        deletes=spark.createDataFrame(
            [(int(victim),)], "c_custkey bigint"
        ),
        batch_id="d1",
    )
    assert sorted(tuple(r) for r in m.sync(spark).collect()) == recompute()
    t.compact(spark, batch_id="c1")  # reorg: read through
    t.evolve_schema("vip string", batch_id="e1")  # metadata: read through
    t.commit_delta(
        cust.filter(k % 7 == 0).withColumn("c_acctbal", F.lit(-5.0)),
        ["c_custkey"], batch_id="d2",
    )
    assert sorted(tuple(r) for r in m.sync(spark).collect()) == recompute()
    t.compact(spark, batch_id="c2")  # DML is CoW: fold deltas first
    t.update_where(
        spark, "c_acctbal < 0.0", {"c_acctbal": "0.25"}, batch_id="uw"
    )
    assert sorted(tuple(r) for r in m.sync(spark).collect()) == recompute()
    assert m.full_refreshes == 0  # feed-driven throughout


def test_durable_multi_agg_spec_roundtrip(spark, tmp_path, cust):
    """The durable maintainer accepts the same aggs spec and persists
    the multi-agg rollup atomically with its cursor."""
    from pypeline_spark.operators.ivm import DurableRollupMaintainer

    k = F.col("c_custkey")
    t = ManifestTable(str(tmp_path / "mdur"))
    t.commit_overwrite(cust.filter(k % 2 == 0), batch_id="seed")
    aggs = [
        ("count", None, "n_rows"),
        ("max", "c_acctbal", "bal_max"),
        ("avg", "c_acctbal", "bal_avg"),
    ]
    args = (t, str(tmp_path / "mvm"), ["c_custkey"], "c_mktsegment")
    m = DurableRollupMaintainer(*args, aggs=aggs)
    m.sync(spark)
    t.commit_delta(
        cust.filter(k % 3 == 0).withColumn("c_acctbal", F.lit(1e6)),
        ["c_custkey"], batch_id="d1",
    )
    m.sync(spark)
    m2 = DurableRollupMaintainer(*args, aggs=aggs)  # restart
    got = sorted(tuple(r) for r in m2.mv.read(spark).collect())
    exp = sorted(
        tuple(r)
        for r in t.read_resolved(spark)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.max("c_acctbal").alias("bal_max"),
            F.avg("c_acctbal").alias("bal_avg"),
        )
        .collect()
    )
    assert got == exp
    assert m2.cursor == 2


def test_bad_agg_specs_raise(spark, tmp_path, cust):
    t = ManifestTable(str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="unsupported aggregate"):
        FeedRollupMaintainer(t, ["k"], "g", aggs=[("median", "v", "m")])
    with pytest.raises(ValueError, match="needs a column"):
        FeedRollupMaintainer(t, ["k"], "g", aggs=[("sum", None, "s")])
    with pytest.raises(ValueError, match="alias"):
        FeedRollupMaintainer(
            t, ["k"], "g",
            aggs=[("count", None, "n"), ("sum", "v", "n")],
        )
    with pytest.raises(ValueError, match="value_col or an aggs"):
        FeedRollupMaintainer(t, ["k"], "g")


def test_run_streaming_survives_content_rewrite(spark, tmp_path, cust):
    """ADVICE r14: a content rewrite on the source must not kill the
    run_streaming consumer at offset planning — the stream skips the
    rewrite (on_rewrite='skip'), sync's own feed read sees it and
    falls back to one pinned recompute, and the maintainer keeps
    following the table."""
    from pypeline_spark.operators.ivm import DurableRollupMaintainer

    k = F.col("c_custkey")
    t = ManifestTable(str(tmp_path / "rwsrc"))
    mv_root = str(tmp_path / "rwmv")
    t.commit_overwrite(cust.filter(k % 2 == 0), batch_id="seed")  # v1
    m = DurableRollupMaintainer(
        t, mv_root, ["c_custkey"], "c_mktsegment", "c_acctbal"
    )
    m.sync(spark)  # cursor 1
    t.commit_delta(cust.filter(k % 2 == 1), ["c_custkey"],
                   batch_id="d1")  # v2 delta
    t.commit_overwrite(cust.filter(k % 3 == 0), batch_id="ow")  # v3 REWRITE
    t.commit_delta(
        cust.filter(k % 5 == 0).withColumn("c_acctbal", F.lit(2.0)),
        ["c_custkey"], batch_id="d2",
    )  # v4 delta
    q = m.run_streaming(spark, str(tmp_path / "rwck"))
    q.awaitTermination(120)
    assert not q.isActive
    assert q.exception() is None  # the rewrite did NOT kill the stream
    assert m.full_refreshes >= 1  # sync's documented fallback ran
    got = sorted((r.c_mktsegment, r.n_rows, r.sum_cents)
                 for r in m.mv.read(spark).collect())
    assert got == _recompute(t, spark)
    assert m.mv.table_properties()["mv_cursor"] == 4
