"""Row tracking (r17 directive #7 — the Delta 3.x row-id shape):
stable row identity assigned at ingest from a monotone high-water
mark, carried through OPTIMIZE/compact via materialized hidden
``__row_id__`` columns, preserved by the deletion-vector DML and the
dv MERGE, surfaced as ``_row_id`` on ``read_rowids`` and as
``__row_id__`` on every CDC image so the feed pairs update pre/post
by identity."""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.session import load_table
from pypeline_spark.sinks.manifest import ManifestTable


@pytest.fixture()
def cust(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )


def _tracked(tmp_path, cust, name, hi=80):
    t = ManifestTable(str(tmp_path / name))
    t.commit_overwrite(
        cust.filter(F.col("c_custkey") <= hi).repartitionByRange(
            4, "c_custkey"
        ),
        batch_id="seed", stats_cols=["c_custkey"],
    )
    t.enable_row_tracking(batch_id="rt")
    return t


def _ids(spark, t):
    return {
        r["c_custkey"]: r["_row_id"]
        for r in t.read_rowids(spark).collect()
    }


class TestRowTracking:
    def test_ids_unique_and_dense_from_hwm(self, spark, tmp_path, cust):
        t = _tracked(tmp_path, cust, "u1")
        ids = _ids(spark, t)
        assert len(ids) == 81
        assert len(set(ids.values())) == 81
        assert min(ids.values()) == 0
        assert max(ids.values()) == 80
        assert t._read_manifest()["row_id_hwm"] == 81

    def test_stable_across_reorg(self, spark, tmp_path, cust):
        t = _tracked(tmp_path, cust, "r1")
        before = _ids(spark, t)
        t.optimize(spark, target_rows=20, batch_id="opt",
                   stats_cols=["c_custkey"])
        assert _ids(spark, t) == before
        # the rewritten files carry MATERIALIZED ids
        m = t._read_manifest()
        assert all(
            m["filemeta"][f].get("row_id_phys") for f in m["files"]
        )
        # a second reorg (now from physical ids) is still stable
        t.optimize(spark, target_rows=50, batch_id="opt2",
                   stats_cols=["c_custkey"])
        assert _ids(spark, t) == before
        # and normal reads never see the hidden column
        assert "__row_id__" not in t.read(spark).columns

    def test_stable_across_dv_dml(self, spark, tmp_path, cust):
        t = _tracked(tmp_path, cust, "d1")
        before = _ids(spark, t)
        t.delete_where(spark, "c_custkey % 7 = 3", batch_id="dd",
                       mode="dv")
        t.update_where(spark, "c_custkey % 7 = 4",
                       {"c_acctbal": "c_acctbal + 9.0"},
                       batch_id="du", mode="dv")
        after = _ids(spark, t)
        assert set(after) == {k for k in before if k % 7 != 3}
        assert all(after[k] == before[k] for k in after)
        assert len(set(after.values())) == len(after)

    def test_merge_updates_keep_ids_inserts_mint_fresh(
        self, spark, tmp_path, cust
    ):
        t = _tracked(tmp_path, cust, "m1")
        before = _ids(spark, t)
        hwm0 = t._read_manifest()["row_id_hwm"]
        src = cust.filter(
            (F.col("c_custkey") <= 10) | (F.col("c_custkey") > 140)
        ).select("c_custkey", (F.col("c_acctbal") * 2).alias("c_acctbal"))
        t.merge_into(
            spark, src, key_columns=["c_custkey"],
            clauses=[("update", None, "*"), ("insert", None, "*")],
            batch_id="mg", mode="dv",
        )
        after = _ids(spark, t)
        # updated + untouched rows keep their identity
        assert all(after[k] == before[k] for k in before)
        # inserted rows mint ids from the high-water mark (never reuse)
        fresh = {after[k] for k in after if k not in before}
        assert fresh and all(i >= hwm0 for i in fresh)
        assert len(set(after.values())) == len(after)

    def test_feed_pairs_update_images_by_row_id(
        self, spark, tmp_path, cust
    ):
        t = _tracked(tmp_path, cust, "f1")
        snapshot = _ids(spark, t)
        v0 = t.version()
        src = cust.filter(F.col("c_custkey") <= 10).select(
            "c_custkey", (F.col("c_acctbal") * 2).alias("c_acctbal")
        )
        t.merge_into(
            spark, src, key_columns=["c_custkey"],
            clauses=[("update", None, "*")], batch_id="mg", mode="dv",
        )
        feed = t.changes(spark, v0)
        pre = {
            r["__row_id__"]: (r["c_custkey"], r["c_acctbal"])
            for r in feed.filter(
                F.col("_change_type") == "update_preimage"
            ).collect()
        }
        post = {
            r["__row_id__"]: (r["c_custkey"], r["c_acctbal"])
            for r in feed.filter(
                F.col("_change_type") == "update_postimage"
            ).collect()
        }
        assert pre and set(pre) == set(post)
        for i in pre:
            assert pre[i][0] == post[i][0]
            assert post[i][1] == pytest.approx(2 * pre[i][1])
            assert snapshot[pre[i][0]] == i  # the SNAPSHOT identity
        # dv delete emits the deleted rows' ids too
        t.delete_where(spark, "c_custkey = 20", batch_id="dd2",
                       mode="dv")
        dels = t.changes(spark, t.version() - 1).filter(
            F.col("_change_type") == "delete"
        ).collect()
        assert [r["__row_id__"] for r in dels] == [snapshot[20]]

    def test_time_travel_reads_each_versions_ids(
        self, spark, tmp_path, cust
    ):
        t = _tracked(tmp_path, cust, "t1")
        v_rt = t.version()
        before = _ids(spark, t)
        t.delete_where(spark, "c_custkey <= 5", batch_id="dd",
                       mode="dv")
        # the pre-delete version still shows every id
        old = {
            r["c_custkey"]: r["_row_id"]
            for r in t.read_rowids(spark, version=v_rt).collect()
        }
        assert old == before
        # a pre-tracking version refuses loudly
        with pytest.raises(ValueError, match="row tracking"):
            t.read_rowids(spark, version=1)

    def test_delta_ingest_defers_ids_and_compact_materializes(
        self, spark, tmp_path, cust
    ):
        """r19 directive #2 — the merge-on-read tier composes with
        tracking by DEFERRED assignment: delta upserts of existing
        keys INHERIT the base id on every resolved read; keys a delta
        introduces read NULL until compaction materializes them with
        fresh ids from the high-water mark; tombstoned keys' ids die.
        Surviving ids are stable across the whole resolution."""
        t = _tracked(tmp_path, cust, "c1", hi=30)
        ids0 = _ids(spark, t)
        hwm0 = t._read_manifest()["row_id_hwm"]
        t.commit_delta(
            cust.filter(F.col("c_custkey").between(25, 40)).select(
                "c_custkey", (F.col("c_acctbal") + 1).alias("c_acctbal")
            ),
            ["c_custkey"], batch_id="d1",
            deletes=spark.createDataFrame([(7,)], "c_custkey long"),
        )
        mid = _ids(spark, t)
        assert 7 not in mid
        for k in range(25, 31):  # delta-updated, base-backed: inherited
            assert mid[k] == ids0[k]
        for k in range(31, 41):  # delta-introduced: deferred
            assert mid[k] is None
        assert all(mid[k] == ids0[k] for k in ids0 if k not in (7,))
        t.compact(spark, batch_id="cp", stats_cols=["c_custkey"])
        done = _ids(spark, t)
        assert all(done[k] == mid[k] for k in mid if mid[k] is not None)
        minted = [done[k] for k in range(31, 41)]
        assert all(i is not None and i >= hwm0 for i in minted)
        assert len(set(done.values())) == len(done)
        # the dead id was never recycled
        assert ids0[7] not in set(done.values())

    def test_delta_batch_claiming_row_id_refused(
        self, spark, tmp_path, cust
    ):
        t = _tracked(tmp_path, cust, "c1b", hi=10)
        with pytest.raises(ValueError, match="__row_id__"):
            t.commit_delta(
                cust.filter(F.col("c_custkey") <= 2).withColumn(
                    "__row_id__", F.lit(0).cast("long")
                ),
                ["c_custkey"], batch_id="x1",
            )

    def test_dv_merge_over_deltas_pairs_cdc_by_id(
        self, spark, tmp_path, cust
    ):
        """A dv MERGE running over OUTSTANDING deltas on a tracked
        table: updates of base-backed keys keep their ids (CDC pre /
        post images pair by ``__row_id__`` across the resolution);
        an update of a delta-only key materializes it (fresh id);
        inserts mint fresh ids."""
        t = _tracked(tmp_path, cust, "c2", hi=20)
        ids0 = _ids(spark, t)
        t.commit_delta(
            cust.filter(F.col("c_custkey").between(18, 25)),
            ["c_custkey"], batch_id="d1",
        )
        v0 = t.version()
        src = cust.filter(F.col("c_custkey").isin(5, 22, 50)).select(
            "c_custkey", (F.col("c_acctbal") * 2).alias("c_acctbal")
        )
        t.merge_into(
            spark, src, key_columns=["c_custkey"],
            clauses=[("update", None, "*"), ("insert", None, "*")],
            batch_id="m1", mode="dv",
        )
        feed = t.changes(spark, v0)
        pre = {r["c_custkey"]: r["__row_id__"] for r in feed.filter(
            F.col("_change_type") == "update_preimage").collect()}
        post = {r["c_custkey"]: r["__row_id__"] for r in feed.filter(
            F.col("_change_type") == "update_postimage").collect()}
        assert set(pre) == set(post) == {5, 22}
        assert pre[5] == post[5] == ids0[5]  # base-backed: paired
        assert pre[22] is None  # delta-only pre-image: unmaterialized
        done = _ids(spark, t)
        assert done[5] == ids0[5]
        assert done[22] is not None and done[50] is not None
        # delta keys the merge didn't touch remain deferred
        assert done[24] is None
        assert len({v for v in done.values() if v is not None}) == len(
            [v for v in done.values() if v is not None]
        )

    def test_streaming_delta_ingest_on_tracked_table(
        self, spark, tmp_path, cust
    ):
        """stream_delta_manifest — the cheapest streaming-upsert path
        — now works on a tracked table: micro-batches land as delta
        commits through the ledger and the auto-compaction policy
        materializes ids without disturbing surviving rows."""
        from pypeline_spark.streaming.ingest import stream_delta_manifest

        t = _tracked(tmp_path, cust, "c3", hi=15)
        ids0 = _ids(spark, t)
        src_dir = tmp_path / "stream_src"
        cust.filter(F.col("c_custkey").between(10, 35)).coalesce(
            1
        ).write.parquet(str(src_dir / "b0"))
        stream = spark.readStream.schema(
            "c_custkey long, c_acctbal double"
        ).option("maxFilesPerTrigger", "1").parquet(str(src_dir / "b*"))
        q = stream_delta_manifest(
            stream, t, ["c_custkey"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            stats_cols=["c_custkey"],
            max_delta_filesets=1, compact_target_rows=500,
        )
        assert q.awaitTermination(300), "stream did not finish in time"
        done = _ids(spark, t)
        assert set(done) == set(range(36))
        assert all(done[k] == ids0[k] for k in ids0)
        assert len(set(done.values())) == len(done)

    def test_cow_dml_preserves_ids(self, spark, tmp_path, cust):
        """Copy-on-write DELETE/UPDATE (r18 #4): the rewrite
        materializes ids into the new files — survivors keep identity,
        updates keep the target row's id."""
        t = _tracked(tmp_path, cust, "cd1")
        before = _ids(spark, t)
        t.delete_where(spark, "c_custkey % 7 = 3", batch_id="dd")
        t.update_where(spark, "c_custkey % 7 = 4",
                       {"c_acctbal": "c_acctbal + 9.0"}, batch_id="du")
        after = _ids(spark, t)
        assert set(after) == {k for k in before if k % 7 != 3}
        assert all(after[k] == before[k] for k in after)
        assert len(set(after.values())) == len(after)
        # the rewritten files carry MATERIALIZED ids
        m = t._read_manifest()
        assert any(
            m["filemeta"][f].get("row_id_phys") for f in m["files"]
        )

    def test_cow_feed_pairs_update_images_by_row_id(
        self, spark, tmp_path, cust
    ):
        """The CDC feed pairs pre/post images by row id ACROSS a CoW
        rewrite (the r18 directive's Done criterion)."""
        t = _tracked(tmp_path, cust, "cf1")
        snapshot = _ids(spark, t)
        v0 = t.version()
        t.update_where(spark, "c_custkey <= 10",
                       {"c_acctbal": "c_acctbal * 2"}, batch_id="du")
        feed = t.changes(spark, v0)
        pre = {
            r["__row_id__"]: (r["c_custkey"], r["c_acctbal"])
            for r in feed.filter(
                F.col("_change_type") == "update_preimage"
            ).collect()
        }
        post = {
            r["__row_id__"]: (r["c_custkey"], r["c_acctbal"])
            for r in feed.filter(
                F.col("_change_type") == "update_postimage"
            ).collect()
        }
        assert pre and set(pre) == set(post)
        for i in pre:
            assert pre[i][0] == post[i][0]
            assert post[i][1] == pytest.approx(2 * pre[i][1])
            assert snapshot[pre[i][0]] == i
        # CoW delete emits the deleted rows' ids too
        t.delete_where(spark, "c_custkey = 20", batch_id="dd2")
        dels = t.changes(spark, t.version() - 1).filter(
            F.col("_change_type") == "delete"
        ).collect()
        assert [r["__row_id__"] for r in dels] == [snapshot[20]]

    def test_cow_merge_updates_keep_ids_inserts_mint_fresh(
        self, spark, tmp_path, cust
    ):
        """mode='cow' MERGE: the dv-mode identity contract holds on
        the copy-on-write path too."""
        t = _tracked(tmp_path, cust, "cm1")
        before = _ids(spark, t)
        hwm0 = t._read_manifest()["row_id_hwm"]
        src = cust.filter(
            (F.col("c_custkey") <= 10) | (F.col("c_custkey") > 140)
        ).select("c_custkey", (F.col("c_acctbal") * 2).alias("c_acctbal"))
        t.merge_into(
            spark, src, key_columns=["c_custkey"],
            clauses=[("update", None, "*"), ("insert", None, "*")],
            batch_id="mg", mode="cow",
        )
        after = _ids(spark, t)
        assert all(after[k] == before[k] for k in before)
        fresh = {after[k] for k in after if k not in before}
        assert fresh and all(i >= hwm0 for i in fresh)
        assert len(set(after.values())) == len(after)

    def test_commit_merge_preserves_ids(self, spark, tmp_path, cust):
        """The unconditional LWW upsert (commit_merge) keeps matched
        rows' ids via one key-map join and mints fresh for inserts."""
        t = _tracked(tmp_path, cust, "km1")
        before = _ids(spark, t)
        hwm0 = t._read_manifest()["row_id_hwm"]
        src = cust.filter(
            (F.col("c_custkey").between(5, 15))
            | (F.col("c_custkey") > 140)
        ).select("c_custkey", (F.col("c_acctbal") + 1).alias("c_acctbal"))
        t.commit_merge(spark, src, ["c_custkey"], batch_id="cm",
                       stats_cols=["c_custkey"], prune_col="c_custkey")
        after = _ids(spark, t)
        assert all(after[k] == before[k] for k in before)
        fresh = {after[k] for k in after if k not in before}
        assert fresh and all(i >= hwm0 for i in fresh)
        assert len(set(after.values())) == len(after)
        with pytest.raises(ValueError, match="__row_id__"):
            t.commit_merge(
                spark,
                src.withColumn("__row_id__", F.lit(1).cast("long")),
                ["c_custkey"], batch_id="cm2",
            )

    def test_compact_after_dv_keeps_schema_clean(
        self, spark, tmp_path, cust
    ):
        """Regression (r18): compact() of a dv'd row-tracked table must
        not leak the materialized ``__row_id__`` into the TRACKED
        schema (reads then collide with the hidden rowid column)."""
        t = _tracked(tmp_path, cust, "cs1")
        before = _ids(spark, t)
        t.delete_where(spark, "c_custkey % 5 = 0", batch_id="dd",
                       mode="dv")
        t.compact(spark, batch_id="cpt")
        m = t._read_manifest()
        assert "__row_id__" not in [
            f["name"] for f in m["schema"]["fields"]
        ]
        after = _ids(spark, t)
        assert after == {k: v for k, v in before.items() if k % 5 != 0}

    def test_enable_preconditions(self, spark, tmp_path, cust):
        t = ManifestTable(str(tmp_path / "p1"))
        t.commit_overwrite(cust.filter(F.col("c_custkey") <= 30),
                           batch_id="seed")
        t.commit_delta(cust.filter(F.col("c_custkey") > 140),
                       ["c_custkey"], batch_id="d")
        with pytest.raises(ValueError, match="deltas"):
            t.enable_row_tracking(batch_id="rt")
        t.compact(spark, batch_id="cpt")
        t.enable_row_tracking(batch_id="rt")
        # idempotent re-enable
        v = t.version()
        t.enable_row_tracking(batch_id="rt2")
        assert t.version() == v
        # mapping exclusion
        t2 = ManifestTable(str(tmp_path / "p2"))
        t2.commit_overwrite(cust.filter(F.col("c_custkey") <= 10),
                            batch_id="seed")
        t2.enable_column_mapping(batch_id="cm")
        with pytest.raises(ValueError, match="mapping"):
            t2.enable_row_tracking(batch_id="rt")

    def test_id_assignment_and_merge_guards(self, spark, tmp_path, cust):
        t = _tracked(tmp_path, cust, "g1")
        src = cust.filter(F.col("c_custkey") <= 3).withColumn(
            "__row_id__", F.lit(7).cast("long")
        )
        with pytest.raises(ValueError, match="__row_id__"):
            t.merge_into(
                spark, src, key_columns=["c_custkey"],
                clauses=[("update", None, "*")], batch_id="x",
                mode="dv",
            )
        with pytest.raises(ValueError, match="__row_id__"):
            t.update_where(
                spark, "c_custkey = 1", {"__row_id__": "0"},
                batch_id="y", mode="dv",
            )
        # the copy-on-write forms enforce the same guards (r18 #4)
        with pytest.raises(ValueError, match="__row_id__"):
            t.merge_into(
                spark, src, key_columns=["c_custkey"],
                clauses=[("update", None, "*")], batch_id="x2",
                mode="cow",
            )
        with pytest.raises(ValueError, match="__row_id__"):
            t.update_where(
                spark, "c_custkey = 1", {"__row_id__": "0"},
                batch_id="y2", mode="cow",
            )

    def test_overwrite_resets_rows_but_never_reuses_ids(
        self, spark, tmp_path, cust
    ):
        t = _tracked(tmp_path, cust, "o1")
        hwm0 = t._read_manifest()["row_id_hwm"]
        t.commit_overwrite(
            cust.filter(F.col("c_custkey") <= 20), batch_id="ow"
        )
        ids = _ids(spark, t)
        assert len(ids) == 21
        assert all(i >= hwm0 for i in ids.values())
        assert t._read_manifest()["row_id_hwm"] == hwm0 + 21
