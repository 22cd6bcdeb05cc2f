"""The no-jar lakehouse surface end to end on the fixtures.

    python examples/lakehouse.py [sf_dir]

ManifestTable gives plain parquet the lakehouse commit protocol —
atomic manifest-swap commits, snapshot isolation, time travel, vacuum,
exactly-once batch ledger — plus the data-skipping tiers:

1. footer-stats file pruning + file-pruned copy-on-write MERGE;
2. merge-on-read delta commits (O(batch) appends), single-shuffle
   last-writer-wins resolution, scheduled compaction;
3. Z-order clustering + conjunctive multi-column pruning;
4. per-file Bloom indexes for equality probes on hashed keys.

Each stage prints what was skipped/rewritten so the scale story is
visible on fixture data.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pypeline_spark.operators.multidim import zbucket, zvalue
from pypeline_spark.session import get_spark, load_table
from pypeline_spark.sinks.manifest import ManifestTable


def main(sf_dir: str) -> None:
    spark = get_spark("lakehouse_example")
    root = tempfile.mkdtemp(prefix="lakehouse_example_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
        )

        # -- 1. copy-on-write with file pruning -------------------------
        cow = ManifestTable(os.path.join(root, "cow"))
        cow.commit_overwrite(
            o.repartitionByRange(8, "o_orderkey"),
            batch_id="seed",
            stats_cols=["o_orderkey"],
        )
        upd = o.filter(F.col("o_orderkey") < 100).withColumn(
            "cents", F.col("cents") + 1
        )
        before = set(cow._read_manifest()["files"])
        cow.commit_merge(
            spark, upd, ["o_orderkey"], batch_id="b1",
            stats_cols=["o_orderkey"], prune_col="o_orderkey",
        )
        after = cow._read_manifest()["files"]
        carried = sum(1 for f in after if f in before)
        print(f"1. COW merge: {carried}/{len(after)} files carried over "
              f"verbatim (only the key-overlapping slice was rewritten)")

        # -- 2. merge-on-read + compaction ------------------------------
        mor = ManifestTable(os.path.join(root, "mor"))
        mor.commit_overwrite(o, batch_id="seed")
        for i in range(3):
            batch = o.filter(F.col("o_orderkey") % 3 == i).withColumn(
                "cents", F.col("cents") + 10 * (i + 1)
            )
            mor.commit_delta(batch, ["o_orderkey"], batch_id=f"d{i}")
        m = mor._read_manifest()
        print(f"2. MOR: 3 delta commits, base untouched "
              f"({len(m['deltas'])} delta filesets); resolved rows ="
              f" {mor.read_resolved(spark).count()}")
        mor.compact(spark)
        print(f"   compacted: deltas={mor._read_manifest()['deltas']}, "
              f"rows={mor.read(spark).count()}")

        # -- 3. Z-order + two-dimensional pruning -----------------------
        b = o.agg(
            F.min("o_custkey").alias("ck_lo"), F.max("o_custkey").alias("ck_hi"),
            F.min("cents").alias("c_lo"), F.max("cents").alias("c_hi"),
        )
        z = zvalue(
            zbucket(F.col("o_custkey"), F.col("ck_lo"), F.col("ck_hi")),
            zbucket(F.col("cents"), F.col("c_lo"), F.col("c_hi")),
        )
        zt = ManifestTable(os.path.join(root, "zorder"))
        zt.commit_overwrite(
            o.crossJoin(F.broadcast(b)).withColumn("__z", z)
            .drop("ck_lo", "ck_hi", "c_lo", "c_hi")
            .repartitionByRange(16, "__z").sortWithinPartitions("__z"),
            batch_id="seed",
            stats_cols=["o_custkey", "cents"],
        )
        for bounds, label in (
            ({"o_custkey": (10, 99)}, "custkey only"),
            ({"cents": (1_000_000, 2_000_000)}, "price only"),
            ({"o_custkey": (10, 99), "cents": (1_000_000, 2_000_000)}, "both"),
        ):
            keep, total = zt.prune_plan_multi(bounds)
            print(f"3. z-order prune [{label}]: open {len(keep)}/{total} files")

        # -- 4. bloom point lookup --------------------------------------
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("fp")
        )
        bt = ManifestTable(os.path.join(root, "bloom"))
        bt.commit_overwrite(
            d.repartition(16, "fp"), batch_id="seed",
            stats_cols=["fp"], bloom_cols=["fp"],
        )
        probe = d.filter(F.col("doc_id") == 7).select("fp").first()[0]
        by_range, total = bt.prune_plan("fp", probe, probe)
        by_bloom, _ = bt.prune_plan_eq("fp", probe)
        print(f"4. bloom lookup on md5 key: range stats keep "
              f"{len(by_range)}/{total} files, bloom keeps {len(by_bloom)}; "
              f"matching rows = {bt.read_pruned_eq(spark, 'fp', probe).count()}")

        # -- 5. bin-packing OPTIMIZE ------------------------------------
        frag = len(bt._read_manifest()["files"])
        bt.optimize(spark, target_rows=2000, stats_cols=["fp"])
        m = bt._read_manifest()
        print(f"5. OPTIMIZE: {frag} -> {len(m['files'])} files "
              f"(bloom index rebuilt: "
              f"{all('bloom' in m['stats'][f] for f in m['files'])})")

        # -- 6. time travel + vacuum ------------------------------------
        v_now = cow.version()
        n_v1 = cow.read(spark, version=1).count()
        removed = cow.vacuum(keep_versions=1)
        print(f"6. time travel: v1 had {n_v1} rows (current v{v_now}); "
              f"vacuum(keep=1) removed {removed} unreferenced files")

        # -- 7. ANALYZE + incremental NDV + metadata-fed bloom sizing ----
        st = ManifestTable(os.path.join(root, "stats"))
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal"
        )
        st.commit_overwrite(c, batch_id="seed", ndv_cols=["c_custkey"])
        st.analyze(spark, ["c_custkey", "c_acctbal"], batch_id="an1")
        prof = st.column_stats("c_custkey")
        print(f"7. ANALYZE (metadata-only commit): c_custkey ndv~{prof['ndv']}"
              f" nulls={prof['nulls']} range=[{prof['min']}, {prof['max']}];"
              f" tracked estimate={st.ndv_estimate('c_custkey')} ->"
              f" suggest_bloom_bits={st.suggest_bloom_bits('c_custkey')}"
              " (zero data passes)")

        # -- 8. partition evolution (live re-cluster, bounded steps) -----
        et = ManifestTable(os.path.join(root, "evolve"))
        et.commit_overwrite(o.repartition(12), batch_id="seed",
                            stats_cols=["o_custkey", "cents"])
        steps = []
        while True:
            _, k = et.evolve_clustering(
                spark, ("o_custkey", "cents"),
                target_rows=max(1, o.count() // 8),
                max_files_per_step=5,
                stats_cols=["o_custkey", "cents"],
            )
            if k == 0:
                break
            steps.append(k)
        keep, total = et.prune_plan_multi(
            {"o_custkey": (10, 99), "cents": (1_000_000, 2_000_000)}
        )
        print(f"8. partition evolution: re-clustered live in steps of "
              f"{steps}; post-convergence 2-D prune opens "
              f"{len(keep)}/{total} files")

        # -- 9. incremental change feed (CDF) -----------------------------
        ct = ManifestTable(os.path.join(root, "cdf"))
        ct.commit_overwrite(c.filter(F.col("c_custkey") % 3 != 0),
                            batch_id="seed")
        for i, shift in ((1, 100.0), (2, 200.0)):
            ct.commit_delta(
                c.filter(F.col("c_custkey") % 3 == 0)
                .filter(F.col("c_custkey") % 2 == i % 2)
                .withColumn("c_acctbal", F.col("c_acctbal") + shift),
                ["c_custkey"], batch_id=f"d{i}",
            )
        feed = ct.changes(spark, since_version=1)
        per_v = {r._commit_version: r.n for r in
                 feed.groupBy("_commit_version").agg(
                     F.count("*").alias("n")).collect()}
        print(f"9. change feed since v1: rows per commit version {per_v} "
              "(read ONLY those commits' files — no table scan)")

        # -- 10. typed CDC + delete tombstones -----------------------------
        ct.commit_delta(
            c.filter(F.col("c_custkey") % 5 == 1).withColumn(
                "c_acctbal", F.col("c_acctbal") + 5.0
            ),
            ["c_custkey"], batch_id="d3", cdc=True,
            deletes=c.filter(F.col("c_custkey") % 7 == 2),
        )
        typed = ct.changes(spark, since_version=ct.version() - 1)
        per_t = {r._change_type: r.n for r in
                 typed.groupBy("_change_type").agg(
                     F.count("*").alias("n")).collect()}
        print(f"10. typed CDC commit: {per_t} — tombstoned keys vanish "
              "from read_resolved, a later upsert resurrects")

        # -- 11. two writers, one table: optimistic concurrency ------------
        a, b = ManifestTable(ct.root), ManifestTable(ct.root)
        a._race_once = lambda: b.commit_delta(
            c.filter(F.col("c_custkey") % 11 == 3),
            ["c_custkey"], batch_id="writer-b",
        )
        a.commit_delta(
            c.filter(F.col("c_custkey") % 11 == 4),
            ["c_custkey"], batch_id="writer-a",
        )
        print("11. concurrent writers: B committed inside A's window; "
              "A detected the conflict (put-if-absent publish) and "
              f"rebased — ledger has both: "
              f"{sorted(x for x in a.applied_batch_ids() if 'writer' in x)}")

        # -- 12. schema evolution: add a column with ZERO rewrites ---------
        st = ManifestTable(os.path.join(root, "schema_evolve"))
        st.commit_overwrite(c.repartitionByRange(6, "c_custkey"),
                            batch_id="seed", stats_cols=["c_custkey"])
        st.commit_merge(
            spark,
            c.filter(F.col("c_custkey") <= 20)
            .withColumn("tier", F.lit("gold")),
            ["c_custkey"], batch_id="m1", prune_col="c_custkey",
        )
        evolved = st.read(spark)
        n_tier = evolved.filter(F.col("tier").isNotNull()).count()
        print(f"12. schema evolution: 'tier' added by a pruned merge — "
              f"carried files null-fill at read ({n_tier} tagged rows, "
              f"{evolved.count()} total, columns {evolved.columns})")

        # -- 13. the feed as a live stream head -----------------------------
        from pypeline_spark.sources.manifest_stream import register

        register(spark)
        out = os.path.join(root, "stream_out")
        (spark.readStream.format("manifest_changes")
         .option("path", ct.root).option("since_version", 1).load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .trigger(availableNow=True).start().awaitTermination(120))
        n_streamed = spark.read.parquet(out).count()
        print(f"13. streaming the feed: {n_streamed} change rows drained "
              "with version-cursor offsets (restart resumes exactly-once)")

        # -- 14. feed reads THROUGH maintenance (reorg commits) ------------
        ct.compact(spark, batch_id="c14")  # reorg: folds deltas
        ct.commit_delta(
            c.filter(F.col("c_custkey") % 13 == 5),
            ["c_custkey"], batch_id="d14",
        )
        through = ct.changes(spark, since_version=1)
        versions = sorted(
            r._commit_version
            for r in through.select("_commit_version").distinct().collect()
        )
        print(f"14. feed through compaction: one read spans versions "
              f"{versions} — the reorg commit contributed nothing and "
              "no consumer had to re-snapshot")

        # -- 15. column mapping: rename with zero rewrites ------------------
        st.enable_column_mapping(batch_id="cm")
        st.rename_column("tier", "loyalty_tier", batch_id="rn")
        renamed = st.read(spark)
        print(f"15. column mapping: renamed tier->loyalty_tier by metadata "
              f"only (columns now {renamed.columns}; the files still say "
              "'tier' — readers map physical->logical; drop/re-add mints "
              "fresh column ids the same way)")

        # -- 16. durable IVM: a standing MV that survives restarts ---------
        from pypeline_spark.operators.ivm import DurableRollupMaintainer

        cseg = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", "c_acctbal"
        )
        src_t = ManifestTable(os.path.join(root, "ivm_src"))
        src_t.commit_overwrite(cseg, batch_id="seed")
        mv_root = os.path.join(root, "ivm_mv")
        args14 = (src_t, mv_root, ["c_custkey"], "c_mktsegment", "c_acctbal")
        DurableRollupMaintainer(*args14).sync(spark)
        src_t.commit_delta(
            cseg.filter(F.col("c_custkey") % 4 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + 10.0),
            ["c_custkey"], batch_id="d1",
        )
        m14 = DurableRollupMaintainer(*args14)  # fresh process
        m14.sync(spark)
        print(f"16. durable IVM: restarted maintainer resumed at cursor "
              f"{m14.mv.table_properties()['mv_cursor']} and spliced only "
              f"the changed groups; the MV table holds "
              f"{m14.mv.read(spark).count()} rollup rows")

        # -- 17. predicate DML: DELETE/UPDATE as pruned CoW + CDC ----------
        dml_t = ManifestTable(os.path.join(root, "dml"))
        dml_t.commit_overwrite(
            cseg.repartitionByRange(8, "c_acctbal"),
            batch_id="seed", stats_cols=["c_acctbal"],
        )
        n_files = len(dml_t._read_manifest()["files"])
        dml_t.delete_where(
            spark, "c_acctbal < -900.0", batch_id="dw",
            stats_cols=["c_acctbal"],
        )
        dml_t.update_where(
            spark, "c_acctbal < 0.0",
            {"c_acctbal": "c_acctbal + 1000.0", "c_mktsegment": "'RESCUED'"},
            batch_id="uw", stats_cols=["c_acctbal"],
        )
        kept = len(
            set(dml_t._manifest_at(2)["files"])
            & set(dml_t._manifest_at(1)["files"])
        )
        ev = dml_t.changes(spark, 1).groupBy("_change_type").count()
        print(f"17. predicate DML: DELETE rewrote {n_files - kept} of "
              f"{n_files} files (stats-pruned CoW); the change feed reads "
              "THROUGH both commits via their typed CDC:")
        ev.show()

        # -- 18. TIMESTAMP AS OF + age-based retention ---------------------
        ct1 = dml_t._manifest_at(1)["committed_at"]
        as_of = dml_t.read_resolved(spark, timestamp=ct1)
        print(f"18. TIMESTAMP AS OF: the pre-DML state at commit stamp "
              f"{ct1:.3f} still reads ({as_of.count()} rows); "
              "vacuum(retain_seconds=7*86400) would keep a week of time "
              "travel regardless of commit rate")

        # -- 19. type widening + constraints -------------------------------
        w_t = ManifestTable(os.path.join(root, "widen"))
        w_t.commit_overwrite(
            cseg.select(
                F.col("c_custkey").cast("int").alias("k"),
                F.col("c_acctbal").cast("float").alias("bal"),
            ),
            batch_id="seed",
        )
        w_t.evolve_schema("k bigint, bal double", batch_id="widen")
        w_t.add_check_constraint(spark, "bal_floor", "bal >= -1000.0")
        try:
            w_t.commit_delta(
                spark.createDataFrame([(1, -9e9)], "k bigint, bal double"),
                ["k"], batch_id="bad",
            )
        except Exception as exc:  # ConstraintViolation
            msg = str(exc).split(";")[0]
            print(f"19. widening + constraints: int->bigint/float->double "
                  f"cost ONE metadata commit (old files upcast at read); "
                  f"the CHECK gate then rejected a bad batch: {msg}")

        # -- 20. deletion vectors: DELETE/UPDATE with zero rewrites ---------
        dv_t = ManifestTable(os.path.join(root, "dv"))
        dv_t.commit_overwrite(
            cseg.repartitionByRange(8, "c_acctbal"),
            batch_id="seed", stats_cols=["c_acctbal"],
        )
        files_before = list(dv_t._read_manifest()["files"])
        dv_t.delete_where(
            spark, "c_custkey % 50 = 0", batch_id="dvd", mode="dv"
        )  # scattered delete: every file holds matches, none rewrite
        dv_t.update_where(
            spark, "c_acctbal < -900.0", {"c_mktsegment": "'FLAGGED'"},
            batch_id="dvu", mode="dv", stats_cols=["c_acctbal"],
        )  # only post-image rows land as new files
        m = dv_t._read_manifest()
        print(f"20. deletion vectors: a scattered DELETE + UPDATE kept all "
              f"{len(files_before)} base files "
              f"({sum(m['dv']['rows'].values())} rows suppressed via dv, "
              f"reads anti-join it away); compact() materializes on the "
              "maintenance schedule")
        dv_t.compact(spark, batch_id="mat", stats_cols=["c_acctbal"])

        # -- 21. conditional MERGE INTO -------------------------------------
        mi_t = ManifestTable(os.path.join(root, "mi"))
        mi_t.commit_overwrite(
            cseg.repartitionByRange(8, "c_custkey"),
            batch_id="seed", stats_cols=["c_custkey"],
        )
        src = cseg.filter(F.col("c_custkey") % 4 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") * 2.0
        )
        mi_t.merge_into(
            spark, src, key_columns=["c_custkey"],
            clauses=[
                ("delete", "s.c_acctbal < 0.0", None),
                ("update", None, {"c_acctbal": "s.c_acctbal"}),
                ("insert", None, "*"),
            ],
            batch_id="m1", stats_cols=["c_custkey"],
            prune_col="c_custkey",
        )
        mev = mi_t.changes(spark, 1).groupBy("_change_type").count()
        print("21. MERGE INTO (matched-delete / matched-update / "
              "not-matched-insert in one commit; typed CDC through the "
              "feed):")
        mev.show()

        # -- 22. REORG PURGE + DESCRIBE HISTORY + SHALLOW CLONE -------------
        dv_t.delete_where(
            spark, "c_custkey % 30 = 0", batch_id="dvd2", mode="dv"
        )
        clone = dv_t.clone_to(os.path.join(root, "dv_clone"))
        dv_t.reorg_purge(spark, batch_id="purge",
                         stats_cols=["c_acctbal"])
        print(f"22. shallow clone pinned {clone.read(spark).count()} rows "
              "with ZERO data copies (clone reads the source's files by "
              "recorded roots; its own writes land locally); the source "
              "then purged its dv — DESCRIBE HISTORY of the source:")
        dv_t.history(spark).select(
            "version", "kind", "batch_id", "n_files", "dv_rows"
        ).show()

        # -- 23. r16: dv MERGE over outstanding deltas + the commit log -----
        mor16 = ManifestTable(os.path.join(root, "mor16"))
        c16 = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal"
        )
        mor16.commit_overwrite(
            c16, batch_id="seed16", stats_cols=["c_custkey"]
        )
        mor16.commit_delta(
            c16.filter(F.col("c_custkey") % 4 == 1),
            ["c_custkey"], batch_id="d16",
        )  # outstanding merge-on-read delta
        mor16.merge_into(
            spark,
            c16.filter(F.col("c_custkey") % 50 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + 5.0),
            key_columns=["c_custkey"],
            clauses=[("update", None, {"c_acctbal": "s.c_acctbal"})],
            batch_id="m16", stats_cols=["c_custkey"],
            prune_col="c_custkey", mode="dv",
        )
        m16 = mor16._read_manifest()
        rec_sz = os.path.getsize(
            os.path.join(mor16.root, f"_manifest.v{m16['version']}.json")
        )
        print("23. dv MERGE over OUTSTANDING deltas (no compact needed): "
              f"deltas still outstanding={len(m16['deltas'])}, dv rows="
              f"{sum((m16.get('dv') or {}).get('rows', {}).values())}, "
              f"and its commit-log record is {rec_sz} bytes (an O(delta) "
              "action diff, not an O(files) snapshot).")
        would = mor16.vacuum(keep_versions=1, dry_run=True)
        print(f"    VACUUM DRY RUN would reap {would} files (nothing "
              "was touched); DESCRIBE DETAIL:")
        mor16.describe_detail(spark).show(truncate=False)

        # -- round 17: YAML pipeline onto the lakehouse + defaults +
        #    row tracking ------------------------------------------------
        from pypeline_spark.pipeline.lakehouse import LakehouseCatalog
        from pypeline_spark.pipeline.runner import Pypeline
        from pypeline_spark.pipeline.spec import PipelineConfig
        from pypeline_spark.session import register_tables

        register_tables(spark, sf_dir)  # the extract reads temp views
        cat = LakehouseCatalog(os.path.join(root, "lh17"))
        cfg = PipelineConfig.from_dict({
            "pypes": {
                "sync": {
                    "extract_query": (
                        "SELECT c_custkey, c_acctbal FROM customer "
                        "WHERE c_custkey <= {hi}"
                    ),
                    "target_table": "accounts",
                    "type": "lakehouse",
                    "lakehouse_op": "upsert",
                    "key_columns": ["c_custkey"],
                    "batch_id": "sync-{seq}",
                },
            },
            "pypelines": {"p": ["sync"]},
        })
        pl = Pypeline(spark, cfg, lakehouse=cat)
        pl.run("p", {"hi": 100, "seq": 1})
        pl.run("p", {"hi": 120, "seq": 2})   # MERGE: updates + inserts
        pl.run("p", {"hi": 120, "seq": 2})   # restart replay: ledger no-op
        acc = cat.table("accounts")
        print("24. `lakehouse` YAML step (r17): the reference pipeline "
              f"surface over ManifestTable — version {acc.version()} "
              "after seed + merge + a REPLAYED merge (the exactly-once "
              "ledger absorbed the restart as a no-op).")

        acc.evolve_schema("tier string", batch_id="e1",
                          defaults={"tier": "'BASIC'"})
        acc.evolve_schema(
            "cents bigint", batch_id="e2",
            generated={"cents": "CAST(FLOOR(c_acctbal * 100) AS BIGINT)"},
        )
        acc.enable_row_tracking(batch_id="rt")
        acc.update_where(spark, "c_custkey < 5",
                         {"c_acctbal": "c_acctbal + 1.0"},
                         batch_id="u17", mode="dv")
        rows = (
            acc.read_rowids(spark)
            .orderBy("c_custkey").limit(3).collect()
        )
        print("25. ADD COLUMN DEFAULT + generated column + row tracking "
              "(r17): pre-add files read tier='BASIC' and compute cents "
              "from their own rows; the dv UPDATE recomputed cents and "
              "kept each row's identity:")
        for r in rows:
            print(f"    key={r['c_custkey']} tier={r['tier']} "
                  f"cents={r['cents']} _row_id={r['_row_id']}")

        # -- round 18: SQL front-end, appends, CoW × tracking,
        #    identity, generated-column pruning -------------------------
        from pypeline_spark.sinks.sql import execute_table_sql

        r = lambda name: acc  # one-table resolver
        execute_table_sql(
            spark, r,
            "INSERT INTO accounts (c_custkey, c_acctbal) "
            "SELECT c_custkey, c_acctbal "
            "FROM customer WHERE c_custkey BETWEEN 130 AND 140",
        )
        execute_table_sql(
            spark, r,
            "UPDATE accounts SET c_acctbal = c_acctbal + 10.0 "
            "WHERE c_custkey BETWEEN 130 AND 132",
        )
        execute_table_sql(
            spark, r, "DELETE FROM accounts WHERE c_custkey = 140"
        )
        hist = execute_table_sql(spark, r, "DESCRIBE HISTORY accounts")
        kinds = [row["kind"] for row in hist.collect()]
        print("26. SQL statement router (r18): INSERT INTO (an 'append' "
              "commit — feed/stream read through it), UPDATE and DELETE "
              "dispatched onto the table, DESCRIBE HISTORY reads back "
              f"kinds {kinds[:4]}... — and the CoW forms now preserve "
              "row identity (r18 #4), so none of this needed dv mode.")

        acc.add_identity_column("sk", start=1000, step=1, batch_id="id1")
        execute_table_sql(
            spark, r,
            "INSERT INTO accounts (c_custkey, c_acctbal) "
            "SELECT c_custkey, c_acctbal "
            "FROM customer WHERE c_custkey BETWEEN 141 AND 145",
        )
        sks = (
            acc.read(spark).orderBy(F.col("sk").desc()).limit(3)
            .select("c_custkey", "sk").collect()
        )
        print("27. IDENTITY column (r18 #6): sk = 1000 + row_id, minted "
              "at publish (collision-safe under OCC) — newest rows: "
              + ", ".join(f"key={x['c_custkey']} sk={x['sk']}" for x in sks))

        gen = ManifestTable(os.path.join(root, "gen18"))
        gen.commit_overwrite(
            spark.table("customer")
            .select("c_custkey", "c_acctbal")
            .filter("c_custkey <= 120")
            .repartitionByRange(6, "c_custkey"),
            batch_id="s",
            stats_cols=["c_custkey"],
        )
        gen.evolve_schema(
            "ck2 bigint", batch_id="g1",
            generated={"ck2": "c_custkey * 2"},
        )
        keep, total = gen.prune_plan_multi({"ck2": (0, 40)})
        print("28. generation-expression pruning (r18 #5): a predicate "
              "on the GENERATED ck2 = c_custkey * 2 column plans "
              "against the SOURCE column's stats through the affine "
              f"form — {len(keep)}/{total} files kept, vectorized "
              "numpy either way (date truncations prune too, via the "
              "string stats index).")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
