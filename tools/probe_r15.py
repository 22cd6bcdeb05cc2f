"""Round-15 scale probes (r14 verdict directive #7: scale probes for
every new path, with honest fixture-scale adjudication), recorded in
SCALE.md:

1. Predicate DML (directive #2): delete_where on a range-clustered
   table with a narrow predicate — wall time AND the files-rewritten /
   files-total ratio (the rewrite amplification the two-phase prune
   bounds) vs the full-table rewrite a non-DML design pays
   (commit_overwrite of the filtered content).
2. TIMESTAMP AS OF (directive #3): version_at_timestamp over a
   50-version history — pure-metadata resolution cost.
3. Type widening (directive #4): evolve_schema widening commit vs the
   cast-rewrite a non-widening design pays (optimize at the same
   version, wide casts applied).
4. Constraints (directive #5): commit_delta of the same batch with 0
   vs 2 declared constraints — the per-commit validation overhead
   (one batch-sized pass).
5. Restore feed (directive #8): changes() across a restore (events
   synthesized from the rolled-away range) vs the full two-sided
   snapshot diff a consumer needed before r15.

Usage: python tools/probe_r15.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypeline_spark.session import get_spark, load_table  # noqa: E402
from pypeline_spark.sinks.manifest import ManifestTable  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 3), out


def main() -> None:
    spark = get_spark("probe_r15")
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    out: dict = {"sf_dir": SF_DIR, "rows": cust.count()}
    scratch = tempfile.mkdtemp(prefix="probe_r15_")
    try:
        # -- 1. predicate DML: pruned CoW vs full rewrite -----------------
        t1 = ManifestTable(os.path.join(scratch, "dml"))
        t1.commit_overwrite(
            cust.repartitionByRange(16, "c_acctbal"),
            batch_id="seed", stats_cols=["c_acctbal"],
        )
        m0 = t1._read_manifest()
        pred = "c_acctbal >= 0.0 AND c_acctbal < 500.0"
        dt, _ = _timed(lambda: t1.delete_where(
            spark, pred, batch_id="dml", stats_cols=["c_acctbal"]
        ))
        m1 = t1._read_manifest()
        rewritten = len(set(m0["files"]) - set(m1["files"]))
        out["dml_delete_where_sec"] = dt
        out["dml_files_rewritten"] = rewritten
        out["dml_files_total"] = len(m0["files"])
        # the non-DML alternative: materialize the filtered content and
        # overwrite the whole table
        t1b = ManifestTable(os.path.join(scratch, "full"))
        t1b.commit_overwrite(
            cust.repartitionByRange(16, "c_acctbal"),
            batch_id="seed", stats_cols=["c_acctbal"],
        )
        dt, _ = _timed(lambda: t1b.commit_overwrite(
            t1b.read(spark).filter(f"NOT ({pred})"),
            batch_id="rw", stats_cols=["c_acctbal"],
        ))
        out["dml_full_rewrite_sec"] = dt

        # -- 2. TIMESTAMP AS OF resolution over 50 versions ---------------
        t2 = ManifestTable(os.path.join(scratch, "asof"))
        t2.commit_overwrite(cust.limit(1000), batch_id="seed")
        for i in range(49):
            t2.evolve_schema(f"extra_{i} string", batch_id=f"e{i}")
        mid_ts = t2._manifest_at(25)["committed_at"]
        dt, v = _timed(lambda: t2.version_at_timestamp(mid_ts))
        out["asof_resolution_sec_50_versions"] = dt
        out["asof_resolved_version"] = v

        # -- 3. widening commit vs cast-rewrite ---------------------------
        narrow = cust.select(
            F.col("c_custkey").cast("int").alias("k"),
            F.col("c_acctbal").cast("float").alias("v"),
        )
        t3 = ManifestTable(os.path.join(scratch, "widen"))
        t3.commit_overwrite(narrow, batch_id="seed", stats_cols=["k"])
        dt, _ = _timed(lambda: t3.evolve_schema(
            "k bigint, v double", batch_id="w"
        ))
        out["widen_metadata_commit_sec"] = dt
        t3b = ManifestTable(os.path.join(scratch, "widenrw"))
        t3b.commit_overwrite(narrow, batch_id="seed", stats_cols=["k"])
        dt, _ = _timed(lambda: t3b.commit_overwrite(
            t3b.read(spark).select(
                F.col("k").cast("bigint").alias("k"),
                F.col("v").cast("double").alias("v"),
            ),
            batch_id="rw", stats_cols=["k"],
        ))
        out["widen_cast_rewrite_sec"] = dt

        # -- 4. constraint validation overhead per commit ------------------
        batch = cust.filter(F.col("c_custkey") % 3 == 0)
        t4 = ManifestTable(os.path.join(scratch, "nocons"))
        t4.commit_overwrite(cust, batch_id="seed")
        dt, _ = _timed(lambda: t4.commit_delta(
            batch, ["c_custkey"], batch_id="d1"
        ))
        out["delta_commit_no_constraints_sec"] = dt
        t5 = ManifestTable(os.path.join(scratch, "cons"))
        t5.commit_overwrite(cust, batch_id="seed")
        t5.add_check_constraint(spark, "floor", "c_acctbal >= -1e6")
        t5.add_not_null(spark, ["c_mktsegment"])
        dt, _ = _timed(lambda: t5.commit_delta(
            batch, ["c_custkey"], batch_id="d1"
        ))
        out["delta_commit_two_constraints_sec"] = dt

        # -- 5. restore feed vs snapshot diff ------------------------------
        t6 = ManifestTable(os.path.join(scratch, "rest"))
        t6.commit_overwrite(cust, batch_id="seed")  # v1
        t6.commit_delta(
            cust.filter(F.col("c_custkey") % 50 == 0)
            .withColumn("c_acctbal", F.lit(1.0)),
            ["c_custkey"], batch_id="d1",
        )  # v2: ~2% of keys
        t6.restore(version=1, batch_id="undo")  # v3
        dt, n = _timed(lambda: t6.changes(spark, 2).count())
        out["restore_feed_events_sec"] = dt
        out["restore_feed_events_rows"] = n
        # the pre-r15 alternative: a consumer diffing two full snapshots
        a = t6.read_resolved(spark, version=2)
        b = t6.read_resolved(spark, version=3)
        dt, nd = _timed(lambda: a.exceptAll(b).unionByName(
            b.exceptAll(a)
        ).count())
        out["restore_snapshot_diff_sec"] = dt
        out["restore_snapshot_diff_rows"] = nd

        # -- 6. deletion vectors: scattered DELETE, dv vs CoW ---------------
        # range-clustered by acctbal, deleted by custkey residue — every
        # file holds matches, so CoW must rewrite ALL files while dv
        # writes O(matched rows)
        full = load_table(spark, SF_DIR, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        ).repartitionByRange(16, "c_acctbal")
        t7 = ManifestTable(os.path.join(scratch, "dv"))
        t7.commit_overwrite(full, batch_id="seed", stats_cols=["c_acctbal"])
        m0 = t7._read_manifest()
        dt, _ = _timed(lambda: t7.delete_where(
            spark, "c_custkey % 50 = 0", batch_id="d", mode="dv"
        ))
        m1 = t7._read_manifest()
        out["dv_delete_sec"] = dt
        out["dv_rows_suppressed"] = int(sum(m1["dv"]["rows"].values()))
        out["dv_bytes_written"] = int(sum(
            m1["filemeta"][f]["bytes"] for f in m1["dv"]["files"]
        ))
        out["dv_files_rewritten"] = len(set(m0["files"]) - set(m1["files"]))
        dt, n = _timed(lambda: t7.read(spark).count())
        out["dv_read_through_sec"] = dt
        out["dv_read_rows"] = n
        t8 = ManifestTable(os.path.join(scratch, "cow"))
        t8.commit_overwrite(full, batch_id="seed", stats_cols=["c_acctbal"])
        m0 = t8._read_manifest()
        dt, _ = _timed(lambda: t8.delete_where(
            spark, "c_custkey % 50 = 0", batch_id="d",
            stats_cols=["c_acctbal"],
        ))
        m1 = t8._read_manifest()
        out["cow_delete_sec"] = dt
        out["cow_files_rewritten"] = len(set(m0["files"]) - set(m1["files"]))
        out["cow_files_total"] = len(m0["files"])
        out["cow_bytes_written"] = int(sum(
            meta["bytes"] for f, meta in m1["filemeta"].items()
            if f in set(m1["files"]) - set(m0["files"])
        ))
        dt, _ = _timed(lambda: t8.read(spark).count())
        out["cow_read_after_sec"] = dt

        # -- 7. conditional MERGE: pruned touched-slice rewrite -------------
        t9 = ManifestTable(os.path.join(scratch, "mi"))
        t9.commit_overwrite(
            load_table(spark, SF_DIR, "customer").select(
                "c_custkey", "c_acctbal", "c_mktsegment"
            ).repartitionByRange(16, "c_custkey"),
            batch_id="seed", stats_cols=["c_custkey"],
        )
        m0 = t9._read_manifest()
        src = load_table(spark, SF_DIR, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        ).filter(
            (F.col("c_custkey") >= 100) & (F.col("c_custkey") < 400)
        ).withColumn("c_acctbal", F.col("c_acctbal") + 1.0)
        dt, _ = _timed(lambda: t9.merge_into(
            spark, src, key_columns=["c_custkey"],
            clauses=[
                ("delete", "s.c_acctbal < 0.0", None),
                ("update", None, {"c_acctbal": "s.c_acctbal"}),
                ("insert", None, "*"),
            ],
            batch_id="m", stats_cols=["c_custkey"], prune_col="c_custkey",
        ))
        m1 = t9._read_manifest()
        out["merge_into_sec"] = dt
        out["merge_files_rewritten"] = len(
            set(m0["files"]) - set(m1["files"])
        )
        out["merge_files_total"] = len(m0["files"])
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
