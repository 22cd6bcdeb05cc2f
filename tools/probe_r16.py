"""Round-16 scale probes (r15 verdict directive #8: scale probes for
every new path, with honest fixture-scale adjudication), recorded in
SCALE.md:

1. Incremental commit log (directive #2): a 2000-file synthetic table
   takes 40 commits — bytes on disk per log record vs per checkpoint,
   cumulative log bytes vs what 40 full snapshots would have cost
   (the pre-r16 protocol), and tip _read_manifest latency (checkpoint
   + replay).  Metadata-level probe: the file COUNT is what the cost
   scales with, so a synthetic manifest is the honest fixture.
2. Bounded ledger (directive #3): 400 structured-id commits under
   retention 50 — final ledger length and manifest bytes vs the
   unbounded twin.
3. dv MERGE (directive #4, sf data): the same narrow merge against a
   delta'd sf0.1 customer table — dv mode (works in place) vs what a
   CoW design pays (compact first, then CoW merge): wall time and
   bytes written.
4. Stream admission walk (directive #5): latestOffset over a
   120-version backlog with byte caps — pure-metadata planning cost.
5. DESCRIBE HISTORY at 120 versions (directive #7): wall time — record
   reads only, no materialization.

Usage: python tools/probe_r16.py   (prints one JSON line)
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


def _synth(version, files, extra=None):
    # per-file stats derive from the NAME (immutable), as real commits
    # do — carried files keep their entries verbatim
    def _k(f):
        h = hash(f) % 1000
        return {"k": [h, h + 1]}

    m = {
        "version": version,
        "files": list(files),
        "deltas": [],
        "batch_ids": [],
        "stats": {f: _k(f) for f in files},
        "filemeta": {f: {"bytes": 1 << 20, "rows": 10_000} for f in files},
    }
    if extra:
        m.update(extra)
    return m


def probe_commit_log() -> dict:
    root = tempfile.mkdtemp(prefix="probe_log_")
    try:
        t = ManifestTable(root)
        files = [f"f{i:05}.parquet" for i in range(2000)]
        t._publish(_synth(1, files))
        ckpt_bytes = os.path.getsize(
            os.path.join(root, "_manifest.v1.json")
        )
        log_bytes = []
        cur = list(files)
        for v in range(2, 41):
            cur = cur[1:] + [f"g{v}.parquet"]
            m = _synth(v, cur, {"dml": True})
            m["batch_ids"] = [f"p-{v}"]
            t._publish(m)
            log_bytes.append(
                os.path.getsize(
                    os.path.join(root, f"_manifest.v{v}.json")
                )
            )
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for f in os.listdir(root)
            if f.startswith("_manifest.v")
        )
        read_s, tip = _timed(t._read_manifest)
        # records at checkpoint cadence (v10/20/30/40) are full-size
        recs = [b for i, b in enumerate(log_bytes, start=2) if i % 10]
        return {
            "files": 2000,
            "commits": 40,
            "checkpoint_bytes": ckpt_bytes,
            "median_log_record_bytes": sorted(recs)[len(recs) // 2],
            "log_total_bytes": total,
            "full_snapshot_total_bytes_est": ckpt_bytes * 40,
            "storage_ratio": round(total / (ckpt_bytes * 40), 4),
            "tip_read_s": read_s,
            "tip_version": tip["version"],
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_bounded_ledger() -> dict:
    out = {}
    for mode, retention in (("bounded", 50), ("unbounded", None)):
        root = tempfile.mkdtemp(prefix=f"probe_led_{mode}_")
        try:
            t = ManifestTable(root)
            if retention:
                t.set_ledger_retention(retention)
            w, _ = _timed(
                lambda: [
                    t.set_ledger_retention(
                        retention, batch_id=f"stream-{i}"
                    )
                    for i in range(400)
                ]
            )
            m = t._read_manifest()
            out[mode] = {
                "commits": 400,
                "ledger_len": len(m["batch_ids"]),
                "tip_record_bytes": os.path.getsize(
                    os.path.join(
                        t.root, f"_manifest.v{m['version']}.json"
                    )
                ),
                "wall_s": w,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return out


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
    )


def probe_dv_merge(spark) -> dict:
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    src = (
        c.filter(F.col("c_custkey") % 97 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1.0)
    )
    out = {}
    for mode in ("dv", "cow"):
        root = tempfile.mkdtemp(prefix=f"probe_mrg_{mode}_")
        try:
            t = ManifestTable(root)
            t.commit_overwrite(
                c.repartitionByRange(16, "c_custkey"),
                batch_id="seed", stats_cols=["c_custkey"],
            )
            t.commit_delta(
                c.filter(F.col("c_custkey") % 5 == 1),
                ["c_custkey"], batch_id="d1",
                stats_cols=["c_custkey"],
            )
            before = _dir_bytes(t.data_dir)
            clauses = [("update", None, {"c_acctbal": "s.c_acctbal"})]

            def run():
                if mode == "cow":
                    # the pre-r16 path: MERGE needs a compacted table
                    t.compact(spark, batch_id="c", stats_cols=["c_custkey"])
                return t.merge_into(
                    spark, src, key_columns=["c_custkey"],
                    clauses=clauses, batch_id="m",
                    stats_cols=["c_custkey"], prune_col="c_custkey",
                    mode=mode,
                )

            w, _ = _timed(run)
            out[mode] = {
                "wall_s": w,
                "bytes_written": _dir_bytes(t.data_dir) - before,
                "deltas_outstanding_after": len(
                    t._read_manifest().get("deltas", [])
                ),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    out["bytes_ratio_cow_over_dv"] = round(
        out["cow"]["bytes_written"] / max(1, out["dv"]["bytes_written"]), 2
    )
    return out


def probe_backlog_walk_and_history(spark) -> dict:
    from pyspark.sql.types import _parse_datatype_string

    from pypeline_spark.sources.manifest_stream import (
        ManifestChangesDataSource,
    )

    root = tempfile.mkdtemp(prefix="probe_walk_")
    try:
        t = ManifestTable(root)
        base = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        t.commit_overwrite(base.coalesce(1), batch_id="seed",
                           stats_cols=["k"])
        for i in range(120):
            t.commit_delta(
                base.limit(5).coalesce(1), ["k"], batch_id=f"s-{i}"
            )
        ds = ManifestChangesDataSource(
            {
                "path": root,
                "since_version": "1",
                "max_bytes_per_batch": str(64 << 10),
            }
        )
        r = ds.streamReader(_parse_datatype_string(ds.schema()))
        r.initialOffset()
        walk_s, end = _timed(r.latestOffset)
        hist_s, h = _timed(lambda: t.history(spark).collect())
        return {
            "backlog_versions": 120,
            "walk_s": walk_s,
            "first_capped_end": end["version"],
            "history_s": hist_s,
            "history_rows": len(h),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark()
    res = {
        "commit_log": probe_commit_log(),
        "bounded_ledger": probe_bounded_ledger(),
        "dv_merge_sf": probe_dv_merge(spark),
        "walk_and_history": probe_backlog_walk_and_history(spark),
        "sf_dir": SF_DIR,
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
