"""r18 scale probes.

Probe 1 (directive #5): generation-expression pruning at 1e5 synthetic
files — a predicate on a GENERATED column (``event_date =
CAST(ts AS DATE)``) must skip files through the SOURCE column's
ISO-string stats, and an affine generated predicate must skip through
the vectorized numpy path.  Per-file stats derive from the file NAME
(deterministic per-file entropy, not an enumeration artifact).
Reports files kept / total and plan wall time for both the scalar
(date/string) and vectorized (affine) directions.

Probe 2 (directive #2): ``commit_append`` publish cost must stay flat
as the table grows — the r16 commit log stores O(delta) action
records, so appending batch #200 onto a 200-fileset table costs the
same manifest work as batch #1.  Reports per-append wall time at the
start and end of a 200-append run (manifest plane only: filesets are
pre-staged once and the manifests are built through the real publish
path with synthetic file entries).

Usage: python tools/probe_r18.py
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pypeline_spark.sinks.manifest import ManifestTable  # noqa: E402


def synth_manifest(n_files: int) -> dict:
    """Synthetic tracked manifest: per-file ts stats (ISO strings, one
    ~17-minute window per file spread over 4 days), numeric user_id
    stats, and declared generated columns event_date / uid2."""
    files, stats, filemeta = [], {}, {}
    day_us = 86_400
    for i in range(n_files):
        name = hashlib.md5(f"f-{i}".encode()).hexdigest() + ".parquet"
        files.append(name)
        h = int(hashlib.md5(name.encode()).hexdigest()[:8], 16)
        t0 = (h % (4 * day_us))  # seconds into a 4-day window
        d, rem = divmod(t0, day_us)
        hh, rem = divmod(rem, 3600)
        mm, ss = divmod(rem, 60)
        lo = f"2024-01-{d + 1:02d} {hh:02d}:{mm:02d}:{ss:02d}"
        mm2 = min(59, mm + 17)
        hi = f"2024-01-{d + 1:02d} {hh:02d}:{mm2:02d}:{ss:02d}"
        uid = h % 100_000
        stats[name] = {
            "ts": [lo, hi],
            "user_id": [uid, uid + h % 500],
        }
        filemeta[name] = {"bytes": 1_000_000 + h % 900_000,
                          "rows": 10_000 + h % 999}
    schema = {
        "type": "struct",
        "fields": [
            {"name": c, "type": t, "nullable": True, "metadata": {}}
            for c, t in (
                ("event_id", "long"), ("ts", "timestamp"),
                ("user_id", "long"), ("event_date", "date"),
                ("uid2", "long"),
            )
        ],
    }
    return {
        "version": 1,
        "files": files,
        "deltas": [],
        "batch_ids": ["seed"],
        "stats": stats,
        "filemeta": filemeta,
        "schema": schema,
        "generated_columns": {
            "event_date": "CAST(ts AS DATE)",
            "uid2": "user_id * 2",
        },
        "column_defaults": {
            "event_date": {"expr": "CAST(ts AS DATE)", "added_v": 1,
                           "generated": True},
            "uid2": {"expr": "user_id * 2", "added_v": 1,
                     "generated": True},
        },
    }


def probe_gen_prune(n_files: int) -> dict:
    root = tempfile.mkdtemp(prefix="probe18-prune-")
    try:
        t = ManifestTable(root)
        m = synth_manifest(n_files)
        t._publish(m)
        mm = t._read_manifest()
        import datetime

        out: dict = {"n_files": n_files}
        # direction: predicate on the GENERATED date column, files
        # carry only ts (string) stats — the scalar path
        d = datetime.date(2024, 1, 2)
        t0 = time.perf_counter()
        keep, total = t.prune_plan_multi({"event_date": (d, d)})
        out["date_pred_cold_ms"] = round(
            (time.perf_counter() - t0) * 1000, 2
        )
        t0 = time.perf_counter()
        keep, total = t.prune_plan_multi({"event_date": (d, d)})
        out["date_pred_warm_ms"] = round(
            (time.perf_counter() - t0) * 1000, 2
        )
        out["date_kept"] = len(keep)
        out["total"] = total
        # sanity: every kept file's ts window touches Jan 2
        assert all(
            mm["stats"][f]["ts"][0][:10] <= "2024-01-02"
            and mm["stats"][f]["ts"][1][:10] >= "2024-01-02"
            for f in keep
        )
        # affine generated predicate — the vectorized numpy path
        t0 = time.perf_counter()
        keep2, _ = t.prune_plan_multi({"uid2": (0, 2_000)})
        out["affine_cold_ms"] = round((time.perf_counter() - t0) * 1000, 2)
        t0 = time.perf_counter()
        keep2, _ = t.prune_plan_multi({"uid2": (0, 2_000)})
        out["affine_warm_ms"] = round((time.perf_counter() - t0) * 1000, 2)
        out["affine_kept"] = len(keep2)
        assert all(mm["stats"][f]["user_id"][0] <= 1_000 for f in keep2)
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_append_flat(n_appends: int = 200, files_per: int = 1) -> dict:
    """Manifest-plane append cost: build each commit exactly like
    commit_append's build() does (fresh files + carried state) and
    push it through the REAL _publish (diff records, ledger, kind
    classification).  Data files are zero-byte placeholders — the
    probe measures the metadata plane, which is what must stay flat."""
    root = tempfile.mkdtemp(prefix="probe18-append-")
    try:
        t = ManifestTable(root)
        t._publish(synth_manifest(50))
        times = []
        for k in range(n_appends):
            m = t._read_manifest()
            fresh, stats, meta = [], {}, {}
            for j in range(files_per):
                name = hashlib.md5(
                    f"a-{k}-{j}".encode()
                ).hexdigest() + ".parquet"
                h = int(hashlib.md5(name.encode()).hexdigest()[:8], 16)
                fresh.append(name)
                uid = h % 100_000
                stats[name] = {"user_id": [uid, uid + 100]}
                meta[name] = {"bytes": 1_000_000, "rows": 10_000}
            new = {
                "version": m["version"] + 1,
                "files": m["files"] + fresh,
                "deltas": m.get("deltas", []),
                "key_columns": m.get("key_columns"),
                "batch_ids": m["batch_ids"] + [f"ap-{k}"],
                "stats": {**m.get("stats", {}), **stats},
                "filemeta": {**m.get("filemeta", {}), **meta},
                **t._carry_meta(m),
                **t._carry_mapping(m),
            }
            if m.get("schema") is not None:
                new["schema"] = m["schema"]
            t0 = time.perf_counter()
            t._publish(new)
            times.append((time.perf_counter() - t0) * 1000)
        kinds = {
            t._load_record(v).get("kind")
            for v in range(2, t.version() + 1)
        }
        head = sum(times[5:25]) / 20
        tail = sum(times[-20:]) / 20
        return {
            "n_appends": n_appends,
            "head_ms_per_append": round(head, 2),
            "tail_ms_per_append": round(tail, 2),
            "tail_over_head": round(tail / head, 2) if head else None,
            "kinds": sorted(kinds),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    out = {
        "gen_prune_1e3": probe_gen_prune(1_000),
        "gen_prune_1e5": probe_gen_prune(100_000),
        "append_flat": probe_append_flat(),
    }
    print(json.dumps(out, indent=2))
