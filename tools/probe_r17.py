"""r17 scale probes.

Probe 1 (directive #3): columnar vs inline-JSON checkpoints at 1e5
synthetic files — checkpoint bytes, write time, and cold-materialize
time.  Per-file stats derive from the file NAME (deterministic but
per-file distinct), so the diff/replay machinery sees realistic
entropy rather than an enumeration artifact.

Probe 2 (directive #4): prune-planning cost at 1e3 vs 1e5 files —
the vectorized planner must stay near-flat per plan after its one-time
per-version index build, and produce the identical keep-set.

Usage: python tools/probe_r17.py
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
    files, stats, filemeta = [], {}, {}
    for i in range(n_files):
        name = hashlib.md5(f"file-{i}".encode()).hexdigest() + ".parquet"
        files.append(name)
        h = int(hashlib.md5(name.encode()).hexdigest()[:8], 16)
        lo = h % 1_000_000
        stats[name] = {
            "o_orderkey": [lo, lo + (h % 5_000)],
            "o_totalprice": [float(h % 90_000), float(h % 90_000) + 512.5],
        }
        filemeta[name] = {"bytes": 1_000_000 + h % 64_000_000, "rows": 50_000 + h % 9_999}
    return {
        "version": 1,
        "files": files,
        "deltas": [],
        "batch_ids": ["seed"],
        "stats": stats,
        "filemeta": filemeta,
        "key_columns": ["o_orderkey"],
    }


def probe_checkpoint(n_files: int) -> dict:
    out: dict = {"n_files": n_files}
    for mode, threshold in (("json", 10**9), ("columnar", 0)):
        root = tempfile.mkdtemp(prefix=f"probe17-{mode}-")
        prev = ManifestTable.SIDECAR_MIN_FILES
        ManifestTable.SIDECAR_MIN_FILES = threshold
        try:
            t = ManifestTable(root)
            m = synth_manifest(n_files)
            t0 = time.perf_counter()
            t._publish(m)
            w = time.perf_counter() - t0
            rec_sz = os.path.getsize(os.path.join(root, "_manifest.v1.json"))
            side_sz = sum(
                os.path.getsize(os.path.join(root, f))
                for f in os.listdir(root)
                if ".ckpt-" in f
            )
            # cold materialize: fresh instance, empty cache
            t2 = ManifestTable(root)
            t0 = time.perf_counter()
            got = t2._materialize(1)
            r = time.perf_counter() - t0
            assert got["files"] == m["files"] and got["stats"] == m["stats"]
            out[mode] = {
                "write_s": round(w, 3),
                "cold_materialize_s": round(r, 3),
                "record_bytes": rec_sz,
                "sidecar_bytes": side_sz,
                "total_bytes": rec_sz + side_sz,
            }
        finally:
            ManifestTable.SIDECAR_MIN_FILES = prev
            shutil.rmtree(root, ignore_errors=True)
    j, c = out["json"], out["columnar"]
    out["bytes_ratio"] = round(c["total_bytes"] / j["total_bytes"], 3)
    out["cold_read_ratio"] = round(
        c["cold_materialize_s"] / j["cold_materialize_s"], 3
    )
    return out


def probe_prune(n_files: int, n_plans: int = 20) -> dict:
    root = tempfile.mkdtemp(prefix="probe17-prune-")
    try:
        t = ManifestTable(root)
        m = synth_manifest(n_files)
        t._publish(m)
        mm = t._read_manifest()
        # warm one plan (includes any one-time per-version index build)
        t0 = time.perf_counter()
        keep0 = t.prune_plan("o_orderkey", 100_000, 140_000)[0]
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(n_plans):
            lo = (i * 37_000) % 900_000
            t.prune_plan("o_orderkey", lo, lo + 40_000)
        per_plan = (time.perf_counter() - t0) / n_plans
        # the r16 per-file Python loop, for comparison — and the
        # keep-sets must be IDENTICAL
        t0 = time.perf_counter()
        for i in range(n_plans):
            lo = (i * 37_000) % 900_000
            loop_keep = [
                f for f in mm["files"]
                if t._overlaps(mm, f, "o_orderkey", lo, lo + 40_000)
            ]
            vec_keep = t.prune_plan("o_orderkey", lo, lo + 40_000)[0]
            assert loop_keep == vec_keep
        loop_plan = (
            (time.perf_counter() - t0) / n_plans - per_plan
        )
        return {
            "n_files": n_files,
            "first_plan_s": round(first, 4),
            "warm_plan_s": round(per_plan, 5),
            "loop_plan_s": round(loop_plan, 5),
            "speedup": round(loop_plan / per_plan, 1),
            "kept_example": len(keep0),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    res = {
        "checkpoint_1e5": probe_checkpoint(100_000),
        "prune_1e3": probe_prune(1_000),
        "prune_1e5": probe_prune(100_000),
    }
    print(json.dumps(res, indent=2))
