"""Round-12 scale probes (r11 verdict directive #3c): wall-clock scaling
of the round's new/changed maintenance paths, recorded in SCALE.md.

1. q_manifest_optimize_zorder across sf0.001 / sf0.01 / sf0.1 — the
   scaling exponent (alpha) of the clustered-OPTIMIZE cert.
2. Filemeta-planned OPTIMIZE vs legacy counted OPTIMIZE at sf0.1 — the
   r11 zero-data-pass planning win, measured.
3. One bounded evolve_clustering step vs a full clustered OPTIMIZE at
   sf0.1 — rewrite-amplification bound in action.
4. commit_delta with vs without NDV tracking at sf0.1 — the O(batch)
   sketch overhead.
5. analyze() one-pass cost at sf0.1.

Usage: python tools/probe_r12.py   (prints one JSON line)
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

from pypeline_spark.registry import load_all  # noqa: E402
from pypeline_spark.session import get_spark, load_table  # noqa: E402
from pypeline_spark.sinks.manifest import ManifestTable  # noqa: E402

SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
}


def timeit(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 3), out


def orders2d(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )


def main():
    spark = get_spark()
    res: dict = {"load_avg_start": list(os.getloadavg())}

    # 1. clustered-OPTIMIZE cert scaling
    cases = load_all()
    q = cases["q_manifest_optimize_zorder"].builder
    alpha_pts = {}
    for tag, d in SF_DIRS.items():
        sec, df = timeit(lambda d=d: q(spark, d).collect())
        alpha_pts[tag] = sec
    res["optimize_zorder_sec"] = alpha_pts
    import math

    res["optimize_zorder_alpha"] = round(
        math.log(alpha_pts["sf0.1"] / alpha_pts["sf0.01"]) / math.log(10), 3
    )

    # 2. filemeta-planned vs counted OPTIMIZE at sf0.1
    o = orders2d(spark, SF_DIRS["sf0.1"])
    n = o.count()
    target = max(1, -(-n // 12))
    for mode in ("filemeta", "counted"):
        scratch = tempfile.mkdtemp(prefix=f"probe_opt_{mode}_")
        try:
            t = ManifestTable(scratch)
            t.commit_overwrite(o.repartition(24), batch_id="seed",
                               stats_cols=["o_custkey", "cents"])
            if mode == "counted":
                # strip filemeta rows: simulates a legacy manifest, which
                # forces the sizing count pass optimize() otherwise skips
                m = t._read_manifest()
                for f in m.get("filemeta", {}):
                    m["filemeta"][f].pop("rows", None)
                m["version"] += 1
                t._publish(m)
            sec, _ = timeit(
                lambda t=t: t.optimize(spark, target_rows=target,
                                       stats_cols=["o_custkey", "cents"])
            )
            res[f"optimize_{mode}_sec_sf0.1"] = sec
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    # 3. one evolution step vs full clustered OPTIMIZE at sf0.1
    for mode in ("evolve_step", "full_cluster"):
        scratch = tempfile.mkdtemp(prefix=f"probe_evo_{mode}_")
        try:
            t = ManifestTable(scratch)
            t.commit_overwrite(o.repartition(24), batch_id="seed",
                               stats_cols=["o_custkey", "cents"])
            if mode == "evolve_step":
                sec, out = timeit(
                    lambda t=t: t.evolve_clustering(
                        spark, ("o_custkey", "cents"), target_rows=target,
                        max_files_per_step=6,
                        stats_cols=["o_custkey", "cents"],
                    )
                )
                res["evolve_step_files"] = out[1]
            else:
                sec, _ = timeit(
                    lambda t=t: t.optimize(
                        spark, target_rows=target,
                        cluster_by=("o_custkey", "cents"),
                        stats_cols=["o_custkey", "cents"],
                    )
                )
            res[f"{mode}_sec_sf0.1"] = sec
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    # 4. delta-commit NDV overhead + 5. analyze cost at sf0.1
    c = load_table(spark, SF_DIRS["sf0.1"], "customer").select(
        "c_custkey", "c_acctbal"
    )
    batch = c.filter(F.col("c_custkey") % 5 == 0)
    for mode in ("plain", "ndv"):
        scratch = tempfile.mkdtemp(prefix=f"probe_ndv_{mode}_")
        try:
            t = ManifestTable(scratch)
            t.commit_overwrite(
                c, batch_id="seed",
                ndv_cols=["c_custkey"] if mode == "ndv" else None,
            )
            sec, _ = timeit(
                lambda t=t: t.commit_delta(batch, ["c_custkey"], batch_id="d1")
            )
            res[f"commit_delta_{mode}_sec_sf0.1"] = sec
            if mode == "ndv":
                sec2, _ = timeit(
                    lambda t=t: t.analyze(spark, ["c_custkey", "c_acctbal"],
                                          batch_id="an1")
                )
                res["analyze_sec_sf0.1"] = sec2
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    res["load_avg_end"] = list(os.getloadavg())
    print(json.dumps(res))


if __name__ == "__main__":
    main()
