"""Empirical scaling probe: time representative queries at three scale
factors (sf0.001 / sf0.01 / sf0.1 — 100x data spread) and report the
growth exponent alpha where t ~ data^alpha.

    python tools/scale_probe.py [query ...]

alpha <= ~1 means linear-or-better scaling (partition-parallel work,
partial aggregation); alpha >> 1 flags an operator whose cost curve
will not survive the jump to warehouse scale even if it is fast today.
Fixed per-query overhead (planning, session) dominates the smallest SF,
so alpha is computed from the sf0.01 -> sf0.1 leg.  One warm-up run at
the smallest SF excludes JVM/codegen warm-up from every measurement.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pypeline_spark.registry import load_all
from pypeline_spark.session import get_spark

SF_DIRS = {
    0.001: "/root/testdata/sf0.001",
    0.01: "/root/testdata/sf0.01",
    0.1: "/root/testdata/sf0.1",
}

# one representative per cost family (scan, shuffle-agg, fact join,
# window, dedup tiers, vector search, pipeline, spans, sketch)
DEFAULT_QUERIES = [
    "q_agg_pricing",
    "q_join_multi",
    "q_window_topn",
    "q_range_join",
    "q_dedup_minhash",
    "q_topk_cosine",
    "q_corpus_pipeline",
    "q_span_dedup",
    "q_heavy_hitters_cms",
    "q_product_profit",
    "q_waiting_orders",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    cases = load_all()
    spark = get_spark("scale_probe")
    report = {}
    for name in names:
        case = cases[name]
        case.builder(spark, SF_DIRS[0.001]).count()  # warm-up
        times = {}
        for sf, d in SF_DIRS.items():
            t0 = time.time()
            case.builder(spark, d).count()
            times[sf] = round(time.time() - t0, 3)
        # growth exponent over the clean decade (0.01 -> 0.1)
        import math

        alpha = math.log(max(times[0.1], 1e-3) / max(times[0.01], 1e-3)) / math.log(10)
        report[name] = {"secs": times, "alpha": round(alpha, 2)}
        print(
            f"{name:24s} sf0.001={times[0.001]:6.2f}s sf0.01={times[0.01]:6.2f}s "
            f"sf0.1={times[0.1]:6.2f}s alpha={alpha:5.2f}"
        )
    print(json.dumps({q: r["alpha"] for q, r in report.items()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
