"""Capture .explain("formatted") for registry queries.

Usage:
    python tools/capture_plans.py <out_dir> [names...]   # default: bench HEADLINE
    python tools/capture_plans.py <out_dir> --all        # every registered query

Writes <out_dir>/<name>_<tag>.txt (tag from $PLAN_TAG, default "before").
Also prints a one-line smell summary per query: #Exchange, join strategies,
Python-eval nodes, cartesian products, scans without pushed filters.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pypeline_spark.registry import load_all
from pypeline_spark.session import get_spark


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


SMELLS = (
    ("Exchange", r"\bExchange\b"),
    ("SMJ", r"SortMergeJoin"),
    ("BHJ", r"BroadcastHashJoin"),
    ("SHJ", r"ShuffledHashJoin"),
    ("BNLJ", r"BroadcastNestedLoopJoin"),
    ("CartesianProduct", r"CartesianProduct"),
    ("BatchEvalPython", r"BatchEvalPython"),
    ("ArrowEvalPython", r"ArrowEvalPython"),
    ("MapInPandas", r"MapInPandas|FlatMapGroupsInPandas|MapInArrow"),
    ("Sort", r"\bSort\b"),
    ("Window", r"\bWindow\b"),
)


def main() -> None:
    out_dir = sys.argv[1]
    os.makedirs(out_dir, exist_ok=True)
    tag = os.environ.get("PLAN_TAG", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cases = load_all()
    if len(sys.argv) > 2 and sys.argv[2] == "--all":
        names = list(cases)
    elif len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import bench

        names = bench.HEADLINE
    spark = get_spark("plan_capture")
    for name in names:
        try:
            df = cases[name].builder(spark, sf_dir)
            txt = plan_text(df)
        except Exception as exc:  # builder with side effects may need tmp dirs
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        counts = {label: len(re.findall(pat, txt)) for label, pat in SMELLS}
        summary = " ".join(f"{k}={v}" for k, v in counts.items() if v)
        nofilter = "PushedFilters: []" in txt
        print(f"{name}: {summary}{' NO_PUSHDOWN' if nofilter else ''}")


if __name__ == "__main__":
    main()
