"""r20 A/B: per-user applyInPandas groups (r19 shape) vs hash-bucketed
groups (r20).  Usage: python tools/exp_r20_sessionize.py [n] [sf_dir]"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from pypeline_spark.session import get_spark, load_table
from pypeline_spark.functions.pandas_ops import SESSION_GAP_MIN
from pypeline_spark.registry import load_all


def old_per_user(spark, sf_dir):
    import numpy as np

    gap_td = np.timedelta64(SESSION_GAP_MIN, "m")

    def _sessions(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["ts"].to_numpy()
        order = np.lexsort((pdf["event_id"].to_numpy(), ts))
        ts = ts[order]
        val = np.nan_to_num(pdf["value"].to_numpy()[order])
        new = np.empty(len(ts), dtype=bool)
        new[0] = True
        np.greater(np.diff(ts), gap_td, out=new[1:])
        starts_idx = np.flatnonzero(new)
        ends_idx = np.r_[starts_idx[1:] - 1, len(ts) - 1]
        return pd.DataFrame(
            {
                "session_start": ts[starts_idx],
                "session_end": ts[ends_idx] + gap_td,
                "user_id": pdf["user_id"].iloc[0],
                "n_events": np.diff(np.r_[starts_idx, len(ts)]),
                "session_value": np.round(np.add.reduceat(val, starts_idx), 2),
            }
        )

    schema = (
        "session_start timestamp, session_end timestamp, "
        "user_id bigint, n_events bigint, session_value double"
    )
    events = load_table(spark, sf_dir, "events")
    par = events.sparkSession.sparkContext.defaultParallelism
    return (
        events.select("user_id", "ts", "event_id", "value")
        .repartition(par, "user_id")
        .groupBy("user_id")
        .applyInPandas(_sessions, schema)
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("exp_r20_sessionize")
    cases = load_all()
    new_fn = cases["q_sessionize_pandas"].builder
    variants = {"old_per_user": old_per_user, "new_bucketed": new_fn}
    ref = None
    for name, fn in variants.items():
        rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        if ref is None:
            ref = rows
        else:
            print("identical:", rows == ref, f"({len(rows)} rows)")
    times = {k: [] for k in variants}
    for i in range(n):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
