"""Local differential harness: run every registry query on Spark and its
oracle on DuckDB, compare row count + column names + order-insensitive
value multiset.  Mirrors the driver's t2 gate so failures surface before
a round ends.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pypeline_spark.registry import load_all
from pypeline_spark.session import TABLES, get_spark


def normalize(rows, cols):
    """Sorted-column, order-insensitive canonical form with float rounding."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    cases = load_all()
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, case in sorted(cases.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = case.builder(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {exc}")
            continue
        if case.oracle is None:
            n_rows_only += 1
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(case.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(exc).__name__}: {exc}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sn, on = normalize(srows, scols), normalize(orows, ocols)
            if sn != on:
                diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            n_pass += 1
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} failed")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
