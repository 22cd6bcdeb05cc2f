"""Local differential harness: run every registry query on Spark and its
oracle on DuckDB, compare row count + column names + order-insensitive
value multiset.  Mirrors the driver's t2 gate so failures surface before
a round ends.

The canonical form deliberately replicates the DRIVER's pandas-based
canonicalizer, which is STRICTER than a repr()-of-collected-rows compare
in two ways that produced invisible-locally red rows in round 2:

- both sides go through ``pandas.DataFrame.sort_values`` first — an
  array/map-typed output column raises ``TypeError: unhashable type``
  exactly like the driver's canon does (q_embedding_quantize r2);
- timestamps keep their native resolution (DuckDB returns datetime64[ns]
  for the TIMESTAMP(NANOS) events column, Spark µs), so emitting a raw
  ``events.ts`` column mismatches here exactly like it did on the driver
  (q_sessionize_sql r2).  Portable queries emit integer epoch micros.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
Set SPARK_GRAFT_BARE=1 to run the Spark side on a BARE SparkSession
(no repo configs) — the verify driver's environment; combined with the
strict canon this is a full offline replica of the driver's gate.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from pypeline_spark.registry import load_all
from pypeline_spark.session import TABLES, get_spark


def _cell(v) -> str:
    """One canonical string per value — DRIVER-STRICT: an integral
    float ('1.0') does NOT unify with an int ('1').  The old unification
    masked the HUGEINT oracle class for three rounds (DuckDB
    SUM(BIGINT)→HUGEINT→pandas float64 vs Spark int64 hashed
    differently on the driver while passing here — q_sessionize_sql
    r2-r4).  Oracles must CAST(... AS BIGINT) instead."""
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, (np.bool_, bool)):
        return "true" if v else "false"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(round(f, 6))
    if isinstance(v, pd.Timestamp):
        return str(v)  # keeps ns digits when present — driver-strict
    if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
        # Spark collects DATE as datetime.date; DuckDB's .df() returns
        # midnight datetime64 — unify (the driver's canon does; DATE
        # queries q_scd2/q_scalar_date were driver-green in r1/r2)
        return str(pd.Timestamp(v))
    if isinstance(v, dt.datetime):
        return str(pd.Timestamp(v))
    return repr(v)


def canon(pdf: pd.DataFrame) -> list[str]:
    """Driver-shaped canonical form: columns sorted by name, pandas
    sort_values over all columns (raises on unhashable cells, like the
    driver), then one normalized string per row, multiset-sorted."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    rows = [
        "|".join(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    cases = load_all()
    if os.environ.get("SPARK_GRAFT_BARE"):
        from pyspark.sql import SparkSession

        # SPARK_GRAFT_BARE_CPUS varies the parallelism for determinism
        # sweeps: a query whose output depends on partition order
        # (unsorted collect_list, underspecified row_number ties, ...)
        # hash-mismatches the oracle at SOME parallelism.
        cpus = os.environ.get("SPARK_GRAFT_BARE_CPUS", "8")
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("check_oracle_bare")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.host", "127.0.0.1")
            .config("spark.driver.bindAddress", "127.0.0.1")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
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
            spdf = sdf.toPandas()
            # canonicalize even rows-only queries: the driver does, and
            # an uncanonicalizable schema fails its weak check too
            sn = canon(spdf)
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark/canon error: {type(exc).__name__}: {exc}")
            continue
        if case.oracle is None:
            n_rows_only += 1
            print(f"rows  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            opdf = con.execute(case.oracle).df()
            on = canon(opdf)
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb/canon error: {type(exc).__name__}: {exc}")
            continue
        problems = []
        if sorted(scols) != sorted(opdf.columns):
            problems.append(
                f"cols spark={sorted(scols)} oracle={sorted(opdf.columns)}"
            )
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if not problems and sn != on:
            diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            problems.append(f"values differ, e.g. {diff}")
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            n_pass += 1
            print(f"ok    {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} failed")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
