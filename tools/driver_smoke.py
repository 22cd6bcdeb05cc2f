"""Driver-environment simulation: run the public __spark_entry__ surface
under a BARE SparkSession, the way the verify driver does.

The driver supplies its own session — none of get_spark's configs
(shuffle partitions, AQE, Arrow, nanosAsLong) exist there, and the
parquet read shapes can differ by Spark version (events.ts arrived as
long nanos in rounds 1-2 but TIMESTAMP_NTZ under 4.1.2 — the round-3
red row was exactly a builder assumption that only held under our own
session).  This script is the regression net for that class of bug:

- imports __spark_entry__.py by path in a fresh interpreter,
- builds a SparkSession with ONLY master + bind-address settings
  (deliberately no timezone: load_table must pin UTC itself),
- runs entry() plus a selectable set of queries() (default: the whole
  50-entry driver window),
- pushes each result through the driver-shaped pandas canon
  (sorted columns + sort_values) so unsortable output schemas crash
  here the way they crash there.

Usage: python tools/driver_smoke.py [sf_dir] [n_queries|all] [name ...]
Exit 0 = all ran and canonicalized; nonzero = first failure printed.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_arg = sys.argv[2] if len(sys.argv) > 2 else "50"
    only = sys.argv[3:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_smoke")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    res = mod.entry(spark)
    n = res.count()
    assert n >= 0 and res.schema.fields, "entry() must return rows with a schema"
    print(f"entry ok: {n} rows")

    qs = mod.queries()
    names = list(qs) if n_arg == "all" else list(qs)[: int(n_arg)]
    if only:
        names = only
    failed = []
    for name in names:
        try:
            pdf = qs[name](spark, sf_dir).toPandas()
            pdf = pdf[sorted(pdf.columns)]
            if len(pdf):
                pdf.sort_values(by=list(pdf.columns))  # driver canon shape
            print(f"ok    {name}: {len(pdf)} rows")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: {type(exc).__name__}: {str(exc).splitlines()[0][:200]}")
    print(f"\n{len(names) - len(failed)} ok, {len(failed)} failed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
