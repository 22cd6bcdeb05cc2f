"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 pricing summary — the
direct analogue of a pypeline ``extract_query``) on sf0.001.
``queries()`` / ``oracle_sql()`` re-export the pypeline_spark registry:
one entry per implemented operator from SURVEY.md §2, each paired with a
DuckDB-runnable ANSI-SQL oracle (or None => rows-only check for
non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pypeline_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    cases = load_all()
    return cases["q_agg_pricing"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: case.builder for name, case in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys => rows-only check."""
    return {name: case.oracle for name, case in load_all().items() if case.oracle is not None}
