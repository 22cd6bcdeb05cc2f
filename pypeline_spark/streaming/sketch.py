"""Streaming Count-Min Sketch via applyInPandasWithState.

The streaming face of `operators/stats.py::q_heavy_hitters_cms`: the
d x w counter grid is the STATE, keyed by (row, bucket) — each event
increments d counters, state is bounded at d*w keys regardless of the
keyspace being counted, and the grid after the last micro-batch equals
the batch-built grid exactly (integer additions commute across batch
boundaries).  That equality is what the parity test pins; the batch
twin `q_cms_users` carries the DuckDB oracle.

This is the shape for "how often does key X occur" over an unbounded
stream when the key space outgrows memory: the alternative — a
per-key stateful count — holds |keys| state rows and dies first on a
hot shuffle, then on the state store.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pypeline_spark.operators.stats import CMS_D, _cms_bucket
from pypeline_spark.registry import query
from pypeline_spark.session import load_table
from pypeline_spark.streaming import await_finished

CMS_STREAM_W = 64  # narrower than the batch bigram sketch: |users| ~ 1e3
CMS_TOP = 10

COUNTER_OUTPUT = "r int, b int, total bigint"
COUNTER_STATE = "total bigint"


def _update_counter(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Add this batch's increments for one (row, bucket) cell."""
    total = state.get[0] if state.exists else 0
    for pdf in pdfs:
        total += int(len(pdf))
    state.update((total,))
    yield pd.DataFrame({"r": [key[0]], "b": [key[1]], "total": [total]})


def cms_cell_rows(df: DataFrame, key_col: str, w: int = CMS_STREAM_W) -> DataFrame:
    """(r, b) — one row per event per sketch row, the map-side explode
    that turns any keyed stream into bounded-state counter updates."""
    parts = [
        df.select(
            F.lit(r).cast("int").alias("r"),
            _cms_bucket(r, F.col(key_col), buckets=w).cast("int").alias("b"),
        )
        for r in range(CMS_D)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cms_counters_stream(stream: DataFrame, key_col: str) -> DataFrame:
    """Streaming CMS grid: state = one bigint per (row, bucket)."""
    return (
        cms_cell_rows(stream, key_col)
        .groupBy("r", "b")
        .applyInPandasWithState(
            _update_counter,
            outputStructType=COUNTER_OUTPUT,
            stateStructType=COUNTER_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_cms_stream(spark: SparkSession, sf_dir: str, n_batches: int = 3) -> DataFrame:
    """Drive the streaming sketch through real micro-batches; return the
    final (r, b, total) grid."""
    src_dir = os.path.join(tempfile.gettempdir(), f"ev_cms_{uuid.uuid4().hex}")
    events = load_table(spark, sf_dir, "events")
    (
        events.select("user_id", "ts")
        .repartitionByRange(n_batches, "ts")
        .write.mode("overwrite")
        .parquet(src_dir)
    )
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    name = f"cms_{uuid.uuid4().hex[:8]}"
    q = (
        cms_counters_stream(stream, "user_id")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    updates = spark.table(name)
    # update mode re-emits a cell on every batch that touches it; the
    # counter is monotone, so max(total) is the final value
    grid = updates.groupBy("r", "b").agg(F.max("total").alias("total"))
    shutil.rmtree(src_dir, ignore_errors=True)
    return grid


def _cms_users_oracle() -> str:
    from pypeline_spark.operators.stats import _cms_bucket_sql

    def bucket(r: int, col: str) -> str:
        return _cms_bucket_sql(r, col).replace("% 128", f"% {CMS_STREAM_W}")

    counters = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, {bucket(r, 'CAST(user_id AS VARCHAR)')} AS b, "
        f"COUNT(*) AS total FROM events GROUP BY b"
        for r in range(CMS_D)
    )
    lookups = ", ".join(
        f"(SELECT total FROM counters WHERE r = {r} "
        f"AND b = {bucket(r, 'CAST(top.user_id AS VARCHAR)')})"
        for r in range(CMS_D)
    )
    return f"""
    WITH counters AS (
        {counters}
    ),
    top AS (
        SELECT user_id, COUNT(*) AS n FROM events
        GROUP BY user_id ORDER BY n DESC, user_id LIMIT {CMS_TOP}
    )
    SELECT top.user_id, CAST(top.n AS BIGINT) AS true_cnt,
           CAST(LEAST({lookups}) AS BIGINT) AS cms_cnt,
           CAST(LEAST({lookups}) - top.n AS BIGINT) AS overest
    FROM top
    """


@query("q_cms_users", oracle=_cms_users_oracle())
def q_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming CMS: heavy-hitter users with exact
    counts and their 4 x 64 sketch estimates (the grid the streaming
    operator maintains incrementally — equality across the two builds
    is pinned in tests/test_stream_sketch.py)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))
    top = counts.orderBy(F.col("n").desc(), "user_id").limit(CMS_TOP)
    key = F.col("user_id").cast("string")
    out = top
    for r in range(CMS_D):
        counter = (
            e.groupBy(
                _cms_bucket(r, key, buckets=CMS_STREAM_W).alias(f"b{r}")
            ).agg(F.count("*").cast("bigint").alias(f"total{r}"))
        )
        out = out.withColumn(f"__b{r}", _cms_bucket(r, key, buckets=CMS_STREAM_W)).join(
            F.broadcast(counter), F.col(f"__b{r}") == F.col(f"b{r}")
        )
    est = F.least(*[F.col(f"total{r}") for r in range(CMS_D)])
    return out.select(
        "user_id",
        F.col("n").alias("true_cnt"),
        est.alias("cms_cnt"),
        (est - F.col("n")).alias("overest"),
    )
