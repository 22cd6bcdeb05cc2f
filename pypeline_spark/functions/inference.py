r"""Batch model inference over embedding columns: the mapInPandas
scoring harness a training-data pipeline uses for model-based quality
filtering (fastText/logreg gates, reward-model scores, classifier
labels) at corpus scale.

The deliverable is the *plumbing*: Arrow-batched iterator transform,
model weights shipped once per executor (a closure here; a real
deployment broadcasts the artifact or loads it in ``func.__init__``
per worker), vectorized numpy scoring inside the batch loop, and a
typed output schema.  The "model" itself is a deterministic integer
linear probe — md5-derived weights, floor-quantized inputs, bigint
accumulation — so the whole path is exactly replayable in SQL and the
harness is HASH-CHECKED, unlike a float model whose summation order
would differ across engines (same determinism-by-integers move as the
LSH signatures).

Scale: scoring is map-side only — zero shuffles; throughput is
governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (batch
size trades Python-call overhead against executor memory) and Arrow
transfer, which beats row-at-a-time Python UDFs by 10-100x.  At
100 TB this is the shape of every GPU/CPU scoring pass; swapping the
probe for a real forward pass changes only the numpy line.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

INF_DIM = 64  # fixture embedding width
INF_SCALE = 1024  # floor(x * 2^10): exact for doubles, matches LSH quantization


def _probe_weights() -> list[int]:
    """Content-addressed pseudo-random weights in [-1000, 1000] —
    identical in every engine and rerun, no RNG state."""
    return [
        int(hashlib.md5(f"probe_{i}".encode()).hexdigest()[:15], 16) % 2001 - 1000
        for i in range(INF_DIM)
    ]


def score_batches(corpus: DataFrame) -> DataFrame:
    """(vec_id, logit, pred): integer linear probe via mapInPandas."""
    import numpy as np

    w = np.array(_probe_weights(), dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy())  # (batch, dim) float
            q = np.floor(x.astype(np.float64) * INF_SCALE).astype(np.int64)
            logits = q @ w  # exact bigint math
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "logit": logits,
                    "pred": logits >= 0,
                }
            )

    return corpus.mapInPandas(run, schema="vec_id bigint, logit bigint, pred boolean")


def _inference_oracle() -> str:
    w = "[" + ", ".join(str(v) for v in _probe_weights()) + "]"
    return f"""
    SELECT vec_id,
           CAST(list_sum(list_transform(range(1, {INF_DIM + 1}), i ->
                CAST(floor(CAST(embedding[i] AS DOUBLE) * {INF_SCALE}) AS BIGINT)
                * ({w})[i])) AS BIGINT) AS logit,
           list_sum(list_transform(range(1, {INF_DIM + 1}), i ->
                CAST(floor(CAST(embedding[i] AS DOUBLE) * {INF_SCALE}) AS BIGINT)
                * ({w})[i])) >= 0 AS pred
    FROM embeddings
    """


@query("q_batch_inference", oracle=_inference_oracle())
def q_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched model scoring over every embedding: integer
    linear probe through the mapInPandas inference harness,
    hash-checked against the DuckDB replay of the same quantized dot
    product."""
    e = load_table(spark, sf_dir, "embeddings")
    return score_batches(e.select("vec_id", "embedding"))
