"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a (uri, byte_range) pointer when blobs live in
object storage), metadata is a typed struct, and decode/feature steps
are Arrow-batched ``mapInPandas`` stages so bytes never round-trip
through Python row objects one at a time.  Partitioning: payload tables
are range-partitioned by id and written with small row groups so a
decode stage's input splits stay under executor memory.

The decode step itself is STUBBED here — codec libraries (PIL/ffmpeg)
aren't in this container — behind ``decode_image``: a clearly-marked
deterministic fake (header-derived pseudo-dimensions) with the real
plumbing (schema, batching, UDF signature) fully exercised; swap the
body for a real codec in deployment.  The fixture payloads are derived
from the documents table (utf-8 bytes), keeping the harness
self-contained.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

DECODED_SCHEMA = (
    "doc_id bigint, byte_len int, header string, fake_width int, fake_height int"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct) — the canonical
    multimodal layout: opaque bytes + typed metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_image(df: DataFrame) -> DataFrame:
    """STUB decode stage over mapInPandas (Arrow-batched).

    Real deployment: replace the body with PIL/libvips decode returning
    (width, height, channels, thumbnail bytes).  The fake is
    deterministic — pseudo-dimensions derived from payload length and
    first bytes — so tests pin the plumbing: batch iteration, binary
    handling, schema contract.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int32"),
                    "header": payloads.map(lambda b: bytes(b[:4]).hex()),
                    "fake_width": payloads.map(lambda b: 16 + len(b) % 64).astype("int32"),
                    "fake_height": payloads.map(lambda b: 16 + (len(b) // 64) % 64).astype(
                        "int32"
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: slice the payload at a fixed stride —
    stand-in for video frame extraction; shows byte-range ops staying
    JVM-side (substring on binary), no Python in the loop."""
    n_frames = (F.length("payload") / every_n_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    return df.select(
        "doc_id",
        F.posexplode(
            F.transform(idx, lambda i: F.substring(F.col("payload"), i * every_n_bytes + 1, 8))
        ).alias("frame_no", "frame_bytes"),
    )


N_FEATURE_BINS = 16


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: payload bytes -> L1-normalized
    16-bin byte histogram as ``array<float>``.

    Unlike ``decode_image`` this stage is NOT a stub — a byte histogram
    is a real (if simple) content feature needing no codec.  It pins
    the production shape of every media featurizer: binary in, fixed-
    width float vector out, numpy vectorized per Arrow batch, rows
    never crossing Python one at a time.  Swap the histogram for a CNN/
    CLIP embedding call and nothing else changes.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=N_FEATURE_BINS).astype("float32")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(run, schema="doc_id bigint, features array<float>")


@query("q_feature_extract", oracle=None)  # Python featurizer: rows-only + pytest parity
def q_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram features for every payload (the media featurizer
    plumbing; numpy-parity and shape pinned in tests/test_llm_ops.py)."""
    d = load_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(d))


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS byte_len,
           source AS origin, 'text/plain' AS mime
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata access, JVM-side (octet length, struct
    fields) — the non-stubbed half of the multimodal surface."""
    d = load_table(spark, sf_dir, "documents")
    p = attach_payload(d)
    return p.select(
        "doc_id",
        F.length("payload").cast("int").alias("byte_len"),
        F.col("meta.origin").alias("origin"),
        F.col("meta.mime").alias("mime"),
    )


@query("q_multimodal_decode", oracle=None)  # stubbed decode: rows-only + pytest
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full decode pipeline through mapInPandas (stub codec)."""
    d = load_table(spark, sf_dir, "documents")
    return decode_image(attach_payload(d))


@query(
    "q_frame_sample",
    # DuckDB can't byte-slice BLOBs; the fixture text is pure ASCII
    # (verified: octet_length(encode(text)) == length(text) at every
    # SF), so character slicing of the varchar is byte-equivalent.
    oracle="""
    WITH f AS (
        SELECT doc_id, text,
               unnest(generate_series(
                   0, greatest(octet_length(encode(text)) // 64 - 1, 0)
               )) AS frame_no
        FROM documents
    )
    SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
           hex(encode(substring(text, frame_no * 64 + 1, 8))) AS frame_hex
    FROM f
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride byte-range sampling over the binary payload (the
    video-frame-extraction plumbing), fully JVM-side; frames emitted as
    hex strings so the comparison is engine-portable."""
    d = load_table(spark, sf_dir, "documents")
    frames = frame_sample(attach_payload(d))
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        F.upper(F.hex(F.col("frame_bytes"))).alias("frame_hex"),
    )
