"""Streaming complex-event-processing (CEP): the pattern state machine.

The batch window formulations (`operators/behavior.py::q_pattern_match`
/ `q_pattern_var`) cover fixed lookaheads and one Kleene star; this is
the escalation path they document — an explicit per-key automaton in
``applyInPandasWithState`` that recognizes ``view (click)* purchase``
over an UNBOUNDED stream, state bounded at one in-flight candidate per
user.

Why the automaton is that small: a strict-contiguity match admits only
clicks between its endpoints, so matches can never overlap and a
single-candidate automaton is complete — on ``view`` start a candidate
(restarting any stale one), on ``click`` extend it, on ``purchase``
emit-and-clear, on anything else clear.  Parity with the batch
formulation across real micro-batches is pinned in
tests/test_stream_cep.py.

Same hard-won stream semantics as streaming/stateful.py: the operator
sees late rows (applyInPandasWithState does not pre-filter them), so
behind-watermark rows are dropped explicitly, and the per-batch fold
sorts by (ts, event_id) — the repo's canonical event order.
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

from pypeline_spark.session import load_table
from pypeline_spark.streaming import await_finished

MATCH_OUTPUT = (
    "user_id bigint, view_id bigint, purchase_id bigint, n_clicks bigint"
)
# candidate: (view_id, n_clicks); stage is implicit (exists = in-flight)
CAND_STATE = "view_id bigint, n_clicks bigint"


def _pattern_automaton(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    out = {"user_id": [], "view_id": [], "purchase_id": [], "n_clicks": []}
    cand = tuple(state.get) if state.exists else None
    rows = []
    for pdf in pdfs:
        rows.extend(
            zip(
                (int(v) for v in pdf["ts_us"]),
                (int(v) for v in pdf["event_id"]),
                pdf["event_type"],
            )
        )
    wm_us = state.getCurrentWatermarkMs() * 1000
    rows = sorted(r for r in rows if r[0] > wm_us)
    for _ts, eid, etype in rows:
        if etype == "view":
            cand = (eid, 0)  # restart; a stale candidate is dead anyway
        elif etype == "click":
            if cand is not None:
                cand = (cand[0], cand[1] + 1)
        elif etype == "purchase":
            if cand is not None:
                out["user_id"].append(key[0])
                out["view_id"].append(cand[0])
                out["purchase_id"].append(eid)
                out["n_clicks"].append(cand[1])
                cand = None
        else:  # any other type breaks contiguity
            cand = None
    if cand is None:
        state.remove() if state.exists else None
    else:
        state.update(cand)
    yield pd.DataFrame(out)


def pattern_stream(events_stream: DataFrame) -> DataFrame:
    """view (click)* purchase matches over a watermarked stream."""
    prepared = events_stream.withWatermark("ts", "0 seconds").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "event_type", "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _pattern_automaton,
        outputStructType=MATCH_OUTPUT,
        stateStructType=CAND_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_pattern_stream(
    spark: SparkSession, sf_dir: str, n_batches: int = 3
) -> DataFrame:
    """Drive the automaton through real micro-batches; return every
    emitted match."""
    src_dir = os.path.join(tempfile.gettempdir(), f"ev_cep_{uuid.uuid4().hex}")
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    from pyspark.sql import Window as _W

    ranked = events.withColumn(
        "__b", F.ntile(n_batches).over(_W.orderBy("ts", "event_id")) - 1
    )
    for b in range(n_batches):
        (
            ranked.filter(F.col("__b") == b)
            .drop("__b")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src_dir, f"f={b}"))
        )
    schema = spark.read.parquet(os.path.join(src_dir, "f=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src_dir, "f=*"))
    )
    name = f"cep_{uuid.uuid4().hex[:8]}"
    q = (
        pattern_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    result = spark.table(name)
    shutil.rmtree(src_dir, ignore_errors=True)
    return result
