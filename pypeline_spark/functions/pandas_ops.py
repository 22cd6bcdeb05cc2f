r"""Arrow-path operators: scalar pandas UDF and applyInPandas grouped
custom operators, each differentially tested against a SQL oracle.

The reference's whole transform surface is a row-at-a-time Python map
(ref: /root/reference/pypeline/Pype.py:51-52).  The Spark equivalent of
"arbitrary Python over rows" is the Arrow batch path — scalar
``pandas_udf`` for per-row expressions, ``applyInPandas`` for per-group
stateful logic — which keeps data vectorized end-to-end (no per-row
pickling).  These two operators exist to *differentially verify the
Arrow path itself*: each has an equivalent pure-SQL oracle, so the
harness proves the UDF surface computes exactly what the declarative
form computes (the pipeline layer then trusts that surface for
transformers that are NOT SQL-expressible).

Scale notes: a scalar pandas UDF ships one Arrow batch per ~10k rows —
per-row overhead is amortized but each batch crosses the JVM/Python
boundary once, so the hot path should stay in built-ins whenever the
expression is expressible (see functions/text.py for the native twins).
applyInPandas shuffles by the group key and materializes ONE GROUP AT A
TIME in pandas — group cardinality must be high (user_id: millions) and
per-group size bounded (one user's events fit in memory); a skewed
group would need pre-splitting by a salt + re-merge.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

SESSION_GAP_MIN = 10


def _ws_token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over an Arrow batch."""
    return text.str.strip().str.split(r"\s+", regex=True).str.len().astype("int32")


def ws_token_count():
    """Built lazily: pandas_udf parses its DDL return type against the
    active session, so the decorator can't run at import time."""
    return pandas_udf(_ws_token_count, "int")


@query(
    "q_udf_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens
    FROM documents
    """,
)
def q_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF token count — same semantics as the native
    q_token_count n_ws column, computed through Arrow instead of
    Catalyst, so the harness differentially verifies the UDF path."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", ws_token_count()(F.col("text")).alias("n_tokens"))


#: target decoded bytes of events per pandas group when the caller
#: derives the bucket count from the backing file size (r20): one
#: Arrow round trip then carries a few thousand rows instead of one
#: user's handful, while each group stays a bounded fraction of a task.
SESSION_BUCKET_BYTES = 4 * 1024 * 1024


def sessionize_pandas(
    events: DataFrame,
    gap_min: int = SESSION_GAP_MIN,
    n_buckets: int | None = None,
) -> DataFrame:
    """Custom grouped sessionization via applyInPandas.

    The imperative twin of the native ``session_window`` plan
    (streaming/windows.py): one shuffle keyed by a deterministic hash
    bucket of user_id, then pure pandas gaps-and-islands over every
    user in the bucket.  This is the (b)-tier pattern from the build
    brief — how an operator Spark *didn't* have would be built — kept
    here because its output is byte-identical to the native one and
    the oracle proves it.

    Grouping by ``pmod(xxhash64(user_id), n_buckets)`` instead of by
    user_id (r20, guide §4.1/§4.2): applyInPandas pays a fixed
    JVM↔Python Arrow round trip PER GROUP, and per-user groups hold a
    handful of rows, so the fixture paid ~1500 round trips for
    milliseconds of numpy work.  All users of a bucket sessionize in
    ONE pandas call (user_id joins the lexsort key and a user-change
    starts a session), so the call count drops to ``n_buckets`` while
    results stay identical for ANY bucket count — session boundaries
    are per-user by construction.  Default bucket count is
    2×defaultParallelism; callers with a known input size pass
    ``n_buckets`` sized so a group stays a bounded fraction of a task
    (q_sessionize_pandas derives it from the backing file size, so at
    warehouse scale groups stay ~SESSION_BUCKET_BYTES and never
    concentrate the corpus into a few giant pandas frames).
    """
    import numpy as np

    gap_td = np.timedelta64(gap_min, "m")

    def _sessions(pdf: pd.DataFrame) -> pd.DataFrame:
        # Vectorized gaps-and-islands on numpy arrays, many users per
        # call.  The numpy formulation replaces sort_values + diff +
        # groupby (five aggregate passes and an intermediate frame per
        # call) with one lexsort and reduceat slices (r19); a session
        # starts at a user change OR a gap above the threshold (r20).
        ts = pdf["ts"].to_numpy()
        uid = pdf["user_id"].to_numpy()
        order = np.lexsort((pdf["event_id"].to_numpy(), ts, uid))
        ts = ts[order]
        uid = uid[order]
        # NaN -> 0 keeps pandas' skipna SUM semantics under reduceat
        val = np.nan_to_num(pdf["value"].to_numpy()[order])
        new = np.empty(len(ts), dtype=bool)
        new[0] = True
        np.greater(np.diff(ts), gap_td, out=new[1:])
        np.logical_or(new[1:], uid[1:] != uid[:-1], out=new[1:])
        starts_idx = np.flatnonzero(new)
        ends_idx = np.r_[starts_idx[1:] - 1, len(ts) - 1]
        return pd.DataFrame(
            {
                "session_start": ts[starts_idx],
                "session_end": ts[ends_idx] + gap_td,
                "user_id": uid[starts_idx],
                "n_events": np.diff(np.r_[starts_idx, len(ts)]),
                "session_value": np.round(np.add.reduceat(val, starts_idx), 2),
            }
        )

    schema = (
        "session_start timestamp, session_end timestamp, "
        "user_id bigint, n_events bigint, session_value double"
    )
    # Explicit repartition by the group key: AQE would coalesce the
    # small shuffle to 1-2 partitions, serializing every pandas group
    # onto a couple of Python workers — per-GROUP overhead, not bytes,
    # is the cost driver of applyInPandas (measured 7.3s -> <1s here).
    # An explicit numbered repartition is exempt from AQE coalescing
    # and satisfies the groupBy's distribution, so no second shuffle.
    par = events.sparkSession.sparkContext.defaultParallelism
    if n_buckets is None:
        n_buckets = 2 * par
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(n_buckets))
    return (
        events.select("user_id", "ts", "event_id", "value")
        .withColumn("__bucket", bucket)
        .repartition(par, "__bucket")
        .groupBy("__bucket")
        .applyInPandas(_sessions, schema)
    )


@query(
    "q_sessionize_pandas",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL {SESSION_GAP_MIN} MINUTE OR
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_sessionize_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas sessionization (10-minute gap) — oracle-checked
    against the same gaps-and-islands SQL as the native q_session, so
    native window, custom pandas operator, and DuckDB all agree.

    Bucket count derives from the backing file size (scale-adaptive,
    like ``session.scan_parallelism``): ~SESSION_BUCKET_BYTES of
    events per pandas group, floored at 2×defaultParallelism so small
    fixtures still spread over every core.  Results are bucket-count-
    independent (sessionization is per-user)."""
    import os

    spark_par = spark.sparkContext.defaultParallelism
    try:
        size = os.path.getsize(os.path.join(sf_dir, "events.parquet"))
    except OSError:
        size = 0
    n_buckets = max(2 * spark_par, size // SESSION_BUCKET_BYTES)
    return sessionize_pandas(
        load_table(spark, sf_dir, "events"), n_buckets=n_buckets
    )


@query(
    "q_sessionize_sql",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           -- CAST: DuckDB's windowed SUM(int) yields HUGEINT, which
           -- pandas materializes as float64 and the driver canon hashes
           -- differently from Spark's int64 (r2-r4 red row)
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_no
    FROM flagged
    """,
)
def q_sessionize_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session labels in pure JVM SQL (gaps-and-islands:
    lag -> new-session flag -> running sum), the scale-preferred twin
    of the applyInPandas sessionizer for when the *per-event* label is
    needed rather than the per-session rollup.

    Scale: one shuffle keyed by user_id serves both window passes
    (Catalyst reuses the partitioning for lag and the running sum);
    zero Python — whole-stage codegen end to end.

    Output carries ``ts_us`` (epoch micros) rather than the raw
    timestamp: events.ts is TIMESTAMP(NANOS) in the file, Spark reads
    at µs and DuckDB at ns, so a raw-ts column can never value-hash
    across engines (driver red in r2) — both sides truncate to µs
    explicitly instead.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            # microsecond precision: a seconds-truncating cast would
            # misclassify gaps within 1s of the threshold
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > SESSION_GAP_MIN * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_no"),
    )


@query(
    "q_capped_running",
    # Floored running balance is a NON-ASSOCIATIVE scan — max(0, prev +
    # delta) — so no window frame can express it: partial sums can't be
    # combined once the floor clips.  This is category (b) of the
    # custom-operator policy: applyInPandas per key, with a recursive
    # CTE as the row-by-row oracle (same replay technique as
    # q_pack_sequences).
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT user_id, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 100) AS BIGINT)
                    ELSE -CAST(ROUND(value * 100) AS BIGINT) END AS delta,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
        WHERE event_type IN ('purchase', 'error')
    ),
    bal AS (
        SELECT user_id, event_id, rn, GREATEST(delta, 0) AS balance_cents
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.event_id, s.rn,
               GREATEST(b.balance_cents + s.delta, 0)
        FROM bal b JOIN seq s ON s.user_id = b.user_id AND s.rn = b.rn + 1
    )
    SELECT user_id, event_id, CAST(balance_cents AS BIGINT) AS balance_cents
    FROM bal
    """,
)
def q_capped_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floored running balance per user (credits from purchases, debits
    from errors, never below zero) — the inventory/wallet semantics
    whose floor makes the scan NON-ASSOCIATIVE: clipped partial sums
    cannot be merged, so no window frame or two-phase aggregate can
    express it.

    Scale: applyInPandas per user — one user-keyed shuffle, then a
    vectorizable linear fold per group (numpy loop over the group's
    rows; each group is one Arrow batch).  This is the documented
    escalation path when Catalyst's operator algebra runs out: key-
    partition the non-associative scan so each sequential fold is
    small, exactly like pack-within-shard.  Integer cents keep the
    fold exact, so the recursive-CTE oracle replays it bit-for-bit.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    delta = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100).cast("bigint"),
    ).otherwise(-F.round(F.col("value") * 100).cast("bigint"))
    seq = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        delta.alias("delta"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        bal = 0
        out = []
        for d in pdf["delta"]:
            bal = max(bal + int(d), 0)
            out.append(bal)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "balance_cents": out,
            }
        )

    return seq.groupBy("user_id").applyInPandas(
        fold, schema="user_id bigint, event_id bigint, balance_cents bigint"
    )
