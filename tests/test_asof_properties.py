"""Property-based differential tests of the as-of join family against
pandas ``merge_asof`` — the de-facto reference semantics for backward /
forward / nearest-with-tolerance joins.  Hypothesis generates small
adversarial event streams (ties, empty sides, out-of-tolerance gaps);
the Spark window-fill formulation must match pandas' sorted-merge
answer event for event.  Same differential method as the DuckDB
oracle harness, aimed at the operator family whose semantics are
easiest to get subtly wrong (tie direction, tolerance inclusivity)."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window as W
from pyspark.sql import functions as F

PROP_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# one user stream: (second offsets, kinds); ts ties across kinds allowed
events = st.lists(
    st.tuples(st.integers(0, 120), st.sampled_from(["view", "purchase"])),
    min_size=1,
    max_size=14,
)

TOL = 30  # seconds


def _frames(rows):
    """pandas view/purchase frames with synthetic event ids breaking
    ts ties deterministically (same tie-break the operators use)."""
    base = pd.Timestamp("2024-01-01")
    rows = sorted(((s, k) for s, k in rows))
    recs = [
        {"event_id": i, "ts": base + pd.Timedelta(seconds=s), "kind": k}
        for i, (s, k) in enumerate(rows)
    ]
    df = pd.DataFrame(recs)
    return df[df.kind == "view"], df[df.kind == "purchase"]


def _spark_nearest(spark, rows):
    """The q_asof_nearest formulation on one generated stream."""
    base = pd.Timestamp("2024-01-01")
    data = [
        (i, (base + pd.Timedelta(seconds=s)).to_pydatetime(), k)
        for i, (s, k) in enumerate(sorted(rows))
    ]
    e = spark.createDataFrame(data, "event_id long, ts timestamp, kind string")
    tagged = e.withColumn(
        "view_ts", F.when(F.col("kind") == "view", F.col("ts"))
    )
    order = ["ts", "event_id"]
    back = W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    fwd = W.orderBy(*order).rowsBetween(W.currentRow, W.unboundedFollowing)
    filled = tagged.withColumn("prev_view_ts", F.max("view_ts").over(back)).withColumn(
        "next_view_ts", F.min("view_ts").over(fwd)
    )
    scored = filled.filter(F.col("kind") == "purchase").select(
        "event_id",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp("prev_view_ts")).alias("back_secs"),
        (F.unix_timestamp("next_view_ts") - F.unix_timestamp("ts")).alias("fwd_secs"),
        "prev_view_ts",
        "next_view_ts",
    )
    back_ok = F.col("back_secs").isNotNull() & (F.col("back_secs") <= TOL)
    back_wins = back_ok & (
        F.col("fwd_secs").isNull()
        | (F.col("back_secs") <= F.col("fwd_secs"))
        | (F.col("fwd_secs") > TOL)
    )
    fwd_ok = F.col("fwd_secs").isNotNull() & (F.col("fwd_secs") <= TOL)
    out = scored.select(
        "event_id",
        F.when(back_wins, F.col("prev_view_ts"))
        .when(fwd_ok, F.col("next_view_ts"))
        .alias("nearest_view_ts"),
    )
    return {r.event_id: r.nearest_view_ts for r in out.collect()}


class TestNearestAsofMatchesPandas:
    @PROP_SETTINGS
    @given(rows=events)
    def test_matches_merge_asof_nearest(self, spark, rows):
        views, purchases = _frames(rows)
        got = _spark_nearest(spark, rows)
        if purchases.empty:
            assert got == {}
            return
        if views.empty:
            assert all(v is None for v in got.values())
            return
        merged = pd.merge_asof(
            purchases.sort_values("ts"),
            views.sort_values("ts")[["ts"]].rename(columns={"ts": "view_ts"}),
            left_on="ts",
            right_on="view_ts",
            direction="nearest",
            tolerance=pd.Timedelta(seconds=TOL),
        )
        for _, row in merged.iterrows():
            want = None if pd.isna(row.view_ts) else row.view_ts.to_pydatetime()
            have = got[row.event_id]
            if want is None:
                assert have is None, (row.event_id, have)
            else:
                # pandas nearest breaks exact-distance ties FORWARD in
                # some versions; our contract is backward-wins.  Accept
                # either side only when the two distances are equal.
                assert have is not None, (row.event_id, want)
                d_have = abs((have - row.ts.to_pydatetime()).total_seconds())
                d_want = abs((want - row.ts.to_pydatetime()).total_seconds())
                assert d_have == d_want, (row.event_id, have, want)
