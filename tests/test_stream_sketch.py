"""Streaming CMS parity: the counter grid maintained across real
micro-batches by applyInPandasWithState must equal the batch-built
grid EXACTLY (integer additions commute across batch boundaries), and
the estimates it yields must match the oracle-checked batch twin
q_cms_users."""

from pyspark.sql import functions as F

from pypeline_spark.operators.stats import CMS_D
from pypeline_spark.registry import load_all
from pypeline_spark.session import load_table
from pypeline_spark.streaming.sketch import (
    CMS_STREAM_W,
    cms_cell_rows,
    run_cms_stream,
)


def test_streaming_grid_equals_batch_grid(spark, sf_dir):
    stream_grid = {
        (r.r, r.b): r.total for r in run_cms_stream(spark, sf_dir, n_batches=3).collect()
    }
    events = load_table(spark, sf_dir, "events")
    batch_grid = {
        (r.r, r.b): r.total
        for r in cms_cell_rows(events, "user_id")
        .groupBy("r", "b")
        .agg(F.count("*").alias("total"))
        .collect()
    }
    assert stream_grid == batch_grid
    # sanity: every sketch row holds the full event count
    n_events = events.count()
    for r in range(CMS_D):
        assert sum(v for (rr, _), v in batch_grid.items() if rr == r) == n_events


def test_estimates_bound_true_counts(spark, sf_dir):
    rows = load_all()["q_cms_users"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_cnt >= r.true_cnt  # one-sided error
        assert r.overest == r.cms_cnt - r.true_cnt
        # 4 rows x 64 buckets over ~1e3 users: collisions exist but the
        # min-over-rows estimate stays within a small multiple
        assert r.cms_cnt <= r.true_cnt * 50
