"""r19 optimization internals: the scan_parallelism guard and the
vectorized applyInPandas sessionizer.

The guard must fire only in the under-split-scan regime (it would be a
pure pessimization to repartition a wide fact scan), and the numpy
sessionizer must keep the exact pandas semantics it replaced — ordering
ties, null values skipped by SUM, single-event sessions.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pypeline_spark.functions.pandas_ops import sessionize_pandas
from pypeline_spark.session import load_table, scan_parallelism


class TestScanParallelism:
    def test_fires_on_undersplit_fixture(self, spark, sf_dir):
        # the fixture is one single-row-group file well under
        # maxPartitionBytes * cores: the guard must return the full width
        assert (
            scan_parallelism(spark, sf_dir, "lineitem")
            == spark.sparkContext.defaultParallelism
        )

    def test_off_when_scan_is_wide(self, spark, sf_dir):
        # shrink maxPartitionBytes so the same file counts as >= cores
        # splits — the warehouse-scale regime — and the guard must turn off
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
            assert scan_parallelism(spark, sf_dir, "lineitem") == 0
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    def test_off_for_missing_backing_file(self, spark, sf_dir):
        # unknown/directory-backed tables can't be sized: treat as wide
        assert scan_parallelism(spark, sf_dir, "no_such_table") == 0

    def test_repartitioned_plan_still_matches_plain(self, spark, sf_dir):
        # the guarded repartition must never change results (here: the
        # headline aggregate, guard on vs forced off)
        from pypeline_spark.registry import load_all

        cases = load_all()
        on = cases["q_agg_pricing"].builder(spark, sf_dir).collect()
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
            off = cases["q_agg_pricing"].builder(spark, sf_dir).collect()
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        assert sorted(map(tuple, on)) == sorted(map(tuple, off))


class TestFixtureRelationMemo:
    def test_repeat_reads_return_memoized_relation(self, spark, sf_dir):
        from pypeline_spark.session import _read_parquet
        import os

        path = os.path.join(sf_dir, "lineitem.parquet")
        _read_parquet(spark, path)  # may be the inference (first) read
        a = _read_parquet(spark, path)
        b = _read_parquet(spark, path)
        assert a is b  # same relation object: no re-resolution
        # metadata-plane only: the memoized relation still computes
        assert a.limit(1).count() == 1

    def test_purge_drops_stopped_sessions(self):
        from pypeline_spark.session import _purge_stopped_sessions

        class FakeCtx:
            _jsc = None  # the stopped-session signature

        class FakeSession:
            _sc = FakeCtx()

        memo = {FakeSession(): {"p": "df"}}
        _purge_stopped_sessions(memo)
        assert memo == {}


class TestVectorizedSessionizer:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id bigint, event_id bigint, ts timestamp, value double"
        )

    def test_null_values_skipped_like_pandas_sum(self, spark):
        t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, 1, t0, 2.0),
            (1, 2, t0 + datetime.timedelta(minutes=1), None),  # inside session
            (1, 3, t0 + datetime.timedelta(minutes=2), 3.0),
            (2, 4, t0, None),  # a session whose only value is null
        ]
        out = {
            (r.user_id, r.n_events): r.session_value
            for r in sessionize_pandas(self._events(spark, rows)).collect()
        }
        assert out[(1, 3)] == 5.0  # null skipped, not poisoning the sum
        assert out[(2, 1)] == 0.0  # all-null session sums to 0.0 (pandas skipna)

    def test_gap_split_boundary_and_singletons(self, spark):
        t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (7, 1, t0, 1.0),
            (7, 2, t0 + datetime.timedelta(minutes=10), 1.0),  # == gap: same session
            (7, 3, t0 + datetime.timedelta(minutes=20, seconds=1), 1.0),  # > gap: new
        ]
        got = sorted(
            (r.n_events, r.session_start, r.session_end)
            for r in sessionize_pandas(self._events(spark, rows)).collect()
        )
        assert [g[0] for g in got] == [1, 2]
        # session end = last event + gap
        assert got[1][2] == t0 + datetime.timedelta(minutes=20)

    def test_matches_native_session_window(self, spark, sf_dir):
        # byte-identical to the JVM session_window plan on the fixture —
        # the standing cross-check the numpy rewrite must preserve
        from pypeline_spark.streaming.windows import session_agg

        e = load_table(spark, sf_dir, "events")
        native = session_agg(e.select("user_id", "ts", "value")).collect()
        custom = sessionize_pandas(e).collect()
        key = lambda r: (r.user_id, r.session_start)  # noqa: E731
        ns = sorted(((r.user_id, r.session_start, r.session_end, r.n_events, r.session_value) for r in native))
        cs = sorted(((r.user_id, r.session_start, r.session_end, r.n_events, r.session_value) for r in custom))
        assert ns == cs

    def test_multi_user_single_bucket(self, spark):
        # r20 bucketed grouping: force EVERY user into one pandas group
        # (n_buckets=1) — user boundaries must still start new sessions
        # and per-user results must match the per-bucket default.
        t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, 1, t0, 1.0),
            (1, 2, t0 + datetime.timedelta(minutes=3), 2.0),
            # user 2's first event inside user 1's gap window: the
            # user change itself must open a session
            (2, 3, t0 + datetime.timedelta(minutes=4), 4.0),
            (2, 4, t0 + datetime.timedelta(minutes=30), 8.0),  # > gap: new
            (3, 5, t0, None),  # all-null singleton rides along
        ]
        e = self._events(spark, rows)
        key = lambda r: (  # noqa: E731
            r.user_id, r.session_start, r.session_end, r.n_events, r.session_value
        )
        one_bucket = sorted(map(key, sessionize_pandas(e, n_buckets=1).collect()))
        default = sorted(map(key, sessionize_pandas(e).collect()))
        assert one_bucket == default
        assert [(u, n, v) for u, _s, _e, n, v in one_bucket] == [
            (1, 2, 3.0),
            (2, 1, 4.0),
            (2, 1, 8.0),
            (3, 1, 0.0),
        ]

    def test_bucket_count_invariance(self, spark, sf_dir):
        # results must be identical for ANY bucket count (per-user
        # semantics can't leak across the grouping granularity)
        e = load_table(spark, sf_dir, "events")
        key = lambda r: (  # noqa: E731
            r.user_id, r.session_start, r.session_end, r.n_events, r.session_value
        )
        a = sorted(map(key, sessionize_pandas(e, n_buckets=3).collect()))
        b = sorted(map(key, sessionize_pandas(e, n_buckets=257).collect()))
        assert a == b
