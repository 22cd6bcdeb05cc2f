"""Property-based differential tests of the keyed-sink merge semantics.

Hypothesis generates adversarial small inputs (key collisions inside
one load, empty updates, disjoint/overlapping key sets); each Spark
merge result must equal a pure-Python reference model of the documented
semantics (last-writer-wins by order column, update-only never inserts,
delete removes exactly the distinct key set).  This is the same
differential method as the DuckDB oracle harness, aimed at the sink
layer where the reference's behavior was implicit in Postgres
(ref: /root/reference/pypeline/Pype.py:97-130, 179-186).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pypeline_spark.sinks.keyed import delete_by_keys, update_only, upsert

SCHEMA = "id long, name string, val long, seq long"

# rows collide on a tiny key space on purpose; seq is made unique
# per-update-load so last-writer-wins is well-defined
row = st.tuples(
    st.integers(0, 5),
    st.sampled_from(["a", "b", "c"]),
    st.integers(-100, 100),
)
target_rows = st.lists(row, max_size=8, unique_by=lambda r: r[0])
update_rows = st.lists(row, max_size=8)

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _with_seq(rows):
    return [(k, n, v, i) for i, (k, n, v) in enumerate(rows)]


def _df(spark, rows):
    return spark.createDataFrame(_with_seq(rows), SCHEMA)


def _model_last_writer(rows):
    """Reference model: highest seq per key wins."""
    best = {}
    for k, n, v, s in _with_seq(rows):
        if k not in best or s > best[k][3]:
            best[k] = (k, n, v, s)
    return best


class TestUpsertProperties:
    @PROP_SETTINGS
    @given(t=target_rows, u=update_rows)
    def test_matches_reference_model(self, spark, t, u):
        got = {
            r.id: (r.id, r.name, r.val, r.seq)
            for r in upsert(_df(spark, t), _df(spark, u), ["id"], order_col="seq").collect()
        }
        model = {k: r for k, r in _model_last_writer(t).items()}
        model.update(_model_last_writer(u))
        assert got == model

    @PROP_SETTINGS
    @given(t=target_rows, u=update_rows)
    def test_idempotent(self, spark, t, u):
        once = upsert(_df(spark, t), _df(spark, u), ["id"], order_col="seq")
        twice = upsert(once, _df(spark, u), ["id"], order_col="seq")
        as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
        assert as_set(once) == as_set(twice)


class TestUpdateOnlyProperties:
    @PROP_SETTINGS
    @given(t=target_rows, u=update_rows)
    def test_never_inserts_and_updates_matched(self, spark, t, u):
        got = {
            r.id: (r.name, r.val)
            for r in update_only(
                _df(spark, t), _df(spark, u), ["id"], order_col="seq"
            ).collect()
        }
        t_model = _model_last_writer(t)
        u_model = _model_last_writer(u)
        assert set(got) == set(t_model)  # key set unchanged: no inserts
        for k in t_model:
            if k in u_model:
                assert got[k] == (u_model[k][1], u_model[k][2])
            else:
                assert got[k] == (t_model[k][1], t_model[k][2])


class TestDeleteProperties:
    @PROP_SETTINGS
    @given(t=target_rows, keys=st.lists(st.integers(0, 5), max_size=10))
    def test_removes_exactly_matching_keys(self, spark, t, keys):
        keys_df = spark.createDataFrame([(k,) for k in keys] or [(None,)], "id long")
        got = {r.id for r in delete_by_keys(_df(spark, t), keys_df, "id").collect()}
        assert got == {k for (k, _, _) in t} - set(keys)


class TestScd2Properties:
    """SCD2 invariants under random batch sequences: exactly one
    current version per live key, closed versions chain without overlap
    (valid_to of version i == valid_from of version i+1), and history
    rows are never rewritten by later batches."""

    @PROP_SETTINGS
    @given(
        batches=st.lists(
            st.lists(
                st.tuples(st.integers(0, 3), st.integers(-50, 50)),
                max_size=4,
                unique_by=lambda r: r[0],
            ),
            min_size=1,
            max_size=3,
        )
    )
    def test_invariants_over_batch_sequence(self, spark, batches):
        from pyspark.sql import functions as F

        from pypeline_spark.sinks.history import scd2_apply

        hist = spark.createDataFrame(
            [], "id long, val long, valid_from date, valid_to date, is_current boolean"
        )
        for day, rows in enumerate(batches, start=1):
            as_of = f"2024-01-{day:02d}"
            batch = spark.createDataFrame(
                [(k, v, as_of) for k, v in rows], "id long, val long, as_of string"
            ).withColumn("as_of", F.col("as_of").cast("date"))
            hist = scd2_apply(hist, batch, ["id"], ["val"])

        collected = hist.collect()
        by_key = {}
        for r in collected:
            by_key.setdefault(r.id, []).append(r)
        ever_seen = {k for rows in batches for (k, _) in rows}
        assert set(by_key) == ever_seen
        for k, versions in by_key.items():
            current = [r for r in versions if r.is_current]
            assert len(current) == 1, f"key {k}: {len(current)} current rows"
            assert current[0].valid_to is None
            ordered = sorted(versions, key=lambda r: r.valid_from)
            for a, b in zip(ordered, ordered[1:]):
                assert a.valid_to == b.valid_from, f"key {k}: gap/overlap"
            # consecutive versions must differ (no-op batches add nothing)
            for a, b in zip(ordered, ordered[1:]):
                assert a.val != b.val
