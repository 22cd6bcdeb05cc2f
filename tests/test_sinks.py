"""Keyed-sink merge semantics on toy tables (SURVEY.md §5): duplicate
keys within one load, excluded fields, delete dedup, idempotence."""

import pytest

from pypeline_spark.sinks.keyed import (
    ParquetCatalog,
    delete_by_keys,
    update_only,
    upsert,
)


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, val double"
    )


class TestUpsert:
    def test_insert_and_update(self, spark, target):
        updates = spark.createDataFrame(
            [(2, "B", 200.0), (4, "d", 40.0)], "id long, name string, val double"
        )
        out = {r.id: r for r in upsert(target, updates, ["id"]).collect()}
        assert set(out) == {1, 2, 3, 4}
        assert out[2].name == "B" and out[2].val == 200.0
        assert out[4].name == "d"
        assert out[1].name == "a"

    def test_duplicate_keys_last_writer_wins_by_order_col(self, spark, target):
        # the reference inherits Postgres ON CONFLICT arrival order; we
        # pin an explicit deterministic rule (SURVEY.md §7 hard part 1)
        updates = spark.createDataFrame(
            [(2, "first", 1.0, 1), (2, "second", 2.0, 2)],
            "id long, name string, val double, seq int",
        )
        out = upsert(
            target, updates.select("id", "name", "val", "seq"), ["id"], order_col="seq"
        )
        row = {r.id: r for r in out.select("id", "name", "val").collect()}[2]
        assert row.name == "second"

    def test_excluded_fields_keep_target_values(self, spark, target):
        updates = spark.createDataFrame(
            [(2, "B", 200.0), (4, "d", 40.0)], "id long, name string, val double"
        )
        out = {
            r.id: r
            for r in upsert(
                target, updates, ["id"], fields_excluded_from_update=["val"]
            ).collect()
        }
        assert out[2].name == "B"
        assert out[2].val == 20.0  # kept target value
        assert out[4].val == 40.0  # insert takes the new value

    def test_excluded_field_null_in_target_survives(self, spark):
        # a matched target row whose excluded column is NULL keeps the
        # NULL — coalesce would let the update overwrite it (ref:
        # Pype.py:132-143 omits the field from the SET list entirely)
        target = spark.createDataFrame(
            [(1, "a", None), (2, "b", 20.0)], "id long, name string, val double"
        )
        updates = spark.createDataFrame(
            [(1, "A", 111.0), (3, "c", 33.0)], "id long, name string, val double"
        )
        out = {
            r.id: r
            for r in upsert(
                target, updates, ["id"], fields_excluded_from_update=["val"]
            ).collect()
        }
        assert out[1].name == "A" and out[1].val is None  # target NULL kept
        assert out[3].val == 33.0  # insert takes the new value

    def test_idempotent(self, spark, target):
        updates = spark.createDataFrame([(2, "B", 200.0)], "id long, name string, val double")
        once = upsert(target, updates, ["id"])
        twice = upsert(once, updates, ["id"])
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


class TestUpdateOnly:
    def test_no_inserts(self, spark, target):
        updates = spark.createDataFrame(
            [(2, "B", 200.0), (9, "ghost", 0.0)], "id long, name string, val double"
        )
        out = {r.id: r for r in update_only(target, updates, ["id"]).collect()}
        assert set(out) == {1, 2, 3}
        assert out[2].name == "B"

    def test_matched_update_writes_null(self, spark, target):
        # UPDATE ... SET f=records.f writes a legitimate NULL (ref:
        # Pype.py:119-130); coalesce(u.c, t.c) would silently keep t.c
        updates = spark.createDataFrame(
            [(2, None, None)], "id long, name string, val double"
        )
        out = {r.id: r for r in update_only(target, updates, ["id"]).collect()}
        assert out[2].name is None and out[2].val is None
        assert out[1].name == "a"  # unmatched rows untouched

    def test_partial_column_updates(self, spark, target):
        # updates missing a column: untouched columns keep target values
        updates = spark.createDataFrame([(3, 300.0)], "id long, val double")
        out = {r.id: r for r in update_only(target, updates, ["id"]).collect()}
        assert out[3].val == 300.0 and out[3].name == "c"


class TestDelete:
    def test_delete_with_duplicate_keys(self, spark, target):
        # duplicate + unmatched identifiers (set-dedup at ref Pype.py:184)
        keys = spark.createDataFrame([(2,), (2,), (99,)], "id long")
        out = delete_by_keys(target, keys, "id")
        assert sorted(r.id for r in out.collect()) == [1, 3]


class TestParquetCatalog:
    def test_read_modify_write_swap(self, spark, target, tmp_path):
        cat = ParquetCatalog(str(tmp_path / "db"))
        cat.put("t", target)
        updates = spark.createDataFrame([(1, "A", 100.0)], "id long, name string, val double")
        # new value reads the old files — the tmp-swap must not corrupt
        cat.put("t", upsert(cat.get("t"), updates, ["id"]))
        out = {r.id: r for r in cat.get("t").collect()}
        assert out[1].name == "A" and set(out) == {1, 2, 3}


class TestScd2:
    KEYS = ["id"]
    TRACKED = ["val"]

    def _hist(self, spark):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            [(1, 10.0, "2023-01-01", None, True), (2, 20.0, "2023-01-01", None, True)],
            "id long, val double, valid_from string, valid_to string, is_current boolean",
        ).select(
            "id", "val",
            F.col("valid_from").cast("date"),
            F.col("valid_to").cast("date"),
            "is_current",
        )

    def _batch(self, spark, rows):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            rows, "id long, val double, as_of string"
        ).withColumn("as_of", F.col("as_of").cast("date"))

    def test_change_closes_and_opens_version(self, spark):
        from pypeline_spark.sinks.history import scd2_apply

        out = scd2_apply(
            self._hist(spark),
            self._batch(spark, [(1, 11.0, "2024-01-01")]),
            self.KEYS,
            self.TRACKED,
        )
        rows = {(r.id, r.is_current): r for r in out.collect()}
        assert len(rows) == 3
        closed = rows[(1, False)]
        assert closed.val == 10.0 and str(closed.valid_to) == "2024-01-01"
        opened = rows[(1, True)]
        assert opened.val == 11.0 and str(opened.valid_from) == "2024-01-01"
        assert rows[(2, True)].val == 20.0  # untouched key

    def test_rerun_is_idempotent(self, spark):
        from pypeline_spark.sinks.history import scd2_apply

        batch = self._batch(spark, [(1, 11.0, "2024-01-01"), (3, 30.0, "2024-01-01")])
        once = scd2_apply(self._hist(spark), batch, self.KEYS, self.TRACKED)
        twice = scd2_apply(once, batch, self.KEYS, self.TRACKED)
        canon = lambda df: sorted(map(tuple, df.collect()))
        assert canon(once) == canon(twice)

    def test_version_chain_across_batches(self, spark):
        from pypeline_spark.sinks.history import scd2_apply

        h1 = scd2_apply(
            self._hist(spark),
            self._batch(spark, [(1, 11.0, "2024-01-01")]),
            self.KEYS,
            self.TRACKED,
        )
        h2 = scd2_apply(
            h1, self._batch(spark, [(1, 12.0, "2024-06-01")]), self.KEYS, self.TRACKED
        )
        versions = sorted(
            ((r.val, str(r.valid_from), r.valid_to and str(r.valid_to), r.is_current)
             for r in h2.filter("id = 1").collect()),
            key=lambda t: t[1],
        )
        assert versions == [
            (10.0, "2023-01-01", "2024-01-01", False),
            (11.0, "2024-01-01", "2024-06-01", False),
            (12.0, "2024-06-01", None, True),
        ]


class TestLakehouseBinding:
    def test_merge_spec_construction_without_delta(self):
        # the merge-spec logic is pure and testable without Delta jars
        from pypeline_spark.sinks.lakehouse import merge_key_condition, update_set_map

        assert merge_key_condition(["id", "ver"]) == "t.id = u.id AND t.ver = u.ver"
        m = update_set_map(
            ["id", "name", "val", "seg"], ["id"], fields_excluded_from_update=["seg"]
        )
        # excluded column OMITTED from SET (target NULL survives a match)
        assert m == {"name": "u.name", "val": "u.val"}

    def test_delta_merge_round_trip(self, spark, target, tmp_path):
        from pypeline_spark.sinks.lakehouse import DeltaCatalog

        if not DeltaCatalog.available():
            pytest.skip("delta-spark not installed in this environment")
        cat = DeltaCatalog(str(tmp_path / "delta"))
        cat.put("t", target)
        updates = spark.createDataFrame(
            [(2, "B", 200.0), (4, "d", 40.0)], "id long, name string, val double"
        )
        cat.merge_upsert("t", updates, ["id"])
        out = {r.id: r for r in cat.get("t").collect()}
        assert set(out) == {1, 2, 3, 4} and out[2].name == "B"
