"""Generation-expression file pruning (r18 directive #5): a predicate
on a declared generated column prunes through the SOURCE column's
stats and vice versa, for the recognized monotone forms (date
truncations, year, affine arithmetic) and the modulo-bucket residue
proof — with the hypothesis property pinning pruned read ≡ full read +
filter and scalar/vectorized keep-set equality."""

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pypeline_spark.session import load_events, load_table
from pypeline_spark.sinks.manifest import ManifestTable


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def gen_table(spark, sf_dir, tmp_path_factory):
    """Events with generated event_date = CAST(ts AS DATE), ehour =
    date_trunc HOUR, eyear = year(ts), cents = amount affine, bucket =
    user_id % 8; seeded range-partitioned on ts (narrow per-file ts
    envelopes), then appended with files carrying ONLY generated-column
    stats (the mixed-stats direction)."""
    ev = load_events(spark, sf_dir).select("event_id", "ts", "user_id")
    t = ManifestTable(str(tmp_path_factory.mktemp("gp") / "t"))
    t.commit_overwrite(
        ev.repartitionByRange(8, "ts"),
        batch_id="seed",
        stats_cols=["ts", "user_id"],
    )
    t.evolve_schema(
        "event_date date, ehour timestamp, eyear int, "
        "uid2 bigint, bucket bigint",
        batch_id="ev",
        generated={
            "event_date": "CAST(ts AS DATE)",
            "ehour": "date_trunc('HOUR', ts)",
            "eyear": "year(ts)",
            "uid2": "user_id * 3",
            "bucket": "user_id % 8",
        },
    )
    # post-add filesets: generated columns materialized at write, and
    # their stats cover ONLY the generated columns — a SOURCE-column
    # predicate must prune these files through the derived proofs.
    # a1 is time-partitioned (event_date/ehour/eyear stats), a2 is
    # uid-partitioned (uid2/bucket stats).
    t.commit_append(
        ev.withColumn("event_id", F.col("event_id") + 1_000_000)
        .repartitionByRange(4, "ts"),
        batch_id="a1",
        stats_cols=["event_date", "ehour", "eyear"],
    )
    t.commit_append(
        ev.withColumn("event_id", F.col("event_id") + 2_000_000)
        .repartitionByRange(4, "user_id"),
        batch_id="a2",
        stats_cols=["uid2", "bucket"],
    )
    return t


class TestForms:
    def test_parsing(self):
        m = {
            "generated_columns": {
                "d": "CAST(ts AS DATE)",
                "d2": "to_date(ts)",
                "h": "date_trunc('HOUR', ts)",
                "y": "year(ts)",
                "a1": "k + 10",
                "a2": "k - 2.5",
                "a3": "k * 4",
                "a4": "100 + k",
                "b": "k % 16",
                "b2": "pmod(k, 16)",
                "nope": "concat(a, b)",
                "neg": "k * 0",  # non-positive multiplier: no proof
            }
        }
        forms = ManifestTable._gen_forms(m)
        assert forms["d"] == ("ts", "date", None)
        assert forms["d2"] == ("ts", "date", None)
        assert forms["h"] == ("ts", "trunc", "HOUR")
        assert forms["y"] == ("ts", "year", None)
        assert forms["a1"] == ("k", "affine", ("+", 10.0))
        assert forms["a3"] == ("k", "affine", ("*", 4.0))
        assert forms["a4"] == ("k", "affine", ("+", 100.0))
        assert forms["b"] == ("k", "mod", 16)
        assert forms["b2"] == ("k", "mod", 16)
        assert "nope" not in forms and "neg" not in forms

    def test_apply_monotone(self):
        ap = ManifestTable._gen_apply
        assert ap("date", None, "2024-03-05 11:22:33.123456") == "2024-03-05"
        assert ap(
            "trunc", "HOUR", "2024-03-05 11:22:33"
        ) == "2024-03-05 11:00:00"
        assert ap(
            "trunc", "MONTH", "2024-03-05 11:22:33"
        ) == "2024-03-01 00:00:00"
        assert ap("year", None, "2024-03-05") == 2024
        assert ap("affine", ("*", 4.0), 10) == 40.0
        assert ap("date", None, None) is None
        assert ap("date", None, 42) is None  # unmappable: no proof
        d = datetime.datetime(2024, 3, 5, 11, 0, 7)
        assert ap("date", None, d) == "2024-03-05"


class TestPruning:
    def test_generated_pred_prunes_via_source_stats(self, spark, gen_table):
        lo = hi = datetime.date(2024, 1, 2)
        keep, total = gen_table.prune_plan_multi({"event_date": (lo, hi)})
        assert len(keep) < total  # seed files pruned via ts stats
        pruned = gen_table.read_pruned_multi(
            spark, {"event_date": (lo, hi)}
        )
        full = gen_table.read(spark).filter(
            (F.col("event_date") >= F.lit(lo))
            & (F.col("event_date") <= F.lit(hi))
        )
        assert _canon(pruned) == _canon(full)

    def test_source_pred_prunes_via_generated_stats(self, spark, gen_table):
        lo = datetime.datetime(2024, 1, 2, 0, 0, 0)
        hi = datetime.datetime(2024, 1, 2, 11, 59, 59)
        keep, total = gen_table.prune_plan_multi({"ts": (lo, hi)})
        assert len(keep) < total
        # the a1 fileset carries NO ts stats — only the derived
        # event_date/ehour proofs can have pruned its files
        m = gen_table._read_manifest()
        appended = [
            f for f in m["files"]
            if "ts" not in m["stats"].get(f, {})
            and "event_date" in m["stats"].get(f, {})
        ]
        assert appended and any(f not in keep for f in appended)
        pruned = gen_table.read_pruned_multi(spark, {"ts": (lo, hi)})
        full = gen_table.read(spark).filter(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
        )
        assert _canon(pruned) == _canon(full)

    def test_year_and_trunc_and_affine(self, spark, gen_table):
        keep, total = gen_table.prune_plan_multi({"eyear": (2025, 2030)})
        # fixture events are all 2024: every file with ANY time proof
        # (ts stats or eyear stats) is pruned; only the a2 fileset
        # (uid-partitioned, no time stats at all) survives — the
        # conservative unknown-keeps rule
        m = gen_table._read_manifest()
        assert keep == [
            f for f in m["files"]
            if not ({"ts", "eyear"} & set(m["stats"].get(f, {})))
        ]
        h = datetime.datetime(2024, 1, 2, 7, 0, 0)
        keep, total = gen_table.prune_plan_multi({"ehour": (h, h)})
        assert len(keep) < total
        pruned = gen_table.read_pruned_multi(spark, {"ehour": (h, h)})
        full = gen_table.read(spark).filter(F.col("ehour") == F.lit(h))
        assert _canon(pruned) == _canon(full)
        # affine: uid2 = user_id * 3; seed files have user_id stats,
        # appended files have uid2 stats — both directions prune
        keep, total = gen_table.prune_plan_multi({"uid2": (0, 30)})
        assert len(keep) < total
        pruned = gen_table.read_pruned_multi(spark, {"uid2": (0, 30)})
        full = gen_table.read(spark).filter(F.col("uid2").between(0, 30))
        assert _canon(pruned) == _canon(full)
        keep, total = gen_table.prune_plan_multi({"user_id": (0, 10)})
        assert len(keep) < total

    def test_mod_bucket_equality(self, spark, gen_table):
        """The appended fileset is range-partitioned on user_id, so
        narrow per-file user_id spans prove residue absence; file
        skipping must still be exact."""
        keep, total = gen_table.prune_plan_multi({"bucket": (3, 3)})
        pruned = gen_table.read_pruned_multi(spark, {"bucket": (3, 3)})
        full = gen_table.read(spark).filter(F.col("bucket") == 3)
        assert _canon(pruned) == _canon(full)
        # range probes on a mod bucket prove nothing (kept all): the
        # conservative rule
        keep2, total2 = gen_table.prune_plan_multi({"bucket": (2, 5)})
        assert len(keep2) == total2

    def test_scalar_vectorized_keep_sets_match(self, gen_table, monkeypatch):
        cases = [
            {"uid2": (0, 30)},
            {"bucket": (3, 3)},
            {"user_id": (0, 10)},
            {"eyear": (2024, 2024)},
            {"event_date": (datetime.date(2024, 1, 2),
                            datetime.date(2024, 1, 3))},
        ]
        vec = [gen_table.prune_plan_multi(b) for b in cases]
        monkeypatch.setattr(
            ManifestTable, "_prune_mask", lambda self, m, b: None
        )
        gen_table._prune_idx.clear()
        scal = [gen_table.prune_plan_multi(b) for b in cases]
        assert vec == scal

    def test_timestamp_stats_recorded(self, gen_table):
        """Regression: manifest writes use TIMESTAMP_MICROS so ts
        stats exist (INT96 carries no footer min/max) and are ISO
        strings ordered like the values."""
        m = gen_table._read_manifest()
        seeded = [f for f in m["files"] if "ts" in m["stats"].get(f, {})]
        assert seeded
        lo, hi = m["stats"][seeded[0]]["ts"]
        assert isinstance(lo, str) and lo <= hi and "+" not in lo


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lo_day=st.integers(min_value=1, max_value=4),
    span=st.integers(min_value=0, max_value=2),
    bucket=st.integers(min_value=0, max_value=7),
    uid_lo=st.integers(min_value=0, max_value=160),
    uid_span=st.integers(min_value=0, max_value=40),
)
def test_property_pruned_read_equals_filtered_full_read(
    spark, gen_table, lo_day, span, bucket, uid_lo, uid_span
):
    """The Done criterion: for arbitrary bounds over generated AND
    source columns, the pruned read is exactly the full read +
    filter."""
    lo = datetime.date(2024, 1, lo_day)
    hi = datetime.date(2024, 1, min(lo_day + span, 6))
    bounds = {
        "event_date": (lo, hi),
        "bucket": (bucket, bucket),
        "uid2": (uid_lo * 3, (uid_lo + uid_span) * 3),
    }
    pruned = gen_table.read_pruned_multi(spark, bounds)
    full = gen_table.read(spark)
    for col, (blo, bhi) in bounds.items():
        full = full.filter(
            (F.col(col) >= F.lit(blo)) & (F.col(col) <= F.lit(bhi))
        )
    assert _canon(pruned) == _canon(full)
