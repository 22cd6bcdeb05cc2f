"""Identity columns (r18 directive #6 — the Delta IDENTITY shape):
``add_identity_column`` allocates monotone auto-increment values from
the row-tracking high-water mark at the publish choke point — values
derive as start + step * row_id, so they are collision-safe under OCC
retry, stable through every id-preserving write, and GENERATED ALWAYS
(no write path accepts explicit values)."""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.session import load_table
from pypeline_spark.sinks.manifest import ManifestTable


@pytest.fixture()
def cust(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )


def _identity_table(tmp_path, cust, name, hi=40, start=100, step=2):
    t = ManifestTable(str(tmp_path / name))
    t.commit_overwrite(
        cust.filter(F.col("c_custkey") <= hi).repartitionByRange(
            4, "c_custkey"
        ),
        batch_id="seed",
        stats_cols=["c_custkey"],
    )
    t.enable_row_tracking(batch_id="rt")
    t.add_identity_column(name="sk", start=start, step=step,
                          batch_id="idc")
    return t


def _sk(spark, t, version=None):
    return {r.c_custkey: r.sk for r in t.read(spark, version).collect()}


class TestIdentity:
    def test_values_dense_unique_and_derived(self, spark, tmp_path, cust):
        t = _identity_table(tmp_path, cust, "i1")
        sk = _sk(spark, t)
        assert len(sk) == 41
        assert len(set(sk.values())) == 41
        assert min(sk.values()) == 100  # start
        assert all((v - 100) % 2 == 0 for v in sk.values())  # step
        # sk == start + step * _row_id, by construction
        rows = t.read_rowids(spark).collect()
        assert all(r["sk"] == 100 + 2 * r["_row_id"] for r in rows)
        # negative step: descending identity
        t2 = _identity_table(tmp_path, cust, "i1n", hi=10, start=0,
                             step=-1)
        sk2 = _sk(spark, t2)
        assert len(set(sk2.values())) == 11 and max(sk2.values()) == 0

    def test_preconditions_and_guards(self, spark, tmp_path, cust):
        t = ManifestTable(str(tmp_path / "i2"))
        t.commit_overwrite(cust.filter(F.col("c_custkey") <= 5),
                           batch_id="seed")
        with pytest.raises(ValueError, match="row tracking"):
            t.add_identity_column("sk", batch_id="x")
        t.enable_row_tracking(batch_id="rt")
        with pytest.raises(ValueError, match="already exists"):
            t.add_identity_column("c_acctbal", batch_id="x2")
        with pytest.raises(ValueError, match="non-zero"):
            t.add_identity_column("sk", step=0, batch_id="x3")
        t.add_identity_column("sk", batch_id="ok")
        v = t.version()
        t.add_identity_column("sk", batch_id="ok2")  # idempotent
        assert t.version() == v
        # rename/drop of an identity column refused: on a row-tracked
        # table the mapping precondition already blocks both (mapping
        # and tracking are mutually exclusive); the IDENTITY guard in
        # _guard_constraint_refs is the belt-and-braces behind it
        with pytest.raises(ValueError, match="mapping|IDENTITY"):
            t.drop_column("sk", batch_id="d")
        with pytest.raises(ValueError, match="mapping|IDENTITY"):
            t.rename_column("sk", "sk2", batch_id="r")
        with pytest.raises(ValueError, match="IDENTITY"):
            t._guard_constraint_refs(
                t._read_manifest(), "sk", "drop_column"
            )

    def test_generated_always_rejected_everywhere(
        self, spark, tmp_path, cust
    ):
        t = _identity_table(tmp_path, cust, "i3", hi=10)
        withsk = cust.limit(2).withColumn("sk", F.lit(1).cast("long"))
        for what, call in [
            ("append", lambda: t.commit_append(withsk, batch_id="a")),
            ("overwrite", lambda: t.commit_overwrite(withsk, batch_id="o")),
            ("commit_merge", lambda: t.commit_merge(
                spark, withsk, ["c_custkey"], batch_id="m")),
            ("merge dv", lambda: t.merge_into(
                spark, withsk, key_columns=["c_custkey"],
                clauses=[("update", None, "*")], batch_id="m2",
                mode="dv")),
            ("update", lambda: t.update_where(
                spark, "c_custkey = 1", {"sk": "7"}, batch_id="u",
                mode="dv")),
            ("update cow", lambda: t.update_where(
                spark, "c_custkey = 1", {"sk": "7"}, batch_id="u2",
                mode="cow")),
        ]:
            with pytest.raises(ValueError, match="GENERATED ALWAYS"):
                call()

    def test_merge_inserts_mint_updates_keep(self, spark, tmp_path, cust):
        t = _identity_table(tmp_path, cust, "i4")
        before = _sk(spark, t)
        top = max(before.values())
        src = cust.filter(
            (F.col("c_custkey") <= 5) | (F.col("c_custkey") > 140)
        ).select("c_custkey", (F.col("c_acctbal") + 1).alias("c_acctbal"))
        for mode, bid in (("dv", "m1"), ("cow", "m2")):
            t.merge_into(
                spark, src, key_columns=["c_custkey"],
                clauses=[("update", None, "*"), ("insert", None, "*")],
                batch_id=bid, mode=mode,
            )
        after = _sk(spark, t)
        assert all(after[k] == before[k] for k in before)
        fresh = {after[k] for k in after if k not in before}
        assert fresh and all(v > top for v in fresh)
        assert len(set(after.values())) == len(after)

    def test_concurrent_writers_mint_disjoint_values(
        self, spark, tmp_path, cust
    ):
        t = _identity_table(tmp_path, cust, "i5", hi=20)

        def racer():
            ManifestTable(t.root).commit_append(
                cust.filter(F.col("c_custkey").between(50, 60)),
                batch_id="race",
            )

        t._race_once = racer
        t.commit_append(
            cust.filter(F.col("c_custkey").between(70, 80)),
            batch_id="mine",
        )
        sk = _sk(spark, t)
        assert len(sk) == 21 + 11 + 11
        assert len(set(sk.values())) == len(sk)  # no collisions

    def test_cdf_pairs_images_and_stability_through_maintenance(
        self, spark, tmp_path, cust
    ):
        t = _identity_table(tmp_path, cust, "i6")
        before = _sk(spark, t)
        v0 = t.version()
        t.update_where(spark, "c_custkey <= 5",
                       {"c_acctbal": "c_acctbal * 2"}, batch_id="u1",
                       mode="dv")
        feed = t.changes(spark, v0)
        pre = {r["sk"]: r["c_acctbal"] for r in feed.filter(
            F.col("_change_type") == "update_preimage").collect()}
        post = {r["sk"]: r["c_acctbal"] for r in feed.filter(
            F.col("_change_type") == "update_postimage").collect()}
        assert pre and set(pre) == set(post)
        for s in pre:
            assert post[s] == pytest.approx(2 * pre[s])
        # identity survives OPTIMIZE and compact (materialized row ids)
        t.optimize(spark, target_rows=15, batch_id="opt")
        assert _sk(spark, t) == {
            k: (v if k > 5 else before[k]) for k, v in _sk(spark, t).items()
        }
        assert _sk(spark, t) == {**before}
        # time travel reads the values as of each version
        assert _sk(spark, t, version=v0) == before

    def test_overwrite_continues_allocator(self, spark, tmp_path, cust):
        t = _identity_table(tmp_path, cust, "i7", hi=30)
        top = max(_sk(spark, t).values())
        t.commit_overwrite(
            cust.filter(F.col("c_custkey") <= 10), batch_id="ow"
        )
        sk = _sk(spark, t)
        assert len(sk) == 11
        assert all(v > top for v in sk.values())  # never reused
        assert "sk" in [
            f["name"] for f in t._read_manifest()["schema"]["fields"]
        ]

    def test_restore_reads_restored_identity(self, spark, tmp_path, cust):
        t = _identity_table(tmp_path, cust, "i8", hi=15)
        before = _sk(spark, t)
        t.delete_where(spark, "c_custkey <= 3", batch_id="d1", mode="dv")
        t.restore(version=t.version() - 1, batch_id="rst")
        assert _sk(spark, t) == before
