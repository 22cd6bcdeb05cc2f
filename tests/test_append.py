"""commit_append + the lakehouse ``append``/``overwrite`` pipeline ops
and the streaming foreachBatch binding (r18 directive #2): blind
base-file appends through the exactly-once ledger, the structural
``kind='append'`` classification, feed/stream read-through, OCC
serialization, and the declarative YAML ingest lifecycle."""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.pipeline.lakehouse import LakehouseCatalog
from pypeline_spark.pipeline.runner import Pypeline
from pypeline_spark.pipeline.spec import PipelineConfig, PypeSpec, SpecError
from pypeline_spark.session import load_table, register_tables
from pypeline_spark.sinks.manifest import CommitConflict, ManifestTable


@pytest.fixture()
def cust(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


class TestCommitAppend:
    def test_append_adds_files_prefix_preserved(self, spark, tmp_path, cust):
        t = ManifestTable(str(tmp_path / "a1"))
        seed = cust.filter(F.col("c_custkey") <= 50)
        batch = cust.filter(F.col("c_custkey").between(51, 80))
        t.commit_overwrite(seed, batch_id="seed", stats_cols=["c_custkey"])
        base_files = list(t._read_manifest()["files"])
        v = t.commit_append(batch, batch_id="a1", stats_cols=["c_custkey"])
        m = t._read_manifest()
        assert m["files"][: len(base_files)] == base_files
        assert len(m["files"]) > len(base_files)
        assert t._load_record(v)["kind"] == "append"
        assert _canon(t.read(spark)) == _canon(seed.unionByName(batch))
        # fresh files carry stats for skipping
        fresh = m["files"][len(base_files):]
        assert all("c_custkey" in m["stats"].get(f, {}) for f in fresh)

    def test_ledger_replay_noop(self, spark, tmp_path, cust):
        t = ManifestTable(str(tmp_path / "a2"))
        t.commit_overwrite(cust.limit(0), batch_id="seed")
        b = cust.filter(F.col("c_custkey") <= 20)
        v = t.commit_append(b, batch_id="stream-0")
        assert t.commit_append(b, batch_id="stream-0") == v
        assert t.version() == v

    def test_feed_and_stream_read_through(self, spark, tmp_path, cust):
        t = ManifestTable(str(tmp_path / "a3"))
        seed = cust.filter(F.col("c_custkey") <= 30)
        t.commit_overwrite(seed, batch_id="seed")
        b1 = cust.filter(F.col("c_custkey").between(31, 40))
        b2 = cust.filter(F.col("c_custkey").between(41, 55))
        t.commit_append(b1, batch_id="a1")
        t.commit_append(b2, batch_id="a2")
        feed = t.changes(spark, 1)
        assert feed.filter(F.col("_change_type") != "upsert").count() == 0
        assert _canon(feed.drop("_commit_version", "_change_type")) == _canon(
            b1.unionByName(b2)
        )
        per_v = {
            r["_commit_version"]: r["n"]
            for r in feed.groupBy("_commit_version")
            .agg(F.count("*").alias("n")).collect()
        }
        assert set(per_v) == {2, 3}

    def test_append_on_empty_table_begins_tracking(
        self, spark, tmp_path, cust
    ):
        t = ManifestTable(str(tmp_path / "a4"))
        t.commit_append(cust.filter(F.col("c_custkey") <= 10), batch_id="s")
        assert t._read_manifest().get("schema") is not None
        # additive evolution on a later append null-fills old files
        t.commit_append(
            cust.filter(F.col("c_custkey").between(11, 15)).withColumn(
                "flag", F.lit(1)
            ),
            batch_id="a1",
        )
        df = t.read(spark)
        assert "flag" in df.columns
        assert df.filter(F.col("flag").isNull()).count() == 11

    def test_untracked_nonempty_requires_exact_columns(
        self, spark, tmp_path, cust, monkeypatch
    ):
        t = ManifestTable(str(tmp_path / "a5"))
        t.commit_overwrite(cust.filter(F.col("c_custkey") <= 5), batch_id="s")
        # simulate a LEGACY untracked manifest (pre-schema-tracking
        # builds): strip the schema from what commit_append reads
        real = t._read_manifest

        def untracked():
            return {
                k: v for k, v in real().items() if k != "schema"
            }

        monkeypatch.setattr(t, "_read_manifest", untracked)
        with pytest.raises(ValueError, match="differ from the untracked"):
            t.commit_append(
                cust.filter(F.col("c_custkey") <= 3).withColumn(
                    "x", F.lit(1)
                ),
                batch_id="a1",
            )

    def test_constraint_gate_and_defaults_fill(self, spark, tmp_path, cust):
        t = ManifestTable(str(tmp_path / "a6"))
        t.commit_overwrite(
            cust.filter(F.col("c_custkey") <= 20), batch_id="seed"
        )
        t.add_check_constraint(spark, "pos", "c_custkey >= 0", batch_id="ck")
        with pytest.raises(ValueError, match="pos"):
            t.commit_append(
                cust.limit(5).select(
                    (-F.col("c_custkey")).alias("c_custkey"), "c_acctbal"
                ),
                batch_id="bad",
            )
        t.evolve_schema(
            "tier string", batch_id="ev", defaults={"tier": "'STD'"}
        )
        t.commit_append(
            cust.filter(F.col("c_custkey").between(21, 25)),
            batch_id="a1",
        )
        got = t.read(spark).filter(F.col("c_custkey") > 20)
        assert got.filter(F.col("tier") == "STD").count() == got.count()

    def test_occ_append_rebases_over_concurrent_append(
        self, spark, tmp_path, cust
    ):
        t = ManifestTable(str(tmp_path / "a7"))
        t.commit_overwrite(cust.filter(F.col("c_custkey") <= 10),
                           batch_id="seed")
        b1 = cust.filter(F.col("c_custkey").between(11, 20))
        b2 = cust.filter(F.col("c_custkey").between(21, 30))

        def racer():
            t2 = ManifestTable(t.root)
            t2.commit_append(b2, batch_id="race")

        t._race_once = racer
        v = t.commit_append(b1, batch_id="mine")
        assert v == 3  # seed + racer + rebased mine
        assert _canon(t.read(spark)) == _canon(
            cust.filter(F.col("c_custkey") <= 30)
        )

    def test_occ_append_aborts_on_concurrent_constraint(
        self, spark, tmp_path, cust
    ):
        t = ManifestTable(str(tmp_path / "a8"))
        t.commit_overwrite(cust.filter(F.col("c_custkey") <= 10),
                           batch_id="seed")

        def racer():
            t2 = ManifestTable(t.root)
            t2.add_check_constraint(
                spark, "pos", "c_custkey >= 0", batch_id="ck"
            )

        t._race_once = racer
        with pytest.raises(CommitConflict, match="constraint"):
            t.commit_append(
                cust.filter(F.col("c_custkey").between(11, 20)),
                batch_id="mine",
            )

    def test_append_with_outstanding_dv_composes(
        self, spark, tmp_path, cust
    ):
        """An append composes with deletion-vector state: dv
        suppression keeps working over the grown base (the dv only
        references pre-append files)."""
        t = ManifestTable(str(tmp_path / "a9"))
        t.commit_overwrite(cust.filter(F.col("c_custkey") <= 30),
                           batch_id="seed")
        t.delete_where(spark, "c_custkey % 5 = 0", batch_id="dd", mode="dv")
        t.commit_append(
            cust.filter(F.col("c_custkey").between(31, 40)), batch_id="a1"
        )
        got = {r.c_custkey for r in t.read_resolved(spark).collect()}
        # the dv suppresses only pre-append rows: appended multiples
        # of 5 (35, 40) rightly survive
        assert got == {k for k in range(41) if k % 5 != 0 or k > 30}

    def test_append_refused_over_outstanding_deltas(
        self, spark, tmp_path, cust
    ):
        """On a keyed table with outstanding merge-on-read deltas an
        append is REFUSED: resolution ranks all base files at 0, so an
        appended row whose key has an older outstanding delta upsert
        would be shadowed by that OLDER row on every resolved read —
        and compact() would drop it permanently (ADVICE r19, medium).
        After compact() drains the deltas the append lands."""
        t = ManifestTable(str(tmp_path / "a9b"))
        t.commit_overwrite(cust.filter(F.col("c_custkey") <= 30),
                           batch_id="seed")
        t.commit_delta(
            cust.filter(F.col("c_custkey") <= 3).withColumn(
                "c_acctbal", F.lit(-1.0)
            ),
            ["c_custkey"], batch_id="d1",
        )
        with pytest.raises(ValueError, match="commit_delta"):
            t.commit_append(
                cust.filter(F.col("c_custkey").between(31, 40)),
                batch_id="a1",
            )
        t.compact(spark)
        t.commit_append(
            cust.filter(F.col("c_custkey").between(31, 40)), batch_id="a1"
        )
        got = {r.c_custkey: r.c_acctbal
               for r in t.read_resolved(spark).collect()}
        assert set(got) == set(range(41))
        assert all(got[k] == -1.0 for k in (0, 1, 2, 3))

    def test_occ_append_aborts_on_concurrent_delta_keyed(
        self, spark, tmp_path, cust
    ):
        """The same hazard arriving CONCURRENTLY: a delta landing
        inside the append's OCC window aborts the rebase instead of
        silently ranking the fresh base rows below it."""
        t = ManifestTable(str(tmp_path / "a9c"))
        t.commit_overwrite(cust.filter(F.col("c_custkey") <= 10),
                           batch_id="seed")

        def racer():
            ManifestTable(t.root).commit_delta(
                cust.filter(F.col("c_custkey") <= 2),
                ["c_custkey"], batch_id="race-d",
            )

        t._race_once = racer
        with pytest.raises(CommitConflict, match="delta"):
            t.commit_append(
                cust.filter(F.col("c_custkey").between(11, 15)),
                batch_id="a1",
            )

    def test_row_tracking_composes(self, spark, tmp_path, cust):
        t = ManifestTable(str(tmp_path / "a10"))
        t.commit_overwrite(cust.filter(F.col("c_custkey") <= 20),
                           batch_id="seed", stats_cols=["c_custkey"])
        t.enable_row_tracking(batch_id="rt")
        hwm0 = t._read_manifest()["row_id_hwm"]
        t.commit_append(
            cust.filter(F.col("c_custkey").between(21, 30)), batch_id="a1"
        )
        ids = {r["c_custkey"]: r["_row_id"]
               for r in t.read_rowids(spark).collect()}
        assert len(set(ids.values())) == len(ids) == 31
        assert all(ids[k] >= hwm0 for k in range(21, 31))
        with pytest.raises(ValueError, match="__row_id__"):
            t.commit_append(
                cust.limit(1).withColumn("__row_id__", F.lit(0).cast("long")),
                batch_id="a2",
            )


class TestLakehouseAppendStep:
    def test_append_and_overwrite_ops(self, spark, sf_dir, tmp_path):
        register_tables(spark, sf_dir)
        config = PipelineConfig.from_dict({
            "pypes": {
                "seed": {
                    "extract_query": (
                        "SELECT c_custkey AS k, c_acctbal AS amt "
                        "FROM customer WHERE c_custkey <= 50"
                    ),
                    "target_table": "ledger",
                    "type": "lakehouse",
                    "lakehouse_op": "overwrite",
                    "key_columns": ["k"],
                    "batch_id": "seed-{seq}",
                },
                "ingest": {
                    "extract_query": (
                        "SELECT c_custkey AS k, c_acctbal AS amt "
                        "FROM customer WHERE c_custkey BETWEEN 51 AND 80"
                    ),
                    "target_table": "ledger",
                    "type": "lakehouse",
                    "lakehouse_op": "append",
                    "key_columns": ["k"],
                    "batch_id": "batch-{seq}",
                },
            },
            "pypelines": {"p": ["seed", "ingest"]},
        })
        cat = LakehouseCatalog(str(tmp_path))
        pipe = Pypeline(spark, config, placeholders={"seq": 1},
                        lakehouse=cat)
        pipe.run("p")
        t = cat.table("ledger")
        v = t.version()
        assert t._load_record(v)["kind"] == "append"
        assert t.read(spark).count() == 81
        # replay: both steps ledger-skip
        pipe.run("p")
        assert t.version() == v
        # the resolved view was registered for later steps
        assert spark.table("ledger").count() == 81

    def test_streaming_append_exactly_once_across_restart(
        self, spark, sf_dir, tmp_path
    ):
        register_tables(spark, sf_dir)
        cust = spark.table("customer").select(
            F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("amt")
        )
        stream_dir = str(tmp_path / "in")
        parts = [
            cust.filter(F.pmod(F.col("k"), 4) == i) for i in range(4)
        ]
        for i in (0, 1):
            parts[i].write.mode("overwrite").parquet(f"{stream_dir}/b{i}")
        spark.readStream.schema(cust.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{stream_dir}/b*").createOrReplaceTempView("cust_stream")
        config = PipelineConfig.from_dict({
            "pypes": {
                "ingest": {
                    "extract_query": "SELECT * FROM cust_stream",
                    "target_table": "ledger",
                    "type": "lakehouse",
                    "lakehouse_op": "append",
                    "key_columns": ["k"],
                    "batch_id": "stream-{seq}",
                    "checkpoint_dir": str(tmp_path / "ckpt"),
                },
            },
            "pypelines": {"p": ["ingest"]},
        })
        cat = LakehouseCatalog(str(tmp_path / "lh"))
        pipe = Pypeline(spark, config, lakehouse=cat)
        pipe.run("p")
        t = cat.table("ledger")
        assert t.version() == 2  # one commit per micro-batch
        # restart with NEW files: only they are processed, epoch ids
        # continue from the checkpoint
        for i in (2, 3):
            parts[i].write.mode("overwrite").parquet(f"{stream_dir}/b{i}")
        pipe.run("p")
        assert t.version() == 4
        applied = sorted(
            int(b.split("-")[1])
            for b in t.applied_batch_ids()
            if b.startswith("stream-")
        )
        assert applied == [0, 1, 2, 3]
        assert _canon(t.read(spark)) == _canon(cust)
        # restart with nothing new: zero commits
        pipe.run("p")
        assert t.version() == 4
        # post-crash foreachBatch replay of an applied epoch: no-op
        b0 = spark.read.parquet(f"{stream_dir}/b0")
        assert t.commit_append(b0, batch_id="stream-0") == 4

    def test_streaming_upsert_op_micro_batches(self, spark, sf_dir, tmp_path):
        """The foreachBatch binding dispatches ANY lakehouse op per
        epoch: an upsert step seeds the table on epoch 0 (overwrite)
        and MERGEs every later micro-batch — final state equals a
        one-shot last-writer-wins upsert of all batches."""
        register_tables(spark, sf_dir)
        cust = spark.table("customer").select(
            F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("amt")
        )
        stream_dir = str(tmp_path / "in")
        parts = [
            cust.filter(F.pmod(F.col("k"), 3) == i) for i in range(3)
        ]
        for i in range(3):
            parts[i].write.mode("overwrite").parquet(f"{stream_dir}/b{i}")
        spark.readStream.schema(cust.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{stream_dir}/b*").createOrReplaceTempView(
            "cust_ups_stream"
        )
        config = PipelineConfig.from_dict({
            "pypes": {
                "sync": {
                    "extract_query": "SELECT * FROM cust_ups_stream",
                    "target_table": "dim",
                    "type": "lakehouse",
                    "lakehouse_op": "upsert",
                    "key_columns": ["k"],
                    "batch_id": "ups-{seq}",
                    "checkpoint_dir": str(tmp_path / "ckpt"),
                },
            },
            "pypelines": {"p": ["sync"]},
        })
        cat = LakehouseCatalog(str(tmp_path / "lh"))
        Pypeline(spark, config, lakehouse=cat).run("p")
        t = cat.table("dim")
        assert t.version() == 3  # seed overwrite + 2 merges
        assert _canon(t.read(spark)) == _canon(cust)
        assert {
            b for b in t.applied_batch_ids() if b.startswith("ups-")
        } == {"ups-0", "ups-1", "ups-2"}

    def test_streaming_requires_seq_template_and_checkpoint(
        self, spark, sf_dir, tmp_path
    ):
        register_tables(spark, sf_dir)
        cust = spark.table("customer").select("c_custkey")
        cust.write.mode("overwrite").parquet(str(tmp_path / "in/b0"))
        spark.readStream.schema(cust.schema).parquet(
            str(tmp_path / "in/b*")
        ).createOrReplaceTempView("cust_stream2")

        def run(**kw):
            step = {
                "extract_query": "SELECT * FROM cust_stream2",
                "target_table": "ledger",
                "type": "lakehouse",
                "lakehouse_op": "append",
                "key_columns": ["c_custkey"],
                **kw,
            }
            config = PipelineConfig.from_dict(
                {"pypes": {"s": step}, "pypelines": {"p": ["s"]}}
            )
            Pypeline(
                spark, config, lakehouse=LakehouseCatalog(str(tmp_path))
            ).run("p")

        with pytest.raises(ValueError, match="batch_id template"):
            run(batch_id="fixed", checkpoint_dir=str(tmp_path / "c1"))
        with pytest.raises(ValueError, match="checkpoint_dir"):
            run(batch_id="stream-{seq}")

    def test_streaming_non_lakehouse_rejected(self, spark, sf_dir, tmp_path):
        register_tables(spark, sf_dir)
        cust = spark.table("customer").select("c_custkey", "c_acctbal")
        cust.write.mode("overwrite").parquet(str(tmp_path / "in/b0"))
        spark.readStream.schema(cust.schema).parquet(
            str(tmp_path / "in/b*")
        ).createOrReplaceTempView("cust_stream3")
        config = PipelineConfig.from_dict({
            "pypes": {
                "s": {
                    "extract_query": "SELECT * FROM cust_stream3",
                    "target_table": "t",
                    "type": "upsert",
                    "key_columns": ["c_custkey"],
                },
            },
            "pypelines": {"p": ["s"]},
        })
        with pytest.raises(ValueError, match="streaming extract_query"):
            Pypeline(spark, config).run("p")

    def test_spec_validation(self):
        with pytest.raises(SpecError, match="lakehouse_op"):
            PypeSpec(name="x", extract_query="SELECT 1",
                     target_table="t", type="lakehouse",
                     lakehouse_op="merge")
        with pytest.raises(SpecError, match="checkpoint_dir"):
            PypeSpec(name="x", extract_query="SELECT 1",
                     target_table="t", type="upsert",
                     checkpoint_dir="/tmp/c")
        # append/overwrite are valid ops and need no identifier/keys
        PypeSpec(name="x", extract_query="SELECT 1", target_table="t",
                 type="lakehouse", lakehouse_op="append")
        PypeSpec(name="x", extract_query="SELECT 1", target_table="t",
                 type="lakehouse", lakehouse_op="overwrite")
