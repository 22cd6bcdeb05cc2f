"""Streaming head over a ManifestTable's change feed (Spark 4 Python
DataSource, streaming reader): ``spark.readStream.format(
"manifest_changes").option("path", table_root)`` turns the lakehouse
table into a live micro-batch source — the Delta "streaming from a
table" shape, built on the same contract as
:meth:`~pypeline_spark.sinks.manifest.ManifestTable.changes`.

Design (and why it scales):

- the OFFSET is the table version cursor (``{"version": N}``) —
  checkpointed by Spark, so restarts resume exactly where the last
  committed micro-batch ended: exactly-once consumption of the feed
  on top of the manifest's immutable version history;
- each micro-batch covers versions ``(start, end]`` and plans ONE
  InputPartition per delta FILE, so a catch-up batch after downtime
  parallelizes across every missed commit's files — and reads ONLY
  those files (a delta commit's fileset IS its change set: O(changed
  rows) per sync, never a table scan);
- metadata-only commits (ANALYZE, schema evolution) and
  content-preserving REORG commits (compact / OPTIMIZE / clustering —
  reorg-tagged by the writer) contribute nothing and are read
  THROUGH, so scheduled maintenance never kills a live consumer
  (Delta CDF's rule: data reorganization emits no CDF rows);
  predicate-DML commits (``delete_where``/``update_where``) emit
  their own typed CDC fileset; a CONTENT-rewriting commit in range
  (overwrite / CoW merge / restore) raises — restart the stream from
  a fresh snapshot, same contract as ``changes()`` — unless the
  consumer opts into ``on_rewrite='skip'`` (trigger-style consumers
  that re-derive state from the table, e.g. the durable IVM
  maintainer, which handles the rewrite in its own sync);
- rows are emitted with ``_commit_version`` and ``_change_type``
  (``insert``/``update`` from typed-CDC commits, ``delete`` for
  tombstones and predicate deletes, ``update_preimage``/
  ``update_postimage`` for predicate updates, ``upsert`` for blind
  appends) — the Delta CDF streaming column contract;
- executors read the parquet files directly by path (pyarrow) — the
  same shared-filesystem assumption the manifest protocol already
  makes; the driver touches only O(versions) manifest JSON;
- ``option("max_files_per_batch", n)`` rate-limits a micro-batch (the
  Delta ``maxFilesPerTrigger`` shape): a consumer catching up a long
  backlog drains it in bounded batches instead of one giant one —
  state-store pressure and commit latency stay flat while behind;
  ``option("max_bytes_per_batch", n)`` is the ``maxBytesPerTrigger``
  twin — the manifest's ``filemeta`` already records per-file bytes,
  so the same backlog walk caps on planned BYTES with zero extra I/O
  (both caps may be set; the tighter one wins per batch);
- ``option("cursor_sidecar", path)`` persists the committed offset to
  a tiny sidecar file (put it under the query's checkpoint dir), so
  the FIRST batch after a restart is rate-limited too — without it,
  the Python DataSource API hands ``latestOffset()`` no checkpointed
  offset and the first catch-up batch after downtime is uncapped
  (the r15-documented trade, now closed on opt-in).

Reference connection: the reference's pipelines poll their extract
query per run (ref: /root/reference/pypeline/Pype.py:147-148); this
source replaces polling with an incremental, exactly-once stream over
committed changes.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

META_COLS = ("_commit_version", "_change_type")


def _arrow_ddl(t) -> str:
    """Minimal arrow→Spark DDL mapping for schema derivation from one
    parquet footer (explicit ``schema`` option overrides)."""
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    raise ValueError(
        f"cannot map arrow type {t} to DDL — pass an explicit 'schema' "
        "option"
    )


class _DeltaFilePartition(InputPartition):
    def __init__(self, path: str, version: int) -> None:
        self.path = path
        self.version = version


class ManifestChangesStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the manifest change feed; see module
    docstring for the offset/partition/typing contract."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.root = options["path"]
        if "since_timestamp" in options:
            # the Delta startingTimestamp shape: start AFTER the latest
            # commit at-or-before ts (its content is the baseline
            # snapshot; changes stream from the next commit on) —
            # resolved once at plan time via the monotone commit stamps
            if "since_version" in options:
                raise ValueError(
                    "pass since_version OR since_timestamp, not both"
                )
            from pypeline_spark.sinks.manifest import ManifestTable

            self.start = ManifestTable(self.root).version_at_timestamp(
                float(options["since_timestamp"])
            )
        else:
            self.start = int(options.get("since_version", "0"))
        # 'fail' (default): a content rewrite in range raises, the
        # consumer restarts from a fresh snapshot (the changes()
        # contract).  'skip': the rewrite contributes NO rows and the
        # offset advances past it — ONLY for trigger-style consumers
        # that re-derive state from the table itself (the durable IVM
        # maintainer: its sync() runs its own feed read under its own
        # cursor and falls back to a snapshot recompute on a rewrite,
        # so skipping here is what keeps the maintainer ALIVE across
        # an overwrite/restore instead of killing the stream at offset
        # planning — ADVICE r14).
        self.on_rewrite = options.get("on_rewrite", "fail")
        if self.on_rewrite not in ("fail", "skip"):
            raise ValueError(
                f"on_rewrite must be 'fail' or 'skip', got "
                f"{self.on_rewrite!r}"
            )
        # Rate limiting (the Delta maxFilesPerTrigger shape): cap how
        # many change FILES one micro-batch may plan.  The offset is a
        # version cursor, so the cap rounds to version boundaries —
        # latestOffset() walks manifests from the reader's cursor
        # accumulating per-commit file counts (pure metadata, the same
        # O(backlog versions) class as partitions' own walk) and stops
        # before the version that would exceed the cap, always
        # admitting at least one version (progress guarantee: a single
        # commit larger than the cap still flows, as in Delta).  The
        # cursor is learned from initialOffset (fresh streams are
        # capped from the FIRST batch), partitions() and commit(); the
        # one uncapped case is the first batch after a clean restart —
        # the Python DataSource API has no admission-control handshake
        # that would hand the checkpointed offset to latestOffset(),
        # and guessing low could regress the offset (worse: replayed
        # rows).  Documented trade: one possibly-large catch-up batch,
        # then steady-state caps.
        mfpb = options.get("max_files_per_batch")
        self.max_files = None if mfpb is None else int(mfpb)
        if self.max_files is not None and self.max_files < 1:
            raise ValueError(
                f"max_files_per_batch must be >= 1, got {self.max_files}"
            )
        # the maxBytesPerTrigger twin: planned bytes come from the
        # manifest's filemeta (recorded at write time), so the walk
        # costs no extra I/O; a file without recorded bytes counts 0
        # (conservative in admission, never in correctness — the cap
        # only decides WHERE the batch boundary lands)
        mbpb = options.get("max_bytes_per_batch")
        self.max_bytes = None if mbpb is None else int(mbpb)
        if self.max_bytes is not None and self.max_bytes < 1:
            raise ValueError(
                f"max_bytes_per_batch must be >= 1, got {self.max_bytes}"
            )
        # optional offset sidecar (r16 directive #6): when set, the
        # committed offset is persisted here and latestOffset() reads
        # it back when the in-memory cursor is None — which happens
        # exactly once, on the first planning call after a process
        # restart, the one case where the rate limit used to be
        # defeated.  Replay safety: Spark re-plans a crashed batch via
        # partitions(start, end) (which re-anchors the cursor) BEFORE
        # asking for new offsets, so a sidecar lagging one commit()
        # behind is never consulted with stale state.
        self.cursor_sidecar = options.get("cursor_sidecar")
        self._cursor: int | None = None
        self.fields = [f.name for f in schema.fields]
        # column-mapped tables store PHYSICAL names in the files;
        # capture logical→physical once at plan time (physical names
        # are immutable per column id, so one snapshot of the mapping
        # covers every delta file, past and future) — the reader is
        # pickled to executors with it
        from pypeline_spark.sinks.manifest import ManifestTable

        m = ManifestTable(self.root)._read_manifest()
        self.phys = {}
        if ManifestTable._mapping_enabled(m) and m.get("schema"):
            self.phys = {
                f["name"]: (f.get("metadata") or {}).get(
                    ManifestTable._CM_PHYS, f["name"]
                )
                for f in m["schema"]["fields"]
            }
        # rows are emitted positionally as (data..., version, type):
        # an explicit schema must keep the meta columns LAST, or the
        # tuple-to-schema mapping would silently shear columns
        if tuple(self.fields[-2:]) != META_COLS:
            raise ValueError(
                f"the last two schema columns must be {META_COLS}, got "
                f"{self.fields[-2:]} — the derived schema places them "
                "there; explicit 'schema' options must too"
            )

    def initialOffset(self) -> dict:
        # default 0 replays the whole delta history; pass
        # since_version=<seed version> to start after the initial
        # overwrite (which, being a rewrite, is not feed-derivable)
        self._cursor = self.start
        return {"version": self.start}

    def _restore_cursor(self) -> "int | None":
        """The rate-limit cursor, restored from the opt-in sidecar
        when the in-memory one is gone (fresh process after restart —
        the one case latestOffset otherwise sees no prior offset)."""
        if self._cursor is None and self.cursor_sidecar:
            try:
                import json as _json

                with open(self.cursor_sidecar) as fh:
                    self._cursor = int(_json.load(fh)["version"])
            except (OSError, ValueError, KeyError, TypeError):
                pass  # absent/corrupt sidecar: the documented trade
        return self._cursor

    def latestOffset(self) -> dict:
        from pypeline_spark.sinks.manifest import ManifestTable

        t = ManifestTable(self.root)
        tip = t.version()
        lo = self._restore_cursor()
        uncapped = self.max_files is None and self.max_bytes is None
        if uncapped or lo is None or tip <= lo:
            return {"version": tip}
        # walk the backlog's manifests accumulating planned file
        # counts AND planned bytes (filemeta, recorded at write time);
        # stop at the last version boundary under whichever cap binds
        # first, always admitting at least one version (progress)
        prev = (
            t._manifest_at(lo) if lo > 0 else {"files": [], "deltas": []}
        )
        n = 0
        b = 0
        end = lo
        for v in range(lo + 1, tip + 1):
            cur = t._manifest_at(v)
            kind = ManifestTable._commit_kind(prev, cur)
            if kind == "delta":
                names = cur.get("deltas", [])[-1]
            elif kind == "append":
                names = cur["files"][len(prev.get("files", [])):]
            elif kind == "dml":
                names = cur.get("cdc_files", [])
            else:
                names = []  # metadata/reorg/rewrite plan no files here
            add = len(names)
            fm = cur.get("filemeta", {})
            abytes = sum(
                int((fm.get(f) or {}).get("bytes") or 0) for f in names
            )
            over = (
                self.max_files is not None and n + add > self.max_files
            ) or (
                self.max_bytes is not None and b + abytes > self.max_bytes
            )
            if over and end > lo:
                break  # the caps round down to a version boundary
            n += add
            b += abytes
            end = v
            prev = cur
            if (self.max_files is not None and n >= self.max_files) or (
                self.max_bytes is not None and b >= self.max_bytes
            ):
                break
        return {"version": end}

    def partitions(self, start: dict, end: dict):
        from pypeline_spark.sinks.manifest import ManifestTable

        t = ManifestTable(self.root)
        lo, hi = start["version"], end["version"]
        self._cursor = hi  # rate-limit walks resume from planned work
        prev = (
            t._manifest_at(lo)
            if lo > 0
            else {"files": [], "deltas": []}
        )
        parts: list[_DeltaFilePartition] = []
        for v in range(lo + 1, hi + 1):
            cur = t._manifest_at(v)
            kind = ManifestTable._commit_kind(prev, cur)
            # 'metadata' and content-preserving 'reorg' (compact /
            # OPTIMIZE / clustering) commits contribute no change rows
            # — the stream reads straight through them, so scheduled
            # maintenance never kills a live consumer
            if kind in ("rewrite", "restore") and self.on_rewrite == "fail":
                # the batch feed (changes()) derives RESTORE events
                # via a resolution join; this reader's partitions are
                # executor-side pyarrow file reads with no
                # SparkSession, so a restore is stream-underivable —
                # fail like a rewrite (or skip for trigger consumers)
                raise ValueError(
                    f"version {v} rewrote content (overwrite/merge/"
                    "restore): the stream cannot derive row-level "
                    "changes across it — restart from a fresh snapshot "
                    "(maintenance compact/OPTIMIZE commits are "
                    "reorg-tagged and read through; predicate DML "
                    "commits carry their own CDC files), or opt a "
                    "trigger-style consumer into on_rewrite='skip'"
                )
            if kind == "delta":
                for f in cur["deltas"][-1]:
                    parts.append(
                        _DeltaFilePartition(
                            t._path(f), v
                        )
                    )
            elif kind == "append":
                # a base-file append's fresh files ARE its change set
                # (untyped 'upsert' events, like a legacy delta fileset)
                for f in cur["files"][len(prev.get("files", [])):]:
                    parts.append(
                        _DeltaFilePartition(
                            t._path(f), v
                        )
                    )
            elif kind == "dml":
                # predicate DELETE/UPDATE: its typed CDC fileset IS the
                # change set (full-row deletes, update pre/post images)
                for f in cur.get("cdc_files", []):
                    parts.append(
                        _DeltaFilePartition(
                            t._path(f), v
                        )
                    )
            prev = cur
        return parts

    def read(self, partition: _DeltaFilePartition):
        # executor-side: one immutable delta file by path — pyarrow,
        # no SparkSession (the Python DataSource execution model)
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        names = set(tbl.schema.names)
        data_fields = [
            (f, self.phys.get(f, f))
            for f in self.fields
            if f not in META_COLS
        ]
        for rec in tbl.to_pylist():
            ct = rec.get("__ct__") or "upsert"
            row = [
                rec.get(phys) if phys in names else None
                for _name, phys in data_fields
            ]
            yield tuple(row + [partition.version, ct])

    def commit(self, end: dict) -> None:
        # offsets live in Spark's streaming checkpoint; remembering the
        # committed end here re-anchors the rate-limit cursor — and the
        # opt-in sidecar persists it so the cursor survives a restart
        # (atomic replace: readers see old-or-new, never a torn write)
        self._cursor = end["version"]
        if self.cursor_sidecar:
            import json as _json
            import uuid as _uuid

            d = os.path.dirname(self.cursor_sidecar)
            if d:
                os.makedirs(d, exist_ok=True)
            tmp = f"{self.cursor_sidecar}.{_uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as fh:
                _json.dump({"version": end["version"]}, fh)
            os.replace(tmp, self.cursor_sidecar)


class ManifestChangesDataSource(DataSource):
    """``spark.readStream.format("manifest_changes")
    .option("path", root).option("since_version", n).load()``."""

    @classmethod
    def name(cls) -> str:
        return "manifest_changes"

    def schema(self) -> str:
        if "schema" in self.options:
            return self.options["schema"]
        from pypeline_spark.sinks.manifest import ManifestTable

        import pyarrow.parquet as pq

        t = ManifestTable(self.options["path"])
        m = t._read_manifest()
        # a schema-tracked table IS the authority: the stream emits
        # rows under the tracked schema (old delta files null-fill
        # evolved columns in read()), so a stream started after an
        # evolve_schema sees the superset deterministically — zero
        # file reads.  Bare-DDL rendering assumes simple identifier
        # column names (the same assumption the footer path below
        # always made); pass an explicit 'schema' option otherwise.
        sch = m.get("schema")
        if sch is not None:
            from pyspark.sql.types import StructType as _St

            cols = [
                f"{f.name} {f.dataType.simpleString()}"
                for f in _St.fromJson(sch).fields
            ]
            return ", ".join(
                cols + ["_commit_version bigint", "_change_type string"]
            )
        # legacy untracked table: derive from parquet footers
        # one footer per FILESET (base + each delta commit), merged in
        # first-seen order: a delete-only fileset carries only key
        # columns, and an evolved commit may ADD columns — neither may
        # narrow the stream's schema.  O(commits) metadata reads.
        probes = []
        if m.get("files"):
            probes.append(m["files"][0])
        probes += [fs[0] for fs in m.get("deltas", []) if fs]
        if not probes:
            raise ValueError(
                "empty table: pass an explicit 'schema' option"
            )
        cols: list[str] = []
        seen: set[str] = set()
        for f in probes:
            sch = pq.ParquetFile(
                t._path(f)
            ).schema_arrow
            for name, typ in zip(sch.names, sch.types):
                if name == "__ct__" or name in seen:
                    continue
                seen.add(name)
                cols.append(f"{name} {_arrow_ddl(typ)}")
        return ", ".join(
            cols + ["_commit_version bigint", "_change_type string"]
        )

    def streamReader(self, schema: StructType) -> ManifestChangesStreamReader:
        return ManifestChangesStreamReader(schema, dict(self.options))


def register(spark) -> None:
    """Idempotent registration on a session."""
    spark.dataSource.register(ManifestChangesDataSource)


from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pypeline_spark.registry import query  # noqa: E402


@query(
    "q_cdf_stream",
    # The oracle recomputes every change event the STREAM must deliver
    # from the same modular slices the table committed: v2 typed-CDC
    # upserts of the even keys at +100 (inserts where k%6==0 — absent
    # from the k%3!=0 seed — else updates) and v3 tombstones of the
    # k%4==1 keys (value columns null => cents 0).  The Spark side
    # consumes the table through TWO availableNow streaming drains
    # sharing one checkpoint — the second starts after the v3 commit,
    # so the hash match proves the version-cursor offsets resumed
    # exactly where drain one committed (no replay, no gap: v2 rows
    # exactly once, v3 rows exactly once).  Boundary refusal and
    # schema derivation are pinned in tests/test_manifest_stream.py.
    oracle="""
    WITH c AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer)
    SELECT CAST(2 AS BIGINT) AS commit_version, 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_keys,
           CAST(SUM(CAST(FLOOR((bal + 100) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM c WHERE k % 6 = 0
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'update', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR((bal + 100) * 100 + 0.5) AS BIGINT))
                AS BIGINT)
    FROM c WHERE k % 2 = 0 AND k % 3 <> 0
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'delete', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT), CAST(0 AS BIGINT)
    FROM c WHERE k % 4 = 1
    """,
)
def q_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest change feed as a STREAMING SOURCE: a lakehouse
    table becomes a live micro-batch stream head (``readStream.format
    ("manifest_changes")``) with the table version as the
    checkpointed offset.  The query drains the stream twice against
    one checkpoint — the second drain starts after a further commit —
    certifying exactly-once incremental consumption: each drain reads
    ONLY the delta files of the versions its offset range covers,
    rows arrive typed (``_change_type``) and version-tagged.

    Scale: this is the replica/index/aggregate-feeding story at
    100 TB — consumers follow the table by reading O(changed rows)
    per trigger with restart-safe cursors, instead of polling
    snapshots; partitions are per delta file, so a catch-up batch
    after downtime parallelizes across every missed commit.
    """
    import shutil
    import tempfile

    from pypeline_spark.session import load_table
    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    k = F.col("c_custkey")
    scratch = tempfile.mkdtemp(prefix="cdf_stream_")
    root = os.path.join(scratch, "tbl")
    out = os.path.join(scratch, "out")
    ckpt = os.path.join(scratch, "ckpt")

    def drain() -> None:
        register(spark)
        q = (
            spark.readStream.format("manifest_changes")
            .option("path", root)
            .option("since_version", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    try:
        table = ManifestTable(root)
        table.commit_overwrite(c.filter(k % 3 != 0), batch_id="seed")  # v1
        table.commit_delta(
            c.filter(k % 2 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + 100.0
            ),
            ["c_custkey"],
            batch_id="d1",
            cdc=True,
        )  # v2
        drain()  # consumes v2
        table.commit_delta(
            None, ["c_custkey"], batch_id="d2",
            deletes=c.filter(k % 4 == 1),
        )  # v3
        drain()  # resumes at the committed offset: v3 only
        got = spark.read.parquet(out)
        cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
        agg = (
            got.groupBy(
                F.col("_commit_version").alias("commit_version"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("c_custkey").cast("bigint").alias("sum_keys"),
                F.sum(F.coalesce(cents, F.lit(0)))
                .cast("bigint")
                .alias("sum_cents"),
            )
        )
        return agg.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
