r"""Manifest-committed parquet table: atomic writes, snapshot reads,
and exactly-once batch application on a plain filesystem.

The reference gets crash-safety from per-batch DB transactions
(ref: /root/reference/pypeline/Pype.py:147-148 — fetch, merge, commit,
repeat).  The keyed sinks here (`sinks/keyed.py`) are idempotent but a
plain ``parquet overwrite`` is not atomic: a reader racing the write
can see a half-written directory, and a crash mid-write corrupts the
table.  Lakehouse formats solve this with a transaction log; this
module implements the minimal core of that idea — no jars, pure
public-knowledge design (the same commit protocol Iceberg/Delta use):

- data files are IMMUTABLE and write-once; a table version is a JSON
  **manifest** naming exactly the files that are live;
- a commit writes new data files to the data directory (invisible —
  nothing references them yet), then publishes by ``os.replace`` of
  the manifest pointer: a single atomic rename.  Readers see the old
  complete version or the new complete version, never a mix;
- every manifest records the ``batch_id``s already applied, so a
  foreachBatch replay after a crash is DETECTED and skipped —
  exactly-once on top of at-least-once delivery, the same contract
  ``txnAppId``/``txnVersion`` gives Delta sinks;
- old versions remain readable until ``vacuum`` (time travel for
  free, bounded by retention).

At real scale the manifest lists object-store keys and the swap is a
conditional PUT (or a log-append); the protocol is identical — commit
visibility rides on ONE atomic metadata operation, never on N file
operations.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


class ManifestTable:
    """A versioned parquet table committed via an atomic manifest swap."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest bookkeeping -------------------------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._pointer):
            return {"version": 0, "files": [], "batch_ids": []}
        with open(self._pointer) as fh:
            return json.load(fh)

    def version(self) -> int:
        return self._read_manifest()["version"]

    def applied_batch_ids(self) -> set:
        return set(self._read_manifest()["batch_ids"])

    def _publish(self, manifest: dict) -> None:
        """Atomic publish: write the new manifest beside the pointer,
        keep it as the versioned history file, then os.replace() the
        pointer — one atomic rename is the entire commit."""
        vfile = os.path.join(self.root, f"_manifest.v{manifest['version']}.json")
        tmp = vfile + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, vfile)
        # the pointer swap: readers see old-or-new, never a mix
        tmp2 = self._pointer + ".tmp"
        shutil.copyfile(vfile, tmp2)
        os.replace(tmp2, self._pointer)

    # -- read path ------------------------------------------------------------

    def read(self, spark: SparkSession, version: Optional[int] = None) -> Optional[DataFrame]:
        """Snapshot read: the file list is fixed the moment the manifest
        is parsed; concurrent commits can't change what this DataFrame
        scans (immutable files + explicit paths = snapshot isolation)."""
        if version is None:
            m = self._read_manifest()
        else:
            vfile = os.path.join(self.root, f"_manifest.v{version}.json")
            if not os.path.exists(vfile):
                raise ValueError(f"version {version} not found (vacuumed?)")
            with open(vfile) as fh:
                m = json.load(fh)
        if not m["files"]:
            return None
        paths = [os.path.join(self.data_dir, f) for f in m["files"]]
        return spark.read.parquet(*paths)

    # -- write path -----------------------------------------------------------

    def _write_fileset(self, df: DataFrame) -> list[str]:
        """Write df as a NEW set of immutable files in data/ and return
        their names.  Files are invisible until a manifest names them."""
        staging = os.path.join(self.root, f"_staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        names = []
        for f in sorted(os.listdir(staging)):
            if not f.endswith(".parquet"):
                continue
            name = f"{uuid.uuid4().hex}.parquet"
            os.replace(os.path.join(staging, f), os.path.join(self.data_dir, name))
            names.append(name)
        shutil.rmtree(staging, ignore_errors=True)
        return names

    def commit_overwrite(self, df: DataFrame, batch_id: Optional[str] = None) -> int:
        """Replace the table contents; returns the new version (or the
        current one when batch_id was already applied)."""
        m = self._read_manifest()
        if batch_id is not None and batch_id in m["batch_ids"]:
            return m["version"]  # replay detected: no-op
        files = self._write_fileset(df)
        new = {
            "version": m["version"] + 1,
            "files": files,
            "batch_ids": m["batch_ids"] + ([batch_id] if batch_id is not None else []),
        }
        self._publish(new)
        return new["version"]

    def commit_merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key_columns: Sequence[str],
        batch_id: Optional[str] = None,
    ) -> int:
        """Copy-on-write keyed upsert: read the current snapshot, merge,
        publish the merged result as a new version.  Idempotent both by
        batch_id (replay skipped outright) and by merge semantics (the
        keyed upsert is last-writer-wins).

        Scale note: copy-on-write rewrites the table per commit — right
        for batch cadence; a high-frequency sink would keep per-batch
        DELTA files in the manifest and compact on read or on a
        schedule (merge-on-read), same protocol, more files per
        version.
        """
        from pypeline_spark.sinks.keyed import upsert

        m = self._read_manifest()
        if batch_id is not None and batch_id in m["batch_ids"]:
            return m["version"]
        current = self.read(spark)
        merged = updates if current is None else upsert(current, updates, key_columns)
        # materialize BEFORE the old files could ever be vacuumed
        files = self._write_fileset(merged)
        new = {
            "version": m["version"] + 1,
            "files": files,
            "batch_ids": m["batch_ids"] + ([batch_id] if batch_id is not None else []),
        }
        self._publish(new)
        return new["version"]

    # -- retention ------------------------------------------------------------

    def vacuum(self, keep_versions: int = 1) -> int:
        """Drop data files referenced only by manifests older than the
        newest ``keep_versions``; returns files removed.  Readers of
        retained versions are unaffected (their files stay)."""
        current = self._read_manifest()["version"]
        keep_from = current - keep_versions + 1
        live: set[str] = set()
        dead_manifests = []
        for f in os.listdir(self.root):
            if not (f.startswith("_manifest.v") and f.endswith(".json")):
                continue
            v = int(f[len("_manifest.v"):-len(".json")])
            with open(os.path.join(self.root, f)) as fh:
                files = json.load(fh)["files"]
            if v >= keep_from:
                live.update(files)
            else:
                dead_manifests.append((f, files))
        removed = 0
        for mf, files in dead_manifests:
            for data_file in files:
                if data_file not in live:
                    path = os.path.join(self.data_dir, data_file)
                    if os.path.exists(path):
                        os.remove(path)
                        removed += 1
            os.remove(os.path.join(self.root, mf))
        return removed
