"""Transactional MERGE binding for the keyed sinks (Delta Lake).

The reference's crash-safety story is per-batch commits + idempotent
keyed writes against Postgres (ref: /root/reference/pypeline/Pype.py:148);
the plain-parquet ``ParquetCatalog`` (sinks/keyed.py) emulates the
semantics but its read-modify-write overwrite is not atomic.  On a
lakehouse the same upsert/update/delete interface binds to
``MERGE INTO``: ACID commits, file pruning on the merge keys, and
concurrent-writer safety — this module is that binding.

Delta jars are NOT shipped in this container (and installs are out of
scope), so everything here is gated behind an import-try:
``DeltaCatalog.available()`` is False and the catalog raises with a
clear message when delta-spark is absent; tests skip.  The merge-spec
construction (key predicate, excluded-column SET map, last-writer
dedupe) is pure logic shared with the emulation and unit-tested without
Delta, so the only untested-here surface is the Delta call itself.

For a LIVE transactional MERGE exercised in this container, see
``sinks/jdbc_merge.py`` — the same catalog interface bound to ANSI
``MERGE INTO`` over JDBC (embedded Derby in tests; MySQL/PostgreSQL in
production, the reference's actual targets).  The pipeline runner
delegates keyed steps to either backend identically.

Semantics parity with sinks/keyed.py (and the reference):
- upsert: matched rows take the update's values EXCEPT key columns and
  ``fields_excluded_from_update`` (omitted from the SET map entirely —
  so a target NULL in an excluded column survives, ref: Pype.py:132-143);
  unmatched update rows insert whole.
- update_only: matched rows updated (legitimate NULLs written),
  never inserts (ref: Pype.py:119-130).
- delete: matched keys removed (ref: Pype.py:179-186).
- intra-batch duplicate keys: deduped last-writer-wins BEFORE the merge
  (Delta rejects multi-match sources), same rule as keyed.py.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from pypeline_spark.sinks.keyed import _dedupe_last_writer

try:  # delta-spark is optional; absent in this container
    from delta.tables import DeltaTable  # type: ignore

    _DELTA_OK = True
except ImportError:  # pragma: no cover - exercised when delta missing
    DeltaTable = None  # type: ignore
    _DELTA_OK = False


def merge_key_condition(keys: Sequence[str], t: str = "t", u: str = "u") -> str:
    """`t.k1 = u.k1 AND ...` — the MERGE ON predicate."""
    return " AND ".join(f"{t}.{c} = {u}.{c}" for c in keys)


def update_set_map(
    columns: Sequence[str],
    key_columns: Sequence[str],
    fields_excluded_from_update: Sequence[str] = (),
) -> dict[str, str]:
    """The whenMatchedUpdate SET map: every non-key, non-excluded column
    takes the source's value.  Excluded columns are OMITTED (not
    coalesced) — target values, including NULLs, survive a match."""
    skip = set(key_columns) | set(fields_excluded_from_update)
    return {c: f"u.{c}" for c in columns if c not in skip}


class DeltaCatalog:
    """Keyed-sink catalog bound to Delta MERGE INTO.

    Same get/put surface as MemoryCatalog/ParquetCatalog plus in-place
    ``merge_upsert`` / ``merge_update_only`` / ``merge_delete`` that
    commit atomically instead of rewriting the table.
    """

    def __init__(self, root: str, spark: Optional[SparkSession] = None) -> None:
        if not _DELTA_OK:
            raise ImportError(
                "delta-spark is not installed; use ParquetCatalog (same "
                "semantics, non-transactional) or add the Delta jars"
            )
        self.root = root
        # pin the session when given — getActiveSession() is unreliable
        # under py4j thread reuse (see ParquetCatalog.__init__)
        self._spark = spark
        os.makedirs(root, exist_ok=True)

    def _session(self) -> SparkSession:
        spark = self._spark or SparkSession.getActiveSession()
        assert spark is not None
        return spark

    @staticmethod
    def available() -> bool:
        return _DELTA_OK

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def get(self, name: str) -> Optional[DataFrame]:
        path = self._path(name)
        if not os.path.exists(path):
            return None
        return self._session().read.format("delta").load(path)

    def put(self, name: str, df: DataFrame) -> None:
        df.write.format("delta").mode("overwrite").save(self._path(name))

    def _table(self, name: str) -> "DeltaTable":
        return DeltaTable.forPath(self._session(), self._path(name))

    def merge_upsert(
        self,
        name: str,
        updates: DataFrame,
        key_columns: Sequence[str] = ("id",),
        fields_excluded_from_update: Sequence[str] = (),
        order_col: Optional[str] = None,
    ) -> None:
        keys = list(key_columns)
        up = _dedupe_last_writer(updates, keys, order_col)
        if self.get(name) is None:
            self.put(name, up)
            return
        (
            self._table(name)
            .alias("t")
            .merge(up.alias("u"), merge_key_condition(keys))
            .whenMatchedUpdate(
                set=update_set_map(up.columns, keys, fields_excluded_from_update)
            )
            .whenNotMatchedInsertAll()
            .execute()
        )

    def merge_update_only(
        self,
        name: str,
        updates: DataFrame,
        key_columns: Sequence[str] = ("id",),
        fields_excluded_from_update: Sequence[str] = (),
        order_col: Optional[str] = None,
    ) -> None:
        keys = list(key_columns)
        up = _dedupe_last_writer(updates, keys, order_col)
        (
            self._table(name)
            .alias("t")
            .merge(up.alias("u"), merge_key_condition(keys))
            .whenMatchedUpdate(
                set=update_set_map(up.columns, keys, fields_excluded_from_update)
            )
            .execute()
        )

    def merge_delete(self, name: str, keys_df: DataFrame, identifier: str) -> None:
        (
            self._table(name)
            .alias("t")
            .merge(
                keys_df.select(identifier).distinct().alias("u"),
                merge_key_condition([identifier]),
            )
            .whenMatchedDelete()
            .execute()
        )
