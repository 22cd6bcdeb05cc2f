"""Dialect-literal statement builders: the reference's exact SQL shapes.

The keyed merge semantics are proven once — ANSI ``MERGE INTO``
executed live against Derby (`sinks/jdbc_merge.py`) and the join
emulation (`sinks/keyed.py`) are asserted equal — but the reference
does not emit ANSI MERGE: its load/update/delete statements are
PostgreSQL dialect literals built from the batch's column headers
(ref: /root/reference/pypeline/Pype.py:97-147 upsert/update,
Pype.py:179-186 delete).  This module generates those literal shapes
from the SAME merge spec that drives the ANSI builders, so a user
pointing the engine at a real PostgreSQL target gets byte-identical
statements to the reference's:

- load (insert-or-update):
  ``INSERT INTO t (SELECT * FROM json_populate_recordset(null::t, %s))
  ON CONFLICT (id) DO UPDATE SET col = excluded.col,...``
- update-only:
  ``UPDATE t AS target SET col = records.col,... FROM (SELECT * FROM
  json_populate_recordset(null::t, %s)) AS records
  WHERE target.id=records.id;``
- delete-by-key: ``DELETE FROM t WHERE id = ANY(%s::uuid[])``

``%s`` is the DB-API parameter placeholder: the reference binds ONE
parameter — the whole batch serialized as a JSON array —
and ``json_populate_recordset(null::t, %s)`` explodes it into typed
rows server-side (the table name doubles as the composite row type).
The exclusion rule matches Pype.py:132-143: the key is never updated,
and ``fields_excluded_from_update`` are omitted from the SET list so
target values (including NULLs) survive a match.  Statement strings
run through ``pipeline/hydrate.py`` like every reference query, so
``$run_date``-style placeholders hydrate identically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence


@dataclass(frozen=True)
class MergeSpec:
    """The one description both statement families are generated from:
    the ANSI ``MERGE INTO`` builders (`jdbc_merge.merge_*_sql`) consume
    (table, columns, key, excluded) positionally; the dialect builders
    below consume this same tuple as a value."""

    table: str
    columns: tuple[str, ...]
    key: str = "id"
    fields_excluded_from_update: tuple[str, ...] = field(default_factory=tuple)

    def updatable_columns(self) -> list[str]:
        """SET-list columns: everything except the key and the excluded
        fields (ref: Pype.py:132-143 — the key is filtered first, then
        the configured exclusions)."""
        skip = {self.key, *self.fields_excluded_from_update}
        return [c for c in self.columns if c not in skip]


def postgres_load_statement(spec: MergeSpec) -> str:
    """Insert-or-update via ``ON CONFLICT`` (ref: Pype.py:97-117).

    The conflict target is the key column; each surviving column takes
    PostgreSQL's ``excluded.`` pseudo-row (the proposed insert values)
    — last-writer-wins, exactly the ANSI MERGE's MATCHED branch.
    """
    sets = ",".join(
        f"{c} = excluded.{c}" for c in spec.updatable_columns()
    )
    return (
        f"INSERT INTO {spec.table} "
        f"(SELECT * FROM json_populate_recordset(null::{spec.table}, %s)) "
        f"ON CONFLICT ({spec.key}) DO UPDATE SET {sets}"
    )


def postgres_update_statement(spec: MergeSpec) -> str:
    """Update-only via ``UPDATE ... FROM`` (ref: Pype.py:118-130):
    matched rows take the batch's values, unmatched batch rows are
    dropped — never inserts, the ANSI MERGE's MATCHED-only form."""
    sets = ",".join(
        f"{c} = records.{c}" for c in spec.updatable_columns()
    )
    return (
        f"UPDATE {spec.table} AS target SET {sets} "
        f"FROM (SELECT * FROM json_populate_recordset(null::{spec.table}, %s)) "
        f"AS records WHERE target.{spec.key}=records.{spec.key};"
    )


def postgres_delete_statement(table: str, identifier: str) -> str:
    """Delete-by-key-set (ref: Pype.py:179-186): one array-typed
    parameter of uuid keys, matched with ``= ANY`` — the set-based form
    of the keyed sink's left-anti join."""
    return f"DELETE FROM {table} WHERE {identifier} = ANY(%s::uuid[])"


def ansi_upsert_statement(spec: MergeSpec, stage: str) -> str:
    """The SAME spec rendered as the executable ANSI form (proven live
    against Derby) — one description, two dialects."""
    from pypeline_spark.sinks.jdbc_merge import merge_upsert_sql

    return merge_upsert_sql(
        spec.table, stage, spec.columns, (spec.key,),
        spec.fields_excluded_from_update,
    )


def ansi_update_statement(spec: MergeSpec, stage: str) -> str:
    from pypeline_spark.sinks.jdbc_merge import merge_update_only_sql

    return merge_update_only_sql(
        spec.table, stage, spec.columns, (spec.key,),
        spec.fields_excluded_from_update,
    )


def ansi_delete_statement(spec: MergeSpec, stage: str) -> str:
    from pypeline_spark.sinks.jdbc_merge import merge_delete_sql

    return merge_delete_sql(spec.table, stage, spec.key)
