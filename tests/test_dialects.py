"""String-parity of the PostgreSQL dialect builders with the
reference's literal statement templates (Pype.py:97-147, 179-186).

The expected strings below are constructed with the reference's OWN
%-templates (quoted from /root/reference/pypeline/Pype.py as the
assertion target), so a drift in spacing, comma joining, the excluded-
field rule, or the trailing semicolon fails loudly.  The same
MergeSpec also renders the executable ANSI MERGE (Derby-proven),
pinning that one spec drives both dialects.
"""

import pytest

from pypeline_spark.sinks.dialects import (
    MergeSpec,
    ansi_delete_statement,
    ansi_update_statement,
    ansi_upsert_statement,
    postgres_delete_statement,
    postgres_load_statement,
    postgres_update_statement,
)

HEADERS = ["id", "name", "balance", "segment", "updated_at"]
EXCLUDED = ("updated_at",)
SPEC = MergeSpec("public.customers", tuple(HEADERS), "id", EXCLUDED)


def _ref_fields(headers, excluded):
    # ref Pype.py:132-143 (remove_fields_excluded_from_update): drop the
    # id, then the configured exclusions, preserving header order
    fields = [f for f in headers if f != "id"]
    return [f for f in fields if f not in excluded]


def test_load_statement_matches_reference_template():
    # ref Pype.py:97-117: build_load_query = insert-part + " " +
    # on-conflict-part; SET list joined with "," (no space)
    fields = _ref_fields(HEADERS, EXCLUDED)
    insert_part = (
        "INSERT INTO %s (SELECT * FROM json_populate_recordset(null::%s, %%s))"
        % ("public.customers", "public.customers")
    )
    conflict_part = "ON CONFLICT (id) DO UPDATE SET %s" % (
        ",".join("%s = excluded.%s" % (f, f) for f in fields)
    )
    assert postgres_load_statement(SPEC) == "%s %s" % (insert_part, conflict_part)


def test_update_statement_matches_reference_template():
    # ref Pype.py:118-130: UPDATE ... FROM json_populate_recordset,
    # trailing semicolon, no spaces around target.id=records.id
    fields = _ref_fields(HEADERS, EXCLUDED)
    expected = (
        "UPDATE %s AS target SET %s FROM (SELECT * FROM "
        "json_populate_recordset(null::%s, %%s)) "
        "AS records WHERE target.id=records.id;"
    ) % ("public.customers", ",".join("%s = records.%s" % (f, f) for f in fields),
         "public.customers")
    assert postgres_update_statement(SPEC) == expected


def test_delete_statement_matches_reference_template():
    # ref Pype.py:179-186: one array-typed uuid parameter via = ANY
    expected = "DELETE FROM %s WHERE %s = ANY(%%s::uuid[])" % ("events", "event_id")
    assert postgres_delete_statement("events", "event_id") == expected


def test_key_is_never_in_the_set_list_even_when_not_excluded():
    spec = MergeSpec("t", ("id", "a"), "id", ())
    assert "id = excluded.id" not in postgres_load_statement(spec)
    assert "id = records.id" not in postgres_update_statement(spec)


def test_one_spec_drives_both_dialects():
    """The exclusion rule and column order must agree between the
    Postgres literals and the executable ANSI MERGE (same spec in,
    same SET membership out)."""
    pg = postgres_load_statement(SPEC)
    ansi = ansi_upsert_statement(SPEC, "stage")
    for col in _ref_fields(HEADERS, EXCLUDED):
        assert f"{col} = excluded.{col}" in pg
        assert f'"{col}" = u."{col}"' in ansi
    # excluded + key appear in neither SET list (scope the ANSI check
    # to the UPDATE SET segment — the key legitimately appears in the
    # ON clause and the INSERT branch)
    ansi_set = ansi.split("UPDATE SET", 1)[1].split("WHEN NOT MATCHED", 1)[0]
    for absent in ("updated_at", "id"):
        assert f"{absent} = excluded." not in pg
        assert f'"{absent}" = u."{absent}"' not in ansi_set
    upd = ansi_update_statement(SPEC, "stage")
    assert upd.startswith("MERGE INTO public.customers")
    assert "WHEN NOT MATCHED" not in upd  # update-only never inserts
    assert ansi_delete_statement(SPEC, "stage").endswith("WHEN MATCHED THEN DELETE")


def test_single_json_parameter_shape():
    """The reference binds ONE parameter: the whole batch as a JSON
    array exploded server-side.  Exactly one %s placeholder must
    survive in each json_populate_recordset statement."""
    for stmt in (postgres_load_statement(SPEC), postgres_update_statement(SPEC)):
        assert stmt.count("%s") == 1
        assert "json_populate_recordset(null::public.customers, %s)" in stmt


def test_statements_compose_with_placeholder_hydration():
    """The reference hydrates its statement templates before execution
    (Pype.py:102 build_load_query -> hydrate_query); the generated
    literals must round-trip through our hydrate without disturbing
    the DB-API %s parameter."""
    from pypeline_spark.pipeline.hydrate import hydrate_query

    spec = MergeSpec("{schema}.customers", ("id", "name"), "id", ())
    stmt = hydrate_query(postgres_load_statement(spec), {"schema": "analytics"})
    assert stmt.startswith("INSERT INTO analytics.customers ")
    assert "json_populate_recordset(null::analytics.customers, %s)" in stmt
    assert stmt.count("%s") == 1  # the bind parameter survives hydration
