"""Registry contract: the driver checks only the FIRST 50 registered
queries (observed cap), so registration order is load-bearing — these
tests pin it, plus basic registry hygiene.

Round-14 rotation: the window holds 45 of the 50-query r9-stale
cohort (5 deferred to r15, where they are non-negotiable),
first-certification slots for the four operators added in round 14
(change-feed continuity across reorg commits, feed × schema
evolution, column mapping, the durable IVM maintainer), and a
re-certification slot for the semantics-changed q_ivm_cdc — pinned
one-to-one against ``registry._DRIVER_WINDOW`` so any drift is a
loud failure.
``test_driver_window_covers_stale_certifications`` makes the round-8
process failure (a planned rotation that was never pinned)
mechanically impossible: it parses every CORRECTNESS_r*.json the
driver has recorded and goes red when any registered query's latest
driver-green round is absent or too stale while the pinned window
doesn't schedule it for re-certification.
"""

import json
import re
from pathlib import Path

from pypeline_spark.registry import _DRIVER_WINDOW, load_all

REPO = Path(__file__).resolve().parent.parent

# A certification MORE than this many rounds behind the newest
# CORRECTNESS record is "stale" and must be queued in _DRIVER_WINDOW.
# The comparison is strict (newest - cert > bound): a query certified
# at round c is flagged once the newest record reaches c+6, so it must
# sit in the window pinned for round c+7 at the latest — a 6-to-7
# round re-certification interval.  That needs ceil(235/6) = 40 slots
# per 50-slot window in steady state, so a skewed backlog (two >=49
# cohorts going stale back-to-back, as after r9) can drain over two
# windows without the guard becoming unsatisfiable.  (The r9 guard
# used >=, which demanded ceil(235/5) = 47 slots and left no slack —
# flagged by the r9 advisor as structurally fragile.)
MAX_CERT_AGE_ROUNDS = 5


def _latest_driver_green() -> tuple[dict[str, int], int]:
    """(query -> latest driver-green round, newest recorded round)."""
    latest: dict[str, int] = {}
    newest = 0
    # r*.json, not r0*.json: the latter stops matching at round 10
    # (the regex below already parses both r09 and r10 forms).
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", f.name).group(1))
        newest = max(newest, rnd)
        for q, v in json.loads(f.read_text()).items():
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
                latest[q] = rnd
    return latest, newest


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


def test_driver_window_covers_stale_certifications():
    """Every registered query must either hold a recent driver-green
    row or sit in the pinned window for re-certification.  This is the
    guard the r8 verdict directed: in round 8 a planned rotation was
    never pinned, so three queries sat with zero driver certifications
    while the driver re-certified fresh ones.  Red here means: rotate
    ``_DRIVER_WINDOW`` before the round ends."""
    latest, newest = _latest_driver_green()
    if newest == 0:  # no driver records yet (fresh clone)
        return
    window = set(_DRIVER_WINDOW)
    overdue = []
    for name in load_all():
        cert = latest.get(name)
        if name in window:
            continue  # queued for re-certification this round
        if cert is None:
            overdue.append(f"{name} (never driver-certified)")
        elif newest - cert > MAX_CERT_AGE_ROUNDS:
            overdue.append(f"{name} (latest cert r{cert}, newest record r{newest})")
    assert not overdue, (
        "queries overdue for driver certification and not in _DRIVER_WINDOW: "
        + ", ".join(overdue)
    )


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
