"""Guard the driver-gate registration window and the registry size.

The round driver oracle-checks only the FIRST 50 registered queries, so
`load_all._DRIVER_FIRST` is the verification budget. These checks catch
the silent failure modes of editing that list: a typo'd name (silently
skipped), an over/under-full window, or a promoted query that has no
oracle (burning a checked slot on a rows-only row).

The registry-size pin exists because ``plans/load_all.py`` used to
swallow pack ImportErrors silently: a single broken import could drop a
pack's 20-70 queries from the registry with no in-repo failure. Imports
are now unconditional, and this test fails if the count ever drifts
from the declared fleet size.
"""

from __future__ import annotations

from end_to_end_database_pipeline_project_spark.plans import ORACLES, QUERIES
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401
from end_to_end_database_pipeline_project_spark.plans.load_all import _DRIVER_FIRST

# The declared fleet size.  Bump BOTH numbers in the same commit that
# registers a new query; a mismatch here means a pack import silently
# lost (or double-registered) names.
EXPECTED_QUERIES = 311
EXPECTED_ORACLES = 309

# Rows-only queries allowed to burn a checked window slot.  Zero from
# r08 on: the r07 window closed the ledger at the full registry size
# (every query has a driver row, including the two certificate-backed
# rows-only names), so freshness windows carry only oracle-backed
# names.
ROWS_ONLY_WINDOW_ALLOWED: set[str] = set()


def test_registry_size_is_pinned():
    assert len(QUERIES) == EXPECTED_QUERIES, (
        f"registry has {len(QUERIES)} queries, expected {EXPECTED_QUERIES}: "
        "a pack import lost names or a new query wasn't accounted for here"
    )
    assert len(ORACLES) == EXPECTED_ORACLES
    assert len(load_all._PACKS) == 13


def test_every_oracle_has_a_query():
    orphans = [n for n in ORACLES if n not in QUERIES]
    assert not orphans, f"oracles without a registered query: {orphans}"


def test_window_is_exactly_50_registered_names():
    assert len(_DRIVER_FIRST) == 50
    missing = [n for n in _DRIVER_FIRST if n not in QUERIES]
    assert not missing, f"typo'd/unregistered names in _DRIVER_FIRST: {missing}"
    assert list(QUERIES)[:50] == _DRIVER_FIRST


def test_window_entries_are_all_oracle_checked():
    no_oracle = [
        n
        for n in _DRIVER_FIRST
        if n not in ORACLES and n not in ROWS_ONLY_WINDOW_ALLOWED
    ]
    assert not no_oracle, f"rows-only queries burn checked slots: {no_oracle}"


def test_no_duplicates_in_window():
    assert len(set(_DRIVER_FIRST)) == len(_DRIVER_FIRST)
