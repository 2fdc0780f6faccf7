"""Guard the driver-gate registration window.

The round driver oracle-checks only the FIRST 50 registered queries, so
`load_all._DRIVER_FIRST` is the verification budget. These checks catch
the silent failure modes of editing that list: a typo'd name (silently
skipped), an over/under-full window, or a promoted query that has no
oracle (burning a checked slot on a rows-only row).
"""

from __future__ import annotations

from end_to_end_database_pipeline_project_spark.plans import ORACLES, QUERIES
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401
from end_to_end_database_pipeline_project_spark.plans.load_all import _DRIVER_FIRST


def test_window_is_exactly_50_registered_names():
    assert len(_DRIVER_FIRST) == 50
    missing = [n for n in _DRIVER_FIRST if n not in QUERIES]
    assert not missing, f"typo'd/unregistered names in _DRIVER_FIRST: {missing}"
    assert list(QUERIES)[:50] == _DRIVER_FIRST


def test_window_entries_are_all_oracle_checked():
    no_oracle = [n for n in _DRIVER_FIRST if n not in ORACLES]
    assert not no_oracle, f"rows-only queries burn checked slots: {no_oracle}"


def test_no_duplicates_in_window():
    assert len(set(_DRIVER_FIRST)) == len(_DRIVER_FIRST)
