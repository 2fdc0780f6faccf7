"""MV rewrite: chooser picks the coarsest sufficient view, lattice
derivations resolve transitively, and unanswerable grains raise."""

from __future__ import annotations

import pytest

from end_to_end_database_pipeline_project_spark.operators.mv import (
    MaterializedView,
    choose_mv,
)


def _mv(name, dims, rows):
    return MaterializedView(name, dims, build=None, measures={}, approx_rows=rows)


DAILY = _mv("mv_daily", ("event_type", "obs_date"), 150)
MONTHLY = _mv("mv_monthly", ("event_type", "obs_month"), 5)


def test_day_grain_needs_daily():
    assert choose_mv(("event_type", "obs_date"), [DAILY, MONTHLY]) is DAILY


def test_month_grain_prefers_coarser_monthly():
    assert choose_mv(("event_type", "obs_month"), [DAILY, MONTHLY]) is MONTHLY


def test_quarter_derives_transitively_from_month():
    assert choose_mv(("event_type", "obs_quarter"), [MONTHLY]) is MONTHLY


def test_quarter_also_derivable_from_daily_when_monthly_absent():
    assert choose_mv(("event_type", "obs_quarter"), [DAILY]) is DAILY


def test_unanswerable_grain_raises():
    with pytest.raises(ValueError):
        choose_mv(("user_id",), [DAILY, MONTHLY])
