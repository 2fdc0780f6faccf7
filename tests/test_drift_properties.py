"""Drift-monitor invariants against an independent implementation.

The oracle parity checks prove Spark == DuckDB on the fixture shapes;
these pin the MATH on randomized (seeded) data against a pure-Python
reimplementation plus the statistics' analytic invariants:

- PSI >= 0 always (each term (p-q)ln(p/q) is nonnegative), == 0 when
  the batch IS the reference sample;
- grid-anchored KS in [0, 1] and <= the classical exact two-sample D
  (the grid evaluates the same ECDF gap on a subset of points);
- Spark values == the pure-Python recomputation on the same rows.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

N_REF = 1500
BATCHES = {"same": 0.0, "shifted": 0.8, "wild": 5.0}


def _py_psi(ref_vals, batch_vals):
    lo, hi = min(ref_vals), max(ref_vals)

    def bin_of(v):
        if hi == lo:
            return 0
        return max(0, min(int(math.floor((v - lo) / ((hi - lo) / 10.0))), 9))

    rn = [0] * 10
    for v in ref_vals:
        rn[bin_of(v)] += 1
    bn = [0] * 10
    for v in batch_vals:
        bn[bin_of(v)] += 1
    tr, td = len(ref_vals), len(batch_vals)
    psi = 0.0
    for b in range(10):
        pr = (rn[b] + 1.0) / (tr + 10.0)
        pc = (bn[b] + 1.0) / (td + 10.0)
        psi += (pr - pc) * math.log(pr / pc)
    return round(psi, 6)


def _py_grid_ks(ref_vals, ref_ids, batch_vals):
    order = sorted(range(len(ref_vals)), key=lambda i: (ref_vals[i], ref_ids[i]))
    nr = len(ref_vals)
    grid = []
    for k in range(1, 20):
        rank = max(1, math.ceil(k * nr / 20.0))
        grid.append(ref_vals[order[rank - 1]])
    td = len(batch_vals)
    d = 0.0
    for g in grid:
        fr = sum(1 for v in ref_vals if v <= g) / nr
        fb = sum(1 for v in batch_vals if v <= g) / td
        d = max(d, abs(fr - fb))
    return round(d, 6)


def _py_exact_ks(ref_vals, batch_vals):
    pts = sorted(set(ref_vals) | set(batch_vals))
    nr, td = len(ref_vals), len(batch_vals)
    rs, bs = sorted(ref_vals), sorted(batch_vals)
    import bisect

    return max(
        abs(bisect.bisect_right(rs, x) / nr - bisect.bisect_right(bs, x) / td)
        for x in pts
    )


@pytest.fixture(scope="module")
def drift_data(spark):
    from end_to_end_database_pipeline_project_spark.streaming.drift import (
        ks_against_reference,
        psi_against_reference,
        reference_grid,
        reference_histogram,
    )

    rng = np.random.default_rng(20260815)
    ref_vals = rng.normal(10.0, 2.0, N_REF).tolist()
    ref_ids = list(range(N_REF))
    ref = spark.createDataFrame(
        list(zip(ref_ids, ref_vals)), "event_id long, value double"
    )
    hist = reference_histogram(ref).localCheckpoint()
    grid = reference_grid(ref).localCheckpoint()

    batches = {"same": ref_vals}
    for name, shift in BATCHES.items():
        if name == "same":
            continue
        batches[name] = (rng.normal(10.0 + shift, 2.0, 700)).tolist()
    rows = [
        (name, v) for name, vals in batches.items() for v in vals
    ]
    batch = spark.createDataFrame(rows, "batch string, value double")
    psi = {
        r["batch"]: r
        for r in psi_against_reference(batch, hist, group_cols=["batch"]).collect()
    }
    ks = {
        r["batch"]: r
        for r in ks_against_reference(batch, grid, group_cols=["batch"]).collect()
    }
    return ref_vals, ref_ids, batches, psi, ks


def test_psi_matches_pure_python_and_is_nonnegative(drift_data):
    ref_vals, _, batches, psi, _ = drift_data
    for name, vals in batches.items():
        expected = _py_psi(ref_vals, vals)
        got = psi[name]["psi"]
        assert got == pytest.approx(expected, abs=1e-9), name
        assert got >= 0.0, f"PSI must be nonnegative, got {got} for {name}"
        assert psi[name]["n_events"] == len(vals)


def test_psi_zero_on_identical_sample_and_orders_with_shift(drift_data):
    _, _, _, psi, _ = drift_data
    assert psi["same"]["psi"] == 0.0
    assert not psi["same"]["drifted"]
    assert psi["same"]["psi"] < psi["shifted"]["psi"] < psi["wild"]["psi"]
    assert psi["wild"]["drifted"] is True


def test_grid_ks_matches_python_bounded_by_exact(drift_data):
    ref_vals, ref_ids, batches, _, ks = drift_data
    for name, vals in batches.items():
        expected = _py_grid_ks(ref_vals, ref_ids, vals)
        got = ks[name]["ks_d"]
        assert got == pytest.approx(expected, abs=1e-9), name
        assert 0.0 <= got <= 1.0
        # grid statistic evaluates the same ECDF gap on a SUBSET of
        # points, so it can never exceed the classical D
        assert got <= _py_exact_ks(ref_vals, vals) + 1e-9, name


def test_empty_reference_yields_no_verdicts(spark):
    # no reference, no verdict: a histogram/grid built from ZERO
    # reference rows must produce an EMPTY monitor result, never a
    # confident PSI/KS against a fabricated all-zero reference
    from end_to_end_database_pipeline_project_spark.streaming.drift import (
        ks_against_reference,
        psi_against_reference,
        reference_grid,
        reference_histogram,
    )

    empty_ref = spark.createDataFrame([], "event_id long, value double")
    hist = reference_histogram(empty_ref)
    grid = reference_grid(empty_ref)
    batch = spark.createDataFrame(
        [("b1", 1.0), ("b1", 2.0)], "batch string, value double"
    )
    assert psi_against_reference(batch, hist, group_cols=["batch"]).count() == 0
    assert ks_against_reference(batch, grid, group_cols=["batch"]).count() == 0


def test_reference_builders_exclude_nulls(spark):
    # an UNFILTERED reference with NULL values must produce the same
    # artifacts as the pre-filtered reference: reference_histogram
    # must not count NULLs into ref_total (deflated proportions ->
    # biased PSI) and reference_grid must not rank them into the
    # ventile grid (r07 advice)
    from end_to_end_database_pipeline_project_spark.streaming.drift import (
        reference_grid,
        reference_histogram,
    )

    clean_rows = [(i, float(i % 50)) for i in range(200)]
    null_rows = [(1000 + i, None) for i in range(60)]
    clean = spark.createDataFrame(clean_rows, "event_id long, value double")
    dirty = spark.createDataFrame(
        clean_rows + null_rows, "event_id long, value double"
    )
    h_clean = sorted(map(tuple, reference_histogram(clean).collect()))
    h_dirty = sorted(map(tuple, reference_histogram(dirty).collect()))
    assert h_clean == h_dirty
    assert h_dirty[0][-1] == 200  # ref_total excludes the 60 NULLs
    g_clean = sorted(map(tuple, reference_grid(clean).collect()))
    g_dirty = sorted(map(tuple, reference_grid(dirty).collect()))
    assert g_clean == g_dirty


def test_constant_reference_flags_degenerate(spark):
    # a CONSTANT reference clamps every batch value to bin 0, so PSI is
    # structurally 0 for ANY batch — the verdict must carry
    # ref_degenerate=true so blindness doesn't read as "no drift"
    from end_to_end_database_pipeline_project_spark.streaming.drift import (
        psi_against_reference,
        reference_histogram,
    )

    const_ref = spark.createDataFrame(
        [(i, 5.0) for i in range(100)], "event_id long, value double"
    )
    hist = reference_histogram(const_ref)
    batch = spark.createDataFrame(
        [("b1", float(v)) for v in range(100)], "batch string, value double"
    )
    [row] = psi_against_reference(batch, hist, group_cols=["batch"]).collect()
    assert row["psi"] == 0.0  # blind by construction
    assert row["ref_degenerate"] is True
    assert not row["drifted"]


def test_healthy_reference_not_flagged_degenerate(drift_data):
    _, _, _, psi, _ = drift_data
    assert all(r["ref_degenerate"] is False for r in psi.values())


def test_ks_zero_on_identical_sample_and_alerts_on_wild(drift_data):
    _, _, _, _, ks = drift_data
    assert ks["same"]["ks_d"] == 0.0
    assert not ks["same"]["drifted"]
    # mean shift of 2.5 sigma: classical exact D ~= 0.79 on these
    # samples and the grid statistic tracks it closely (0.78)
    assert ks["wild"]["ks_d"] > 0.5
    assert ks["wild"]["drifted"] is True
    assert ks["same"]["ks_d"] < ks["shifted"]["ks_d"] < ks["wild"]["ks_d"]
