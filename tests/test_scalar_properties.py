"""Property-based tests (hypothesis): the scalar library vs literal
Python ports of the reference's semantics.

The reference's unit conversions are data-dependent branches
(clickhouse_etl.py:218-227, :520, :144-152) whose boundary behavior the
edge tests pin pointwise; these properties check the full input space —
each Spark column expression must agree with a direct transcription of
the reference's Python on arbitrary finite doubles, including the
quirky regions (0.999 m -> 999 mm but 1.5 "m" passes through; humidity
0 is falsy so the cap skips it).

One Spark job per hypothesis example would be minutes of scheduler
overhead — instead each example IS a batch of doubles evaluated in one
job, so 25 examples x 40 values cover the space in a few jobs' time.
"""

from __future__ import annotations

import math
import os

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.functions import scalar

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)
batches = st.lists(st.one_of(finite, st.none()), min_size=1, max_size=40)

# default example count keeps the suite inside the driver's verify
# window; SPARK_GRAFT_STRESS=1 restores the full budget
_SETTINGS = dict(
    max_examples=25 if os.environ.get("SPARK_GRAFT_STRESS") else 10,
    deadline=None,
)


def _eval(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    return [r[0] for r in df.select(col_fn(F.col("v")).alias("o")).collect()]


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)


# --- literal transcriptions of the reference's Python -----------------


def _ref_kelvin(v):  # clickhouse_etl.py:218-221
    if v is None:
        return None
    return v - 273.15 if v > 100 else v


def _ref_meters(v):  # clickhouse_etl.py:224-227
    if v is None:
        return None
    return v * 1000 if v < 1 else v


def _ref_humidity_cap(v):  # clickhouse_etl.py:520 — `if row and row > 0`
    if v and v > 0:
        return min(v, 100.0)
    return v


def _ref_midpoint(vmax, vmin):  # clickhouse_etl.py:144-152
    if vmax is not None and vmin is not None:
        return (vmax + vmin) / 2
    return vmax if vmax is not None else vmin


# --- properties -------------------------------------------------------


@settings(**_SETTINGS)
@given(batches)
def test_kelvin_sniff_matches_reference(spark, vals):
    out = _eval(spark, scalar.kelvin_sniff_to_celsius, vals)
    assert all(_close(o, _ref_kelvin(v)) for o, v in zip(out, vals))


@settings(**_SETTINGS)
@given(batches)
def test_meters_sniff_matches_reference(spark, vals):
    out = _eval(spark, scalar.meters_sniff_to_mm, vals)
    assert all(_close(o, _ref_meters(v)) for o, v in zip(out, vals))


@settings(**_SETTINGS)
@given(batches)
def test_humidity_cap_matches_reference(spark, vals):
    out = _eval(spark, scalar.humidity_cap, vals)
    assert all(_close(o, _ref_humidity_cap(v)) for o, v in zip(out, vals))


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.one_of(finite, st.none()),
                          st.one_of(finite, st.none())),
                min_size=1, max_size=40))
def test_midpoint_fallback_matches_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "mx double, mn double")
    out = [
        r[0]
        for r in df.select(
            scalar.midpoint_fallback(F.col("mx"), F.col("mn")).alias("o")
        ).collect()
    ]
    assert all(_close(o, _ref_midpoint(mx, mn)) for o, (mx, mn) in zip(out, pairs))


@settings(**_SETTINGS)
@given(batches)
def test_temperature_conversion_roundtrip(spark, vals):
    # F4 and F2 are exact inverses up to float error
    rt = lambda c: scalar.fahrenheit_to_celsius(scalar.celsius_to_fahrenheit(c))
    out = _eval(spark, rt, vals)
    for o, v in zip(out, vals):
        if v is None:
            assert o is None
        else:
            assert math.isclose(o, v, rel_tol=1e-9, abs_tol=1e-9)
