"""Edge-case unit tests for the scalar library (SURVEY.md §5.2).

The value-sniffing thresholds (Kelvin at 100, meters at 1), the
only-when-positive humidity cap and the midpoint fallback chain are where
the reference's real-world bugs lived (README.md:241-259) — each branch
boundary is pinned here.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.functions import scalar


def _eval(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    return [r[0] for r in df.select(col_fn(F.col("v")).alias("o")).collect()]


def test_kelvin_sniff_boundary(spark):
    # >100 converts; exactly 100 and below pass through (clickhouse_etl.py:221)
    out = _eval(spark, scalar.kelvin_sniff_to_celsius, [300.0, 100.0, 100.00001, 25.0, None])
    assert math.isclose(out[0], 26.85)
    assert out[1] == 100.0
    assert math.isclose(out[2], -173.14999)
    assert out[3] == 25.0
    assert out[4] is None


def test_meters_sniff_boundary(spark):
    # <1 multiplies by 1000; 1.0 and above pass through — including the
    # faithful 1.5-meters quirk (clickhouse_etl.py:227)
    out = _eval(spark, scalar.meters_sniff_to_mm, [0.005, 0.999, 1.0, 1.5, None])
    assert math.isclose(out[0], 5.0)
    assert math.isclose(out[1], 999.0)
    assert out[2] == 1.0
    assert out[3] == 1.5
    assert out[4] is None


def test_humidity_cap_only_when_positive(spark):
    # positive values cap at 100; zero, negative and null pass through
    # (clickhouse_etl.py:520,566)
    out = _eval(spark, scalar.humidity_cap, [150.0, 100.0, 42.0, 0.0, -5.0, None])
    assert out == [100.0, 100.0, 42.0, 0.0, -5.0, None]


def test_midpoint_fallback_chain(spark):
    df = spark.createDataFrame(
        [(10.0, 20.0), (10.0, None), (None, 20.0), (None, None)], "mx double, mn double"
    )
    out = [
        r[0]
        for r in df.select(
            scalar.midpoint_fallback(F.col("mx"), F.col("mn")).alias("o")
        ).collect()
    ]
    assert out == [15.0, 10.0, 20.0, None]


def test_temperature_conversions(spark):
    out = _eval(spark, scalar.fahrenheit_to_celsius, [32.0, 212.0])
    assert math.isclose(out[0], 0.0)
    assert math.isclose(out[1], 100.0)
    out = _eval(spark, scalar.celsius_to_fahrenheit, [0.0, 100.0])
    assert out == [32.0, 212.0]


def test_weather_description_buckets(spark):
    out = _eval(spark, scalar.weather_description, [80.0, 75.0, 61.0, 50.0, 10.0])
    assert out == ["Sunny", "Partly Cloudy", "Partly Cloudy", "Cloudy", "Cool"]


def test_last_path_segment(spark):
    df = spark.createDataFrame(
        [("https://api.weather.gov/stations/KSCK",), ("KX",)], "v string"
    )
    out = [r[0] for r in df.select(scalar.last_path_segment(F.col("v"))).collect()]
    assert out == ["KSCK", "KX"]
