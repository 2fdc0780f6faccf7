"""Scalar function library — the reference's semantic core (SURVEY.md §2.8).

Each function reproduces, as a native Catalyst column expression, one of
the driver-side Python scalar transforms of the reference pipeline
(F1-F21 in SURVEY.md §2.8). Native expressions keep the whole plan inside
whole-stage codegen — no Python round-trip in the hot path.

The value-sniffing branches (Kelvin at >100, meters at <1) and the
humidity cap's only-when-positive guard are the reference's observable
semantics, real-world bugs included — ported faithfully, not "fixed"
(reference: clickhouse_etl.py:218-227, 520, 566; mongodb_etl.py:38-49).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def kelvin_sniff_to_celsius(c: Column) -> Column:
    """F1: ``temp - 273.15 if temp > 100 else temp``.

    The reference sniffs the unit by magnitude (clickhouse_etl.py:218-221,
    mongodb_etl.py:38-41): NWS sometimes reports Kelvin. The >100 boundary
    is exclusive — 100.0 passes through unconverted.
    """
    return F.when(c > 100, c - F.lit(273.15)).otherwise(c)


def fahrenheit_to_celsius(c: Column) -> Column:
    """F2: ``(temp - 32) * 5/9`` (mongodb_etl.py:63-64, forecast temps)."""
    return (c - F.lit(32)) * 5 / 9


def meters_sniff_to_mm(c: Column) -> Column:
    """F3: ``rain * 1000 if rain < 1 else rain``.

    Note the faithful quirk (clickhouse_etl.py:224-227): the boundary is
    ``< 1``, so 0.999 m becomes 999 mm but a true 1.5 m passes through
    unconverted as "1.5 mm".
    """
    return F.when(c < 1, c * 1000).otherwise(c)


def celsius_to_fahrenheit(c: Column) -> Column:
    """F4: ``(c * 9/5) + 32`` (dashboard.py:1091-1092)."""
    return c * 9 / 5 + 32


def hour_bucket(ts: Column) -> Column:
    """F5: ``toStartOfHour(ts)`` (clickhouse_etl.py:321)."""
    return F.date_trunc("hour", ts)


def iso_ts(c: Column) -> Column:
    """F6/F9: parse-or-format ISO-8601 with trailing Z (clickhouse_etl.py:215)."""
    return F.to_timestamp(c)


def iso_format(c: Column) -> Column:
    """F9: ``isoformat() + 'Z'`` output shape (redis_etl.py:44)."""
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def date_parse_fallback(c: Column) -> Column:
    """F7: ``strptime('%Y-%m-%d')`` else ISO fallback (clickhouse_etl.py:135-141)."""
    return F.coalesce(F.to_date(c, "yyyy-MM-dd"), F.to_date(c))


def epoch_millis(ts: Column) -> Column:
    """F8: ``int(t.timestamp() * 1000)`` (nws_api_fetcher_v2.py:123)."""
    return F.unix_millis(ts)


def last_path_segment(c: Column) -> Column:
    """F10: station URL -> id via ``split('/')[-1]`` (clickhouse_etl.py:238)."""
    return F.element_at(F.split(c, "/"), -1)


def synthetic_id(prefix: Column | str, *parts: Column) -> Column:
    """F11: ``f"{prefix}_{...}"`` id synthesis (clickhouse_etl.py:241 etc.).

    All wall-clock inputs must be passed in as columns/params so output is
    deterministic under the oracle hash (SURVEY.md §5.3).
    """
    head = F.lit(prefix) if isinstance(prefix, str) else prefix
    return F.concat_ws("_", head, *parts)


def humidity_cap(c: Column) -> Column:
    """F12: ``min(h, 100.0) if h and h > 0 else h`` (clickhouse_etl.py:520,566).

    The cap applies only to positive values: nulls, zeros and negative
    readings pass through untouched — the band-aid for the reference's
    historical SummingMergeTree humidity corruption (README.md:256-259).
    """
    return F.when(c.isNotNull() & (c > 0), F.least(c, F.lit(100.0))).otherwise(c)


def midpoint_fallback(cmax: Column, cmin: Column) -> Column:
    """F13: avg = (max+min)/2 if both, else whichever exists, else null
    (clickhouse_etl.py:144-152). Null-propagation of ``+`` reproduces the
    branch semantics in one coalesce."""
    return F.coalesce((cmax + cmin) / 2, cmax, cmin)


def weather_description(c: Column) -> Column:
    """F17: temperature(F) bucketing (dashboard.py:699)."""
    return (
        F.when(c > 75, F.lit("Sunny"))
        .when(c > 60, F.lit("Partly Cloudy"))
        .when(c > 45, F.lit("Cloudy"))
        .otherwise(F.lit("Cool"))
    )


def high_low_estimate(temp_f: Column) -> tuple[Column, Column]:
    """F18: ``round(tempF ± 8)`` display high/low (dashboard.py:678-681)."""
    return F.round(temp_f + 8), F.round(temp_f - 8)


def month_name(c: Column) -> Column:
    """F19: ``'MMM yyyy'`` month label (dashboard.py:822-823)."""
    return F.date_format(c, "MMM yyyy")


def coalesce_default(c: Column, default) -> Column:
    """F16: ``doc.get(k, default)`` / ``x or default`` (clickhouse_etl.py:165,243)."""
    return F.coalesce(c, F.lit(default))
