"""Reference-parity queries over the ``events`` table (SURVEY.md §2.4/§2.8).

``events`` plays the reference's ``weather_observations`` fact table
(FIXTURES.md §2): ts -> timestamp, user_id -> station_id, value -> the
measure, props JSON -> nested doc fields. Each query mirrors one
reference behavior (clickhouse_etl.py / redis_etl.py / mongodb_etl.py
citations inline) and carries a DuckDB oracle with identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalar
from ..operators.rollup import daily_rollup, hourly_aggregate, monthly_rollup
from ..sources.catalog import load_table
from .registry import query

_R = 6  # float rounding applied identically on both sides


def _round(df: DataFrame, *cols: str, r: int = _R) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), r))
    return df


# Shared oracle CTE: the A1 hourly dedup aggregate (clickhouse_etl.py:318-331).
_HOURLY_CTE = """
hourly AS (
  SELECT CAST(ts AS DATE) AS obs_date,
         CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS obs_hour,
         avg(value) AS avg_value,
         max(value) AS max_value,
         min(value) AS min_value,
         count(*) AS observation_count
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
)"""

_DAILY_CTE = f"""
{_HOURLY_CTE},
daily AS (
  SELECT obs_date,
         avg(avg_value) AS avg_value,
         max(max_value) AS max_value,
         min(min_value) AS min_value,
         sum(max_value) AS total_value,
         CAST(sum(observation_count) AS BIGINT) AS observation_count
  FROM hourly GROUP BY obs_date
)"""

_MONTHLY_CTE = f"""
{_DAILY_CTE},
monthly AS (
  SELECT CAST(year(obs_date) AS BIGINT) AS year,
         CAST(month(obs_date) AS BIGINT) AS month,
         avg(avg_value) AS avg_value,
         max(max_value) AS max_value,
         min(min_value) AS min_value,
         sum(total_value) AS total_value,
         CAST(sum(observation_count) AS BIGINT) AS observation_count
  FROM daily GROUP BY 1, 2
)"""


@query(
    "hourly_dedup_agg",
    oracle=f"""WITH {_HOURLY_CTE}
SELECT obs_date, obs_hour, round(avg_value, 6) AS avg_value,
       round(max_value, 6) AS max_value, round(min_value, 6) AS min_value,
       observation_count
FROM hourly""",
)
def hourly_dedup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the hour-grain dedup aggregate (clickhouse_etl.py:318-331)."""
    ev = load_table(spark, sf_dir, "events")
    return _round(hourly_aggregate(ev), "avg_value", "max_value", "min_value")


@query(
    "daily_weather_rollup",
    oracle=f"""WITH {_DAILY_CTE}
SELECT obs_date, round(avg_value, 6) AS avg_value, round(max_value, 6) AS max_value,
       round(min_value, 6) AS min_value, round(total_value, 6) AS total_value,
       observation_count
FROM daily ORDER BY obs_date DESC LIMIT 30""",
)
def daily_weather_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY.md §7.3): A1 -> A2 avg-of-avgs daily rollup,
    last 30 days (clickhouse_etl.py:309-334 + :554-556)."""
    ev = load_table(spark, sf_dir, "events")
    daily = daily_rollup(hourly_aggregate(ev))
    daily = _round(daily, "avg_value", "max_value", "min_value", "total_value")
    return daily.orderBy(F.desc("obs_date")).limit(30)


@query(
    "monthly_weather_rollup",
    oracle=f"""WITH {_MONTHLY_CTE}
SELECT year, month, round(avg_value, 6) AS avg_value, round(max_value, 6) AS max_value,
       round(min_value, 6) AS min_value, round(total_value, 6) AS total_value,
       observation_count
FROM monthly ORDER BY year DESC, month DESC LIMIT 12""",
)
def monthly_weather_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: three-level rollup, last-12-months serving shape
    (clickhouse_etl.py:370-411, :472-524)."""
    ev = load_table(spark, sf_dir, "events")
    monthly = monthly_rollup(daily_rollup(hourly_aggregate(ev)))
    monthly = _round(monthly, "avg_value", "max_value", "min_value", "total_value")
    return monthly.orderBy(F.desc("year"), F.desc("month")).limit(12)


@query(
    "daily_averages_serving",
    oracle=f"""WITH {_HOURLY_CTE},
daily AS (
  SELECT obs_date,
         avg(avg_value) AS avg_value,
         sum(max_value) AS total_value,
         CAST(sum(observation_count) AS BIGINT) AS observation_count,
         max(obs_hour) AS latest_obs_time
  FROM hourly GROUP BY obs_date
)
SELECT obs_date, round(avg_value, 6) AS avg_value, round(total_value, 6) AS total_value,
       observation_count, latest_obs_time
FROM daily ORDER BY obs_date DESC LIMIT 30""",
)
def daily_averages_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: serving daily averages with latest-observation-time carried
    through (clickhouse_etl.py:526-573)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = hourly_aggregate(ev)
    daily = hourly.groupBy("obs_date").agg(
        F.avg("avg_value").alias("avg_value"),
        F.sum("max_value").alias("total_value"),
        F.sum("observation_count").alias("observation_count"),
        F.max("obs_hour").alias("latest_obs_time"),
    )
    daily = _round(daily, "avg_value", "total_value")
    return daily.orderBy(F.desc("obs_date")).limit(30)


@query(
    "overall_summary",
    oracle=f"""WITH {_MONTHLY_CTE}
SELECT round(avg(avg_value), 6) AS overall_avg_value,
       round(sum(total_value), 6) AS overall_total_value,
       round(avg(max_value), 6) AS avg_monthly_max,
       CAST(count(*) AS BIGINT) AS period_months
FROM monthly""",
)
def overall_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A9: cache-time overall-averages summary — avg over monthly
    avgs, grand totals, period count (redis_etl.py:31-58;
    dashboard.py:1108-1126 collapse into one engine-side op)."""
    ev = load_table(spark, sf_dir, "events")
    monthly = monthly_rollup(daily_rollup(hourly_aggregate(ev)))
    return monthly.agg(
        F.round(F.avg("avg_value"), _R).alias("overall_avg_value"),
        F.round(F.sum("total_value"), _R).alias("overall_total_value"),
        F.round(F.avg("max_value"), _R).alias("avg_monthly_max"),
        F.count(F.lit(1)).alias("period_months"),
    )


@query(
    "latest_record",
    oracle="""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
FROM events ORDER BY ts DESC, event_id DESC LIMIT 1""",
)
def latest_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: latest-record lookup (mongodb_etl.py:124-128); event_id
    breaks timestamp ties deterministically."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
    )


@query(
    "station_enrichment",
    oracle="""SELECT user_id,
       round(avg(value), 6) AS avg_value,
       round(sum(value), 6) AS total_value,
       count(*) AS observation_count,
       count(*) FILTER (WHERE event_type = 'error') AS error_count,
       count(*) FILTER (WHERE value IS NOT NULL) AS non_null_count
FROM events GROUP BY user_id""",
)
def station_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: per-entity enrichment metrics — the reference's per-document
    calculated_metrics (mongodb_etl.py:22-77) as one hash aggregate
    keyed by the station role column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(F.avg("value"), _R).alias("avg_value"),
        F.round(F.sum("value"), _R).alias("total_value"),
        F.count(F.lit(1)).alias("observation_count"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("error_count"),
        F.count("value").alias("non_null_count"),
    )


@query(
    "unit_conversions",
    oracle="""SELECT event_id,
       round(CASE WHEN value > 100 THEN value - 273.15 ELSE value END, 6) AS temp_c,
       round(CASE WHEN value < 1 THEN value * 1000 ELSE value END, 6) AS rain_mm,
       round(value * 9 / 5 + 32, 6) AS temp_f,
       round((value - 32) * 5 / 9, 6) AS forecast_c,
       round(CASE WHEN value IS NOT NULL AND value > 0
                  THEN least(value, 100.0) ELSE value END, 6) AS capped_humidity
FROM events""",
)
def unit_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F4 + F12: the value-sniffing unit conversions and the
    only-when-positive humidity cap, applied per row
    (clickhouse_etl.py:218-227,520; mongodb_etl.py:38-49,63-64)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(scalar.kelvin_sniff_to_celsius(v), _R).alias("temp_c"),
        F.round(scalar.meters_sniff_to_mm(v), _R).alias("rain_mm"),
        F.round(scalar.celsius_to_fahrenheit(v), _R).alias("temp_f"),
        F.round(scalar.fahrenheit_to_celsius(v), _R).alias("forecast_c"),
        F.round(scalar.humidity_cap(v), _R).alias("capped_humidity"),
    )


@query(
    "weather_buckets",
    oracle="""SELECT CASE WHEN value * 9 / 5 + 32 > 75 THEN 'Sunny'
            WHEN value * 9 / 5 + 32 > 60 THEN 'Partly Cloudy'
            WHEN value * 9 / 5 + 32 > 45 THEN 'Cloudy'
            ELSE 'Cool' END AS description,
       count(*) AS n,
       round(avg(value), 6) AS avg_value
FROM events WHERE value IS NOT NULL GROUP BY 1""",
)
def weather_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17: weather-description bucketing over display-Fahrenheit
    (dashboard.py:699), grouped with counts."""
    ev = load_table(spark, sf_dir, "events")
    f = scalar.celsius_to_fahrenheit(F.col("value"))
    return (
        ev.where(F.col("value").isNotNull())
        .groupBy(scalar.weather_description(f).alias("description"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), _R).alias("avg_value"),
        )
    )


@query(
    "json_props_extract",
    oracle="""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n,
       round(avg(value), 6) AS avg_value,
       round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k
FROM events GROUP BY 1""",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15/P1: semi-structured extraction — parse the props JSON column,
    pull a nested field, aggregate by it (the reference's nested
    properties.*.value access, clickhouse_etl.py:210-238, re-expressed
    as get_json_object over a JSON string column)."""
    ev = load_table(spark, sf_dir, "events")
    # from_json with an explicit schema parses the document ONCE per row;
    # repeating get_json_object per referenced field re-parses per call
    # (2x here, Nx for the reference's 7-field extraction)
    parsed = ev.select(
        "value", F.from_json("props", "k long").getField("k").alias("k")
    )
    k = F.col("k")
    return parsed.groupBy((k % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), _R).alias("avg_value"),
        F.round(F.avg(k.cast("double")), _R).alias("avg_k"),
    )


@query(
    "lineage_stamped_load",
    oracle="""SELECT event_id, user_id,
       'batch_' || strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS etl_batch_id,
       CAST(user_id AS VARCHAR) || '_' || CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS VARCHAR)
         AS observation_id,
       'full' AS sync_type
FROM events""",
)
def lineage_stamped_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.4/F8/F11: lineage metadata stamping with deterministic ids —
    batch id from the event's own date, observation id as
    station_epochms (nws_api_fetcher_v2.py:123; mongodb_etl.py:97;
    clickhouse_etl.py:241) — wall-clock made injectable per SURVEY §5.3."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.concat(F.lit("batch_"), F.date_format("ts", "yyyyMMdd")).alias("etl_batch_id"),
        # floor μs→ms explicitly: Spark's unix_millis half-rounds, DuckDB's
        # epoch_ms floors — floor on both sides keeps the hash stable.
        scalar.synthetic_id(
            F.col("user_id").cast("string"),
            F.expr("unix_micros(ts) div 1000").cast("string"),
        ).alias("observation_id"),
        F.lit("full").alias("sync_type"),
    )


@query(
    "dashboard_display",
    oracle=f"""WITH {_DAILY_CTE[1:]}
SELECT obs_date,
       strftime(obs_date, '%b %Y') AS month_label,
       round((avg_value * 9/5) + 32, 1) AS avg_temp_f,
       CAST(round(((avg_value * 9/5) + 32) + 8, 0) AS BIGINT) AS high_estimate_f,
       CAST(round(((avg_value * 9/5) + 32) - 8, 0) AS BIGINT) AS low_estimate_f,
       CASE WHEN (avg_value * 9/5) + 32 > 75 THEN 'Sunny'
            WHEN (avg_value * 9/5) + 32 > 60 THEN 'Partly Cloudy'
            WHEN (avg_value * 9/5) + 32 > 45 THEN 'Cloudy'
            ELSE 'Cool' END AS weather_description
FROM daily""",
)
def dashboard_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dashboard's display-layer scalar functions as engine columns:
    C->F (F4, dashboard.py:1091-1092), high/low estimate = round(F +- 8)
    (F18, dashboard.py:678-681), weather-description bucketing (F17,
    dashboard.py:699), month-name label (F19, dashboard.py:822-823),
    display rounding (F21) — over the A2 daily rollup."""
    ev = load_table(spark, sf_dir, "events")
    daily = daily_rollup(hourly_aggregate(ev, ts="ts", measure="value"))
    temp_f = (F.col("avg_value") * 9 / 5) + 32
    return daily.select(
        "obs_date",
        F.date_format("obs_date", "MMM yyyy").alias("month_label"),
        F.round(temp_f, 1).alias("avg_temp_f"),
        F.round(temp_f + 8, 0).cast("long").alias("high_estimate_f"),
        F.round(temp_f - 8, 0).cast("long").alias("low_estimate_f"),
        F.when(temp_f > 75, "Sunny")
        .when(temp_f > 60, "Partly Cloudy")
        .when(temp_f > 45, "Cloudy")
        .otherwise("Cool")
        .alias("weather_description"),
    )


@query(
    "serving_json_envelope",
    oracle=f"""WITH {_MONTHLY_CTE[1:]},
recent AS (
  SELECT * FROM monthly ORDER BY year DESC, month DESC LIMIT 12
),
summary AS (
  SELECT round(avg(avg_value), 6) AS avg_temperature_c,
         round(sum(total_value), 6) AS total_rainfall_mm,
         round(avg(CASE WHEN avg_value IS NOT NULL AND avg_value > 0
                        THEN least(avg_value, 100.0) ELSE avg_value END), 6)
           AS avg_humidity_percent,
         CAST(count(*) AS BIGINT) AS period_months,
         CAST(max(year * 100 + month) AS BIGINT) AS latest_period
  FROM recent
)
SELECT 'weather:stockton:monthly_averages' AS cache_key,
       to_json(struct_pack(
         location := 'stockton',
         data_version := 'v' || CAST(latest_period AS VARCHAR),
         refresh_interval_sec := CAST(3600 AS BIGINT),
         avg_temperature_c := avg_temperature_c,
         total_rainfall_mm := total_rainfall_mm,
         avg_humidity_percent := avg_humidity_percent,
         period_months := period_months
       )) AS payload
FROM summary""",
)
def serving_json_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15/A8: the Redis cache envelope as data — overall averages over
    the last 12 months (avg-of-avgs again, redis_etl.py:31-58), humidity
    cap applied (F12), serialized with ``to_json`` (F14) under the
    reference's cache key, with data_version derived from the latest
    period instead of wall clock (deterministic, SURVEY.md §5.3) and the
    TTL carried as envelope metadata (refresh_interval_sec,
    redis_etl.py:44-46)."""
    ev = load_table(spark, sf_dir, "events")
    monthly = monthly_rollup(daily_rollup(hourly_aggregate(ev, ts="ts", measure="value")))
    recent = monthly.orderBy(F.desc("year"), F.desc("month")).limit(12)
    capped = scalar.humidity_cap(F.col("avg_value"))
    summary = recent.agg(
        F.round(F.avg("avg_value"), _R).alias("avg_temperature_c"),
        F.round(F.sum("total_value"), _R).alias("total_rainfall_mm"),
        F.round(F.avg(capped), _R).alias("avg_humidity_percent"),
        F.count(F.lit(1)).alias("period_months"),
        F.max(F.col("year") * 100 + F.col("month")).alias("latest_period"),
    )
    return summary.select(
        F.lit("weather:stockton:monthly_averages").alias("cache_key"),
        F.to_json(
            F.struct(
                F.lit("stockton").alias("location"),
                F.concat(F.lit("v"), F.col("latest_period").cast("string")).alias(
                    "data_version"
                ),
                F.lit(3600).cast("long").alias("refresh_interval_sec"),
                F.col("avg_temperature_c"),
                F.col("total_rainfall_mm"),
                F.col("avg_humidity_percent"),
                F.col("period_months"),
            ),
            # keep null fields in the envelope (Spark's default drops
            # them): a cache consumer needs the full key set, and the
            # oracle's to_json(struct_pack(...)) always emits them —
            # only observable when a summary field is NULL (empty
            # history); byte-identical otherwise
            {"ignoreNullFields": "false"},
        ).alias("payload"),
    )


@query(
    "monthly_averages_serving",
    oracle=f"""WITH {_HOURLY_CTE},
daily AS (
  SELECT obs_date,
         avg(avg_value) AS avg_value,
         max(max_value) AS max_value,
         min(min_value) AS min_value,
         sum(max_value) AS total_value,
         CAST(sum(observation_count) AS BIGINT) AS observation_count,
         max(obs_hour) AS latest_hour
  FROM hourly GROUP BY obs_date
),
monthly AS (
  SELECT CAST(year(obs_date) AS BIGINT) AS year,
         CAST(month(obs_date) AS BIGINT) AS month,
         avg(avg_value) AS avg_value,
         max(max_value) AS max_value,
         min(min_value) AS min_value,
         sum(total_value) AS total_value,
         CAST(sum(observation_count) AS BIGINT) AS observation_count,
         max(latest_hour) AS latest_obs_time
  FROM daily GROUP BY 1, 2
)
SELECT year, month,
       round(CASE WHEN avg_value IS NOT NULL AND avg_value > 0
                  THEN least(avg_value, 100.0) ELSE avg_value END, 6) AS avg_value,
       round(max_value, 6) AS max_value, round(min_value, 6) AS min_value,
       round(total_value, 6) AS total_value, observation_count, latest_obs_time
FROM monthly ORDER BY year DESC, month DESC LIMIT 12""",
)
def monthly_averages_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: the monthly serving variant — hour->day->month rollup with the
    latest observation hour carried through every grain, last-12-months
    slice, humidity-cap semantics on the served average
    (clickhouse_etl.py:472-524; cap at :520)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = hourly_aggregate(ev, ts="ts", measure="value")
    daily = hourly.groupBy("obs_date").agg(
        F.avg("avg_value").alias("avg_value"),
        F.max("max_value").alias("max_value"),
        F.min("min_value").alias("min_value"),
        F.sum("max_value").alias("total_value"),
        F.sum("observation_count").alias("observation_count"),
        F.max("obs_hour").alias("latest_hour"),
    )
    monthly = daily.groupBy(
        F.year("obs_date").cast("long").alias("year"),
        F.month("obs_date").cast("long").alias("month"),
    ).agg(
        F.avg("avg_value").alias("avg_value"),
        F.max("max_value").alias("max_value"),
        F.min("min_value").alias("min_value"),
        F.sum("total_value").alias("total_value"),
        F.sum("observation_count").alias("observation_count"),
        F.max("latest_hour").alias("latest_obs_time"),
    )
    return (
        monthly.select(
            "year",
            "month",
            F.round(scalar.humidity_cap(F.col("avg_value")), _R).alias("avg_value"),
            F.round("max_value", _R).alias("max_value"),
            F.round("min_value", _R).alias("min_value"),
            F.round("total_value", _R).alias("total_value"),
            "observation_count",
            "latest_obs_time",
        )
        .orderBy(F.desc("year"), F.desc("month"))
        .limit(12)
    )


@query(
    "null_handling_defaults",
    oracle="""SELECT
  CAST(count(*) AS BIGINT) AS n_total,
  CAST(count(value) AS BIGINT) AS n_value_present,
  round(sum(coalesce(value, 0.0)), 6) AS total_with_defaults,
  CAST(coalesce(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_defaulted,
  round(avg(CASE WHEN value IS NOT NULL THEN value END), 6) AS avg_dropna
FROM events""",
)
def null_handling_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 null-coalescing defaults as DataFrame NA ops: ``na.fill`` for
    the rainfall-or-0 pattern (dashboard.py:824), ``na.drop`` for the
    filter-then-average pattern (mongodb_etl.py:39-54) — both are sugar
    over the same coalesce/isNotNull expressions Catalyst optimizes."""
    ev = load_table(spark, sf_dir, "events")
    filled = ev.na.fill({"value": 0.0})
    dropped = ev.na.drop(subset=["value"])
    return (
        ev.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(
            filled.agg(F.round(F.sum("value"), _R).alias("total_with_defaults"))
        )
        .crossJoin(
            dropped.agg(
                F.count(F.lit(1)).alias("n_value_present"),
                F.round(F.avg("value"), _R).alias("avg_dropna"),
            )
        )
        .select(
            "n_total",
            "n_value_present",
            "total_with_defaults",
            (F.col("n_total") - F.col("n_value_present")).alias("n_defaulted"),
            "avg_dropna",
        )
    )


# F20: the dashboard's 8-stop warm-to-cool rainfall gradient
# (dashboard.py:830-906). One shared stop table generates BOTH the Spark
# piecewise expression and the DuckDB CASE chain, so the two sides are
# the same formula by construction. JS Math.round == floor(x + 0.5) for
# the non-negative channel values, used verbatim on both engines.
_GRADIENT_STOPS = [
    (0.0, 255, 100, 150),   # reddish-pink
    (0.15, 255, 165, 0),    # orange
    (0.3, 255, 200, 50),    # yellow-orange
    (0.45, 180, 200, 80),   # olive green
    (0.6, 100, 220, 100),   # bright green
    (0.75, 50, 200, 180),   # teal
    (0.9, 50, 150, 255),    # medium blue
    (1.0, 100, 200, 255),   # sky blue
]


def _gradient_channel_spark(t, ch: int):
    expr = None
    for i in range(len(_GRADIENT_STOPS) - 1):
        p0, p1 = _GRADIENT_STOPS[i][0], _GRADIENT_STOPS[i + 1][0]
        c0, c1 = _GRADIENT_STOPS[i][ch], _GRADIENT_STOPS[i + 1][ch]
        local = (t - F.lit(p0)) / F.lit(p1 - p0)
        seg = F.lit(float(c0)) + F.lit(float(c1 - c0)) * local
        if i < len(_GRADIENT_STOPS) - 2:
            clause = F.when(t < F.lit(p1), seg)
            expr = clause if expr is None else expr.when(t < F.lit(p1), seg)
        else:
            expr = expr.otherwise(seg)
    return F.floor(expr + F.lit(0.5)).cast("int")


def _gradient_channel_sql(ch: int) -> str:
    parts = []
    for i in range(len(_GRADIENT_STOPS) - 1):
        p0, p1 = _GRADIENT_STOPS[i][0], _GRADIENT_STOPS[i + 1][0]
        c0, c1 = _GRADIENT_STOPS[i][ch], _GRADIENT_STOPS[i + 1][ch]
        seg = f"{float(c0)} + {float(c1 - c0)} * ((t - {p0}) / {p1 - p0})"
        if i < len(_GRADIENT_STOPS) - 2:
            parts.append(f"WHEN t < {p1} THEN {seg}")
        else:
            parts.append(f"ELSE {seg}")
    return "CAST(floor((CASE " + " ".join(parts) + " END) + 0.5) AS INT)"


@query(
    "rainfall_gradient_colors",
    oracle=f"""WITH {_DAILY_CTE},
norm AS (
  SELECT obs_date, total_value AS rainfall,
         least(total_value / max(total_value) OVER (), 1.0) AS t
  FROM daily
)
SELECT obs_date, round(rainfall, 6) AS rainfall,
  CASE WHEN rainfall = 0 THEN 255 ELSE {_gradient_channel_sql(1)} END AS r,
  CASE WHEN rainfall = 0 THEN 255 ELSE {_gradient_channel_sql(2)} END AS g,
  CASE WHEN rainfall = 0 THEN 255 ELSE {_gradient_channel_sql(3)} END AS b,
  CASE WHEN rainfall = 0 THEN 0.15
       ELSE round(0.5 + t * 0.25, 6) END AS alpha,
  CASE WHEN rainfall = 0 THEN 255
       ELSE least({_gradient_channel_sql(1)} + 30, 255) END AS border_r,
  CASE WHEN rainfall = 0 THEN 255
       ELSE least({_gradient_channel_sql(2)} + 30, 255) END AS border_g,
  CASE WHEN rainfall = 0 THEN 255
       ELSE least({_gradient_channel_sql(3)} + 30, 255) END AS border_b
FROM norm""",
)
def rainfall_gradient_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20: the dashboard's piecewise-linear 8-stop gradient over
    normalized daily rainfall intensity (dashboard.py:830-906), with
    the zero-rainfall white special case and the +30-capped border
    variant (dashboard.py:893-906). The normalization max is a global
    window aggregate — one single-row exchange over the (tiny, already
    aggregated) daily series, not a second scan. Emitted as numeric
    rgba components: string assembly is presentation, the math is the
    operator."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = daily_rollup(hourly_aggregate(ev)).select(
        "obs_date", F.col("total_value").alias("rainfall")
    )
    t = F.least(F.col("rainfall") / F.max("rainfall").over(Window.partitionBy()), F.lit(1.0))
    norm = daily.select("obs_date", "rainfall", t.alias("t"))
    tc = F.col("t")
    zero = F.col("rainfall") == 0
    r, g, b = (_gradient_channel_spark(tc, ch) for ch in (1, 2, 3))
    return norm.select(
        "obs_date",
        F.round("rainfall", _R).alias("rainfall"),
        F.when(zero, 255).otherwise(r).alias("r"),
        F.when(zero, 255).otherwise(g).alias("g"),
        F.when(zero, 255).otherwise(b).alias("b"),
        F.when(zero, 0.15).otherwise(F.round(0.5 + tc * 0.25, _R)).alias("alpha"),
        F.when(zero, 255).otherwise(F.least(r + 30, F.lit(255))).alias("border_r"),
        F.when(zero, 255).otherwise(F.least(g + 30, F.lit(255))).alias("border_g"),
        F.when(zero, 255).otherwise(F.least(b + 30, F.lit(255))).alias("border_b"),
    )


@query(
    "value_outlier_counts",
    oracle="""WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events WHERE value IS NOT NULL GROUP BY 1
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_values,
       CAST(sum(CASE WHEN abs((e.value - s.mu) / s.sigma) > 3
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(s.mu, 6) AS mean_value,
       round(s.sigma, 6) AS stddev_value
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE e.value IS NOT NULL
GROUP BY e.event_type, s.mu, s.sigma""",
)
def value_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical data-quality scan: per-type 3-sigma outlier counts —
    the screening pass a sensor pipeline (or a training-data numeric
    feature audit) runs before trusting aggregates. Two passes over the
    fact: a tiny per-type stats aggregate broadcast back into the scan
    (aggregate-then-join, no window over the full table needed — a
    global-partition window would funnel every row through one
    reducer)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "mu", "sigma")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(F.when(z > 3, 1).otherwise(0)).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_values",
            "n_outliers",
            F.round("mu", _R).alias("mean_value"),
            F.round("sigma", _R).alias("stddev_value"),
        )
    )


@query(
    "monthly_value_change",
    oracle=f"""WITH {_MONTHLY_CTE}
SELECT year, month,
       round(avg_value, 6) AS avg_value,
       round(avg_value - lag(avg_value) OVER (ORDER BY year, month), 6)
         AS change_abs,
       round(100.0 * (avg_value - lag(avg_value) OVER (ORDER BY year, month))
             / lag(avg_value) OVER (ORDER BY year, month), 6) AS change_pct
FROM monthly""",
)
def monthly_value_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month delta/percent change on the A3 monthly rollup —
    the dashboard trend-line shape (dashboard.py:816-823) as a lag
    window over the (tiny, already-aggregated) monthly series: the
    window runs on ~tens of rows regardless of fact size."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    monthly = monthly_rollup(daily_rollup(hourly_aggregate(ev)))
    w = Window.orderBy("year", "month")
    prev = F.lag("avg_value").over(w)
    return monthly.select(
        "year",
        "month",
        F.round("avg_value", _R).alias("avg_value"),
        F.round(F.col("avg_value") - prev, _R).alias("change_abs"),
        F.round(100.0 * (F.col("avg_value") - prev) / prev, _R).alias("change_pct"),
    )


@query(
    "latest_value_by_station",
    oracle="""SELECT user_id,
       max_by(value, ts ORDER BY ts, event_id) AS latest_value,
       min_by(value, ts ORDER BY ts, event_id) AS earliest_value,
       CAST(max(ts) AS TIMESTAMP) AS latest_ts
FROM events
WHERE value IS NOT NULL
GROUP BY user_id""",
)
def latest_value_by_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 generalized: latest/earliest measure per station via the
    max_by/min_by ordered-selection aggregates — one hash aggregate, no
    window and no self-join (the classic argmax without the
    row_number() shuffle-and-filter detour). Ties on ts broken by
    event_id so both engines select the same row."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # tie-break: pack (ts, event_id) into a struct ordering key so the
    # argmax row is unique on both engines
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("value", key).alias("latest_value"),
        F.min_by("value", key).alias("earliest_value"),
        F.max("ts").alias("latest_ts"),
    )
