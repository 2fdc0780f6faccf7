"""Streaming, medallion-pipeline and as-of-join queries (M3/M5).

The streaming entries run a real Structured Streaming query to
completion over the static fixtures (availableNow semantics) and return
the result as a batch frame — batch-equivalence is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join, asof_join_pandas
from ..pipeline.medallion import build_bronze, bronze_to_silver, gold_tables, serving_view
from ..sources.catalog import load_table
from ..streaming.pipeline import run_hourly_stream_available_now
from .registry import query

_R = 6


@query(
    "streaming_hourly_window",
    oracle="""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS obs_hour,
       round(avg(value), 6) AS avg_value,
       round(max(value), 6) AS max_value,
       round(min(value), 6) AS min_value,
       count(*) AS observation_count
FROM events WHERE value IS NOT NULL
GROUP BY 1""",
)
def streaming_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: Structured Streaming 1-hour tumbling window with watermark +
    dropDuplicates, run to completion over the static fixture — result
    must equal the batch hourly aggregate exactly (§2.10
    batch-equivalence)."""
    out = run_hourly_stream_available_now(spark, sf_dir)
    return out.select(
        "obs_hour",
        F.round("avg_value", _R).alias("avg_value"),
        F.round("max_value", _R).alias("max_value"),
        F.round("min_value", _R).alias("min_value"),
        "observation_count",
    )


@query(
    "medallion_silver",
    oracle="""SELECT CAST(user_id AS VARCHAR) || '_'
         || CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS VARCHAR) AS observation_id,
       CAST(user_id AS VARCHAR) AS station_id,
       CAST(ts AS TIMESTAMP) AS timestamp,
       round(CASE WHEN value > 100 THEN value - 273.15 ELSE value END, 6)
         AS temperature_c,
       round(CASE WHEN value / 200 < 1 THEN value / 200 * 1000
                  ELSE value / 200 END, 6) AS rainfall_mm,
       CAST(json_extract_string(props, '$.k') AS DOUBLE) AS humidity_percent,
       'batch_' || strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS etl_batch_id
FROM events""",
)
def medallion_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: bronze nested docs -> exploded, unit-sniffed silver facts —
    the reference's stage-2 ETL as one job (P1/P2/F1/F3/F10/F11 over
    the assembled bronze documents)."""
    bronze = build_bronze(spark, sf_dir)
    silver = bronze_to_silver(bronze)
    return silver.select(
        "observation_id",
        "station_id",
        "timestamp",
        F.round("temperature_c", _R).alias("temperature_c"),
        F.round("rainfall_mm", _R).alias("rainfall_mm"),
        "humidity_percent",
        "etl_batch_id",
    )


@query(
    "medallion_serving",
    oracle="""WITH silver AS (
  SELECT CAST(ts AS TIMESTAMP) AS timestamp,
         CASE WHEN value > 100 THEN value - 273.15 ELSE value END AS temperature_c
  FROM events
),
hourly AS (
  SELECT CAST(timestamp AS DATE) AS obs_date, date_trunc('hour', timestamp) AS obs_hour,
         avg(temperature_c) AS avg_value, max(temperature_c) AS max_value,
         min(temperature_c) AS min_value, count(*) AS observation_count
  FROM silver WHERE temperature_c IS NOT NULL GROUP BY 1, 2
),
daily AS (
  SELECT obs_date, avg(avg_value) AS avg_value, max(max_value) AS max_value,
         min(min_value) AS min_value, sum(max_value) AS total_value,
         CAST(sum(observation_count) AS BIGINT) AS observation_count
  FROM hourly GROUP BY 1
),
capped AS (
  SELECT obs_date,
         CASE WHEN avg_value IS NOT NULL AND avg_value > 0
              THEN least(avg_value, 100.0) ELSE avg_value END AS avg_value,
         max_value, min_value, total_value, observation_count,
         max(obs_date) OVER () AS latest
  FROM daily
)
SELECT obs_date, round(avg_value, 6) AS avg_value, round(max_value, 6) AS max_value,
       round(min_value, 6) AS min_value, round(total_value, 6) AS total_value,
       observation_count,
       CASE WHEN date_diff('day', latest, (SELECT max(CAST(ts AS DATE)) FROM events)) <= 1
            THEN 'full' ELSE 'partial' END AS sync_status
FROM capped ORDER BY obs_date DESC LIMIT 30""",
)
def medallion_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: the full pipeline bronze->silver->gold->serving in one DAG,
    with humidity-cap semantics on the served average and data-derived
    freshness status (S15/S16; TTL modeled as data, SURVEY.md §7.4)."""
    bronze = build_bronze(spark, sf_dir)
    silver = bronze_to_silver(bronze)
    daily, monthly = gold_tables(silver)
    as_of = (
        silver.agg(F.date_format(F.max("timestamp"), "yyyy-MM-dd").alias("d"))
        .collect()[0]["d"]
    )
    out = serving_view(daily, monthly, as_of)
    return out.select(
        "obs_date",
        F.round("avg_value", _R).alias("avg_value"),
        F.round("max_value", _R).alias("max_value"),
        F.round("min_value", _R).alias("min_value"),
        F.round("total_value", _R).alias("total_value"),
        "observation_count",
        "sync_status",
    )


_ASOF_ORACLE = """WITH u AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('purchase', 'error')
),
c AS (
  SELECT *,
         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS purchase_ts_asof,
         last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER w AS purchase_value_asof
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, ts, user_id, purchase_ts_asof,
       round(purchase_value_asof, 6) AS purchase_value_asof
FROM c WHERE side = 1"""


def _asof_inputs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    # right side's time column must NOT be named 'ts': the cogroup plan
    # dedupes same-named non-key columns across sides (see asof_join_pandas)
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("value").alias("purchase_value"),
        F.col("ts").alias("purchase_ts"),
    )
    return left, right


@query("asof_last_purchase", oracle=_ASOF_ORACLE)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union+window form): for every error event, the
    user's most recent purchase at-or-before it (SURVEY.md §2.3/§7.4 —
    the one join shape Spark lacks a primitive for). No pairwise join:
    one shuffle on user_id, forward-carry with last(ignorenulls)."""
    left, right = _asof_inputs(spark, sf_dir)
    out = asof_join(left, right, on="ts", by="user_id", right_on="purchase_ts",
                    right_cols=["purchase_value", "purchase_ts"])
    return out.select(
        "event_id",
        "ts",
        "user_id",
        F.col("purchase_ts_asof"),
        F.round("purchase_value_asof", _R).alias("purchase_value_asof"),
    )


@query("asof_last_purchase_pandas", oracle=_ASOF_ORACLE)
def asof_last_purchase_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics via cogrouped applyInPandas + pd.merge_asof
    — the per-key pandas path, verified against the same oracle."""
    left, right = _asof_inputs(spark, sf_dir)
    out = asof_join_pandas(left, right, on="ts", by="user_id", right_on="purchase_ts",
                           right_cols=["purchase_value", "purchase_ts"])
    return out.select(
        "event_id",
        "ts",
        "user_id",
        F.col("purchase_ts_asof"),
        F.round("purchase_value_asof", _R).alias("purchase_value_asof"),
    )
