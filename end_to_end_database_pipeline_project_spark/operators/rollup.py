"""The reference's signature aggregate: dedup-then-rollup hierarchy.

Reference semantics (clickhouse_etl.py:309-334 daily, :372-411 monthly;
rationale README.md:236-244): observations first group to hours taking
``max(rainfall)`` per hour (dedup against re-delivered observations),
then hours roll up to days, then days to months. Temperature/humidity
use **avg-of-avgs** across grains — each hour counts equally regardless
of observation count, numerically different from a flat mean. That exact
nesting is reproduced here; the oracle SQL mirrors it.

Scale notes (100 TB): each level is one hash-aggregate with map-side
partial aggregation; the hour-level keys are (date, hour) so cardinality
collapses by orders of magnitude at the first shuffle. With silver data
partitioned by date, Catalyst prunes partitions for date-bounded serving
queries and the rollups shuffle only the already-tiny hourly grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_aggregate(df: DataFrame, ts: str = "ts", measure: str = "value") -> DataFrame:
    """A1: hour-grain dedup aggregate.

    GROUP BY (date, hour) -> avg/max/min(measure), max-as-dedup for the
    rainfall role, count(*). Mirrors clickhouse_etl.py:318-331.
    """
    c = F.col(measure)
    return (
        df.where(c.isNotNull())
        .groupBy(
            F.to_date(ts).alias("obs_date"),
            F.date_trunc("hour", F.col(ts)).alias("obs_hour"),
        )
        .agg(
            F.avg(c).alias("avg_value"),
            F.max(c).alias("max_value"),
            F.min(c).alias("min_value"),
            F.count(F.lit(1)).alias("observation_count"),
        )
    )


def daily_rollup(hourly: DataFrame) -> DataFrame:
    """A2: day grain over A1 — avg-of-avgs, max-of-max, min-of-min,
    sum(max-per-hour) as the dedup'd daily total, sum of counts.
    Mirrors clickhouse_etl.py:309-334."""
    return hourly.groupBy("obs_date").agg(
        F.avg("avg_value").alias("avg_value"),
        F.max("max_value").alias("max_value"),
        F.min("min_value").alias("min_value"),
        F.sum("max_value").alias("total_value"),
        F.sum("observation_count").alias("observation_count"),
    )


def monthly_rollup(daily: DataFrame) -> DataFrame:
    """A3: month grain over A2 — same avg-of-avgs / sum-of-sums pattern.
    Mirrors clickhouse_etl.py:370-411."""
    return daily.groupBy(
        F.year("obs_date").cast("long").alias("year"),
        F.month("obs_date").cast("long").alias("month"),
    ).agg(
        F.avg("avg_value").alias("avg_value"),
        F.max("max_value").alias("max_value"),
        F.min("min_value").alias("min_value"),
        F.sum("total_value").alias("total_value"),
        F.sum("observation_count").alias("observation_count"),
    )
