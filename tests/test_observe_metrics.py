"""In-flight quality metrics via ``Dataset.observe``: the constraint
counters of ``data_quality_report`` collected for FREE during a real
ETL pass (one accumulator ride-along, no second scan of the input)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_observe_counts_ride_the_etl_pass(spark):
    ev = load_table(spark, SF, "events")
    obs = Observation("dq")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_null_value"),
        F.min("ts").alias("min_ts"),
    )
    # the "real" job: an aggregate consuming the observed frame
    daily = (
        observed.where(F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.avg("value").alias("avg_value"))
    )
    n_days = daily.count()

    truth = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("nulls"),
    ).collect()[0]
    m = obs.get
    assert m["n_rows"] == truth["n"]
    assert m["n_null_value"] == truth["nulls"]
    assert n_days > 0
