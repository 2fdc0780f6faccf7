"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM (``local[N]``); at cluster scale the same
settings hold except memory/parallelism knobs, which the submitter owns.
The defaults here encode the scale decisions the rest of the engine
assumes:

- AQE on (runtime partition coalescing + skew-join splitting), so static
  ``spark.sql.shuffle.partitions`` only needs to be an upper bound;
- UTC session timezone, so timestamps round-trip identically against
  parquet files and the DuckDB oracle;
- Arrow enabled, so the pandas-UDF slow path is batch-vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "end_to_end_database_pipeline_project_spark",
    *,
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    cpus = str(cpus or _DEF_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
