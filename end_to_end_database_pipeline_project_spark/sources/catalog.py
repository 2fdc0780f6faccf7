"""Parquet catalog over the driver-generated test tables.

The fixture universe (see /root/repo/TESTDATA.md) is a TPC-H-ish star
schema plus ``events`` (stream-shaped), ``documents`` (text ops) and
``embeddings`` (similarity ops), one parquet file per table per scale
factor directory.

At 100 TB the same access path holds: ``spark.read.parquet`` on a
directory of column-pruned, predicate-pushed parquet splits. Nothing here
materializes or collects; every loader returns a lazy DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Accepts either ``<dir>/<name>.parquet`` or a
    bare directory of parquet files named ``<name>``.

    Spark has no nanosecond timestamp type and by default refuses parquet
    ``TIMESTAMP(NANOS)`` columns (the fixtures' ``events.ts``). We read
    nanos as raw INT64 (``spark.sql.legacy.parquet.nanosAsLong`` — a
    runtime SQL conf, so it works on whatever session the driver passes)
    and floor-convert to a microsecond timestamp, matching DuckDB's
    ``CAST(ts AS TIMESTAMP)`` truncation of the same column.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        path = os.path.join(sf_dir, name)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # engine semantics are UTC (matches DuckDB's naive-UTC parquet reads);
    # pin it even on externally-supplied sessions (driver default session).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Fixtures may carry parquet TIMESTAMP(MICROS, isAdjustedToUTC=false),
    # which Spark would infer as TIMESTAMP_NTZ — a type `unix_micros` and
    # friends reject. Read it as an instant (engine time is UTC anyway).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # ship this package to executor Python workers (pandas-UDF closures
    # are pickled by module reference)
    from ..session import ship_package

    ship_package(spark)
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer `div`, not `/`: epoch-ns values (~1.7e18) exceed
            # double's 2^53 integer precision, so float division would
            # corrupt the microsecond value.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            # belt-and-suspenders for sessions where inferTimestampNTZ was
            # resolved before our conf set: NTZ→instant is exact under the
            # pinned UTC session timezone. Cast with the TYPE OBJECT, not
            # the string "timestamp": the string resolves through
            # spark.sql.timestampType, which a TIMESTAMP_NTZ-defaulted
            # session would turn into a no-op NTZ→NTZ cast.
            df = df.withColumn(field.name, F.col(field.name).cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views so ``spark.sql`` can be used
    interchangeably with the DataFrame API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
