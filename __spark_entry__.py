"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(``end_to_end_database_pipeline_project_spark.plans``): ``entry`` runs the flagship
dedup-rollup query on sf0.001, ``queries``/``oracle_sql`` expose every
registered operator and its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from end_to_end_database_pipeline_project_spark.plans import ORACLES, QUERIES  # noqa: E402
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: E402, F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's signature semantics: hourly dedup
    aggregate -> avg-of-avgs daily rollup -> last-30-days serving slice
    (SURVEY.md §7.3)."""
    return QUERIES["daily_weather_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-expressible query."""
    return dict(ORACLES)
