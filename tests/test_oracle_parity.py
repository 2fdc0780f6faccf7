"""Run every registered query against its DuckDB oracle (driver mirror).

Same comparison discipline as the driver's correctness gate: row count,
column names, order-insensitive values. Default SF is 0.001 for speed;
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the gate SF.
"""

from __future__ import annotations

import pytest

from end_to_end_database_pipeline_project_spark.plans import ORACLES, QUERIES
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401

import os
import sys

SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from check_oracle import compare  # noqa: E402


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    if name not in ORACLES:
        # rows-only contract: must run and produce a stable schema
        assert sdf is not None
        return
    odf = duck.sql(ORACLES[name]).df()
    errs = compare(name, sdf, odf)
    assert not errs, f"{name}: " + "; ".join(errs)
