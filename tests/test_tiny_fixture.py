"""Tiny-N totality: queries that used to crash or diverge on a 3-row
corpus stay fixed.

The third degenerate-input family after empty (`test_empty_fixture`)
and constant (`test_degenerate_fits`): a universe with three rows per
table, where rank/variance statistics meet their other edge — one
class absent (AUC), one population empty (KS), one day of history
(OLS x-variance 0), a 1xC contingency (Cramer's V), every user in one
experiment arm (z-test), and ANN index structures sized beyond the
corpus (256-codeword PQ books, k=8 k-means, recall@10 of 2 candidates).
Undefined statistics pin to NULL exactly like DuckDB's x/0; recall
certificates divide by the TRUE candidate count; index builds cap at
the corpus size. Every fix is the identity on any fixture big enough
for the original expression.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import compare  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

if not os.path.isdir(SRC_SF):  # pragma: no cover - machine without fixtures
    pytest.skip(f"fixture dir {SRC_SF} missing", allow_module_level=True)
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

FIXED_ON_TINY = [
    # undefined statistics -> NULL (DuckDB x/0 semantics)
    "quality_classifier_auc",
    "ks_two_sample_test",
    "ols_daily_trend",
    "event_weekday_chi2",
    "ab_conversion_ztest",
    # ANN structures capped at corpus size / true-candidate recall
    "sq8_ann_topk",
    "pq_adc_topk",
    "ivfpq_topk",
    "ivf_kmeans_certificate",
]

ROWS_ONLY_ON_TINY = ["ivf_kmeans_topk"]


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_tiny")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{SRC_SF}/{t}.parquet' LIMIT 3)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.fixture(scope="module")
def oracle_con(tiny_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{tiny_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", FIXED_ON_TINY)
def test_tiny_input_parity(spark, tiny_dir, oracle_con, name):
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import (
        ORACLES,
        QUERIES,
    )

    sdf = QUERIES[name](spark, tiny_dir).toPandas()
    odf = oracle_con.sql(ORACLES[name]).df()
    errs = compare(name, sdf, odf)
    assert not errs, f"{name} on 3-row input: {errs}"


@pytest.mark.parametrize("name", ROWS_ONLY_ON_TINY)
def test_tiny_input_runs(spark, tiny_dir, name):
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import QUERIES

    QUERIES[name](spark, tiny_dir).count()  # must not raise


@pytest.fixture(scope="module")
def mid_dir(tmp_path_factory):
    # ADVICE r06: a 9-40 vector corpus sits between the tiny fixture
    # (3 rows) and the gate SFs; ivf_kmeans_certificate's vacuous
    # branch must cover it (cells hold ~1-4 vectors, nprobe=1 can
    # structurally miss neighbors, so the real recall bound is noise).
    d = tmp_path_factory.mktemp("sf_mid")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{SRC_SF}/{t}.parquet' LIMIT 24)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_ivf_kmeans_certificate_midrange_vacuous(spark, mid_dir):
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import (
        ORACLES,
        QUERIES,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{mid_dir}/{t}.parquet'")
    name = "ivf_kmeans_certificate"
    sdf = QUERIES[name](spark, mid_dir).toPandas()
    odf = con.sql(ORACLES[name]).df()
    errs = compare(name, sdf, odf)
    assert not errs, f"{name} on 24-row corpus: {errs}"
    assert bool(sdf["mean_recall_ge_020"].iloc[0]) is True
