"""Degenerate-fixture sweep for the regression/fit/correlation queries.

`heaps_law_fit` went driver-red in r05 because a degenerate corpus (all
cuts see the same vocabulary) collapses the OLS slope to summation
noise, which rounds to ``-0.0`` or ``0.0`` by aggregation order. This
suite pins every fit-shaped query on purpose-built degenerate inputs —
a constant daily series and a corpus of identical documents — and
asserts STRICT (representation-faithful) Spark/oracle parity on them,
exactly the comparison the driver's value hash performs. The
``normalize_signed_zero`` wrapper in the registry plus deterministic
single-threaded DuckDB make the outputs reproducible; any regression
back toward noise-dependent output fails here before it can flake a
driver round.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import compare  # noqa: E402

FIT_QUERIES = [
    "heaps_law_fit",
    "zipf_law_fit",
    "ols_daily_trend",
    "theil_sen_trend",
    "mann_kendall_trend_test",
    "daily_value_acf",
    "click_purchase_ccf",
    "rolling_value_volume_corr",
    "doc_length_quality_spearman",
    "weekday_seasonality_strength",
]


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    """A scale-factor dir where every fit statistic is degenerate:
    constant event values (zero slope / zero variance), one event per
    type per day (flat counts), and byte-identical documents (every
    Heaps/Zipf cut sees the same vocabulary; all lengths tie)."""
    d = tmp_path_factory.mktemp("sf_degenerate")
    con = duckdb.connect()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev_rows = []
    eid = 0
    for day in range(30):
        for j, et in enumerate(("click", "purchase", "view", "error", "signup")):
            ev_rows.append(
                (
                    eid,
                    base + dt.timedelta(days=day, minutes=j),
                    eid % 7,
                    et,
                    5.0,
                    "{}",
                )
            )
            eid += 1
    con.sql(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?, ?, ?)", ev_rows)
    con.sql(f"COPY ev TO '{d}/events.parquet' (FORMAT PARQUET)")

    text = "alpha beta gamma delta epsilon zeta"
    con.sql(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?, ?, ?)",
        [(i, text, "en", f"src{i % 4}", len(text)) for i in range(40)],
    )
    con.sql(f"COPY docs TO '{d}/documents.parquet' (FORMAT PARQUET)")
    return str(d)


@pytest.fixture(scope="module")
def oracle_con(degenerate_dir):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{degenerate_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", FIT_QUERIES)
def test_degenerate_parity(spark, degenerate_dir, oracle_con, name):
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import (
        ORACLES,
        QUERIES,
    )

    sdf = QUERIES[name](spark, degenerate_dir).toPandas()
    odf = oracle_con.sql(ORACLES[name]).df()
    errs = compare(name, sdf, odf)
    assert not errs, f"{name} on degenerate input: {errs}"
    # no fit query may emit a signed zero on collapsed input
    for col in sdf.columns:
        assert "-0.0" not in sdf[col].astype(str).tolist(), (name, col)
