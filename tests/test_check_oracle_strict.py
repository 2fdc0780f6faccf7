"""The local mirror must be representation-faithful to the driver hash.

Round-5 driver reds (`sequence_packing_report`, `heaps_law_fit`) were
numerically-equal representation diffs — an un-CAST DuckDB HUGEINT that
pandas renders float64 (oracle ``26.0`` vs Spark ``26``) and an IEEE
``-0.0`` vs ``0.0`` flip from summation order. The old mirror compared
floats numerically and coerced int/float dtypes, so it passed both for
three rounds. These tests pin the tightened semantics: dtype skew and
signed zero must FAIL ``tools.check_oracle.compare``.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import _neg_zero_cols, compare  # noqa: E402


def test_int_vs_float_dtype_skew_fails():
    spark_df = pd.DataFrame({"seq_id": np.array([26, 27], dtype=np.int64)})
    oracle_df = pd.DataFrame({"seq_id": np.array([26.0, 27.0])})
    errs = compare("t", spark_df, oracle_df)
    assert errs, "int64 26 vs float64 26.0 must fail the strict mirror"
    assert "REPR-ONLY" in errs[0]


def test_negative_zero_fails():
    spark_df = pd.DataFrame({"beta": np.array([-0.0])})
    oracle_df = pd.DataFrame({"beta": np.array([0.0])})
    errs = compare("t", spark_df, oracle_df)
    assert errs, "-0.0 vs 0.0 must fail the strict mirror"
    assert "REPR-ONLY" in errs[0]


def test_numerically_identical_same_dtype_passes():
    a = pd.DataFrame(
        {"k": np.array([1, 2], dtype=np.int64), "v": np.array([0.5, -1.25])}
    )
    b = a.iloc[::-1].reset_index(drop=True)  # row order must not matter
    assert compare("t", a, b) == []


def test_real_value_diff_labeled_value():
    a = pd.DataFrame({"v": np.array([1.0])})
    b = pd.DataFrame({"v": np.array([2.0])})
    errs = compare("t", a, b)
    assert errs and "REPR-ONLY" not in errs[0]


def test_neg_zero_detector():
    df = pd.DataFrame({"a": np.array([0.0, -0.0]), "b": np.array([1, 2])})
    assert _neg_zero_cols(df) == ["a"]


def test_duckdb_hugeint_projection_detected():
    # sum(BIGINT) and // over a HUGEINT operand both yield HUGEINT —
    # the exact shape of the sequence_packing_report r03–r05 red.
    con = duckdb.connect()
    rel = con.sql("SELECT sum(x) // 512 AS seq_id FROM (VALUES (1::BIGINT)) t(x)")
    assert any("HUGEINT" in str(t).upper() for t in rel.types)
    rel2 = con.sql(
        "SELECT CAST(sum(x) // 512 AS BIGINT) AS seq_id"
        " FROM (VALUES (1::BIGINT)) t(x)"
    )
    assert not any("HUGEINT" in str(t).upper() for t in rel2.types)


def test_registry_normalizes_signed_zero(spark):
    from pyspark.sql import functions as F

    from end_to_end_database_pipeline_project_spark.plans.registry import (
        normalize_signed_zero,
    )

    df = spark.range(1).select(
        F.lit(-0.0).alias("v"),
        F.lit(1).alias("k"),
        F.lit(float("nan")).alias("n"),
        F.lit(None).cast("double").alias("z"),
    )
    row = normalize_signed_zero(df).collect()[0]
    assert str(row.v) == "0.0" and row.k == 1 and str(row.n) == "nan"
    assert row.z is None


def test_registry_normalizes_nested_signed_zero(spark):
    # ADVICE r06: the wrapper must reach float payloads inside arrays,
    # structs and maps, not just top-level columns — a query projecting
    # an embedding array must not escape the -0.0 guarantee.
    from pyspark.sql import functions as F

    from end_to_end_database_pipeline_project_spark.plans.registry import (
        normalize_signed_zero,
    )

    df = spark.range(1).select(
        F.array(F.lit(-0.0), F.lit(1.5), F.lit(None).cast("double")).alias("arr"),
        F.struct(
            F.lit(-0.0).alias("x"), F.lit(7).alias("i"), F.lit("s").alias("t")
        ).alias("st"),
        F.create_map(F.lit("a"), F.lit(-0.0)).alias("m"),
        F.create_map(F.lit(-0.0), F.lit("k")).alias("mk"),  # float KEY
        F.array(F.array(F.lit(-0.0))).alias("nested"),
        F.lit(None).cast("struct<x:double>").alias("null_st"),
        F.array(F.lit("plain")).alias("untouched"),
    )
    row = normalize_signed_zero(df).collect()[0]
    assert [str(v) for v in row.arr] == ["0.0", "1.5", "None"]
    assert str(row.st.x) == "0.0" and row.st.i == 7 and row.st.t == "s"
    assert str(row.m["a"]) == "0.0"
    assert [str(k) for k in row.mk.keys()] == ["0.0"]
    assert str(row.nested[0][0]) == "0.0"
    assert row.null_st is None  # outer null struct preserved, not struct-of-nulls
    assert row.untouched == ["plain"]


def test_driver_stringification_assumptions_pinned():
    # ADVICE r06: the strict mirror assumes pandas astype(str) renders
    # exactly these forms (the driver's hash input). A pandas upgrade
    # that changes any of them must fail here loudly, not silently
    # shift the mirror's semantics.
    s = pd.Series(
        pd.to_datetime(["2024-01-09", "2024-02-29"])
    )  # all-midnight datetime64
    assert list(s.astype(str)) == ["2024-01-09", "2024-02-29"]
    s2 = pd.Series(pd.to_datetime(["2024-01-09 00:00:00", "2024-01-09 12:30:00"]))
    assert list(s2.astype(str)) == ["2024-01-09 00:00:00", "2024-01-09 12:30:00"]
    assert list(pd.Series(np.array([26], dtype=np.int64)).astype(str)) == ["26"]
    assert list(pd.Series(np.array([26.0])).astype(str)) == ["26.0"]
    assert list(pd.Series(np.array([-0.0])).astype(str)) == ["-0.0"]
    assert list(pd.Series([None], dtype="object").astype(str)) == ["None"]
    assert list(pd.Series([np.nan]).astype(str)) == ["nan"]


def test_plus_zero_normalizes_negative_zero():
    # the -0.0 fix applied in heaps_law_fit (both engines): x + 0.0
    assert str(np.float64(-0.0) + 0.0) == "0.0"
    con = duckdb.connect()
    (v,) = con.sql("SELECT round(-1e-15, 6) + 0.0").fetchone()
    assert str(v) == "0.0"
