"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column names, dtypes and an
order-insensitive value comparison (exact for non-floats; exact for
floats too, since both sides round to 6 decimals — any diff is reported
with the max abs error to distinguish real bugs from rounding flap).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from end_to_end_database_pipeline_project_spark.session import get_spark
from end_to_end_database_pipeline_project_spark.sources.catalog import TABLES


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order: stringify everything, sort by all columns
    s = df.astype(str)
    idx = s.sort_values(by=list(s.columns), kind="mergesort").index
    return df.loc[idx].reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_df) != len(oracle_df):
        errs.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        errs.append(f"columns: spark={sc} oracle={oc}")
        return errs
    if errs:
        return errs
    s, o = _canon(spark_df), _canon(oracle_df)
    for col in s.columns:
        sv, ov = s[col], o[col]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv_f = pd.to_numeric(sv, errors="coerce").astype(float)
            ov_f = pd.to_numeric(ov, errors="coerce").astype(float)
            both_nan = sv_f.isna() & ov_f.isna()
            diff = (sv_f - ov_f).abs()
            bad = ~both_nan & ~(diff == 0)
            if bad.any():
                mx = diff[bad].max()
                errs.append(
                    f"col {col}: {int(bad.sum())} value diffs (max abs {mx!r}); "
                    f"first: spark={sv_f[bad].iloc[0]!r} oracle={ov_f[bad].iloc[0]!r}"
                )
        else:
            sv_s, ov_s = sv.astype(str), ov.astype(str)
            bad = sv_s != ov_s
            if bad.any():
                errs.append(
                    f"col {col}: {int(bad.sum())} value diffs; "
                    f"first: spark={sv_s[bad].iloc[0]!r} oracle={ov_s[bad].iloc[0]!r}"
                )
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from end_to_end_database_pipeline_project_spark.plans import ORACLES, QUERIES
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            n_fail += 1
            print(f"FAIL {name}:")
            for e in errs:
                print(f"   {e}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
