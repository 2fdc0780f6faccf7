"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive REPRESENTATION-FAITHFUL value comparison: both sides
are canonicalized (columns sorted by name, rows sorted by stringified
values) and compared as dtype-faithful string forms, exactly like the
driver's stringified value hash. That means int64 ``26`` differs from
float64 ``26.0``, and ``-0.0`` differs from ``0.0`` — even though both
are numerically equal. Round-5 driver reds proved the old numeric
comparison (diff == 0, int/float coerced) masks exactly this class.

When a string mismatch is numerically zero the failure is labeled
REPR-ONLY so you know it is a dtype/rendering bug, not a math bug —
but it still FAILS, because the driver's hash fails it.

Extra proactive checks per oracle:
- any HUGEINT/UHUGEINT column in the oracle's projection fails
  immediately (pandas renders it float64 -> guaranteed repr diff with
  Spark's int64; DuckDB returns HUGEINT from sum(BIGINT) and from
  ``//`` over a HUGEINT operand);
- a WARN for any -0.0 appearing on either side (summation-order noise
  can flip it between runs even if this run matched).

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


def _strfy(df: pd.DataFrame) -> pd.DataFrame:
    """Dtype-faithful string form of every cell — the driver's hash input.

    No numeric coercion: an int64 column prints ``26`` while a float64
    column prints ``26.0``; ``-0.0`` prints with its sign. Uses pandas
    ``astype(str)`` (NOT element-wise ``str()``) because that is what
    the driver's hash behaves like: an all-midnight datetime64 column
    collapses to ``2024-01-09`` — matching Spark's ``datetime.date``
    objects — which is why the historically driver-green date rollups
    pass while int-vs-float and signed-zero diffs fail.
    """
    return pd.DataFrame(
        {c: df[c].astype(str) for c in df.columns}, index=df.index
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order: stringify everything, sort by all columns
    s = _strfy(df)
    idx = s.sort_values(by=list(s.columns), kind="mergesort").index
    return df.loc[idx].reset_index(drop=True)


def _neg_zero_cols(df: pd.DataFrame) -> list[str]:
    out = []
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            v = df[c].to_numpy()
            import numpy as np

            if bool(((v == 0) & np.signbit(v)).any()):
                out.append(c)
    return out


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
    s_str, o_str = _strfy(s), _strfy(o)
    for col in s.columns:
        sv_s, ov_s = s_str[col], o_str[col]
        bad = (sv_s != ov_s).to_numpy()
        if not bad.any():
            continue
        # classify: numerically equal (repr-only) vs real value diff
        label, extra = "value", ""
        try:
            sv_f = pd.to_numeric(s[col], errors="raise").astype(float)
            ov_f = pd.to_numeric(o[col], errors="raise").astype(float)
            both_nan = (sv_f.isna() & ov_f.isna()).to_numpy()
            diff = (sv_f - ov_f).abs().to_numpy()
            if not (~both_nan & ~(diff == 0))[bad].any():
                label = "REPR-ONLY (numerically equal — dtype/rendering)"
            else:
                extra = f" (max abs {diff[bad & ~both_nan].max()!r})"
        except (ValueError, TypeError):
            pass
        i = int(bad.argmax())
        errs.append(
            f"col {col}: {int(bad.sum())} {label} diffs{extra}; "
            f"first: spark={sv_s.iloc[i]!r} oracle={ov_s.iloc[i]!r}"
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
            rel = con.sql(ORACLES[name])
            hug = [
                c
                for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()
            ]
            odf = rel.df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        if hug:
            errs.insert(
                0,
                f"oracle projects HUGEINT column(s) {hug} — pandas renders "
                "float64, guaranteed repr mismatch vs Spark int64; add "
                "CAST(... AS BIGINT)",
            )
        for side, df_ in (("spark", sdf), ("oracle", odf)):
            nz = _neg_zero_cols(df_)
            if nz:
                print(f"WARN {name}: {side} emits -0.0 in {nz} (flaky repr)")
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
