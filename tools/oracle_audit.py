"""Mechanical audit of every DuckDB oracle for representation hazards.

DuckDB-only (no Spark session), so it runs in seconds; meant to be run
at HEAD after any oracle edit and kept clean. Two classes, both proven
driver-reds in round 5:

1. HUGEINT projections. DuckDB's ``sum(INTEGER/BIGINT)`` returns
   HUGEINT, and any arithmetic over a HUGEINT operand (``//``, ``+``,
   ``*``) stays HUGEINT; pandas materializes HUGEINT as float64, so the
   driver's stringified value hash sees ``26.0`` where Spark prints
   ``26``. Every HUGEINT column must be ``CAST(... AS BIGINT)``
   (`sequence_packing_report`, red r03-r05).

2. IEEE negative zero. A rounded float expression whose true value is
   summation noise can print ``-0.0`` or ``0.0`` depending on
   aggregation order (`heaps_law_fit`, red r05). The audit flags any
   -0.0 in oracle output at the audit SF; the fix is ``round(x, 6) +
   0.0`` on BOTH engines.

Also flags DECIMAL projections (pandas renders them as ``Decimal('26')``
objects whose str differs from both int64 and float64 — always CAST the
final projection) and any column pandas types as ``object`` holding
Decimal values.

Usage: python tools/oracle_audit.py [sf_dir]
Exit 1 if any oracle is flagged.
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def audit_oracle(con: duckdb.DuckDBPyConnection, name: str, sql: str) -> list[str]:
    flags: list[str] = []
    try:
        rel = con.sql(sql)
    except Exception as e:  # noqa: BLE001
        return [f"oracle raised {type(e).__name__}: {e}"]
    for c, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if "HUGEINT" in ts:
            flags.append(f"col {c}: projects {ts} (pandas -> float64; CAST AS BIGINT)")
        elif ts.startswith("DECIMAL"):
            flags.append(f"col {c}: projects {ts} (pandas -> Decimal objects; CAST)")
    try:
        df = rel.df()
    except Exception as e:  # noqa: BLE001
        return flags + [f"materialize raised {type(e).__name__}: {e}"]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            v = s.to_numpy()
            if bool(((v == 0) & np.signbit(v)).any()):
                flags.append(f"col {c}: emits -0.0 (add `+ 0.0` after round, both engines)")
        elif s.dtype == object and s.map(lambda x: isinstance(x, Decimal)).any():
            flags.append(f"col {c}: object column holding Decimal values (CAST)")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401
    from end_to_end_database_pipeline_project_spark.plans.registry import ORACLES
    from end_to_end_database_pipeline_project_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    n_flagged = 0
    for name, sql in ORACLES.items():
        flags = audit_oracle(con, name, sql)
        if flags:
            n_flagged += 1
            print(f"FLAG {name}:")
            for f in flags:
                print(f"   {f}")
    print(f"\n{len(ORACLES) - n_flagged} clean, {n_flagged} flagged of {len(ORACLES)}")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
