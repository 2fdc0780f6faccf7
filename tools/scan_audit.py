"""Fleet-wide scan audit: flag unpruned parquet scans in every query.

For each registered query, walk the executed plan's `Scan parquet`
nodes and compare the ReadSchema column count against the source
table's width. A scan reading every column of a wide table means
column pruning failed (or the query genuinely needs all columns — the
report says which query/table so a human can judge). At 100 TB an
unpruned lineitem scan is the single most expensive plan bug, and it
is invisible in small-fixture wall-clock.

Usage: python tools/scan_audit.py [query ...]
Prints one line per wide-unpruned scan; exits 0 always (report tool).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_database_pipeline_project_spark.plans import QUERIES
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401
from end_to_end_database_pipeline_project_spark.session import get_spark

SF = "/root/testdata/sf0.001"

TABLE_WIDTHS = {
    "region": 2, "nation": 3, "customer": 5, "supplier": 4, "part": 6,
    "orders": 6, "lineitem": 11, "events": 6, "documents": 5, "embeddings": 3,
}

SCAN_RE = re.compile(
    r"FileScan parquet \[(?P<cols>[^\]]*)\][^\n]*?Location: [^\n]*?/(?P<table>\w+)\.parquet",
)


def audit(spark, name: str) -> list[str]:
    try:
        plan = QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    except Exception as e:
        return [f"{name}: BUILD ERROR {str(e)[:100]}"]
    out = []
    for m in SCAN_RE.finditer(plan):
        table = m.group("table")
        width = TABLE_WIDTHS.get(table)
        if width is None or width <= 4:
            continue
        ncols = len([c for c in m.group("cols").split(",") if c.strip()])
        if ncols >= width:
            out.append(f"{name}: scan of {table} reads all {ncols} columns")
    return out


def main() -> None:
    spark = get_spark("scan_audit", cpus=8)
    names = sys.argv[1:] or sorted(QUERIES)
    flags = []
    for n in names:
        flags.extend(audit(spark, n))
    for f in flags:
        print(f)
    print(f"-- audited {len(names)} queries, {len(flags)} wide-unpruned scans")


if __name__ == "__main__":
    main()
