"""Scale-up stress harness: headline queries on a xK blowup of sf0.1.

The fixtures stop at sf0.1 (~600k lineitem rows); this tool derives a
K-times larger dataset from them (union of K key-shifted copies — same
distributions, disjoint keys, so join fan-outs and group cardinalities
scale linearly like real growth) and times the headline queries on it.
The point is trend, not absolutes: a query whose runtime scales ~K
(or better, for fixed-output aggregates) is shuffle-disciplined; one
that scales ~K^2 has a quadratic term the fixtures were hiding.

Derived data lands in a temp dir (NOT /root/testdata — fixtures stay
read-only) and is removed on exit unless --keep.

Usage: python tools/stress.py [K] [query ...]   (default K=8)
Prints one JSON line: {"k": K, "queries": {name: sec}, "rows": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.plans import QUERIES
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401
from end_to_end_database_pipeline_project_spark.session import get_spark
from end_to_end_database_pipeline_project_spark.sources.catalog import TABLES, load_table

SRC_SF = "/root/testdata/sf0.1"

# key columns shifted per copy so the blowup preserves key cardinality
# (a pure union would multiply duplicates-per-key by K instead of
# growing the key space, distorting joins and dedup ops). Columns that
# reference the same key DOMAIN (orderkey appears in lineitem+orders,
# custkey in orders+customer) must shift by the SAME span or copy>0
# foreign keys dangle across copies — the span is computed per domain
# over every member column, not per table.
SHIFT_KEYS = {
    "lineitem": {"l_orderkey": "orderkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "events": {"event_id": "eventid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}

DEFAULT_QUERIES = [
    "pricing_summary",
    "regional_revenue",
    "market_share",
    "hourly_dedup_agg",
    "daily_weather_rollup",
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "token_frequencies",
]


def blow_up(spark, out_dir: str, k: int) -> dict[str, int]:
    # one span per key domain = max over every column in that domain
    domain_span: dict[str, int] = {}
    for t, cols in SHIFT_KEYS.items():
        src = load_table(spark, SRC_SF, t)
        for col, domain in cols.items():
            mx = src.agg(F.max(col)).collect()[0][0] + 1
            domain_span[domain] = max(domain_span.get(domain, 0), mx)
    rows = {}
    for t in TABLES:
        src = load_table(spark, SRC_SF, t)
        if t in SHIFT_KEYS:
            copies = []
            for i in range(k):
                c = src
                for col, domain in SHIFT_KEYS[t].items():
                    c = c.withColumn(
                        col, F.col(col) + F.lit(i * domain_span[domain])
                    )
                copies.append(c)
            big = copies[0]
            for c in copies[1:]:
                big = big.unionByName(c)
        else:  # dims (region/nation/part/supplier) keep their size
            big = src
        dest = os.path.join(out_dir, f"{t}.parquet")
        big.write.mode("overwrite").parquet(dest)
        rows[t] = spark.read.parquet(dest).count()
    return rows


def main() -> None:
    args = sys.argv[1:]
    k = 8
    if args and args[0].isdigit():
        k = int(args[0])
        args = args[1:]
    names = [a for a in args if a != "--keep"] or DEFAULT_QUERIES
    keep = "--keep" in sys.argv
    spark = get_spark("stress")
    out_dir = tempfile.mkdtemp(prefix=f"stress_x{k}_")
    try:
        rows = blow_up(spark, out_dir, k)
        # warm python worker pool once, as bench.py does
        spark.range(128).repartition(32).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()
        # min of two runs: the first pass pays first-touch page cache on
        # the freshly written blowup + codegen warmup, which isn't the
        # scaling signal this tool measures
        timings = {}
        for name in names:
            best = None
            for _ in range(2):
                df = QUERIES[name](spark, out_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 4)
        print(json.dumps({"k": k, "queries": timings, "rows": rows}))
    finally:
        if keep:
            print(f"kept: {out_dir}", file=sys.stderr)
        else:
            shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
