"""One-off attribution experiment for the versioned read path (r12).

Builds a small versioned table like versioned_table_source_scan's
scaffold, then times, in ONE session (min-of-N noop):
  A. format read (declared schema)  -> agg count
  B. the same files via native spark.read.parquet -> agg count
  C. library read_version           -> agg count
  D. format read schema-less        (inference per analysis)
  E. format read timestampasof      (schema-less, as r11 travel query)
plus in-process wall timings of the driver-side metadata calls:
  versions(), infer_arrow_schema(), _VersionedBatchReader.partitions().
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.session import get_spark
from end_to_end_database_pipeline_project_spark.sources.catalog import load_table
from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
    scratch_artifact_dir,
)
from end_to_end_database_pipeline_project_spark.sources import versioned as V
from end_to_end_database_pipeline_project_spark.sources import (
    versioned_source as VS,
)


def t_noop(df, n=4):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("vt-attrib")
    VS.register(spark)
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    yr = F.year("o_orderdate")
    store = scratch_artifact_dir("vt_attrib_")
    t0 = time.perf_counter()
    V.write_version(orders.where(yr < 2000), store)
    V.append_version(orders.where(yr == 2000), store)
    forget = orders.where((F.col("o_custkey") % 97 == 0) & (yr <= 2000)).select(
        "o_orderkey"
    )
    V.delete_version(forget, store, "o_orderkey")
    V.append_version(orders.where(yr >= 2001), store)
    print(f"scaffold commits: {time.perf_counter()-t0:.3f}s")

    ddl = (
        "o_orderkey bigint, o_custkey bigint, "
        "o_orderdate timestamp, o_totalprice double"
    )

    # A: format read, declared schema
    fmt = (
        spark.read.format("versioned_table")
        .option("path", store)
        .option("schema", ddl)
        .load()
    )
    a = t_noop(fmt.agg(F.count(F.lit(1))))

    # B: native parquet of all data dirs (no tombstone logic): lower bound
    data_dirs = [
        os.path.join(store, e["dir"])
        for e in V.versions(store)
        if e.get("mode", "full") in ("full", "append")
    ]
    nat = spark.read.parquet(*data_dirs)
    b = t_noop(nat.agg(F.count(F.lit(1))))

    # C: library read
    lib = V.read_version(spark, store)
    c = t_noop(lib.agg(F.count(F.lit(1))))

    # D: schema-less format read — schema() inference runs at load()
    # (construction); time BOTH the construction and the noop
    t0 = time.perf_counter()
    fmt_nos = (
        spark.read.format("versioned_table").option("path", store).load()
    )
    d_build = time.perf_counter() - t0
    d = t_noop(fmt_nos.agg(F.count(F.lit(1))))

    # E: timestampasof (schema-less)
    ts = str(time.time())
    t0 = time.perf_counter()
    fmt_ts = (
        spark.read.format("versioned_table")
        .option("path", store)
        .option("timestampasof", ts)
        .load()
    )
    e_build = time.perf_counter() - t0
    e = t_noop(fmt_ts.agg(F.count(F.lit(1))))

    # in-process metadata calls
    t0 = time.perf_counter(); V.versions(store); t_v = time.perf_counter() - t0
    t0 = time.perf_counter()
    VS.infer_arrow_schema(store)
    t_inf = time.perf_counter() - t0
    from pyspark.sql.types import _parse_datatype_string

    sch = _parse_datatype_string(ddl)
    t0 = time.perf_counter()
    r = VS._VersionedBatchReader({"path": store, "schema": ddl}, sch)
    parts = r.partitions()
    t_parts = time.perf_counter() - t0
    t0 = time.perf_counter()
    V.version_at_timestamp(store, float(ts))
    t_vat = time.perf_counter() - t0

    print(f"A format(declared) noop : {a:.3f}")
    print(f"B native parquet noop   : {b:.3f}")
    print(f"C library read noop     : {c:.3f}")
    print(f"D schema-less build     : {d_build:.3f}  noop: {d:.3f}")
    print(f"E timestampasof build   : {e_build:.3f}  noop: {e:.3f}")
    print(
        f"meta: versions={t_v*1e3:.1f}ms infer={t_inf*1e3:.1f}ms "
        f"partitions={t_parts*1e3:.1f}ms ({len(parts)} parts) "
        f"version_at_timestamp={t_vat*1e3:.1f}ms"
    )


if __name__ == "__main__":
    main()
