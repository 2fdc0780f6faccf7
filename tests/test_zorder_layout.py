"""Z-order clustering: multi-dimensional data skipping, measured.

A linear sort (the reference's MergeTree ORDER BY analog) skips
perfectly on its leading column and not at all on the other dimension.
The Z-ordered layout must skip meaningfully in BOTH dimensions — that's
the whole claim, checked here against real parquet footer stats, the
same stats Spark's reader prunes with.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.operators.layout import (
    cluster_by_zorder,
    cluster_linear,
    file_skip_fraction,
    morton_key,
)
from end_to_end_database_pipeline_project_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
# skip-fraction measurement needs enough rows per file for range
# boundaries to be tight; sf0.01 (10k events over 16 files) is still fast
SF_SKIP = "/root/testdata/sf0.01"


def test_morton_key_interleaves(spark):
    rows = spark.range(1).select(
        morton_key(F.lit(0b1111), F.lit(0)).alias("a"),
        morton_key(F.lit(0), F.lit(0b1111)).alias("b"),
        morton_key(F.lit(0xFFFF), F.lit(0xFFFF)).alias("both"),
    ).first()
    assert rows.a == 0b01010101
    assert rows.b == 0b10101010
    assert rows.both == 0xFFFFFFFF


def test_zorder_skips_in_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_SKIP, "events").select(
        "user_id", "value", "event_type"
    )
    ev = ev.where(F.col("value").isNotNull())
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    cluster_by_zorder(ev, "user_id", "value", zpath, n_files=16)
    cluster_linear(ev, "user_id", lpath, n_files=16)

    # narrow box predicates in each dimension (~10% of each range)
    lo_u, hi_u = 10, 24
    stats = ev.agg(F.min("value"), F.max("value")).first()
    vlo = stats[0] + 0.45 * (stats[1] - stats[0])
    vhi = stats[0] + 0.55 * (stats[1] - stats[0])

    lin_user = file_skip_fraction(lpath, "user_id", lo_u, hi_u)
    lin_val = file_skip_fraction(lpath, "value", vlo, vhi)
    z_user = file_skip_fraction(zpath, "user_id", lo_u, hi_u)
    z_val = file_skip_fraction(zpath, "value", vlo, vhi)

    # the linear layout is the specialist: near-perfect on its sort
    # column, useless on the other
    assert lin_user >= 0.8
    assert lin_val <= 0.1
    # the z-order layout must prune substantially in BOTH dimensions
    assert z_user >= 0.4, f"z-order user_id skip too weak: {z_user}"
    assert z_val >= 0.4, f"z-order value skip too weak: {z_val}"


def test_zorder_preserves_content(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("user_id", "value", "event_type")
    path = str(tmp_path / "z")
    cluster_by_zorder(ev, "user_id", "value", path, n_files=8)
    back = spark.read.parquet(path)
    a = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("s")
    )
    b = back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("s")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert set(back.columns) == {"user_id", "value", "event_type"}
