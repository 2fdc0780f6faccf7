"""Storage-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping.

The reference gets its scan pruning from a single ClickHouse MergeTree
``ORDER BY`` (clickhouse_etl.py table DDL) — one clustering dimension.
A linear sort skips perfectly on its leading column and not at all on
any other; at 100 TB the second predicate dimension (a value range over
a station-sorted table, a station over a time-sorted table) reads the
whole table.  Z-ordering interleaves the bits of two rank-scaled
dimensions into one sort key, so file/row-group min-max stats become
tight boxes in BOTH dimensions and either predicate prunes.

Everything is native Catalyst bit arithmetic (shift/and/or — fully
codegen'd); the layout write is ``repartitionByRange`` on the Morton
key + in-file sort, the same mechanics the medallion silver writer uses
for its one-dimensional layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16  # per-dimension resolution: 2^16 ranks; plenty for file-level skipping


def _spread_bits(x: Column) -> Column:
    """Insert a zero between consecutive bits of a 16-bit int (the
    classic magic-mask Morton spread): 0b1111 -> 0b01010101."""
    x = x.cast("long")  # stay in the 64-bit domain: bit 31 must not sign-flip
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def morton_key(a16: Column, b16: Column) -> Column:
    """Interleave two 16-bit rank columns into one 32-bit Morton key."""
    return (
        _spread_bits(a16).bitwiseOR(F.shiftleft(_spread_bits(b16), 1)).cast("long")
    )


def _rank16(c: Column, lo: Column, hi: Column) -> Column:
    """Min-max scale a numeric column to [0, 2^16-1]. lo/hi come from a
    broadcast one-row stats frame, so the scaling is a pure projection."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (c.cast("double") - lo) / span
    return F.least(
        F.floor(frac * (1 << _BITS)).cast("int"), F.lit((1 << _BITS) - 1)
    )


def cluster_by_zorder(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    path: str,
    n_files: int = 32,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the
    Morton key of (dim_a, dim_b).

    One pass: a one-row min/max stats aggregate rides in as a broadcast
    (no driver round-trip), the Morton key is a projection, and
    ``repartitionByRange`` + in-partition sort gives each output file a
    tight min-max box in both dimensions.  At scale this is the
    maintenance job that re-clusters a partition after enough appends
    dilute its boxes (the OPTIMIZE ZORDER pattern)."""
    stats = df.agg(
        F.min(dim_a).cast("double").alias("_alo"),
        F.max(dim_a).cast("double").alias("_ahi"),
        F.min(dim_b).cast("double").alias("_blo"),
        F.max(dim_b).cast("double").alias("_bhi"),
    )
    keyed = df.crossJoin(F.broadcast(stats)).withColumn(
        "_z",
        morton_key(
            _rank16(F.col(dim_a), F.col("_alo"), F.col("_ahi")),
            _rank16(F.col(dim_b), F.col("_blo"), F.col("_bhi")),
        ),
    )
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_alo", "_ahi", "_blo", "_bhi")
        .write.mode("overwrite")
        .parquet(path)
    )


def cluster_linear(
    df: DataFrame, dim: str, path: str, n_files: int = 32
) -> None:
    """The one-dimensional baseline: range-partition + sort on a single
    column (the reference's MergeTree ORDER BY analog)."""
    (
        df.repartitionByRange(n_files, dim)
        .sortWithinPartitions(dim)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skip_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of parquet files under ``path`` whose footer min-max
    stats EXCLUDE the predicate ``col BETWEEN lo AND hi`` — what a
    stats-based reader (Spark parquet filter pushdown, or partition-
    level skipping services) would never open."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(path, "*.parquet"))
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        cmin, cmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(names[col]).statistics
            cmin = st.min if cmin is None else min(cmin, st.min)
            cmax = st.max if cmax is None else max(cmax, st.max)
        if cmax < lo or cmin > hi:
            skipped += 1
    return skipped / max(len(files), 1)
