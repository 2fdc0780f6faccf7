"""As-of join — latest right-side row at or before each left timestamp.

Spark has no native as-of primitive (SURVEY.md §2.3/§7.4). Two
implementations:

- **union+window** (default): tag both sides, union, sort by (key, time),
  carry the right side's values forward with ``last(..., ignorenulls)``
  over an unbounded-preceding frame, keep left rows. One shuffle on the
  key, no join at all — the standard scale pattern; state per key is one
  row.
- **merge_asof** (pandas path): per-key ``applyInPandas`` with
  ``pd.merge_asof`` — simpler semantics for many value columns, used
  when the per-key data fits a pandas frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    right_on: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row's
    ``right_cols`` with right.right_on <= left.on, matched per ``by``
    key (right_on defaults to on).

    Ties at identical timestamps resolve right-before-left (the right
    row is visible to a left row with the same timestamp)."""
    if right_on and right_on != on:
        right = right.withColumn(on, F.col(right_on))
    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.withColumn("__side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps (__side asc)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in right_cols:
        carried = carried.withColumn(
            c + suffix,
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return carried.where(F.col("__side") == 1).drop(
        "__side", *right_cols
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    right_on: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """pandas ``merge_asof`` per key group (cogrouped applyInPandas).

    ``right_on`` names the right side's time column and must differ from
    ``on``: Spark's cogroup plan dedupes same-named non-key columns
    across the two sides, so a right column literally named like the
    left's would never reach the UDF."""
    import pandas as pd

    right_on = right_on or on
    if right_on == on:
        raise ValueError(
            "right_on must differ from on (cogroup drops duplicate "
            "column names across sides); alias the right time column"
        )
    schema_parts = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    schema_parts += [
        f"{c}{suffix} {right.schema[c].dataType.simpleString()}" for c in right_cols
    ]
    out_schema = ", ".join(schema_parts)
    left_cols = [f.name for f in left.schema.fields]

    def merge(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        lg = lg.sort_values(on)
        if rg.empty:
            # a key present only on the left arrives as a column-less
            # empty frame — emit left rows with null as-of columns
            merged = lg.copy()
            for c in right_cols:
                merged[c + suffix] = None
        else:
            sel = [right_on] + [c for c in right_cols if c != right_on]
            rg = rg.sort_values(right_on)[sel]
            merged = pd.merge_asof(
                lg,
                rg,
                left_on=on,
                right_on=right_on,
                direction="backward",
                suffixes=("", suffix),
            )
            ren = {c: c + suffix for c in right_cols if c + suffix not in merged.columns}
            merged = merged.rename(columns=ren)
        return merged[[*left_cols, *[c + suffix for c in right_cols]]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda lg, rg: merge(lg, rg), schema=out_schema)
    )
