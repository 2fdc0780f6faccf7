"""Query registry: name -> (Spark builder, DuckDB oracle SQL).

Every operator the engine claims is registered here via the ``@query``
decorator.  The driver contract (``/root/repo/__spark_entry__.py``)
re-exports ``QUERIES`` and ``ORACLES`` verbatim; the in-repo test
``tests/test_oracle_parity.py`` runs the same comparison locally.

Conventions that keep the order-insensitive value-hash stable between
Spark and DuckDB:

- **Column names must match.** Every computed/aggregate column is aliased
  identically on both sides.
- **Floats are rounded to 6 decimals on both sides** (``F.round(c, 6)``
  / ``round(c, 6)``): the two engines sum doubles in different orders, so
  unrounded last-bit noise would flap the hash.
- **Integer widths are pinned**: DuckDB ``sum(INTEGER)`` yields HUGEINT
  and ``year()`` yields BIGINT — both sides cast explicitly (usually to
  BIGINT) so schemas agree.
- **UTC everywhere**: the Spark session runs with
  ``spark.sql.session.timeZone=UTC`` to match DuckDB's naive-UTC reading
  of parquet timestamps.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _type_has_float(dtype) -> bool:
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        FloatType,
        MapType,
        StructType,
    )

    if isinstance(dtype, (DoubleType, FloatType)):
        return True
    if isinstance(dtype, ArrayType):
        return _type_has_float(dtype.elementType)
    if isinstance(dtype, MapType):
        return _type_has_float(dtype.keyType) or _type_has_float(dtype.valueType)
    if isinstance(dtype, StructType):
        return any(_type_has_float(f.dataType) for f in dtype.fields)
    return False


def _norm_zero_expr(col, dtype):
    """Expression normalizing ``-0.0`` anywhere in ``dtype``.

    Recurses through arrays, maps and structs so nested float payloads
    (``array<double>`` embeddings, metric structs) get the same
    guarantee as top-level columns.  Callers must pre-check
    ``_type_has_float`` so unaffected columns pass through untouched
    (no plan-shape change for the common case).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        FloatType,
        MapType,
        StructType,
    )

    if isinstance(dtype, DoubleType):
        return col + F.lit(0.0)
    if isinstance(dtype, FloatType):
        return (col + F.lit(0.0)).cast("float")
    if isinstance(dtype, ArrayType):
        return F.transform(col, lambda x: _norm_zero_expr(x, dtype.elementType))
    if isinstance(dtype, MapType):
        out = col
        if _type_has_float(dtype.keyType):
            # -0.0 and +0.0 never coexist as keys of one SPARK-built
            # map (ArrayBasedMapBuilder normalizes at construction), so
            # key normalization cannot collide entries for anything
            # this engine constructs. Caveat: a map column read from
            # parquet WRITTEN BY ANOTHER ENGINE can carry both keys, and
            # transform_keys would then fail with DUPLICATED_MAP_KEY
            # under the default EXCEPTION dedup policy — the right
            # failure (the input violates Spark's map-key invariant;
            # silently merging the entries would pick an arbitrary
            # value). No registered query reads external map columns.
            out = F.transform_keys(
                out, lambda k, _: _norm_zero_expr(k, dtype.keyType)
            )
        if _type_has_float(dtype.valueType):
            out = F.transform_values(
                out, lambda _, v: _norm_zero_expr(v, dtype.valueType)
            )
        return out
    if isinstance(dtype, StructType):
        rebuilt = F.struct(
            *[
                (
                    _norm_zero_expr(col[f.name], f.dataType)
                    if _type_has_float(f.dataType)
                    else col[f.name]
                ).alias(f.name)
                for f in dtype.fields
            ]
        )
        # F.struct of a null struct's fields yields a non-null struct
        # of nulls; preserve outer nullness explicitly.
        return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
    return col


def normalize_signed_zero(df: DataFrame) -> DataFrame:
    """Normalize IEEE ``-0.0`` to ``0.0`` in every float column, nested
    float array/map/struct payloads included.

    A statistic that collapses to summation noise on a degenerate input
    (e.g. an OLS slope over identical points) rounds to ``-0.0`` or
    ``0.0`` depending on Spark's run-dependent aggregation order; the
    two are numerically equal but DIFFER under the driver's stringified
    value hash (`heaps_law_fit`, driver-red r05). ``x + 0.0`` maps
    ``-0.0`` to ``+0.0`` and is the identity for every other value
    (NaN, infinities and null included); Catalyst does not fold it away
    (that would be unsound for exactly this reason — verified against
    the physical plan). The oracle side needs no twin: single-threaded
    DuckDB is deterministic and ``tools/oracle_audit.py`` proves no
    registered oracle emits ``-0.0`` at the gate SF.
    """
    cols, changed = [], False
    for f in df.schema.fields:
        if _type_has_float(f.dataType):
            cols.append(_norm_zero_expr(df[f.name], f.dataType).alias(f.name))
            changed = True
        else:
            cols.append(df[f.name])
    return df.select(cols) if changed else df


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check —
    reserve that for genuinely non-SQL-expressible ops (hash-seeded LSH,
    streaming state, binary-column UDFs).

    Every registered builder's output passes through
    ``normalize_signed_zero`` so no plan can emit ``-0.0``.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return normalize_signed_zero(fn(spark, sf_dir))

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # plan audits can reach the raw builder
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- exact money arithmetic (shared by query packs) -------------------
#
# The fixture money columns are exact 2-decimal values; computing
# revenue as DECIMAL end-to-end makes sums order-independent and
# identical across engines at any scale factor (double summation noise
# exceeds any fixed rounding once group sums are large enough, and
# round-after-double-cast flips on half-cent boundaries — see
# spark-graft oracle conventions).

DEC_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


def dec_rev():
    """l_extendedprice * (1 - l_discount) as an exact decimal column."""
    from pyspark.sql import functions as F

    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


def rev_e4():
    """The same exact revenue value as ``dec_rev()``, scaled by 1e4
    into an integer-valued decimal(18,0) — r11 (guide §1.2 per-task
    work): the decimal(18,2) x decimal(4,2) product is decimal(23,4),
    which exceeds Spark's 18-digit long-backed fast path and pays a
    BigDecimal allocation per row; cents x (100 - discount-cents) is
    ONE long multiply (exact: prices < 1e10, so the e4 product fits 18
    digits with room for any per-row value), and only the aggregate
    boundary converts back to a revenue-scaled decimal via
    :func:`e4_to_rev`. Measured ~25% off the Q1-shape aggregate at
    sf0.1 with bit-identical output.

    ``rint`` recovers the exact cents from the stored double by the
    same argument as the decimal cast (the double sits ~1e-13 from its
    2-decimal value; the nearest tie is 5e-3 away)."""
    from pyspark.sql import functions as F

    epc = F.rint(F.col("l_extendedprice") * 100).cast("long")
    dc = F.rint(F.col("l_discount") * 100).cast("long")
    return (epc * (100 - dc)).cast("decimal(18,0)")


def e4_to_rev(c):
    """Exact decimal revenue value of a summed ``rev_e4`` column
    (division by 10^4 is exact: the quotient has <= 4 fractional
    digits, within the result scale Spark assigns)."""
    from pyspark.sql import functions as F

    return c / F.lit(10000).cast("decimal(5,0)")
