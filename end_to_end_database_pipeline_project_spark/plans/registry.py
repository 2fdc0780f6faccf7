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


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check —
    reserve that for genuinely non-SQL-expressible ops (hash-seeded LSH,
    streaming state, binary-column UDFs).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
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
