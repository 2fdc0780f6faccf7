"""Materialized-view catalog + automatic aggregate query rewrite.

The engine feature behind ``incremental_rollup_merge``'s storage trick:
rollups are stored as MERGEABLE partials (sum, count per group — the
mean family's commutative monoid), which makes every coarser grain
answerable by re-aggregating partials instead of rescanning the base
table. This module adds the missing half — the *rewrite*: given a
requested grain, pick the coarsest registered view that can still
answer it and fold its partials.

At 100 TB this is the difference between a dashboard query costing a
full fact scan and costing a scan of a few-thousand-row summary: the
rewrite is O(|MV|), and correctness is guaranteed by the partials'
associativity (the oracle for ``mv_rewrite_report`` recomputes every
answer from the base table and hash-compares).

Grain derivations form a lattice (date -> month -> quarter...): an MV
answers a request iff every requested dim is one of the MV's dims or
derivable from one. Among candidates the chooser takes the coarsest
(fewest partial rows to fold) — the standard summary-table rewrite
rule (Gupta/Mumick's MV rewrite condition specialized to the
distributive-aggregate case).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# dim -> (parent dim it derives from, derivation expression). A chain
# of derivations (month from date, quarter from month) is followed
# transitively by the matcher.
DERIVATIONS: dict[str, tuple[str, Callable[[Column], Column]]] = {
    "obs_month": ("obs_date", lambda c: F.date_trunc("month", c).cast("date")),
    "obs_quarter": ("obs_month", lambda c: F.date_trunc("quarter", c).cast("date")),
}


@dataclass
class MaterializedView:
    """A registered summary table holding mergeable (sum, count) partials."""

    name: str
    dims: tuple[str, ...]
    #: builds the partials DataFrame: dims... + measure partial columns
    build: Callable[[SparkSession, str], DataFrame]
    #: measure -> (sum_col, count_col) partial column names
    measures: dict[str, tuple[str, str]] = field(default_factory=dict)
    #: rough partial-row count at the gate SF — the chooser's cost key
    approx_rows: int = 0


def _derivable(dim: str, available: set[str]) -> bool:
    """Can `dim` be computed from `available` via the derivation lattice?"""
    if dim in available:
        return True
    step = DERIVATIONS.get(dim)
    return step is not None and _derivable(step[0], available)


def _derive(dim: str, available: set[str]) -> Column:
    if dim in available:
        return F.col(dim)
    parent, fn = DERIVATIONS[dim]
    return fn(_derive(parent, available))


def choose_mv(request_dims: tuple[str, ...], mvs: list[MaterializedView]) -> MaterializedView:
    """Coarsest registered view that can answer the requested grain."""
    ok = [m for m in mvs if all(_derivable(d, set(m.dims)) for d in request_dims)]
    if not ok:
        raise ValueError(f"no registered MV answers grain {request_dims}")
    return min(ok, key=lambda m: m.approx_rows)


def answer_from_mv(
    spark: SparkSession,
    sf_dir: str,
    request_dims: tuple[str, ...],
    measure: str,
    mvs: list[MaterializedView],
) -> tuple[DataFrame, str]:
    """Rewrite an avg/count request onto the chosen MV's partials.

    Returns (answer, mv_name); the answer has the requested dims plus
    ``avg_value`` / ``n_events`` — identical, by partial associativity,
    to recomputing from the base table."""
    mv = choose_mv(request_dims, mvs)
    part = mv.build(spark, sf_dir)
    avail = set(mv.dims)
    sum_c, cnt_c = mv.measures[measure]
    dims = [_derive(d, avail).alias(d) for d in request_dims]
    out = (
        part.select(*dims, F.col(sum_c).alias("_s"), F.col(cnt_c).alias("_c"))
        .groupBy(*request_dims)
        .agg(
            (F.sum("_s") / F.sum("_c")).alias("avg_value"),
            F.sum("_c").alias("n_events"),
        )
    )
    return out, mv.name
