"""Distribution-drift monitors for the incremental ingest path.

The reference's whole point is periodic re-sync (scheduler.py:45-73 —
re-run the warehouse load every 30-60 minutes); a production version of
that loop also needs to know when the NEW data stopped looking like the
old data. These are the two standard scorecard monitors, built so the
SAME code runs batch (registered queries `streaming_psi_monitor` /
`streaming_ks_monitor`) and streaming (``run_drift_monitor``'s
``foreachBatch`` hook over the landing stream):

- **PSI** (Population Stability Index) of each batch's value
  distribution against a 10-bin equal-width reference histogram
  (add-1 smoothing; PSI > 0.2 = significant shift — the same
  construction as the whole-history ``value_psi_drift``).
- **Grid-anchored KS**: max ECDF gap between batch and reference,
  evaluated on the reference's exact 19-point ventile grid. The grid
  (not the full reference sample) is what rides along at scale: the
  classical sup over the *union* of both samples needs every reference
  value per batch — unbounded state — while the ventile grid is a
  19-row broadcast with the reference CDF precomputed, so per batch
  the cost is one pass over the batch. The grid statistic lower-bounds
  the classical D (it evaluates the same step functions on a subset of
  points) and is the standard binned-KS drift monitor; the
  significance cutoff keeps the classical large-sample form
  ``1.36 * sqrt((nr+nb)/(nr*nb))``.

Scale shape: both reference artifacts are metadata-sized (10 / 19
rows) and built in one corpus pass each — the histogram from
associative min/max + one groupBy, the grid from
``distributed_prefix_sum`` ranks (never a global window over the
reference). Monitoring a batch costs one pass over the batch joined
against the broadcast artifact.

Determinism: bin ids and grid memberships are integer comparisons on
exact counts; ``ln`` appears only in the final PSI value (rounded to
6, the eval-pack convention), never in anything grouped or joined on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.scale import distributed_prefix_sum

_R = 6
N_BINS = 10
N_GRID = 20  # ventiles: grid points k = 1..19
PSI_ALERT = 0.2
KS_COEFF = 1.36  # alpha = 0.05 two-sample Kolmogorov coefficient


def _bin_expr(value, lo, hi):
    """Equal-width bin id in [0, N_BINS) with out-of-reference-range
    values clamped to the edge bins (a batch can exceed the reference's
    min/max — the monitor must still bin it, unlike the whole-history
    PSI where lo/hi are global)."""
    raw = F.floor((value - lo) / ((hi - lo) / float(N_BINS))).cast("long")
    return F.when(hi == lo, F.lit(0).cast("long")).otherwise(
        F.greatest(F.lit(0).cast("long"), F.least(raw, F.lit(N_BINS - 1).cast("long")))
    )


def reference_histogram(ref: DataFrame, value_col: str = "value") -> DataFrame:
    """10-row reference histogram ``(bin, ref_n, lo, hi, ref_total)``
    — the broadcastable PSI artifact, built once per reference epoch.
    Every row carries the scalar stats so the artifact is one
    self-contained table (persist it; re-use across batches).

    NULL values are excluded HERE, not by caller convention: an
    unfiltered reference would otherwise count NULLs into ``ref_total``
    while binning them to NULL (dropped by the bin spine join),
    silently deflating every reference proportion and biasing the PSI
    (r07 advice)."""
    spark = ref.sparkSession
    ref = ref.where(F.col(value_col).isNotNull())
    stats = ref.agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.count(F.lit(1)).alias("ref_total"),
    )
    binned = ref.crossJoin(F.broadcast(stats)).select(
        _bin_expr(F.col(value_col), F.col("lo"), F.col("hi")).alias("bin")
    )
    counts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("ref_n"))
    spine = spark.range(N_BINS).select(F.col("id").alias("bin"))
    return (
        spine.join(counts, "bin", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).cast("long").alias("ref_n"),
            "lo",
            "hi",
            F.col("ref_total").cast("long").alias("ref_total"),
        )
    )


def psi_against_reference(
    batch: DataFrame,
    hist: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """PSI of ``batch``'s value distribution vs the reference
    histogram, per ``group_cols`` (one row per group; pass the
    batch-id / day column). Returns ``group_cols + (n_events, psi,
    drifted, ref_degenerate)``. Empty-group-impossible by construction
    (groups come from the batch rows themselves). An EMPTY reference
    (``ref_total == 0``) yields an empty result, enforced here: a
    histogram built from zero rows carries NULL lo/hi, under which
    every batch value would clamp into one bin and the PSI would
    confidently score the batch against a fabricated all-zero
    reference — no reference, no verdict. A CONSTANT reference
    (``hi == lo``) is a different regime: it is real data, so a
    verdict is still emitted, but ``_bin_expr`` clamps every batch
    value to bin 0 and the PSI is structurally 0 for ANY batch — the
    monitor is blind, and ``ref_degenerate = true`` says so instead of
    letting that regime read as "no drift" (r07 advice)."""
    gcols = list(group_cols or [])
    hist = hist.where(F.col("ref_total") > 0)
    stats = hist.agg(
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.first("ref_total").alias("ref_total"),
    )
    b = (
        batch.where(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(
            *gcols,
            _bin_expr(F.col(value_col), F.col("lo"), F.col("hi")).alias("bin"),
        )
    )
    cnts = b.groupBy(*gcols, "bin").agg(F.count(F.lit(1)).alias("nd"))
    totals = b.groupBy(*gcols).agg(F.count(F.lit(1)).alias("td"))
    full = totals.crossJoin(
        F.broadcast(hist.select("bin", "ref_n", "ref_total"))
    ).join(cnts, [*gcols, "bin"], "left")
    pr = (F.col("ref_n") + 1.0) / (F.col("ref_total") + float(N_BINS))
    pc = (F.coalesce("nd", F.lit(0)) + 1.0) / (F.col("td") + float(N_BINS))
    term = (pr - pc) * F.log(pr / pc)
    out = full.groupBy(*gcols, "td").agg(F.round(F.sum(term), _R).alias("psi"))
    deg = stats.select(
        F.coalesce(F.col("lo") == F.col("hi"), F.lit(False)).alias("ref_degenerate")
    )
    return out.select(
        *gcols,
        F.col("td").cast("long").alias("n_events"),
        "psi",
        F.coalesce(F.col("psi") > PSI_ALERT, F.lit(False)).alias("drifted"),
    ).crossJoin(F.broadcast(deg))


def reference_grid(
    ref: DataFrame, value_col: str = "value", tiebreak_col: str = "event_id"
) -> DataFrame:
    """19-row exact-ventile grid ``(k, g, ref_le, ref_total)`` of the
    reference: ``g`` is the value at rank ``ceil(k * n / 20)`` (ranks
    from ``distributed_prefix_sum`` — no global window), ``ref_le`` the
    exact reference CDF count at ``g``. The broadcastable KS artifact.
    NULL values are excluded here (not by caller convention) — they
    would otherwise occupy ranks in the ventile grid and shift every
    quantile (r07 advice; same contract as ``reference_histogram``)."""
    spark = ref.sparkSession
    ref = ref.where(F.col(value_col).isNotNull())
    r = ref.select(
        F.col(value_col).alias("value"), F.col(tiebreak_col).alias("tb")
    ).withColumn("one", F.lit(1).cast("long"))
    nr = r.agg(F.count(F.lit(1)).alias("ref_total"))
    ranked = distributed_prefix_sum(r, ["value", "tb"], "one", out_col="rk0")
    targets = (
        spark.range(1, N_GRID)
        .select(F.col("id").alias("k"))
        .crossJoin(F.broadcast(nr))
        .select(
            "k",
            "ref_total",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("k") * F.col("ref_total") / float(N_GRID)).cast("long"),
            ).alias("target_rank"),
        )
    )
    grid = (
        ranked.select("value", (F.col("rk0") + 1).alias("rk"))
        .join(F.broadcast(targets), F.col("rk") == F.col("target_rank"))
        .select("k", F.col("value").alias("g"), "ref_total")
    )
    ref_le = (
        r.crossJoin(F.broadcast(grid))
        .groupBy("k", "g", "ref_total")
        .agg(
            F.sum(F.when(F.col("value") <= F.col("g"), 1).otherwise(0))
            .cast("long")
            .alias("ref_le")
        )
    )
    return ref_le.select("k", "g", "ref_le", F.col("ref_total").cast("long").alias("ref_total"))


def ks_against_reference(
    batch: DataFrame,
    grid: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Grid-anchored two-sample KS of ``batch`` vs the reference, per
    ``group_cols``: ``ks_d = max_k |F_ref(g_k) - F_batch(g_k)|`` with
    the classical 5% critical value. Returns ``group_cols +
    (n_events, ks_d, ks_crit, drifted)``. An empty reference yields an
    empty result by construction (no ranks -> no grid rows -> the
    grid join produces nothing) — same no-reference-no-verdict
    contract as ``psi_against_reference``."""
    gcols = list(group_cols or [])
    b = batch.where(F.col(value_col).isNotNull())
    totals = b.groupBy(*gcols).agg(F.count(F.lit(1)).alias("td"))
    le = (
        b.crossJoin(F.broadcast(grid))
        .groupBy(*gcols, "k", "ref_le", "ref_total")
        .agg(
            F.sum(F.when(F.col(value_col) <= F.col("g"), 1).otherwise(0))
            .cast("long")
            .alias("le")
        )
    )
    j = le.join(totals, gcols) if gcols else le.crossJoin(totals)
    adiff = F.abs(
        F.col("ref_le") / F.col("ref_total").cast("double")
        - F.col("le") / F.col("td").cast("double")
    )
    crit = F.round(
        F.lit(KS_COEFF)
        * F.sqrt(
            (F.col("ref_total") + F.col("td"))
            / (F.col("ref_total").cast("double") * F.col("td"))
        ),
        _R,
    )
    out = j.groupBy(*gcols, "td", "ref_total").agg(
        F.round(F.max(adiff), _R).alias("ks_d")
    )
    return out.select(
        *gcols,
        F.col("td").cast("long").alias("n_events"),
        "ks_d",
        crit.alias("ks_crit"),
        F.coalesce(F.col("ks_d") > crit, F.lit(False)).alias("drifted"),
    )


def run_drift_monitor(
    spark,
    landing_dir: str,
    out_dir: str,
    hist: DataFrame,
    grid: DataFrame,
    value_col: str = "value",
) -> str:
    """Consume the landing stream to completion (availableNow), scoring
    every micro-batch against the precomputed reference artifacts and
    writing one monitor row per (batch, day) to ``out_dir/monitor``
    under the batch's own ``batch_id`` partition (dynamic overwrite —
    replays rewrite their rows; note ``batch_id`` therefore reads back
    as a partition column, inferred int, and the table layout is
    partitioned from r08 on — point fresh runs at fresh dirs):
    ``(batch_day, n_events, psi, drifted, ref_degenerate, ks_d,
    ks_crit, ks_drifted, batch_id)``. The foreachBatch body runs the
    SAME ``psi_against_reference`` / ``ks_against_reference`` code as
    the registered batch queries — batch-equivalence is pinned by
    tests/test_streaming_drift_monitor.py. Artifacts are built once per
    reference epoch and reused across every batch (persist them; they
    are 10 / 19 rows). Returns the monitor table path."""
    import os

    from .incremental import EVENT_SCHEMA, _run_landing_stream

    monitor_path = os.path.join(out_dir, "monitor")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        b = (
            batch.where(F.col(value_col).isNotNull())
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                F.to_date("ts").alias("batch_day"),
                value_col,
            )
        )
        if not b.take(1):
            return
        gcols = ["batch_id", "batch_day"]
        psi = psi_against_reference(b, hist, value_col, gcols)
        ks = ks_against_reference(b, grid, value_col, gcols).select(
            *gcols, "ks_d", "ks_crit", F.col("drifted").alias("ks_drifted")
        )
        # idempotent per batch: a replayed batch (failure between sink
        # write and checkpoint commit) overwrites its OWN batch_id
        # partition instead of appending duplicate monitor rows, so the
        # one-row-per-(batch, day) invariant survives at-least-once
        # delivery (r07 advice)
        psi.join(ks, gcols).write.partitionBy("batch_id").option(
            "partitionOverwriteMode", "dynamic"
        ).mode("overwrite").parquet(monitor_path)

    _run_landing_stream(
        spark,
        landing_dir,
        os.path.join(out_dir, "_checkpoint"),
        process_batch,
        schema=EVENT_SCHEMA,
    )
    return monitor_path
