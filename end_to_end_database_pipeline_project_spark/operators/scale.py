"""Skew and co-location techniques for 100 TB operation.

AQE's skew-join splitting and partition coalescing handle much of this
at runtime, but two patterns still need explicit engineering at scale
and are first-class operators here:

- **Salting**: a hot grouping/join key (one user, one null-bucket, one
  default id) overwhelms a single reducer. Aggregations decompose into
  a salted partial pass (key, salt) followed by a final combine on the
  key — both shuffles are uniform. Joins replicate the (small) build
  side once per salt so the probe side can carry a deterministic salt
  and join on (key, salt) without any reducer seeing the whole hot key.
- **Bucketing**: both join sides pre-hash-partitioned (and sorted) into
  the same number of buckets on the join key at write time; the join
  then runs with zero shuffle — the classic co-located join for fact
  tables joined repeatedly on the same key.

Salts are deterministic (hash of a unique column, not rand()) so
results are reproducible and retries are safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 32


def salted_sum_avg(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_src: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-proof aggregate: sum/count/avg of ``value_col``
    per ``key_cols``.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 combines the tiny per-salt partials.
    avg is recomposed from (sum, count), never averaged-of-averaged.
    Equivalent to the plain groupBy for all inputs (oracle-checked)."""
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).alias("__salt")
    partial = (
        df.groupBy(*key_cols, salt)
        .agg(
            F.sum(value_col).alias("__s"),
            F.count(value_col).alias("__c"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__s").alias("total_value"),
        F.sum("__c").alias("n_values"),
        (F.sum("__s") / F.sum("__c")).alias("avg_value"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-proof equi-join: the dim side is replicated once per salt,
    the fact side carries a deterministic salt, and the join key becomes
    (key, salt) — a hot fact key now lands on ``n_salts`` reducers
    instead of one.

    Use when the dim is too big to broadcast but small enough to
    replicate ``n_salts``×; otherwise prefer broadcast (no shuffle at
    all) or AQE skew splitting."""
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return salted_fact.join(salted_dim, [key, "__salt"]).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    database_location: str | None = None,
) -> None:
    """Persist a table hash-bucketed (and sorted) on the join key.

    Both sides of a repeated fact-fact join written this way join with
    NO exchange: each task zips bucket i with bucket i. ``database_location``
    pins the metastore-managed files to an explicit path (tests use a
    temp dir) — on a cluster this is the warehouse/object-store root."""
    spark = df.sparkSession
    if "." in table and database_location:
        db = table.split(".")[0]
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{database_location}'"
        )
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table)
    )


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Point-in-interval join ([lo, hi) containment) as an equi-join.

    A raw inequality join plans as a nested-loop — O(|points|·|intervals|)
    comparisons, viable only while one side broadcasts. When both sides
    are large, discretize: map each point to ``floor(value/bin_width)``,
    explode each interval to every bin it overlaps, hash-join on the bin,
    then apply the exact containment predicate as a residual filter.
    Cost drops to O(points + intervals·spanned_bins + true_matches·k)
    and both sides shuffle-partition uniformly.

    ``bin_width`` tuning: ≈ the typical interval width, so intervals
    span O(1) bins. Degenerate wide intervals fan out proportionally —
    at scale, split interval sets by width class and use a width-matched
    bin per class."""
    pt = points.withColumn(
        "__bin", F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    return (
        pt.join(iv, "__bin")
        .where((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bin")
    )


def _order_cols(order_col) -> list:
    """Normalize an ordering spec: a single column name, or a list of
    names / Column sort expressions (``F.desc("revenue")``)."""
    cols = order_col if isinstance(order_col, (list, tuple)) else [order_col]
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def distributed_prefix_sum(
    df: DataFrame,
    order_col,
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum over a global ordering WITHOUT a global
    window — the two-pass scheme every sequence-packing / offset-
    assignment job needs at scale.

    A plain ``sum().over(Window.orderBy(...))`` with no PARTITION BY
    collapses to a single partition (Spark literally warns): one
    reducer streams the whole corpus. Instead:

    1. range-partition by the order column (already sorted within
       partitions);
    2. per-partition subtotals (one tiny row each) -> driver-free
       cumulative offsets via a window over the FEW subtotal rows;
    3. broadcast-join offsets back, then a per-partition running sum
       (window PARTITION BY the physical partition id — state bounded
       per partition) plus the partition's offset.

    Identical result to the global window (asserted in
    tests/test_scale.py), wall-clock bounded by the largest partition,
    not the corpus.

    Cost model of the checkpoint below: one extra local write + read
    of the ranged table (executor-local storage, already post-shuffle).
    That is the price of a CONSISTENT partition assignment across the
    two consumer branches — the same materialize-then-assign shape
    production packing/offset pipelines use — and it is what makes the
    operator deterministic when chained after other shuffles. (The
    zero-materialization alternative — deterministic value-binned
    partitioning, a pure function of the key — trades this for skew
    sensitivity; the checkpoint is the right default.)

    ``order_col`` may be a single column name or a list of sort
    expressions (``[F.desc("revenue"), F.asc("l_suppkey")]``) — the
    range partitioner and the local window share the spec, so any
    total ordering expressible as a sort works."""
    from pyspark.sql import Window

    ocols = _order_cols(order_col)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # the partition assignment MUST be materialized once: `ranged`
    # feeds two branches (subtotals and the final join), and the range
    # partitioner derives its boundaries by SAMPLING — if the upstream
    # row order is nondeterministic (e.g. this operator chained after
    # another shuffle), two independent evaluations can draw different
    # boundaries, and the offsets then correct the wrong partitions
    # (observed at sf0.1 as ntile buckets > n_buckets). The checkpoint
    # pins one assignment for both consumers.
    ranged = (
        df.repartitionByRange(n, *ocols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    subtotals = ranged.groupBy("__pid").agg(F.sum(value_col).alias("__psum"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = subtotals.withColumn(
        "__offset", F.coalesce(F.sum("__psum").over(w_off), F.lit(0))
    ).select("__pid", "__offset")
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.withColumn("__local", F.coalesce(F.sum(value_col).over(w_local), F.lit(0)))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__offset"))
        .drop("__pid", "__local", "__offset")
    )


def distributed_ntile(
    df: DataFrame,
    order_col,
    n_buckets: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n_buckets) OVER (ORDER BY ...)`` without the global
    single-reducer window.

    ntile is a pure function of (global rank, row count): with
    q = n div b and m = n mod b, the first m buckets hold q+1 rows and
    the rest hold q. The global rank comes from
    ``distributed_prefix_sum`` over a ones column (two-pass, bounded by
    the largest range partition); the row count rides along as a
    broadcast one-row aggregate. Bit-identical to the window ntile for
    any total ordering (callers must supply a unique tie-break column,
    exactly as an engine-portable window ntile needs anyway)."""
    ones = df.withColumn("__one", F.lit(1).cast("long"))
    ranked = distributed_prefix_sum(
        ones, order_col, "__one", out_col="__rank0", num_partitions=num_partitions
    ).withColumn("__rank", F.col("__rank0") + 1)
    cnt = df.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    r, n, b = F.col("__rank"), F.col("__n"), F.lit(n_buckets)
    q = F.floor(n / b)
    m = n - q * b
    big = m * (q + 1)  # rows living in the first m (larger) buckets
    bucket = (
        F.when(r <= big, F.floor((r - 1) / (q + 1)) + 1)
        .otherwise(m + F.floor((r - big - 1) / q) + 1)
        .cast("int")
    )
    return (
        ranked.crossJoin(F.broadcast(cnt))
        .withColumn(out_col, bucket)
        .drop("__one", "__rank0", "__rank", "__n")
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """2-D skyline (Pareto frontier, maximize both): points not
    dominated by any other point that is >= in both dimensions and > in
    one.

    The classic sort-sweep — order by (x DESC, y DESC), keep a point
    iff its y exceeds the running max of everything before it — is a
    one-pass O(n log n) algorithm, but a naive Spark translation is a
    global no-partition window (single reducer). This runs the sweep
    with the same two-pass discipline as ``distributed_prefix_sum``:
    range-partition on the sort key, local running max per partition,
    partition-level maxima prefix-maxed over the FEW subtotal rows and
    broadcast back. Identical to the naive sweep, wall-clock bounded by
    the largest partition.

    ``x_col``/``y_col`` must be numeric (doubles); duplicate points are
    collapsed first (a point never dominates its twin).
    """
    from pyspark.sql import Window

    neg_inf = F.lit(float("-inf"))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    pts = df.select(x_col, y_col).distinct()
    # same consistency requirement as distributed_prefix_sum: the
    # sampled range assignment feeds both the submax pass and the join,
    # so it must be pinned by a checkpoint, not re-evaluated per branch
    ranged = (
        pts.repartitionByRange(n, F.desc(x_col), F.desc(y_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    submax = ranged.groupBy("__pid").agg(F.max(y_col).alias("__pmax"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = submax.withColumn("__premax", F.max("__pmax").over(w_off)).select(
        "__pid", "__premax"
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(F.desc(x_col), F.desc(y_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.greatest(
        F.coalesce(F.max(y_col).over(w_local), neg_inf),
        F.coalesce(F.col("__premax"), neg_inf),
    )
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn("__prev", prev)
        .where(F.col(y_col) > F.col("__prev"))
        .drop("__pid", "__premax", "__prev")
    )
