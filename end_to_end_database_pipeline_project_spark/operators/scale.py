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


def _norm_order_spec(order_spec) -> list[tuple[str, str]]:
    """Normalize an ordering spec to ``[(column_name, "asc"|"desc")]``.

    Accepted: a single column name, a ``(name, direction)`` pair, or a
    list mixing both. Column sort *expressions* (``F.desc("x")``) are
    deliberately rejected: the deterministic bin assignment needs the
    column NAME and DIRECTION separately (to build an orderable
    normalized key), and a Column object hides both."""
    if isinstance(order_spec, str):
        raw: list = [order_spec]
    elif (
        isinstance(order_spec, tuple)
        and len(order_spec) == 2
        and order_spec[1] in ("asc", "desc")
    ):
        raw = [order_spec]
    else:
        raw = list(order_spec)
    items: list[tuple[str, str]] = []
    for it in raw:
        if isinstance(it, str):
            items.append((it, "asc"))
        elif (
            isinstance(it, tuple) and len(it) == 2 and it[1] in ("asc", "desc")
        ):
            items.append((it[0], it[1]))
        else:
            raise TypeError(
                "order spec must be column names or (name, 'asc'|'desc') "
                f"pairs, got {it!r} — Column sort expressions are not "
                "accepted (the deterministic binning needs name+direction)"
            )
    return items


def _orderable(df: DataFrame, name: str, direction: str) -> Column:
    """A column whose ASCENDING order equals the requested order of
    ``name`` — desc numerics/dates/timestamps are negated so a plain
    struct comparison implements any supported sort spec."""
    if direction == "asc":
        return F.col(name)
    dt = dict(df.dtypes)[name]
    if dt == "date":
        return -F.unix_date(F.col(name))
    if dt.startswith("timestamp"):
        return -F.unix_micros(F.col(name))
    if dt in ("float", "double"):
        # Spark orders NaN as the LARGEST value, so desc puts NaN
        # first — but -NaN is still NaN, which would bin NaN rows
        # LAST. Map NaN to -infinity instead: minimum bin key, weakly
        # consistent with the true order (it ties with negated +inf;
        # ties in the bin key are fine — the in-bin window re-orders
        # by the real sort spec).
        return F.when(
            F.isnan(F.col(name)), F.lit(float("-inf"))
        ).otherwise(-F.col(name))
    if dt in ("tinyint", "smallint", "int", "bigint") or dt.startswith(
        "decimal"
    ):
        return -F.col(name)
    raise NotImplementedError(
        f"desc ordering on type {dt} has no orderable negation; "
        "add an ascending surrogate column instead"
    )


def _assign_order_bins(
    df: DataFrame,
    items: list[tuple[str, str]],
    n: int,
    n_candidates: int = 4096,
) -> DataFrame:
    """Order-preserving bin id ``__pid`` in [0, n) for every row, as a
    PURE FUNCTION of the data multiset — zero sampling, zero
    materialization, so no session, plan branch, or upstream shuffle
    order can ever produce two different assignments for the same
    input (the nondeterminism class behind the r03/r04
    ``sequence_packing_report`` driver-gate mismatch: sampled
    ``repartitionByRange`` boundaries + per-run checkpoints are
    functions of the RUN, this is a function of the DATA).

    Scheme: hash every row's order key into ``n_candidates`` buckets
    and take each bucket's MIN key (an order-insensitive aggregate —
    deterministic whatever the row order); the sorted bucket-mins are
    a deterministic pseudo-random sample of the key distribution, from
    which n-1 evenly-spaced boundaries are drawn in-plan; each row's
    bin is the count of boundaries <= its key (struct comparison on
    the direction-normalized key), evaluated against the one-row
    broadcast boundary array. Balance matches sampled range
    partitioning (~n_candidates key samples); determinism is absolute.
    Sort keys must be non-null and (as a whole) unique — the same
    contract every engine-portable global ordering needs."""
    key = F.struct(
        *[
            _orderable(df, nm, d).alias(f"__k{i}")
            for i, (nm, d) in enumerate(items)
        ]
    )
    keyed = df.withColumn("__k", key)
    if n <= 1:
        return keyed.withColumn("__pid", F.lit(0))
    hash_cols = [F.col(nm) for nm, _ in items]
    cands = keyed.groupBy(
        F.pmod(F.xxhash64(*hash_cols), F.lit(n_candidates)).alias("__b")
    ).agg(F.min("__k").alias("__ck"))
    # `get()` (null on out-of-range), not `[...]`: an EMPTY input still
    # produces the one agg row with __cs = [], and the strict subscript
    # would raise INVALID_ARRAY_INDEX building the boundary array. For
    # any non-empty input the indices are always in range (i*size/n <
    # size for i < n), so this is behavior-identical off the empty path;
    # on it, the boundaries are all NULL and there are no rows to bin.
    bnds = cands.agg(
        F.array_sort(F.collect_list("__ck")).alias("__cs")
    ).select(
        F.expr(
            f"transform(sequence(1, {n - 1}), "
            f"i -> get(__cs, cast(i * size(__cs) / {n} AS INT)))"
        ).alias("__bs")
    )
    return (
        keyed.crossJoin(F.broadcast(bnds))
        .withColumn(
            "__pid",
            F.size(F.filter(F.col("__bs"), lambda b: b <= F.col("__k"))),
        )
        .drop("__bs")
    )  # __k is kept: consumers use it as the in-bin order surrogate


def distributed_prefix_sum(
    df: DataFrame,
    order_spec,
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
    n_candidates: int = 4096,
) -> DataFrame:
    """Exclusive prefix sum over a global ordering WITHOUT a global
    window — the two-pass scheme every sequence-packing / offset-
    assignment job needs at scale.

    A plain ``sum().over(Window.orderBy(...))`` with no PARTITION BY
    collapses to a single partition (Spark literally warns): one
    reducer streams the whole corpus. Instead:

    1. assign every row a DETERMINISTIC order-preserving bin id (see
       ``_assign_order_bins`` — a pure function of the data, never a
       sampled range partitioner, so repeated evaluation in separate
       plan branches can never disagree);
    2. per-bin subtotals (one tiny row each) -> cumulative offsets via
       a window over the FEW subtotal rows;
    3. broadcast-join offsets back, then a per-bin running sum
       (window PARTITION BY ``__pid`` — state bounded per bin) plus
       the bin's offset.

    Identical result to the global window (asserted in
    tests/test_scale.py, and across sessions/parallelism in the soak
    test), wall-clock bounded by the largest bin, not the corpus.

    Determinism contract: with integer/decimal values the result is
    bit-identical across any session, parallelism, or upstream row
    order (min-of-bucket boundaries and per-bin integer sums are
    order-insensitive). Float values keep the usual FP
    summation-order caveat of any distributed sum.

    ``order_spec``: a column name, a ``(name, "desc")`` pair, or a
    list of either (``[("revenue", "desc"), "l_suppkey"]``). Callers
    must make the whole key unique (tie-break column) — exactly what
    an engine-portable global ordering needs anyway.

    ``value_col``/``out_col`` may be parallel LISTS of column names:
    every column rides the SAME binning pass, subtotal aggregate and
    per-bin window (one extra agg expression each), so a consumer
    needing two prefix sums over one ordering (the two-population
    ECDFs of ``ks_two_sample_test``) pays the two-pass machinery
    once instead of per column."""
    from pyspark.sql import Window

    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    ocols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(vcols) != len(ocols):
        raise ValueError("value_col and out_col lists must be parallel")
    items = _norm_order_spec(order_spec)
    wcols = [
        F.asc(nm) if d == "asc" else F.desc(nm) for nm, d in items
    ]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    assigned = _assign_order_bins(df, items, n, n_candidates).persist()
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*wcols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    localed = assigned
    for i, vc in enumerate(vcols):
        localed = localed.withColumn(
            f"__local{i}", F.coalesce(F.sum(vc).over(w_local), F.lit(0))
        )
    # The subtotal branch aggregates BELOW the window (plain per-bin
    # sum over `assigned`), skipping the sort+window a shared-exchange
    # formulation would pay twice (measured 2.2x on
    # token_budget_selection at sf0.1). Correctness carries ZERO
    # materialization dependence: the bin assignment is a pure
    # function of the data, and for the integer/decimal values this
    # operator contracts for, a multiset sum is order-insensitive —
    # both branches see identical __pid and identical bin totals
    # whatever the evaluation order. (Float values keep the usual
    # distributed-sum rounding caveat, as documented above.) The
    # persist() above is purely perf — the upstream (often a corpus
    # tokenize) feeds both branches once instead of twice (measured
    # 1.7-2.5x across the five consumers); on a cluster this is the
    # staging table a production two-pass job would write. The cache
    # is deliberately NOT unpersisted here (the operator cannot know
    # when its consumers finish); MEMORY_AND_DISK entries are evicted
    # LRU / collected by the ContextCleaner once the frame is
    # unreachable, which bounds the footprint in long sessions — a
    # long-running service calling this in a loop should unpersist the
    # returned frame's lineage itself after materializing.
    subtotals = assigned.groupBy("__pid").agg(
        *[F.sum(vc).alias(f"__psum{i}") for i, vc in enumerate(vcols)]
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = subtotals
    for i in range(len(vcols)):
        offsets = offsets.withColumn(
            f"__offset{i}", F.coalesce(F.sum(f"__psum{i}").over(w_off), F.lit(0))
        )
    offsets = offsets.select(
        "__pid", *[f"__offset{i}" for i in range(len(vcols))]
    )
    out = localed.join(F.broadcast(offsets), "__pid")
    for i, oc in enumerate(ocols):
        out = out.withColumn(oc, F.col(f"__local{i}") + F.col(f"__offset{i}"))
    return out.drop(
        "__pid",
        "__k",
        *[f"__local{i}" for i in range(len(vcols))],
        *[f"__offset{i}" for i in range(len(vcols))],
    )


def distributed_ntile(
    df: DataFrame,
    order_spec,
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
    exactly as an engine-portable window ntile needs anyway).
    ``order_spec`` format as in ``distributed_prefix_sum``."""
    ones = df.withColumn("__one", F.lit(1).cast("long"))
    ranked = distributed_prefix_sum(
        ones, order_spec, "__one", out_col="__rank0", num_partitions=num_partitions
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
    deterministic order-preserving bins on the sort key (pure function
    of the data — see ``_assign_order_bins``; no sampled range
    partitioner, no checkpoint), local running max per bin, bin-level
    maxima prefix-maxed over the FEW subtotal rows and broadcast back.
    Identical to the naive sweep, wall-clock bounded by the largest
    bin.

    ``x_col``/``y_col`` must be numeric (doubles); duplicate points are
    collapsed first (a point never dominates its twin).
    """
    from pyspark.sql import Window

    neg_inf = F.lit(float("-inf"))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    pts = df.select(x_col, y_col).distinct()
    ranged = _assign_order_bins(
        pts, [(x_col, "desc"), (y_col, "desc")], n
    ).persist()  # two consumer branches; see distributed_prefix_sum
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(F.desc(x_col), F.desc(y_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    localed = ranged.withColumn(
        "__lmax", F.coalesce(F.max(y_col).over(w_local), neg_inf)
    )
    # bin maxima aggregate BELOW the window (max over the bin's
    # multiset is order-insensitive, so both branches agree without
    # any materialization pin — the deterministic assignment carries
    # the correctness; persist carries the perf)
    submax = ranged.groupBy("__pid").agg(F.max(y_col).alias("__pmax"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = submax.withColumn("__premax", F.max("__pmax").over(w_off)).select(
        "__pid", "__premax"
    )
    prev = F.greatest(
        F.col("__lmax"), F.coalesce(F.col("__premax"), neg_inf)
    )
    return (
        localed.join(F.broadcast(offsets), "__pid")
        .withColumn("__prev", prev)
        .where(F.col(y_col) > F.col("__prev"))
        .drop("__pid", "__premax", "__prev", "__lmax", "__k")
    )
