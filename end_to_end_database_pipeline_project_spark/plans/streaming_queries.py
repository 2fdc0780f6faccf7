"""Streaming, medallion-pipeline and as-of-join queries (M3/M5).

The streaming entries run a real Structured Streaming query to
completion over the static fixtures (availableNow semantics) and return
the result as a batch frame — batch-equivalence is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join, asof_join_pandas
from ..operators.rollup import daily_rollup, hourly_aggregate
from ..pipeline.medallion import (
    build_bronze,
    bronze_to_silver,
    gold_tables,
    latest_wins_upsert,
    read_gold_daily,
    refresh_gold_daily_months,
    serving_view,
    write_gold_daily,
)
from ..session import ship_package
from ..sources.catalog import load_table
from ..streaming.pipeline import (
    run_hourly_stream_available_now,
    run_stream_to_table,
    stream_events,
    stream_stream_interval_join,
)
from ..streaming.stateful import (
    session_window_agg,
    sliding_window_agg,
    stateful_user_totals,
)
from .registry import query

_R = 6


@query(
    "streaming_hourly_window",
    oracle="""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS obs_hour,
       round(CAST(sum(CAST(value AS DECIMAL(25,12))) AS DOUBLE) / count(*), 6)
         AS avg_value,
       round(max(value), 6) AS max_value,
       round(min(value), 6) AS min_value,
       count(*) AS observation_count
FROM events WHERE value IS NOT NULL
GROUP BY 1""",
)
def streaming_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: Structured Streaming 1-hour tumbling window with watermark +
    dropDuplicates, run to completion over the static fixture — result
    must equal the batch hourly aggregate exactly (§2.10
    batch-equivalence)."""
    out = run_hourly_stream_available_now(spark, sf_dir)
    return out.select(
        "obs_hour",
        F.round("avg_value", _R).alias("avg_value"),
        F.round("max_value", _R).alias("max_value"),
        F.round("min_value", _R).alias("min_value"),
        "observation_count",
    )


@query(
    "stream_static_enrich",
    oracle="""SELECT CAST(c.c_nationkey AS INT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(e.value AS DECIMAL(25,12))) AS DOUBLE)
             / count(*), 6) AS avg_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.value IS NOT NULL
GROUP BY 1""",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the streaming event feed enriched against a
    static broadcast dimension (user -> nation), then aggregated per
    nation. The static side needs no watermark and no state — Spark
    re-plans it per micro-batch with the broadcast reused — which is
    why dimension enrichment in a stream costs the same as in batch.
    Batch equivalence against the plain join is the oracle."""
    ev = stream_events(spark, sf_dir).where(F.col("value").isNotNull())
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("int").alias("nationkey")
    )
    joined = ev.join(F.broadcast(cust), ev["user_id"] == cust["c_custkey"])
    agg = joined.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(25,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )
    out = run_stream_to_table(agg, "complete", "stream_enrich")
    return out.select(
        "nationkey", "n_events", F.round("avg_value", _R).alias("avg_value")
    )


@query(
    "observation_upsert",
    oracle="""WITH delta AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS ts,
         value * 2 AS value
  FROM events WHERE event_id % 100 = 0
),
unioned AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value, 0 AS pref FROM events
  UNION ALL
  SELECT event_id, ts, value, 1 AS pref FROM delta
)
SELECT event_id, ts, round(value, 6) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_id
                               ORDER BY ts DESC, pref DESC) AS rn
  FROM unioned
) WHERE rn = 1""",
)
def observation_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13/S14 generalized to MERGE semantics: a corrected re-delivery
    batch (every 100th observation, newer timestamp, doubled value)
    upserted onto the snapshot with latest-version-wins — matched keys
    take the newer row, everything else persists. One shuffle on the
    key (union + per-key argmax), no full outer join; at scale the
    merge is partition-scoped like gold_partition_refresh."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    delta = ev.where(F.col("event_id") % 100 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("interval 1 hour")).alias("ts"),
        (F.col("value") * 2).alias("value"),
    )
    merged = latest_wins_upsert(ev, delta, ["event_id"], "ts")
    return merged.select("event_id", "ts", F.round("value", _R).alias("value"))


@query(
    "stream_stream_join",
    oracle="""SELECT a.user_id, a.event_id AS purchase_id, b.event_id AS click_id,
       CAST(a.ts AS TIMESTAMP) AS purchase_ts,
       CAST(b.ts AS TIMESTAMP) AS click_ts
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'purchase' AND b.event_type = 'click'
 AND b.ts BETWEEN a.ts - INTERVAL 30 MINUTE AND a.ts""",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: stream-stream interval join (purchase↔click attribution
    within 30 minutes), watermarks on BOTH sides bounding the join
    state, run to completion over the static fixture — batch
    equivalence against the plain SQL interval join is the oracle.
    Cross-micro-batch state buffering is proven separately in
    tests/test_stream_stream_join.py."""
    left = stream_events(spark, sf_dir)
    right = stream_events(spark, sf_dir)
    joined = stream_stream_interval_join(left, right, interval="30 minutes")
    return run_stream_to_table(joined, "append", "stream_join")


@query(
    "medallion_silver",
    oracle="""SELECT CAST(user_id AS VARCHAR) || '_'
         || CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS VARCHAR) AS observation_id,
       CAST(user_id AS VARCHAR) AS station_id,
       CAST(ts AS TIMESTAMP) AS timestamp,
       round(CASE WHEN value > 100 THEN value - 273.15 ELSE value END, 6)
         AS temperature_c,
       round(CASE WHEN value / 200 < 1 THEN value / 200 * 1000
                  ELSE value / 200 END, 6) AS rainfall_mm,
       CAST(json_extract_string(props, '$.k') AS DOUBLE) AS humidity_percent,
       'batch_' || strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS etl_batch_id
FROM events""",
)
def medallion_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: bronze nested docs -> exploded, unit-sniffed silver facts —
    the reference's stage-2 ETL as one job (P1/P2/F1/F3/F10/F11 over
    the assembled bronze documents)."""
    bronze = build_bronze(spark, sf_dir)
    silver = bronze_to_silver(bronze)
    return silver.select(
        "observation_id",
        "station_id",
        "timestamp",
        F.round("temperature_c", _R).alias("temperature_c"),
        F.round("rainfall_mm", _R).alias("rainfall_mm"),
        "humidity_percent",
        "etl_batch_id",
    )


@query(
    "medallion_serving",
    oracle="""WITH silver AS (
  SELECT CAST(ts AS TIMESTAMP) AS timestamp,
         CASE WHEN value > 100 THEN value - 273.15 ELSE value END AS temperature_c
  FROM events
),
hourly AS (
  SELECT CAST(timestamp AS DATE) AS obs_date, date_trunc('hour', timestamp) AS obs_hour,
         avg(temperature_c) AS avg_value, max(temperature_c) AS max_value,
         min(temperature_c) AS min_value, count(*) AS observation_count
  FROM silver WHERE temperature_c IS NOT NULL GROUP BY 1, 2
),
daily AS (
  SELECT obs_date, avg(avg_value) AS avg_value, max(max_value) AS max_value,
         min(min_value) AS min_value, sum(max_value) AS total_value,
         CAST(sum(observation_count) AS BIGINT) AS observation_count
  FROM hourly GROUP BY 1
),
capped AS (
  SELECT obs_date,
         CASE WHEN avg_value IS NOT NULL AND avg_value > 0
              THEN least(avg_value, 100.0) ELSE avg_value END AS avg_value,
         max_value, min_value, total_value, observation_count,
         max(obs_date) OVER () AS latest
  FROM daily
)
SELECT obs_date, round(avg_value, 6) AS avg_value, round(max_value, 6) AS max_value,
       round(min_value, 6) AS min_value, round(total_value, 6) AS total_value,
       observation_count,
       CASE WHEN date_diff('day', latest, (SELECT max(CAST(ts AS DATE)) FROM events)) <= 1
            THEN 'full' ELSE 'partial' END AS sync_status
FROM capped ORDER BY obs_date DESC LIMIT 30""",
)
def medallion_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: the full pipeline bronze->silver->gold->serving in one DAG,
    with humidity-cap semantics on the served average and data-derived
    freshness status (S15/S16; TTL modeled as data, SURVEY.md §7.4)."""
    bronze = build_bronze(spark, sf_dir)
    silver = bronze_to_silver(bronze)
    daily, monthly = gold_tables(silver)
    as_of = (
        silver.agg(F.date_format(F.max("timestamp"), "yyyy-MM-dd").alias("d"))
        .collect()[0]["d"]
    )
    out = serving_view(daily, monthly, as_of)
    return out.select(
        "obs_date",
        F.round("avg_value", _R).alias("avg_value"),
        F.round("max_value", _R).alias("max_value"),
        F.round("min_value", _R).alias("min_value"),
        F.round("total_value", _R).alias("total_value"),
        "observation_count",
        "sync_status",
    )


_ASOF_ORACLE = """WITH u AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('purchase', 'error')
),
c AS (
  SELECT *,
         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS purchase_ts_asof,
         last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER w AS purchase_value_asof
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, ts, user_id, purchase_ts_asof,
       round(purchase_value_asof, 6) AS purchase_value_asof
FROM c WHERE side = 1"""


def _asof_inputs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    # right side's time column must NOT be named 'ts': the cogroup plan
    # dedupes same-named non-key columns across sides (see asof_join_pandas)
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("value").alias("purchase_value"),
        F.col("ts").alias("purchase_ts"),
    )
    return left, right


@query("asof_last_purchase", oracle=_ASOF_ORACLE)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union+window form): for every error event, the
    user's most recent purchase at-or-before it (SURVEY.md §2.3/§7.4 —
    the one join shape Spark lacks a primitive for). No pairwise join:
    one shuffle on user_id, forward-carry with last(ignorenulls)."""
    left, right = _asof_inputs(spark, sf_dir)
    out = asof_join(left, right, on="ts", by="user_id", right_on="purchase_ts",
                    right_cols=["purchase_value", "purchase_ts"])
    return out.select(
        "event_id",
        "ts",
        "user_id",
        F.col("purchase_ts_asof"),
        F.round("purchase_value_asof", _R).alias("purchase_value_asof"),
    )


@query("asof_last_purchase_pandas", oracle=_ASOF_ORACLE)
def asof_last_purchase_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics via cogrouped applyInPandas + pd.merge_asof
    — the per-key pandas path, verified against the same oracle."""
    left, right = _asof_inputs(spark, sf_dir)
    out = asof_join_pandas(left, right, on="ts", by="user_id", right_on="purchase_ts",
                           right_cols=["purchase_value", "purchase_ts"])
    return out.select(
        "event_id",
        "ts",
        "user_id",
        F.col("purchase_ts_asof"),
        F.round("purchase_value_asof", _R).alias("purchase_value_asof"),
    )


@query(
    "streaming_sliding_window",
    oracle="""WITH e AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events WHERE value IS NOT NULL
),
x AS (
  SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR])
           AS win_start,
         value
  FROM e
)
SELECT win_start, win_start + INTERVAL 2 HOUR AS win_end,
       round(avg(value), 6) AS avg_value, count(*) AS observation_count
FROM x GROUP BY 1""",
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window (2h size / 1h slide) over the event stream — each
    event lands in two windows; window starts align to epoch multiples
    of the slide, so the oracle unnests each event's two window starts.
    State is bounded by the watermark (§2.10 generalization)."""
    out = run_stream_to_table(
        sliding_window_agg(stream_events(spark, sf_dir)), "complete", "stream_slide"
    )
    return out.select(
        "win_start",
        "win_end",
        F.round("avg_value", _R).alias("avg_value"),
        "observation_count",
    )


@query(
    "streaming_session_window",
    oracle="""WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
),
m AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM s GROUP BY user_id, sid""",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-min gap) via ``F.session_window`` in
    a real streaming query — the state store merges variable-length
    windows as events arrive. Oracle: batch gaps-and-islands (lag +
    cumulative break-sum), the only batch-SQL equivalent."""
    out = run_stream_to_table(
        session_window_agg(stream_events(spark, sf_dir)), "complete", "stream_sess"
    )
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("total_value", _R).alias("total_value"),
    )


@query(
    "stateful_user_totals",
    oracle="""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(coalesce(value, 0)), 6) AS total_value
FROM events GROUP BY user_id""",
)
def stateful_user_totals_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful streaming op via ``applyInPandasWithState``:
    per-user running (count, total) kept in explicit group state across
    micro-batches. The update-mode sink holds one row per (key, batch);
    the final totals are the max-count row per key."""
    ship_package(spark)
    out = run_stream_to_table(
        stateful_user_totals(stream_events(spark, sf_dir)), "update", "stream_state"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("total_value", _R).alias("total_value"),
        )
    )


@query(
    "stateful_user_totals_tws",
    oracle="""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(coalesce(value, 0)), 6) AS total_value
FROM events GROUP BY user_id""",
)
def stateful_user_totals_tws_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful streaming op via ``transformWithStateInPandas``
    — the Spark 4 typed-state API (ValueState handle, RocksDB state
    store). Runs with the real protobuf wheel where installed, else the
    vendored mini runtime (``_vendor/protobuf_shim``) activates and is
    exported to Python workers through the captured env. Same semantics
    and oracle as ``stateful_user_totals``; final totals are the
    max-count row per key out of the update-mode sink."""
    from ..streaming.stateful import stateful_user_totals_tws

    ship_package(spark)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = run_stream_to_table(
            stateful_user_totals_tws(stream_events(spark, sf_dir)),
            "update",
            "stream_tws",
        ).localCheckpoint()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("total_value", _R).alias("total_value"),
        )
    )


@query(
    "gold_partition_refresh",
    oracle="""WITH silver AS (
  SELECT CAST(ts AS TIMESTAMP) AS timestamp,
         CASE WHEN value > 100 THEN value - 273.15 ELSE value END AS temperature_c
  FROM events
),
hourly AS (
  SELECT CAST(timestamp AS DATE) AS obs_date, date_trunc('hour', timestamp) AS obs_hour,
         avg(temperature_c) AS avg_value, max(temperature_c) AS max_value,
         min(temperature_c) AS min_value, count(*) AS observation_count
  FROM silver WHERE temperature_c IS NOT NULL GROUP BY 1, 2
)
SELECT obs_date, round(avg(avg_value), 6) AS avg_value,
       round(max(max_value), 6) AS max_value, round(min(min_value), 6) AS min_value,
       round(sum(max_value), 6) AS total_value,
       CAST(sum(observation_count) AS BIGINT) AS observation_count
FROM hourly GROUP BY 1""",
)
def gold_partition_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental gold maintenance (the O(history)->O(delta) headroom
    called out in BASELINE.md): gold daily is written partitioned by
    month with the newest month stale-missing, then ONLY that month is
    recomputed from the silver slice and swapped in via dynamic
    partition overwrite. The read-back must equal the full-history
    rollup — proving partition-scoped refresh is semantics-preserving."""
    import tempfile

    silver = bronze_to_silver(build_bronze(spark, sf_dir))
    months = [
        r["m"]
        for r in silver.select(
            F.date_format(F.to_date("timestamp"), "yyyy-MM").alias("m")
        )
        .distinct()
        .collect()
    ]
    if not months:
        # empty-history guard: nothing to refresh; emit the (empty)
        # rollup with the serving schema rather than crashing on max()
        return daily_rollup(
            hourly_aggregate(silver, ts="timestamp", measure="temperature_c")
        ).select(
            "obs_date",
            F.round("avg_value", _R).alias("avg_value"),
            F.round("max_value", _R).alias("max_value"),
            F.round("min_value", _R).alias("min_value"),
            F.round("total_value", _R).alias("total_value"),
            "observation_count",
        )
    last = max(months)
    out_dir = tempfile.mkdtemp(prefix="gold_refresh_")
    stale = silver.where(
        F.date_format(F.to_date("timestamp"), "yyyy-MM") != last
    )
    write_gold_daily(
        daily_rollup(hourly_aggregate(stale, ts="timestamp", measure="temperature_c")),
        out_dir,
    )
    refresh_gold_daily_months(silver, out_dir, [last])
    out = read_gold_daily(spark, out_dir)
    return out.select(
        "obs_date",
        F.round("avg_value", _R).alias("avg_value"),
        F.round("max_value", _R).alias("max_value"),
        F.round("min_value", _R).alias("min_value"),
        F.round("total_value", _R).alias("total_value"),
        "observation_count",
    )



# ---------------------------------------------------------- drift monitors


def _events_ref_batch(spark: SparkSession, sf_dir: str):
    """Shared split for the drift monitors: reference = the first 7
    event days, batches = each later day (the per-day slices stand in
    for the micro-batches `streaming.incremental` lands; the streaming
    twin in tests/test_streaming_drift_monitor.py feeds the SAME day
    slices through foreachBatch and must reproduce these rows)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(F.to_date("ts").alias("d"), "value", "event_id")
    )
    d0 = ev.agg(F.min("d").alias("d0"))
    ev2 = ev.crossJoin(F.broadcast(d0))
    ref = ev2.where(F.col("d") <= F.date_add("d0", 6)).select("value", "event_id")
    batch = ev2.where(F.col("d") > F.date_add("d0", 6)).select(
        F.col("d").alias("batch_day"), "value"
    )
    return ref, batch


_DRIFT_EV_CTE = """ev AS (
  SELECT CAST(ts AS DATE) AS d, value, event_id
  FROM events WHERE value IS NOT NULL
),
d0 AS (SELECT min(d) AS d0 FROM ev),
ref AS (SELECT value, event_id FROM ev CROSS JOIN d0 WHERE d <= d0 + 6),
bt AS (SELECT d AS batch_day, value FROM ev CROSS JOIN d0 WHERE d > d0 + 6)"""


@query(
    "streaming_psi_monitor",
    oracle=f"""WITH {_DRIFT_EV_CTE},
st AS (SELECT min(value) AS lo, max(value) AS hi,
              CAST(count(*) AS BIGINT) AS tr FROM ref),
rh AS (
  SELECT CASE WHEN hi = lo THEN 0
          ELSE greatest(0, least(CAST(floor((value - lo) / ((hi - lo) / 10.0))
                                      AS BIGINT), 9)) END AS bin,
         CAST(count(*) AS BIGINT) AS ref_n
  FROM ref CROSS JOIN st GROUP BY 1
),
bb AS (
  SELECT batch_day,
         CASE WHEN hi = lo THEN 0
          ELSE greatest(0, least(CAST(floor((value - lo) / ((hi - lo) / 10.0))
                                      AS BIGINT), 9)) END AS bin
  FROM bt CROSS JOIN st
),
bc AS (SELECT batch_day, bin, CAST(count(*) AS BIGINT) AS nd FROM bb GROUP BY 1, 2),
ndt AS (SELECT batch_day, CAST(count(*) AS BIGINT) AS td FROM bb GROUP BY 1),
spine AS (
  SELECT batch_day, td, bin
  FROM ndt CROSS JOIN (SELECT unnest(range(10)) AS bin)
),
p AS (
  SELECT s.batch_day, s.td,
         (coalesce(rh.ref_n, 0) + 1.0) / (st.tr + 10.0) AS pr,
         (coalesce(bc.nd, 0) + 1.0) / (s.td + 10.0) AS pc
  FROM spine s
  LEFT JOIN rh ON s.bin = rh.bin
  LEFT JOIN bc ON bc.batch_day = s.batch_day AND bc.bin = s.bin
  CROSS JOIN st
)
SELECT batch_day, CAST(td AS BIGINT) AS n_events,
       round(sum((pr - pc) * ln(pr / pc)), 6) AS psi,
       coalesce(round(sum((pr - pc) * ln(pr / pc)), 6) > 0.2, FALSE) AS drifted,
       coalesce((SELECT hi = lo FROM st), FALSE) AS ref_degenerate
FROM p GROUP BY 1, 2""",
)
def streaming_psi_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch PSI drift monitor over the incremental ingest path:
    each post-reference event day (the micro-batch grain
    `streaming.incremental` lands) is scored against the first-week
    reference histogram — the monitor a production version of the
    reference's periodic re-sync loop (scheduler.py:45-73) runs beside
    every load. `value_psi_drift` answers "did the WHOLE history
    shift"; this is the operational per-batch form whose reference
    artifact is a 10-row broadcast built ONCE per epoch
    (`streaming/drift.reference_histogram`), so monitoring a batch
    costs one pass over the batch — the only shape that survives
    continuous ingest at 100 TB. The streaming twin (foreachBatch over
    a file-landing stream, tests/test_streaming_drift_monitor.py) runs
    the SAME `psi_against_reference` code per micro-batch and must
    emit these exact rows (batch-equivalence, §2.10)."""
    from ..streaming.drift import psi_against_reference, reference_histogram

    ref, batch = _events_ref_batch(spark, sf_dir)
    hist = reference_histogram(ref).localCheckpoint(eager=False)
    return psi_against_reference(batch, hist, group_cols=["batch_day"])


@query(
    "streaming_ks_monitor",
    oracle=f"""WITH {_DRIFT_EV_CTE},
nr AS (SELECT CAST(count(*) AS BIGINT) AS tr FROM ref),
ranked AS (
  SELECT value, row_number() OVER (ORDER BY value, event_id) AS rk FROM ref
),
tgt AS (
  SELECT k, greatest(1, CAST(ceil(k * tr / 20.0) AS BIGINT)) AS trk
  FROM (SELECT unnest(range(1, 20)) AS k) CROSS JOIN nr
),
grid AS (SELECT t.k, r.value AS g FROM tgt t JOIN ranked r ON r.rk = t.trk),
refle AS (
  SELECT g.k, g.g,
         CAST(sum(CASE WHEN ref.value <= g.g THEN 1 ELSE 0 END) AS BIGINT) AS ref_le
  FROM grid g CROSS JOIN ref GROUP BY 1, 2
),
ndt AS (SELECT batch_day, CAST(count(*) AS BIGINT) AS td FROM bt GROUP BY 1),
ble AS (
  SELECT b.batch_day, r.k, r.ref_le,
         CAST(sum(CASE WHEN b.value <= r.g THEN 1 ELSE 0 END) AS BIGINT) AS le
  FROM bt b CROSS JOIN refle r GROUP BY 1, 2, 3
),
dif AS (
  SELECT bl.batch_day, nd.td, nr.tr,
         abs(bl.ref_le * 1.0 / nr.tr - bl.le * 1.0 / nd.td) AS adiff
  FROM ble bl JOIN ndt nd ON nd.batch_day = bl.batch_day CROSS JOIN nr
)
SELECT batch_day, CAST(td AS BIGINT) AS n_events,
       round(max(adiff), 6) AS ks_d,
       round(1.36 * sqrt((tr + td) * 1.0 / (tr * td)), 6) AS ks_crit,
       coalesce(round(max(adiff), 6)
                > round(1.36 * sqrt((tr + td) * 1.0 / (tr * td)), 6),
                FALSE) AS drifted
FROM dif GROUP BY batch_day, td, tr""",
)
def streaming_ks_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch grid-anchored KS drift monitor, PSI's nonparametric
    sibling: max ECDF gap between each post-reference day and the
    reference, evaluated on the reference's exact 19-point ventile
    grid (`streaming/drift.reference_grid` — ranks via
    distributed_prefix_sum, never a global window; the grid + its CDF
    is a 19-row broadcast, so per-batch cost is one batch pass, unlike
    the classical union-points D whose state grows with the
    reference). Alert at the classical 5% two-sample critical value.
    Same streaming twin contract as `streaming_psi_monitor`."""
    from ..streaming.drift import ks_against_reference, reference_grid

    ref, batch = _events_ref_batch(spark, sf_dir)
    grid = reference_grid(ref).localCheckpoint(eager=False)
    return ks_against_reference(batch, grid, group_cols=["batch_day"])
