"""UDF / UDAF / UDTF surface (SURVEY.md §2.9).

The reference registers no UDFs anywhere — all its custom logic is
driver-side Python loops (mongodb_etl.py:22-93, clickhouse_etl.py:
126-256) — and this repo's policy is the same logic as *native column
expressions*. These queries exist to prove the full Spark extension
surface is available and correctly wired when semantics genuinely need
it, each form demonstrated once and oracle-checked:

- **scalar pandas UDF** (`@pandas_udf` returning a Series): Arrow-batched,
  vectorized — the only acceptable scalar-Python form in a hot path;
- **grouped-agg pandas UDF** (UDAF): a whole-group reduction NumPy can
  express but ``F`` aggregates cannot (directly);
- **Python UDTF** (``@udtf``): variable-row-count output per input row,
  the table-function form (Spark's native ``explode`` covers most real
  cases — the UDTF is for logic that can't be an array expression).

All three stay off the recommended path for reference-parity semantics;
see the per-query docstrings for when each is actually warranted.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..sources.catalog import load_table
from .registry import query

_R = 6


@query(
    "pandas_scalar_log_value",
    oracle="""SELECT event_id, round(ln(1 + value), 6) AS log1p_value
FROM events WHERE value IS NOT NULL AND value > -1""",
)
def pandas_scalar_log_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: log1p over the event measure, computed in
    Arrow batches by NumPy. Deliberately something ``F.log1p`` also
    does — the point is the *form*: a ``@pandas_udf`` receives/returns
    whole ``pd.Series`` per batch (one Python call per ~10k rows, not
    per row), which is the only scalar-Python shape that survives at
    100 TB. Hot paths should still prefer the built-in."""
    import numpy as np

    @pandas_udf("double")
    def log1p_vec(v: pd.Series) -> pd.Series:
        return pd.Series(np.log1p(v.to_numpy()))

    from ..session import fan_out, ship_package

    ship_package(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        fan_out(ev.where(F.col("value").isNotNull() & (F.col("value") > -1)))
        .select("event_id", F.round(log1p_vec("value"), _R).alias("log1p_value"))
    )


@query(
    "pandas_udaf_geomean",
    oracle="""SELECT event_type,
       round(exp(avg(ln(value))), 6) AS geomean_value,
       CAST(count(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL AND value > 0
GROUP BY event_type""",
)
def pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (the UDAF form): geometric mean of the
    positive event measure per event type. The UDAF receives each
    group's column as one Series and returns a scalar; Spark runs it
    after the same hash-partition shuffle a built-in aggregate uses, so
    group state is bounded per executor. (This particular reduction
    decomposes as exp(avg(ln x)) — shown both ways; a UDAF earns its
    keep only when no such decomposition exists, e.g. a streaming
    quantile sketch.)"""
    import numpy as np

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.mean(np.log(v.to_numpy()))))

    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT) — the count rides the same UDF path
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    from ..session import fan_out, ship_package

    ship_package(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        fan_out(ev.where(F.col("value").isNotNull() & (F.col("value") > 0)))
        .groupBy("event_type")
        .agg(
            geomean("value").alias("g"),
            n_rows("value").alias("n"),
        )
        .select("event_type", F.round("g", _R).alias("geomean_value"), "n")
    )


@query(
    "udtf_sentence_split",
    oracle=r"""SELECT doc_id, CAST(idx - 1 AS INT) AS sentence_idx,
       CAST(length(s) AS INT) AS sentence_chars
FROM (
  SELECT doc_id, unnest(string_split(text, '. ')) AS s,
         generate_subscripts(string_split(text, '. '), 1) AS idx
  FROM documents
)
WHERE length(s) > 0""",
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one input document row fans out to N sentence rows
    (index + length). A UDTF is Spark's arbitrary table-function form —
    per-row Python emitting any number of rows — demonstrated on logic
    that ``posexplode(split(...))`` also expresses (and which the
    built-in should own in production; the UDTF row-at-a-time path costs
    ~100x). Real UDTF territory is row expansion no array expression
    can write, e.g. a stateful parser over an opaque payload."""

    @udtf(returnType="sentence_idx int, sentence_chars int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                if s:
                    yield i, len(s)

    from ..session import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # lateral-join form: the UDTF runs once per document row
    return (
        docs.lateralJoin(SentenceSplit(F.col("text").outer()))
        .select("doc_id", "sentence_idx", "sentence_chars")
    )


@query(
    "grouped_map_zscores",
    oracle="""WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events WHERE value IS NOT NULL GROUP BY 1
)
SELECT e.event_id, e.event_type,
       round((e.value - s.mu) / s.sigma, 6) AS z
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE e.value IS NOT NULL""",
)
def grouped_map_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (``groupBy().applyInPandas``) — the
    whole-group-in/whole-group-out form, completing the pandas API
    surface (scalar, grouped-agg, map, cogrouped-map live elsewhere):
    per-type z-score standardization, where the UDF sees each group as
    ONE pandas DataFrame and returns the transformed frame. Per-group
    feature standardization is the classic use — but note the same
    semantics decompose into aggregate-then-broadcast-join (see
    value_outlier_counts), which scales without holding a whole group
    in one worker's memory; applyInPandas earns its keep when the
    per-group logic genuinely needs the full group matrix (pandas/
    sklearn transforms)."""
    import numpy as np

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        mu = float(np.mean(v))
        sigma = float(np.std(v, ddof=1))
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "z": np.round((v - mu) / sigma, 6),
            }
        )

    from ..session import fan_out, ship_package

    ship_package(spark)
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return (
        fan_out(ev.select("event_id", "event_type", "value"))
        .groupBy("event_type")
        .applyInPandas(zscore, schema="event_id long, event_type string, z double")
    )


@query(
    "sql_udf_weather_display",
    oracle="""SELECT round((value - 32) * 5 / 9, 6) AS celsius,
       CASE WHEN value >= 80 THEN 'hot'
            WHEN value >= 50 THEN 'mild' ELSE 'cold' END AS band
FROM events WHERE value IS NOT NULL AND event_type = 'view'""",
)
def sql_udf_weather_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDFs (Spark 4 ``CREATE FUNCTION ... RETURN``):
    the reference's display-conversion helpers (dashboard.py F-to-C and
    banding) packaged as catalog functions.

    This is the UDF form with NO scale tax: the body is inlined by
    Catalyst into the calling plan (fully codegen'd, no Python worker,
    no serialization boundary), so shared business logic gets a named,
    reusable definition while executing exactly like the hand-written
    expression. The right default for every UDF that is expressible in
    SQL; the pandas forms above are for logic that isn't."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION f_to_c(f DOUBLE)
           RETURNS DOUBLE RETURN round((f - 32) * 5 / 9, 6)"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION temp_band(f DOUBLE)
           RETURNS STRING RETURN
             CASE WHEN f >= 80 THEN 'hot'
                  WHEN f >= 50 THEN 'mild' ELSE 'cold' END"""
    )
    return spark.sql(
        """SELECT f_to_c(value) AS celsius, temp_band(value) AS band
           FROM events_v WHERE value IS NOT NULL AND event_type = 'view'"""
    )


@query(
    "collated_event_types",
    oracle="""WITH mixed AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
              ELSE event_type END AS et
  FROM events
)
SELECT lower(et) AS event_type_ci, CAST(count(*) AS BIGINT) AS n
FROM mixed GROUP BY 1""",
)
def collated_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 ``COLLATE UTF8_LCASE``): group
    a deterministically mixed-case column case-insensitively WITHOUT
    normalizing it first.

    At 100 TB the difference matters: a collated comparison works on
    the original bytes in codegen (and keeps parquet min/max usable for
    the original column), where a ``lower()`` normalization is an extra
    per-row projection that breaks pushdown against the source column.
    The output projects the lowercased key only to keep the oracle
    deterministic (the collated group's representative value is
    engine-chosen)."""
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(
            F.col("event_id") % 2 == 0, F.upper("event_type")
        ).otherwise(F.col("event_type")).alias("et")
    )
    return (
        mixed.groupBy(F.expr("collate(et, 'UTF8_LCASE')").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower("k").alias("event_type_ci"), "n")
    )


@query(
    "udtf_dynamic_stats",
    oracle="""SELECT event_type,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       round(avg(value), 6) AS avg_value
FROM events WHERE value IS NOT NULL GROUP BY 1""",
)
def udtf_dynamic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    schema is not declared statically but computed at PLAN TIME from a
    constant argument — here a requested-statistics list
    ('min,max,avg') that becomes one typed column per stat. This is
    the table-function form behind dynamic pivots / configurable
    profilers, impossible with a fixed ``returnType``.

    The UDTF itself runs on the 5-row pre-aggregated per-type table
    (sum/count/min/max partials computed by native Catalyst
    aggregation first) — per-row Python touches five rows, never the
    fact, per the engine's UDF-off-the-hot-path policy."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import DoubleType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class DynamicStats:
        @staticmethod
        def analyze(row, stats):
            schema = StructType().add("event_type", StringType())
            for s in stats.value.split(","):
                schema = schema.add(f"{s}_value", DoubleType())
            return AnalyzeResult(schema=schema)

        def __init__(self):
            self._stats = None

        def eval(self, row, stats: str):
            chosen = stats.split(",")
            out = [row["et"]]
            for s in chosen:
                if s == "min":
                    out.append(row["mn"])
                elif s == "max":
                    out.append(row["mx"])
                elif s == "avg":
                    out.append(row["sm"] / row["cnt"])
            yield tuple(out)

    DynamicStatsUDTF = udtf(DynamicStats)
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    partials = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.sum("value").alias("sm"),
        F.count("value").alias("cnt"),
    )
    out = partials.lateralJoin(
        DynamicStatsUDTF(
            F.struct("et", "mn", "mx", "sm", "cnt").outer(),
            F.lit("min,max,avg"),
        )
    )
    return out.select(
        "event_type",  # emitted by the UDTF per its analyzed schema
        F.round("min_value", _R).alias("min_value"),
        F.round("max_value", _R).alias("max_value"),
        F.round("avg_value", _R).alias("avg_value"),
    )
