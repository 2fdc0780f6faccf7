"""AQE runtime re-planning: a skewed shuffle join is split at runtime.

Salting (`operators/scale.py`) is the *static* skew answer; Spark's
adaptive execution is the *runtime* one — `skewJoin` detects a
partition exceeding the size thresholds after the map stage and splits
it into sub-partitions. This pins that the engine's sessions actually
get that behavior (AQE on + thresholds reachable), using a deliberately
skewed key distribution.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        # thresholds low enough that the hot key trips detection on
        # fixture-scale data; broadcast off so the join really shuffles
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # 99% of left rows share key 0; the 1% sample spreads over keys
        # 0-49 ((id/100) % 50 — NOT id % 50, which is always 0 when
        # id % 100 == 0)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 == 0, (F.col("id") / 100).cast("long") % 50)
            .otherwise(0)
            .alias("k"),
            F.concat(F.lit("padpadpadpadpadpad-"), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        # aggregate on a NON-join key: a groupBy on the join key would
        # reuse the join's partitioning, and AQE refuses to split a skewed
        # partition when downstream requires that distribution (splitting
        # would force an extra shuffle; see forceOptimizeSkewedJoin)
        joined = left.join(right, "k").groupBy(F.length("payload").alias("lp")).agg(
            F.count(F.lit(1)).alias("n")
        )
        # collect() executes THIS frame's queryExecution (count() would
        # plan a separate job and leave the inspected plan unexecuted)
        rows = joined.collect()
        assert sum(r["n"] for r in rows) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "AQE did not mark the skewed join for runtime splitting:\n" + plan
        )
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
