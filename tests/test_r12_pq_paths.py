"""Round-12 optimization parity pins for the fused PQ paths.

Two operator-internal changes this round must be result-identical to
the shapes they replace:

1. ``pq_recon_stats`` (fused encode + reconstruction-cosine partial
   sums, one Python crossing) vs ``pq_apply`` + per-row HOF cosine +
   ``avg`` — same mean at the report's 1e-6 rounding, same count.
2. ``pq_adc_pair_scores`` (fused encode + exact/ADC pair scoring
   against a bounded probe slab) vs the broadcast pair join with two
   HOF cosines — same pair set, same downstream ranks, cosines equal
   to float tolerance (the kernel reproduces the HOF's product
   rounding; only summation order differs).

Fixtures use ``array<float>`` embeddings — the production embeddings
schema — so the float32 product-rounding parity is what is pinned.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.functions.vector import cosine
from end_to_end_database_pipeline_project_spark.operators.similarity import (
    _collect_codebook,
    pq_adc_pair_scores,
    pq_apply,
    pq_codebook,
    pq_recon_stats,
)


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (i, [float(((i * 13 + d * 7) % 29) - 14) / 3.0 for d in range(8)])
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()


def test_pq_recon_stats_matches_unfused(emb):
    for m, sub, k in [(2, 4, 8), (1, 8, 4)]:
        cb = pq_codebook(emb, m=m, sub=sub, k=k).localCheckpoint()
        fused = pq_recon_stats(emb, cb, m=m, sub=sub).agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
            F.round(F.sum("c_sum") / F.sum("n"), 6).alias("c"),
        ).collect()[0]
        unfused = (
            pq_apply(emb, cb, m=m, sub=sub)
            .select(cosine(F.col("embedding"), F.col("dq")).alias("c"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.round(F.avg("c"), 6).alias("c"),
            )
            .collect()[0]
        )
        assert fused["n"] == unfused["n"]
        assert fused["c"] == pytest.approx(unfused["c"], abs=2e-6)


def test_pq_adc_pair_scores_matches_unfused(emb):
    m, sub, k = 2, 4, 8
    cb = pq_codebook(emb, m=m, sub=sub, k=k).localCheckpoint()
    probe = emb.where(F.col("vec_id") < 3)
    fused = pq_adc_pair_scores(
        emb, cb, probe.select("vec_id", "embedding").toPandas(), m=m, sub=sub
    )
    q = pq_apply(probe, cb, m=m, sub=sub).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("dq").alias("q_dq"),
    )
    unfused = (
        pq_apply(emb, cb, m=m, sub=sub)
        .join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("embedding"), F.col("q_emb")).alias("exact_cos"),
            cosine(F.col("dq"), F.col("q_dq")).alias("approx_cos"),
        )
    )
    got = {
        (r["query_id"], r["vec_id"]): (r["exact_cos"], r["approx_cos"])
        for r in fused.collect()
    }
    want = {
        (r["query_id"], r["vec_id"]): (r["exact_cos"], r["approx_cos"])
        for r in unfused.collect()
    }
    assert set(got) == set(want)
    for key, (ge, ga) in got.items():
        we, wa = want[key]
        assert ge == pytest.approx(we, rel=1e-12, abs=1e-12)
        assert ga == pytest.approx(wa, rel=1e-12, abs=1e-12)

    # downstream rank parity: the certificate consumes row_number over
    # (exact_cos, vec_id) and (approx_cos, vec_id) — identical ranks
    def ranks(df):
        w_e = Window.partitionBy("query_id").orderBy(
            F.desc("exact_cos"), F.asc("vec_id")
        )
        w_a = Window.partitionBy("query_id").orderBy(
            F.desc("approx_cos"), F.asc("vec_id")
        )
        return sorted(
            (r["query_id"], r["vec_id"], r["e"], r["a"])
            for r in df.select(
                "query_id",
                "vec_id",
                F.row_number().over(w_e).alias("e"),
                F.row_number().over(w_a).alias("a"),
            ).collect()
        )

    assert ranks(fused) == ranks(unfused)


def test_pq_adc_pair_scores_empty_probe(emb):
    import pandas as pd

    cb = pq_codebook(emb, m=2, sub=4, k=8).localCheckpoint()
    out = pq_adc_pair_scores(
        emb, cb, pd.DataFrame({"vec_id": [], "embedding": []}), m=2, sub=4
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "exact_cos", "approx_cos"]


def test_collect_codebook_empty_frame_raises(spark):
    empty = spark.createDataFrame([], "cb array<array<array<double>>>")
    with pytest.raises(ValueError, match="codebook frame has no rows"):
        _collect_codebook(empty)


def test_linear_attribution_grouped_credit_parity(spark):
    """r12: linear_attribution's per-channel credit now sums
    c_ec * (value / n_t) over (event_id, channel) groups instead of
    value / n_t per touch row. The outputs must match the touch-grain
    shape exactly at the query's 1e-6 rounding."""
    from pyspark.sql import functions as F

    from end_to_end_database_pipeline_project_spark.plans.analytics_queries import (
        linear_attribution,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["channel"]: (r["n_touches"], r["n_purchases"], r["credited_value"])
        for r in linear_attribution(spark, sf).collect()
    }

    # the pre-r12 touch-grain reference, rebuilt inline
    from end_to_end_database_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf, "events")
    p = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("event_id", "user_id", "ts", "value")
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(
        t,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("ts"))
        & (F.col("t_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
    ).select("event_id", "value", "channel")
    n = j.groupBy("event_id").agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    credited = j.join(n, "event_id").select(
        "channel", (F.col("value") / F.col("n_t")).alias("credit"), "event_id"
    )
    want = {
        r["channel"]: (r["n_touches"], r["n_purchases"], r["credited_value"])
        for r in credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.countDistinct("event_id").cast("long").alias("n_purchases"),
            F.round(F.sum("credit"), 6).alias("credited_value"),
        )
        .collect()
    }
    for ch, vals in want.items():
        assert got[ch] == vals, (ch, got[ch], vals)
