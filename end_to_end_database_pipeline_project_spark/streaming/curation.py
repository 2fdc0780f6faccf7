"""The fused curation funnel, shared between batch and streaming.

``curation_funnel`` is the ONE copy of the per-sync training-data
pipeline — Bloom-prefiltered exact dedup against the standing corpus,
quality gate, quality-greedy token-budget admission, fixed-length
sequence packing, five-stage audit ledger. The registered batch query
(`plans.curation_queries.incremental_curation_packing`) and the
streaming twin (``run_curation_stream``'s ``foreachBatch`` hook) both
call it, so the two cannot silently diverge — the same single-body
discipline as ``incremental._maintain_silver_gold`` and
``drift.run_drift_monitor`` (r07 review: shared, not copied).

Budget semantics are PER SYNC by design: every micro-batch gets the
full token budget, exactly like the batch query's one delivery — so
each streamed batch's ledger equals the batch funnel run on that
slice alone (batch-equivalence, pinned by
tests/test_streaming_curation.py).

Scale shape per batch: the standing corpus enters only as (a) the
broadcast (≤16K-row) Bloom words table — built once per corpus epoch;
persist it via ``pipeline.artifacts.publish_bloom_epoch`` and read it
back per stream start — and (b) an exact anti-join probed ONLY by the
maybe-dups. Both global orderings (budget cut, packing offsets) run
through ``distributed_prefix_sum``; no global windows, no driver
state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import quality_score, word_count
from ..operators.bloom import probe_bloom
from ..operators.scale import distributed_prefix_sum

BUDGET_TOKENS = 2048
SEQ_LEN = 512

DOC_SCHEMA = "doc_id long, text string"


def featurize(batch: DataFrame) -> DataFrame:
    """(doc_id, text) -> + content_hash, n_tokens, n_distinct — the
    funnel's input shape."""
    t = F.trim(F.col("text"))
    return batch.select(
        "doc_id",
        "text",
        F.md5("text").alias("content_hash"),
        word_count(F.col("text")).cast("long").alias("n_tokens"),
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.array_distinct(F.split(F.lower(t), r"\s+"))))
        .cast("long")
        .alias("n_distinct"),
    )


def curation_funnel(
    batch: DataFrame,
    corpus_keys: DataFrame,
    bloom: DataFrame,
    budget_tokens: int = BUDGET_TOKENS,
    seq_len: int = SEQ_LEN,
) -> DataFrame:
    """Run one sync's funnel over ``batch`` (doc_id, text) and return
    the five-row audit ledger ``(stage, n_docs, n_tokens, n_seqs,
    n_straddling)``. ``corpus_keys`` is the exact-verify side (column
    ``content_hash``), probed only by Bloom maybe-dups; ``bloom`` is
    the corpus's words table (broadcast-sized, built once per epoch)."""
    b = featurize(batch).localCheckpoint(eager=False)
    tagged = probe_bloom(b, bloom, "content_hash", "doc_id")
    new = (
        tagged.where(~F.col("maybe_dup"))
        .unionByName(
            tagged.where(F.col("maybe_dup")).join(
                corpus_keys, "content_hash", "left_anti"
            )
        )
        .drop("maybe_dup")
        .localCheckpoint(eager=False)
    )
    qual = new.where(quality_score(F.col("text")) >= 0.5).localCheckpoint(
        eager=False
    )
    q = qual.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("n_distinct * 1000 div n_tokens"))
        .alias("qp"),
    )
    cum = distributed_prefix_sum(q, [("qp", "desc"), "doc_id"], "n_tokens")
    adm = (
        cum.where(F.col("cum_before") + F.col("n_tokens") <= budget_tokens)
        .select("doc_id", "n_tokens")
        .localCheckpoint(eager=False)
    )
    placed = distributed_prefix_sum(adm, "doc_id", "n_tokens", out_col="pb")

    zero = F.lit(0).cast("long")

    def ledger(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select(
            F.lit(stage).alias("stage"),
            "n_docs",
            "n_tokens",
            zero.alias("n_seqs"),
            zero.alias("n_straddling"),
        )

    packed = placed.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("pb") % seq_len + F.col("n_tokens") > seq_len, 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_straddling"),
    ).select(
        F.lit("e_packed").alias("stage"),
        "n_docs",
        "n_tokens",
        F.expr(f"CAST((n_tokens + {seq_len - 1}) div {seq_len} AS BIGINT)").alias(
            "n_seqs"
        ),
        "n_straddling",
    )
    return (
        ledger(b, "a_incoming")
        .unionByName(ledger(new, "b_new"))
        .unionByName(ledger(qual, "c_quality"))
        .unionByName(ledger(adm, "d_budget"))
        .unionByName(packed)
    )


def run_curation_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    corpus_keys: DataFrame,
    bloom: DataFrame,
    budget_tokens: int = BUDGET_TOKENS,
    seq_len: int = SEQ_LEN,
    max_files_per_trigger: int = 1,
) -> str:
    """The continuous-ingest curation sync: consume a document landing
    stream to completion (availableNow), running ``curation_funnel``
    per micro-batch and writing each batch's five-row ledger to
    ``out_dir/ledger`` under its own ``batch_id`` partition (dynamic
    overwrite — replays rewrite their rows, never duplicate; same
    at-least-once discipline as the drift monitor sink). Returns the
    ledger table path.

    This is the "continuous 100 TB curation sync" composition: the
    corpus artifacts (Bloom words + key table) are built once per
    epoch and reused by every batch; per-sync cost is bounded by the
    batch."""
    from .incremental import _run_landing_stream

    ledger_path = os.path.join(out_dir, "ledger")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        led = curation_funnel(
            batch, corpus_keys, bloom, budget_tokens, seq_len
        ).select(F.lit(batch_id).cast("long").alias("batch_id"), "*")
        led.write.partitionBy("batch_id").option(
            "partitionOverwriteMode", "dynamic"
        ).mode("overwrite").parquet(ledger_path)

    _run_landing_stream(
        spark,
        landing_dir,
        os.path.join(out_dir, "_checkpoint"),
        process_batch,
        max_files_per_trigger,
        schema=DOC_SCHEMA,
    )
    return ledger_path
