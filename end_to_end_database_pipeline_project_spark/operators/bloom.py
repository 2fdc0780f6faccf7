"""Bloom-filter prefiltered incremental dedup.

The 100 TB ingest problem: each incoming batch must be deduplicated
against an existing multi-billion-row corpus. A naive anti-join
shuffles the *entire corpus* per batch. The standard fix is a Bloom
filter over the corpus keys: probe the (tiny, broadcastable) filter
first, and run the exact anti-join only for the rows the filter flags
as possible duplicates — false positives are weeded out by the exact
join, false negatives are impossible, so the final answer is exact.

This implementation builds the filter *as a DataFrame aggregation* with
built-in expressions only (no internal/JVM-private APIs, no driver
round-trip):

- ``k`` hash positions per key: ``pmod(xxhash64(key, seed_i), m)``.
- The ``m``-bit array is sharded into 64-bit words: position ``p`` maps
  to word ``p div 64`` / mask ``1 << (p % 64)``; one ``groupBy(word)``
  + ``bit_or(mask)`` over the corpus builds the words table
  (≤ ``m/64`` rows — 16 K rows for the default 1 Mbit filter, a
  broadcast regardless of corpus size).
- Probing is a broadcast join of the batch's positions against the
  words table, then ``bool_and(bit set)`` per row: a key "might be
  present" iff all ``k`` probed bits are set.

Reference parity: the reference dedups re-delivered observations with
a full DELETE+INSERT per batch (clickhouse_etl.py:340-356); this is the
sublinear-ingest generalization of that path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: filter geometry: 2^20 bits in 2^14 longs, 5 hash probes. For n keys,
#: false-positive rate ≈ (1 - e^(-k n / m))^k — ~0.02 at n = 100k.
#: At real scale, size m from the corpus-key estimate (HLL sketch).
M_BITS = 1 << 20
K_HASHES = 5


def _positions(df: DataFrame, key_col: str, out: str) -> DataFrame:
    """Explode each key into its K_HASHES (word, mask) probe coordinates."""
    pos = F.explode(
        F.array(
            *[F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(M_BITS)) for i in range(K_HASHES)]
        )
    ).alias("pos")
    return df.select(out, pos).select(
        out,
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        # SQL form: pyspark's shiftleft() only takes a literal shift count
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
    )


def build_bloom(corpus: DataFrame, key_col: str) -> DataFrame:
    """Aggregate the corpus into the bloom words table
    ``(word_idx, bits)`` — at most ``M_BITS/64`` rows, one shuffle whose
    reduce side is bounded by the filter size, not the corpus size."""
    return (
        _positions(corpus.select(F.col(key_col).alias("k")), "k", "k")
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def probe_bloom(batch: DataFrame, bloom: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """Tag each batch row with ``maybe_dup``: true iff every probed bit
    is set. The words table is broadcast; the only batch-sized exchange
    is the ``groupBy(id)`` reassembly of the k probe verdicts."""
    probes = _positions(
        batch.select(F.col(id_col).alias("pid"), F.col(key_col).alias("k")).select(
            "pid", "k"
        ),
        "k",
        "pid",
    )
    hit = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "pid",
            (F.col("bits").isNotNull() & (F.col("bits").bitwiseAND(F.col("mask")) != 0)).alias(
                "bit_set"
            ),
        )
        .groupBy("pid")
        .agg(F.bool_and("bit_set").alias("maybe_dup"))
    )
    return batch.join(hit, batch[id_col] == hit["pid"]).drop("pid")


def probe_bloom_scan(batch: DataFrame, bloom: DataFrame, key_col: str) -> DataFrame:
    """Fact-side probe: tag each row with ``maybe_dup`` with ZERO
    exchanges on the probed side — ``K_HASHES`` chained broadcast hash
    joins against the (≤16K-row) words table, one per hash seed, all
    fused into the scan stage; the verdict is a codegen'd AND over the
    k fetched words.

    Probing a FACT table is a different problem than probing a batch:
    the explode+groupBy probe above costs one fact-sized exchange
    (fine for incremental-ingest batches, disqualifying for a runtime
    filter), and riding the words table as a dense one-row ARRAY
    through a broadcast join measured 14x SLOWER than the exchange it
    saved — the join copies the 128 KB array into every joined fact
    row (~190 GB of memcpy at sf0.1). Chained broadcast HASH joins add
    one 8-byte word per row per probe instead. (Spark's own injected
    runtime filters — BloomFilterMightContain under
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` — are the
    config-level form of the same shape; the expression is not in the
    public function registry, so the explicit spelling stays on
    engine-portable relational pieces.)"""
    out = batch
    verdict = F.lit(True)
    for i in range(K_HASHES):
        pos = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(M_BITS))
        words_i = bloom.select(
            F.col("word_idx").alias(f"__widx{i}"),
            F.col("bits").alias(f"__bits{i}"),
        )
        out = out.withColumn(
            f"__pos{i}", pos
        ).join(
            F.broadcast(words_i),
            (F.col(f"__pos{i}") / 64).cast("long") == F.col(f"__widx{i}"),
            "left",
        )
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(__pos{i} % 64 AS INT))"
        )
        verdict = verdict & (
            F.col(f"__bits{i}").isNotNull()
            & (F.col(f"__bits{i}").bitwiseAND(bit) != 0)
        )
    return out.select(*batch.columns, verdict.alias("maybe_dup"))


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    key_col: str,
    id_col: str,
) -> DataFrame:
    """Rows of ``batch`` whose key does not occur in ``corpus`` — exact,
    with the corpus-sized work bounded by the bloom build (one pass,
    reusable across batches when persisted).

    Filter-negative rows skip the join entirely; only the maybe-dups
    (true dups + ~2% false positives) reach the exact anti-join, so the
    join's probe side shrinks from |batch| to ~|dups|."""
    bloom = build_bloom(corpus, key_col)
    tagged = probe_bloom(batch, bloom, key_col, id_col)
    definite_new = tagged.where(~F.col("maybe_dup")).drop("maybe_dup")
    confirmed_new = (
        tagged.where(F.col("maybe_dup"))
        .drop("maybe_dup")
        .join(corpus.select(F.col(key_col).alias("k")), F.col(key_col) == F.col("k"), "left_anti")
    )
    return definite_new.unionByName(confirmed_new)
