"""Streaming curation sync == the batch curation funnel.

`incremental_curation_packing`'s funnel body is shared with
``run_curation_stream``'s foreachBatch hook; this makes the contract
literal, in the test_streaming_drift_monitor.py style:

- the full delivery streamed as ONE micro-batch emits exactly the
  registered batch query's ledger;
- a split delivery emits, per micro-batch, exactly the ledger of the
  batch funnel run on that slice alone (budget semantics are per sync
  BY DESIGN — every sync gets the full token budget);
- wiping the checkpoint and replaying never duplicates ledger rows
  (per-batch_id dynamic overwrite).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

if not os.path.isdir(SF):  # pragma: no cover - machine without fixtures
    pytest.skip(f"fixture dir {SF} missing", allow_module_level=True)

LEDGER_COLS = ["stage", "n_docs", "n_tokens", "n_seqs", "n_straddling"]


def _delivery(spark):
    """The exact delivery mix the registered batch query constructs."""
    from end_to_end_database_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, SF, "documents")
    return (
        docs.where(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") * 10 + 1).alias("doc_id"), "text")
        .unionByName(
            docs.where(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") * 10 + 2).alias("doc_id"),
                F.concat("text", F.lit(" updated edition")).alias("text"),
            )
        )
    )


def _corpus_artifacts(spark):
    from end_to_end_database_pipeline_project_spark.operators.bloom import (
        build_bloom,
    )
    from end_to_end_database_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, SF, "documents")
    keys = docs.select(F.md5("text").alias("content_hash")).localCheckpoint()
    return keys, build_bloom(keys, "content_hash").localCheckpoint()


def _ledger_rows(df):
    return sorted(tuple(r[c] for c in LEDGER_COLS) for r in df.collect())


def test_single_batch_stream_equals_registered_query(spark, tmp_path):
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import QUERIES
    from end_to_end_database_pipeline_project_spark.streaming.curation import (
        run_curation_stream,
    )

    landing = str(tmp_path / "landing")
    _delivery(spark).coalesce(1).write.parquet(landing)
    keys, bloom = _corpus_artifacts(spark)
    path = run_curation_stream(
        spark, landing, str(tmp_path / "out"), keys, bloom
    )
    streamed = spark.read.parquet(path)
    assert streamed.select("batch_id").distinct().count() == 1
    expected = QUERIES["incremental_curation_packing"](spark, SF)
    assert _ledger_rows(streamed) == _ledger_rows(expected)


def test_split_stream_batches_equal_per_slice_funnel(spark, tmp_path):
    from end_to_end_database_pipeline_project_spark.streaming.curation import (
        curation_funnel,
        run_curation_stream,
    )

    delivery = _delivery(spark).localCheckpoint()
    slices = [
        delivery.where(F.col("doc_id") % 2 == 0),
        delivery.where(F.col("doc_id") % 2 == 1),
    ]
    landing = str(tmp_path / "landing")
    import time as _t

    for s in slices:
        s.coalesce(1).write.mode("append").parquet(landing)
        _t.sleep(1.1)  # distinct mtimes -> deterministic batch order

    keys, bloom = _corpus_artifacts(spark)
    path = run_curation_stream(
        spark, landing, str(tmp_path / "out"), keys, bloom
    )
    streamed = spark.read.parquet(path)
    by_batch = {
        r["batch_id"]: None for r in streamed.select("batch_id").collect()
    }
    assert len(by_batch) == 2
    for bid, s in zip(sorted(by_batch), slices):
        got = _ledger_rows(streamed.where(F.col("batch_id") == bid))
        want = _ledger_rows(curation_funnel(s, keys, bloom))
        assert got == want, f"batch {bid} diverged from per-slice funnel"


def test_replay_never_duplicates_ledger_rows(spark, tmp_path):
    import shutil

    from end_to_end_database_pipeline_project_spark.streaming.curation import (
        run_curation_stream,
    )

    landing = str(tmp_path / "landing")
    _delivery(spark).coalesce(1).write.parquet(landing)
    keys, bloom = _corpus_artifacts(spark)
    out = str(tmp_path / "out")
    path = run_curation_stream(spark, landing, out, keys, bloom)
    before = _ledger_rows(spark.read.parquet(path))
    shutil.rmtree(os.path.join(out, "_checkpoint"))
    path = run_curation_stream(spark, landing, out, keys, bloom)
    assert _ledger_rows(spark.read.parquet(path)) == before
