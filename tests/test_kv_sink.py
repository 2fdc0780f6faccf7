"""KV cache sink connector (sources/kv_sink.py): commit protocol.

Result parity is covered by the registered `kv_cache_sink_roundtrip`
query; these tests pin the connector mechanics — manifest-gated
visibility, no leftover temp files, stream-writer batch commits, and
idempotent manifest replacement on batch replay.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.sources import kv_sink


def _write_batch(spark, store, n=100):
    kv_sink.register(spark)
    df = spark.range(n).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), (F.col("id") * 2).alias("v")
    )
    (
        df.write.format("kv_cache")
        .option("path", store)
        .option("key", "k")
        .option("ttl_seconds", 60)
        .option("now_epoch", 1000)
        .mode("append")
        .save()
    )


def test_batch_commit_publishes_manifest_and_cleans_tmp(spark, tmp_path):
    store = str(tmp_path / "store")
    _write_batch(spark, store)
    files = kv_sink.committed_files(store)
    assert files, "manifest lists no files"
    assert not [f for f in os.listdir(store) if f.endswith(".tmp")]
    rows = [
        json.loads(line) for f in files for line in open(f, encoding="utf-8")
    ]
    assert len(rows) == 100
    assert {r["key"] for r in rows} == {f"k{i}" for i in range(100)}
    assert all(r["expires_at"] == 1060 for r in rows)


def test_uncommitted_files_are_invisible(spark, tmp_path):
    store = str(tmp_path / "store")
    _write_batch(spark, store)
    # a stray attempt file (crashed task, speculative twin) must never
    # be visible through the committed view
    stray = os.path.join(store, ".part-99999-123.jsonl.tmp")
    open(stray, "w").write('{"key": "ghost"}\n')
    assert stray not in kv_sink.committed_files(store)
    assert all("ghost" not in open(f).read() for f in kv_sink.committed_files(store))


def test_stream_writer_commits_per_batch(spark, tmp_path):
    kv_sink.register(spark)
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    spark.range(50).select(
        F.concat(F.lit("e"), F.col("id")).alias("k"), F.col("id").alias("v")
    ).write.parquet(src)
    sdf = spark.readStream.schema("k string, v long").parquet(src)
    q = (
        sdf.writeStream.format("kv_cache")
        .option("path", store)
        .option("key", "k")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    manifest = json.load(open(os.path.join(store, "_MANIFEST.json")))
    assert manifest["total_rows"] == 50
    assert "batch_id" in manifest


def test_replayed_batch_overwrites_manifest_idempotently(spark, tmp_path):
    store = str(tmp_path / "store")
    _write_batch(spark, store)
    first = json.load(open(os.path.join(store, "_MANIFEST.json")))
    # cache refresh: a second generation replaces the manifest atomically
    _write_batch(spark, store)
    second = json.load(open(os.path.join(store, "_MANIFEST.json")))
    assert second["total_rows"] == first["total_rows"] == 100
    assert len(kv_sink.committed_files(store)) == len(second["files"])
