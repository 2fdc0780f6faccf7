"""Streaming index maintenance == the batch maintenance report.

`run_index_maintenance_stream` lands embedding micro-batches against
the committed centroid epoch; this pins (test_streaming_drift_monitor
style):

- per-batch monitor rows equal `centroid_maintenance_report` run on
  the same slice directly (batch-equivalence);
- a collapsed micro-batch trips `rebuild_recommended` in-stream while
  an in-distribution one stays quiet;
- republishing mid-loop is picked up: after the rebuild, a fresh
  stream run over a mixture batch probes the NEW version and is quiet.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

REPORT_COLS = [
    "cell_id",
    "ref_n",
    "batch_n",
    "total_n",
    "artifact_version",
    "occupancy_psi",
    "rebuild_recommended",
]


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def vectors():
    import numpy as np

    rng = np.random.default_rng(88)
    base = np.eye(4)
    return [
        (i, [float(x) for x in base[i % 4] + rng.normal(0, 0.05, 4)])
        for i in range(24)
    ]


def _rows(df, batch_id=None):
    if batch_id is not None:
        df = df.where(F.col("batch_id") == batch_id)
    return sorted(tuple(r[c] for c in REPORT_COLS) for r in df.collect())


def test_streamed_batches_equal_batch_report_and_alert(
    spark, tmp_path, vectors
):
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        centroid_maintenance_report,
        publish_centroid_epoch,
    )
    from end_to_end_database_pipeline_project_spark.streaming.index_maintenance import (
        run_index_maintenance_stream,
    )

    ref = _emb_df(spark, vectors)
    centroids = _emb_df(spark, vectors[:4])
    art = str(tmp_path / "epoch")
    publish_centroid_epoch(ref, centroids, art)

    # two micro-batches: in-distribution, then collapsed
    calm = _emb_df(spark, [(100 + i, v) for i, (_, v) in enumerate(vectors)])
    collapsed = _emb_df(spark, [(200 + i, vectors[0][1]) for i in range(12)])
    landing = str(tmp_path / "landing")
    for s in (calm, collapsed):
        s.coalesce(1).write.mode("append").parquet(landing)
        time.sleep(1.1)

    path = run_index_maintenance_stream(
        spark, landing, str(tmp_path / "out"), art
    )
    monitor = spark.read.parquet(path)
    assert monitor.select("batch_id").distinct().count() == 2

    assert _rows(monitor, 0) == _rows(centroid_maintenance_report(spark, art, calm))
    assert _rows(monitor, 1) == _rows(
        centroid_maintenance_report(spark, art, collapsed)
    )
    flags = {
        r["batch_id"]: r["rebuild_recommended"]
        for r in monitor.select("batch_id", "rebuild_recommended").distinct().collect()
    }
    assert flags[0] is False and flags[1] is True

    # the operator acts on the alert: republish over ref + the drifted
    # batch, then a fresh stream pass over a mixture batch probes the
    # NEW version and is quiet
    assert publish_centroid_epoch(ref.unionByName(collapsed), centroids, art) == 2
    landing2 = str(tmp_path / "landing2")
    ref.unionByName(collapsed).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    ).coalesce(1).write.parquet(landing2)
    path2 = run_index_maintenance_stream(
        spark, landing2, str(tmp_path / "out2"), art
    )
    after = spark.read.parquet(path2).collect()
    assert all(r["artifact_version"] == 2 for r in after)
    assert all(r["rebuild_recommended"] is False for r in after)


def test_replay_never_duplicates_monitor_rows(spark, tmp_path, vectors):
    import shutil

    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        publish_centroid_epoch,
    )
    from end_to_end_database_pipeline_project_spark.streaming.index_maintenance import (
        run_index_maintenance_stream,
    )

    art = str(tmp_path / "epoch")
    publish_centroid_epoch(
        _emb_df(spark, vectors), _emb_df(spark, vectors[:4]), art
    )
    landing = str(tmp_path / "landing")
    _emb_df(spark, [(100 + i, v) for i, (_, v) in enumerate(vectors)]).coalesce(
        1
    ).write.parquet(landing)
    out = str(tmp_path / "out")
    path = run_index_maintenance_stream(spark, landing, out, art)
    before = _rows(spark.read.parquet(path))
    shutil.rmtree(os.path.join(out, "_checkpoint"))
    path = run_index_maintenance_stream(spark, landing, out, art)
    assert _rows(spark.read.parquet(path)) == before


# ------------------------- streaming corpus -> CDF-maintained artifact


def _land_docs(spark, landing, name, rows):
    # the landing convention: part files append into ONE directory
    # (the shared _run_landing_stream globs part-* there)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(landing)


def test_corpus_minhash_stream_end_to_end(spark, tmp_path):
    """run_corpus_minhash_stream: landing stream -> exactly-once
    versioned corpus commits -> CDF-driven artifact advance per batch.
    Parity with a full rebuild at the final corpus version; restart
    and wiped-checkpoint replays change NEITHER table; an out-of-band
    corpus delete is absorbed through the same cursor."""
    import shutil

    from end_to_end_database_pipeline_project_spark.operators.dedup import (
        lsh_buckets,
        minhash_signatures,
    )
    from end_to_end_database_pipeline_project_spark.sources import versioned as V
    from end_to_end_database_pipeline_project_spark.streaming.index_maintenance import (
        run_corpus_minhash_stream,
    )

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    art = str(tmp_path / "buckets")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    def drain():
        run_corpus_minhash_stream(spark, landing, corpus, art, ckpt)

    def bucket_set(df):
        return {(r.doc_id, r.band, r.bucket) for r in df.collect()}

    def rebuilt():
        return bucket_set(
            lsh_buckets(
                minhash_signatures(V.read_version(spark, corpus), "text", "doc_id")
            )
        )

    _land_docs(
        spark, landing, "b1",
        [(i, f"first wave document number {i} about weather") for i in range(4)],
    )
    drain()
    assert len(V.versions(corpus)) == 1  # full base snapshot
    assert bucket_set(V.read_version(spark, art)) == rebuilt()

    _land_docs(
        spark, landing, "b2",
        [(i, f"second wave doc {i} entirely different topic") for i in range(4, 7)],
    )
    drain()
    n_corpus, n_art = len(V.versions(corpus)), len(V.versions(art))
    assert n_corpus == 2
    assert bucket_set(V.read_version(spark, art)) == rebuilt()

    # restart with the same checkpoint: nothing re-delivered
    drain()
    assert len(V.versions(corpus)) == n_corpus
    assert len(V.versions(art)) == n_art

    # wiped checkpoint: full history replay, ids restart at 0 — the
    # corpus watermark absorbs it and the artifact cursor nets to zero
    shutil.rmtree(ckpt)
    drain()
    assert len(V.versions(corpus)) == n_corpus
    assert len(V.versions(art)) == n_art
    assert bucket_set(V.read_version(spark, art)) == rebuilt()

    # out-of-band GDPR delete on the corpus, then another landed batch:
    # the cursor advances through BOTH commits
    V.delete_version(
        spark.createDataFrame([(1,), (5,)], "doc_id long"), corpus, "doc_id"
    )
    _land_docs(
        spark, landing, "b3",
        [(7, "third wave doc seven fresh content")],
    )
    drain()
    assert bucket_set(V.read_version(spark, art)) == rebuilt()
    assert {r.doc_id for r in V.read_version(spark, art).collect()} == (
        set(range(8)) - {1, 5}
    )


def test_corpus_bloom_stream_with_rebuild_policy(spark, tmp_path):
    """run_corpus_bloom_stream (VERDICT r09 #7): exactly-once corpus
    commits + O(delta) Bloom advance per batch, and the stale-fraction
    policy republishes the epoch EXACTLY ONCE when out-of-band deletes
    cross the threshold — live-key probes identical across it, stale
    false positives gone, replays change neither table."""
    import shutil

    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        bloom_stale_fraction,
        probe_bloom_epoch,
    )
    from end_to_end_database_pipeline_project_spark.sources import versioned as V
    from end_to_end_database_pipeline_project_spark.streaming.index_maintenance import (
        run_corpus_bloom_stream,
    )

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    art = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    mkb = lambda rows: spark.createDataFrame(
        rows, "doc_id long, content_hash string"
    )

    def land(rows):
        mkb(rows).coalesce(1).write.mode("append").parquet(landing)

    def drain():
        run_corpus_bloom_stream(
            spark, landing, corpus, art, ckpt, rebuild_stale_ratio=0.2
        )

    def probe(keys):
        got = probe_bloom_epoch(
            spark, art, mkb(list(enumerate(keys))), "content_hash", "doc_id"
        )
        return [r.maybe_dup for r in got.orderBy("doc_id").collect()]

    land([(i, f"h{i}") for i in range(8)])
    drain()
    assert len(V.versions(corpus)) == 1
    assert probe([f"h{i}" for i in range(8)]) == [True] * 8
    live = [f"h{i}" for i in range(4, 8)]
    before = probe(live)

    # out-of-band GDPR deletes past the threshold + one landed batch
    V.delete_version(
        spark.createDataFrame([(0,), (1,), (2,)], "doc_id long"),
        corpus,
        "doc_id",
    )
    land([(8, "h8")])
    drain()
    rebuilds = [e for e in V.versions(art) if e.get("bloom_rebuild")]
    assert len(rebuilds) == 2, "seed publish + exactly one policy republish"
    assert bloom_stale_fraction(spark, art) == 0.0
    assert probe(live) == before, "live keys identical across republish"
    assert probe(["h0", "h1", "h2"]) == [False] * 3
    assert probe(["h8"]) == [True]

    # replay discipline: restart and wiped checkpoint are no-ops
    n_c, n_a = len(V.versions(corpus)), len(V.versions(art))
    drain()
    shutil.rmtree(ckpt)
    drain()
    assert (len(V.versions(corpus)), len(V.versions(art))) == (n_c, n_a)
