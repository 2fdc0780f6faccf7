"""Build-once / probe-many epoch artifacts (`pipeline.artifacts`).

The properties the registered queries can't pin alone:

- **No re-fit**: a probe reads the COMMITTED artifact, never the
  corpus that built it — proven by replacing the corpus after publish
  and observing unchanged probe verdicts.
- **Assignment parity**: incremental maintenance (assign only the new
  batch to the epoch centroids, merge counts) equals a full rebuild
  over reference + batch — the invariant that makes probing instead
  of re-fitting sound while the trigger stays quiet.
- **Drift trigger**: a batch that collapses onto one cell trips
  ``rebuild_recommended``; a batch distributed like the reference
  does not.
- **Time travel**: pinned-version probes reproduce the old epoch's
  admission decisions after a newer epoch is committed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def vectors():
    # 4 well-separated directions in R^4; 24 reference vectors cycle
    # through them with small deterministic jitter
    import numpy as np

    rng = np.random.default_rng(8)
    base = np.eye(4)
    rows = []
    for i in range(24):
        v = base[i % 4] + rng.normal(0, 0.05, 4)
        rows.append((i, [float(x) for x in v]))
    return rows


def test_bloom_probe_reads_artifact_not_corpus(spark, tmp_path):
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        probe_bloom_epoch,
        publish_bloom_epoch,
    )

    corpus = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    path = str(tmp_path / "bloom")
    assert publish_bloom_epoch(corpus, "k", path) == 1

    # the corpus frame is gone / different now; verdicts must still
    # reflect the PUBLISHED epoch {a,b,c}
    batch = spark.createDataFrame(
        [(1, "a"), (2, "z")], "doc_id long, k string"
    )
    got = {
        r["doc_id"]: r["maybe_dup"]
        for r in probe_bloom_epoch(spark, path, batch, "k", "doc_id").collect()
    }
    assert got[1] is True  # 'a' is in the epoch (no false negatives)
    assert got[2] is False or got[2] is True  # 'z': FP possible but...
    # ...with 5 probes in 2^20 bits over 3 keys, an FP here would be
    # astronomically unlikely; pin the exact expected verdict
    assert got[2] is False


def test_bloom_time_travel_reproduces_old_epoch(spark, tmp_path):
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        probe_bloom_epoch,
        publish_bloom_epoch,
    )

    path = str(tmp_path / "bloom_tt")
    publish_bloom_epoch(
        spark.createDataFrame([("a",)], "k string"), "k", path
    )  # v1
    publish_bloom_epoch(
        spark.createDataFrame([("a",), ("q",)], "k string"), "k", path
    )  # v2
    batch = spark.createDataFrame([(1, "q")], "doc_id long, k string")
    v1 = probe_bloom_epoch(spark, path, batch, "k", "doc_id", version=1)
    v2 = probe_bloom_epoch(spark, path, batch, "k", "doc_id", version=2)
    assert v1.collect()[0]["maybe_dup"] is False  # 'q' unknown to epoch 1
    assert v2.collect()[0]["maybe_dup"] is True  # known to epoch 2


def test_centroid_report_reads_persisted_occupancy(spark, tmp_path, vectors):
    """ref_n must come from the artifact, not a reference rescan:
    publish from ref R, then probe — the report's ref_n equals R's
    occupancy even though R never enters the probe call."""
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        centroid_maintenance_report,
        publish_centroid_epoch,
    )

    ref = _emb_df(spark, vectors)
    centroids = _emb_df(spark, vectors[:4])
    path = str(tmp_path / "ivf")
    assert publish_centroid_epoch(ref, centroids, path) == 1

    batch = _emb_df(spark, [(100 + i, v) for i, (_, v) in enumerate(vectors[:8])])
    rep = centroid_maintenance_report(spark, path, batch).collect()
    assert sum(r["ref_n"] for r in rep) == len(vectors)
    assert sum(r["batch_n"] for r in rep) == 8
    assert all(r["total_n"] == r["ref_n"] + r["batch_n"] for r in rep)
    assert all(r["artifact_version"] == 1 for r in rep)


def test_incremental_assignment_parity_with_full_rebuild(
    spark, tmp_path, vectors
):
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        centroid_maintenance_report,
        publish_centroid_epoch,
    )
    from end_to_end_database_pipeline_project_spark.sources.versioned import (
        read_version,
    )

    ref = _emb_df(spark, vectors[:16])
    batch = _emb_df(spark, vectors[16:])
    centroids = _emb_df(spark, vectors[:4])

    inc_path = str(tmp_path / "inc")
    publish_centroid_epoch(ref, centroids, inc_path)
    inc = {
        r["cell_id"]: r["total_n"]
        for r in centroid_maintenance_report(spark, inc_path, batch).collect()
    }

    # full rebuild over ref + batch with the SAME centroids
    full_path = str(tmp_path / "full")
    publish_centroid_epoch(ref.unionByName(batch), centroids, full_path)
    full = {
        r["cell_id"]: r["ref_n"]
        for r in read_version(spark, full_path).collect()
    }
    assert inc == full


def test_drift_trigger_fires_on_collapsed_batch(spark, tmp_path, vectors):
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        centroid_maintenance_report,
        publish_centroid_epoch,
    )

    ref = _emb_df(spark, vectors)
    centroids = _emb_df(spark, vectors[:4])
    path = str(tmp_path / "drift")
    publish_centroid_epoch(ref, centroids, path)

    # balanced batch = the reference itself -> cell histogram matches
    balanced = centroid_maintenance_report(
        spark, path, _emb_df(spark, [(100 + i, v) for i, (_, v) in enumerate(vectors)])
    ).collect()
    assert all(r["rebuild_recommended"] is False for r in balanced)
    assert all(r["occupancy_psi"] < 0.05 for r in balanced)

    # collapsed batch: every vector lands in centroid 0's cell
    collapsed = centroid_maintenance_report(
        spark,
        path,
        _emb_df(spark, [(200 + i, vectors[0][1]) for i in range(12)]),
    ).collect()
    assert all(r["rebuild_recommended"] is True for r in collapsed)
    assert all(r["occupancy_psi"] > 0.2 for r in collapsed)


def test_rebuild_loop_closes_after_trigger(spark, tmp_path, vectors):
    """The full maintenance loop: probe fires the rebuild trigger ->
    republish the epoch from reference + drifted batch (version bump
    through the same manifest swap) -> re-probe of the same batch
    against the NEW epoch is quiet. This is what a production operator
    does when `rebuild_recommended` fires; the versioned store makes
    it a one-call republish with the old epoch still addressable."""
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        centroid_maintenance_report,
        publish_centroid_epoch,
    )
    from end_to_end_database_pipeline_project_spark.sources.versioned import (
        expire_versions,
        versions,
    )

    ref = _emb_df(spark, vectors)
    centroids = _emb_df(spark, vectors[:4])
    path = str(tmp_path / "loop")
    publish_centroid_epoch(ref, centroids, path)

    # collapsed batch -> trigger fires against epoch 1
    batch = _emb_df(spark, [(200 + i, vectors[0][1]) for i in range(12)])
    fired = centroid_maintenance_report(spark, path, batch).collect()
    assert all(r["rebuild_recommended"] is True for r in fired)

    # rebuild: new epoch over reference + the drifted batch (same
    # centroids here — the trigger is about OCCUPANCY baselines; a
    # k-means re-fit would slot in identically)
    v2 = publish_centroid_epoch(ref.unionByName(batch), centroids, path)
    assert v2 == 2

    # a NEXT batch drawn from the post-shift mixture (the union's own
    # distribution, re-keyed) probes quiet against the new epoch —
    # the baseline has absorbed the shift. (The collapsed batch alone
    # would STILL alert, correctly: it is out-of-distribution even for
    # the mixture.)
    mixture = ref.unionByName(batch).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    calm = centroid_maintenance_report(spark, path, mixture).collect()
    assert all(r["artifact_version"] == 2 for r in calm)
    assert all(r["rebuild_recommended"] is False for r in calm)

    # both epochs stay addressable until vacuumed; after retain_last=1
    # the old epoch is gone and a pinned probe of it fails loudly
    assert [v["version"] for v in versions(path)] == [1, 2]
    old = centroid_maintenance_report(spark, path, batch, version=1)
    assert all(r["rebuild_recommended"] for r in old.collect())
    assert expire_versions(path, retain_last=1) == [1]
    with pytest.raises(ValueError, match="version 1 not committed"):
        centroid_maintenance_report(spark, path, batch, version=1)


def test_minhash_probe_reads_committed_buckets(spark, tmp_path):
    """Near-dup candidates must come from the PUBLISHED bucket epoch:
    identical text -> identical signature -> same buckets in every
    band, so a redelivered doc is a candidate against the epoch even
    though the corpus frame is gone; a novel doc collides with
    nothing. Parity: the persisted-probe candidates equal the in-plan
    bucket join over the same frames."""
    from end_to_end_database_pipeline_project_spark.operators.dedup import (
        lsh_buckets,
        minhash_signatures,
    )
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        probe_minhash_epoch,
        publish_minhash_epoch,
    )

    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a completely different document body with its own words"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    path = str(tmp_path / "mh")
    assert publish_minhash_epoch(corpus, path) == 1

    batch = spark.createDataFrame(
        [
            (11, corpus_rows[0][1]),  # redelivery of doc 1
            (12, "entirely novel text that shares no shingles with anything"),
        ],
        "doc_id long, text string",
    )
    cands = {
        (r["new_id"], r["old_id"])
        for r in probe_minhash_epoch(spark, path, batch).collect()
    }
    assert (11, 1) in cands
    assert not any(n == 12 for n, _ in cands)

    # parity with the in-plan join the registered query runs
    old_b = lsh_buckets(minhash_signatures(corpus)).select(
        F.col("doc_id").alias("old_id"), "band", "bucket"
    )
    new_b = lsh_buckets(minhash_signatures(batch)).select(
        F.col("doc_id").alias("new_id"), "band", "bucket"
    )
    inplan = {
        (r["new_id"], r["old_id"])
        for r in new_b.join(old_b, ["band", "bucket"])
        .select("new_id", "old_id")
        .distinct()
        .collect()
    }
    assert cands == inplan


def test_pq_roundtrip_encode_identical_to_inplan(spark, tmp_path, vectors):
    """publish -> commit -> re-nest must reproduce the in-plan encode
    bit-identically: dq from the committed epoch == dq from the fused
    in-plan codebook over the same reference."""
    from end_to_end_database_pipeline_project_spark.operators.similarity import (
        pq_apply,
        pq_codebook,
    )
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        _nest_pq_rows,
        publish_pq_epoch,
    )
    from end_to_end_database_pipeline_project_spark.sources.versioned import (
        read_version,
    )

    ref = _emb_df(spark, vectors)
    batch = _emb_df(spark, [(100 + i, v) for i, (_, v) in enumerate(vectors[:8])])
    path = str(tmp_path / "pq")
    assert publish_pq_epoch(ref, path, m=1, k=8) == 1

    committed = _nest_pq_rows(read_version(spark, path))
    from_artifact = {
        r["vec_id"]: r["dq"]
        for r in pq_apply(batch, committed, m=1).collect()
    }
    inplan = {
        r["vec_id"]: r["dq"]
        for r in pq_apply(batch, pq_codebook(ref, m=1, k=8), m=1).collect()
    }
    assert from_artifact == inplan


def test_pq_report_reads_artifact_and_flags_shifted_batch(
    spark, tmp_path, vectors
):
    """The committed epoch carries its own baseline; a batch drawn
    from the reference distribution reconstructs comparably (no
    degradation), while a batch shifted off the codebook's support
    reconstructs > 0.1 worse and trips ``degraded`` — the re-sample
    trigger."""
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        pq_quantization_report,
        publish_pq_epoch,
    )

    ref = _emb_df(spark, vectors)
    path = str(tmp_path / "pq_drift")
    publish_pq_epoch(ref, path, m=1, k=8)

    same_dist = _emb_df(
        spark, [(100 + i, v) for i, (_, v) in enumerate(vectors)]
    )
    [ok] = pq_quantization_report(spark, path, same_dist, m=1).collect()
    assert ok["degraded"] is False
    assert ok["n_batch"] == len(vectors)
    assert ok["ref_recon_cos"] is not None

    # shift every vector off the 4 reference directions: negate and
    # swirl components so no codeword aligns
    shifted = _emb_df(
        spark,
        [
            (200 + i, [v[1], -v[0], v[3], -v[2]])
            for i, (_, v) in enumerate(vectors)
        ],
    )
    [bad] = pq_quantization_report(spark, path, shifted, m=1).collect()
    assert bad["degraded"] is True
    assert bad["batch_recon_cos"] < bad["ref_recon_cos"] - 0.1


def test_probe_before_any_publish_fails_loudly(spark, tmp_path):
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        centroid_maintenance_report,
        probe_bloom_epoch,
    )

    batch = spark.createDataFrame([(1, "a")], "doc_id long, k string")
    with pytest.raises(FileNotFoundError):
        probe_bloom_epoch(spark, str(tmp_path / "nope"), batch, "k", "doc_id")
    with pytest.raises(FileNotFoundError):
        centroid_maintenance_report(
            spark,
            str(tmp_path / "nope2"),
            spark.createDataFrame([], "vec_id long, embedding array<double>"),
        )


def test_probe_from_fresh_process(spark, tmp_path):
    """The literal build-once/probe-many split: an epoch PUBLISHED by
    this session is probed by a COMPLETELY SEPARATE process (its own
    JVM, default SparkSession, no shared state) — the 'later session'
    of the persist-artifact -> later-session-probe contract. The
    committed manifest + parquet on shared storage is the entire
    interface."""
    import json
    import os
    import subprocess
    import sys

    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        publish_bloom_epoch,
    )

    path = str(tmp_path / "bloom_x")
    corpus = spark.createDataFrame([("a",), ("b",)], "k string")
    assert publish_bloom_epoch(corpus, "k", path) == 1

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = f"""
import sys, json
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[2]").getOrCreate()
from end_to_end_database_pipeline_project_spark.pipeline.artifacts import probe_bloom_epoch
batch = spark.createDataFrame([(1, "a"), (2, "z")], "doc_id long, k string")
out = {{r["doc_id"]: r["maybe_dup"]
       for r in probe_bloom_epoch(spark, {path!r}, batch, "k", "doc_id").collect()}}
print("RESULT=" + json.dumps({{str(k): v for k, v in out.items()}}))
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT=")][0]
    got = json.loads(line[len("RESULT="):])
    assert got == {"1": True, "2": False}


def test_artifact_dir_injection(spark, tmp_path, monkeypatch):
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        scratch_artifact_dir,
    )

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "store"))
    d = scratch_artifact_dir("ep_")
    assert d.startswith(str(tmp_path / "store"))


# ---------------------------------------------- CDF-driven maintenance


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cdf_minhash_update_parity_with_full_rebuild(spark, tmp_path):
    """VERDICT r08 #5: advancing the bucket artifact from the corpus
    CDF (inserts, a delete, an upsert, and a delete-then-reinsert)
    equals rebuilding it from the corpus's latest snapshot."""
    from end_to_end_database_pipeline_project_spark.operators.dedup import (
        lsh_buckets,
        minhash_signatures,
    )
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        cdf_update_minhash_epoch,
        publish_minhash_epoch,
    )
    from end_to_end_database_pipeline_project_spark.sources import versioned as V

    corpus_path = str(tmp_path / "corpus")
    art_path = str(tmp_path / "buckets")
    base = [(i, f"the quick brown fox jumps over dog number {i} again") for i in range(6)]
    V.write_version(_mk_docs(spark, base), corpus_path)  # v1
    publish_minhash_epoch(
        V.read_version(spark, corpus_path), art_path
    )  # epoch over v1

    # corpus evolves: append, delete, upsert, delete-then-reinsert
    V.append_version(
        _mk_docs(spark, [(6, "a completely new document about rivers")]),
        corpus_path,
    )  # v2
    V.delete_version(
        spark.createDataFrame([(1,), (2,)], "doc_id long"), corpus_path, "doc_id"
    )  # v3
    V.upsert_version(
        _mk_docs(spark, [(3, "doc three fully rewritten content")]),
        corpus_path,
        "doc_id",
    )  # v4
    V.append_version(
        _mk_docs(spark, [(2, "doc two reborn with different words")]),
        corpus_path,
    )  # v5: re-insert a deleted key

    res = cdf_update_minhash_epoch(spark, corpus_path, art_path, 1)
    assert res["n_deleted"] == 1  # only doc 1 is NET deleted
    assert res["n_upserted"] == 3  # docs 6, 3, 2(net reborn)

    maintained = V.read_version(spark, art_path)
    rebuilt = lsh_buckets(
        minhash_signatures(V.read_version(spark, corpus_path), "text", "doc_id")
    )
    m = {(r.doc_id, r.band, r.bucket) for r in maintained.collect()}
    f = {(r.doc_id, r.band, r.bucket) for r in rebuilt.collect()}
    assert m == f, "CDF-maintained bucket table must equal full rebuild"
    # and the probe path works against the maintained artifact
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        probe_minhash_epoch,
    )

    cand = probe_minhash_epoch(
        spark,
        art_path,
        _mk_docs(spark, [(100, "doc three fully rewritten content")]),
    )
    assert (100, 3) in {(r.new_id, r.old_id) for r in cand.collect()}


def test_cdf_bloom_update_monotone_and_stale_count(spark, tmp_path):
    """Insert/upsert windows advance the Bloom exactly (== full
    rebuild); deletes are counted as stale, never subtracted — the
    filter stays sound (over-approximating)."""
    from end_to_end_database_pipeline_project_spark.operators.bloom import (
        build_bloom,
    )
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        cdf_update_bloom_epoch,
        probe_bloom_epoch,
        publish_bloom_epoch,
    )
    from end_to_end_database_pipeline_project_spark.sources import versioned as V

    corpus_path = str(tmp_path / "corpus")
    art_path = str(tmp_path / "bloom")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, content_hash string")
    V.write_version(mk([(1, "h1"), (2, "h2")]), corpus_path)  # v1
    publish_bloom_epoch(
        V.read_version(spark, corpus_path), "content_hash", art_path
    )
    V.append_version(mk([(3, "h3"), (4, "h4")]), corpus_path)  # v2

    res = cdf_update_bloom_epoch(spark, corpus_path, art_path, 1)
    assert res["stale_deletes"] == 0 and res["n_added"] == 2
    maintained = {
        (r.word_idx, r.bits)
        for r in V.read_version(spark, art_path).collect()
    }
    rebuilt = {
        (r.word_idx, r.bits)
        for r in build_bloom(
            V.read_version(spark, corpus_path), "content_hash"
        ).collect()
    }
    assert maintained == rebuilt, "insert-only window: incremental == rebuild"

    # a delete window: counted stale, filter still over-approximates
    V.delete_version(
        spark.createDataFrame([(3,)], "doc_id long"), corpus_path, "doc_id"
    )  # v3
    res2 = cdf_update_bloom_epoch(spark, corpus_path, art_path, 2)
    assert res2["stale_deletes"] == 1
    probe = probe_bloom_epoch(
        spark,
        art_path,
        mk([(10, "h3"), (11, "h9")]),
        "content_hash",
        "doc_id",
    )
    got = {r.doc_id: r.maybe_dup for r in probe.collect()}
    assert got[10] is True, "stale key still flags (sound, not minimal)"
    assert got[11] is False


def test_cdf_ivf_index_update_parity_and_occupancy(spark, tmp_path, vectors):
    """The assignment index maintained from the CDF equals assigning
    the latest corpus snapshot wholesale; deletes decrement occupancy
    via the key→cell lookup the index provides."""
    from end_to_end_database_pipeline_project_spark.operators.similarity import (
        assign_clusters,
    )
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        cdf_update_ivf_index,
        ivf_index_occupancy,
        publish_centroid_epoch,
    )
    from end_to_end_database_pipeline_project_spark.sources import versioned as V

    corpus_path = str(tmp_path / "corpus")
    cent_path = str(tmp_path / "cents")
    index_path = str(tmp_path / "index")

    ref = _emb_df(spark, vectors)
    cents = _emb_df(
        spark,
        [(j, [1.0 if i == j else 0.0 for i in range(4)]) for j in range(4)],
    )
    publish_centroid_epoch(ref, cents, cent_path)

    V.write_version(ref, corpus_path)  # v1
    # seed the index from the initial snapshot assignment (the index
    # carries the vectors: it IS the IVF bucketed posting lists)
    init = assign_clusters(ref, cents).select(
        "vec_id", F.col("cluster_id").alias("cell_id"), "embedding"
    )
    V.write_version(init, index_path)

    # corpus evolves: new vectors + a deletion + a moved vector
    import numpy as np

    rng = np.random.default_rng(99)
    newv = [(100 + i, [float(x) for x in (np.eye(4)[i % 4] + rng.normal(0, 0.05, 4))]) for i in range(5)]
    V.append_version(_emb_df(spark, newv), corpus_path)  # v2
    V.delete_version(
        spark.createDataFrame([(0,), (101,)], "vec_id long"), corpus_path, "vec_id"
    )  # v3
    moved = [(1, [0.0, 0.0, 1.0, 0.0])]  # vec 1 moves to cell 2
    V.upsert_version(_emb_df(spark, moved), corpus_path, "vec_id")  # v4

    res = cdf_update_ivf_index(spark, corpus_path, cent_path, index_path, 1)
    assert res["n_deleted"] == 2 and res["n_upserted"] == 5

    maintained = {
        (r.vec_id, r.cell_id)
        for r in V.read_version(spark, index_path).collect()
    }
    full = {
        (r.vec_id, r.cluster_id)
        for r in assign_clusters(
            V.read_version(spark, corpus_path), cents
        ).collect()
    }
    assert maintained == full, "CDF-maintained index == full re-assignment"
    occ = {r.cell_id: r.n for r in ivf_index_occupancy(spark, index_path).collect()}
    assert sum(occ.values()) == len(full)
    assert maintained and (1, 2) in maintained, "moved vector re-homed"


def test_cursor_stamped_only_on_last_commit_of_sync(spark, tmp_path, monkeypatch):
    """ADVICE r09 (medium): a sync window netting BOTH deletes and
    upserts stamps ``corpus_version`` only on its LAST commit. A crash
    between the tombstone and the replace leaves the cursor at its
    pre-sync value, so the cursor-driven retry re-runs the whole
    window (idempotently) instead of skipping the lost upserts."""
    from end_to_end_database_pipeline_project_spark.operators.dedup import (
        lsh_buckets,
        minhash_signatures,
    )
    from end_to_end_database_pipeline_project_spark.pipeline import artifacts as A
    from end_to_end_database_pipeline_project_spark.sources import versioned as V

    corpus_path = str(tmp_path / "corpus")
    art_path = str(tmp_path / "buckets")
    base = [(i, f"quick brown fox document number {i} content") for i in range(5)]
    V.write_version(_mk_docs(spark, base), corpus_path)  # v1
    A.publish_minhash_epoch(
        V.read_version(spark, corpus_path), art_path, corpus_version=1
    )

    V.delete_version(
        spark.createDataFrame([(1,)], "doc_id long"), corpus_path, "doc_id"
    )  # v2
    V.append_version(
        _mk_docs(spark, [(9, "a brand new appended document about mountains")]),
        corpus_path,
    )  # v3

    # crash INSIDE the sync: the tombstone commit lands, the upsert never does
    real_upsert = V.upsert_version

    def exploding_upsert(*a, **kw):
        raise RuntimeError("simulated crash between delete and upsert")

    # cdf_update_minhash_epoch imports upsert_version at call time, so
    # patching the module attribute intercepts exactly the sync's commit
    import end_to_end_database_pipeline_project_spark.sources.versioned as VS

    monkeypatch.setattr(VS, "upsert_version", exploding_upsert)
    with pytest.raises(RuntimeError, match="simulated crash"):
        A.cdf_update_minhash_epoch(spark, corpus_path, art_path, 1)
    monkeypatch.setattr(VS, "upsert_version", real_upsert)

    # the half-applied sync did NOT advance the cursor
    assert A.artifact_corpus_cursor(art_path) == 1
    # cursor-driven retry re-runs the whole window and converges
    cur = A.artifact_corpus_cursor(art_path)
    A.cdf_update_minhash_epoch(spark, corpus_path, art_path, cur)
    assert A.artifact_corpus_cursor(art_path) == 3
    maintained = {
        (r.doc_id, r.band, r.bucket)
        for r in V.read_version(spark, art_path).collect()
    }
    rebuilt = {
        (r.doc_id, r.band, r.bucket)
        for r in lsh_buckets(
            minhash_signatures(
                V.read_version(spark, corpus_path), "text", "doc_id"
            )
        ).collect()
    }
    assert maintained == rebuilt, "retry after crash must converge to rebuild"


def test_net_changes_keeps_all_rows_of_winning_commit(spark, tmp_path):
    """ADVICE r09: a key whose winning (highest-version) commit carries
    MULTIPLE rows — the LIST fold `upsert_version` documents — nets to
    ALL of those rows, not an arbitrary one."""
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        _net_changes,
    )
    from end_to_end_database_pipeline_project_spark.sources import versioned as V

    path = str(tmp_path / "lists")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, item string")
    V.write_version(mk([(1, "a"), (2, "x")]), path)  # v1
    # v2: doc 1's row-set replaced by THREE rows in one atomic commit
    V.upsert_version(mk([(1, "b"), (1, "c"), (1, "d")]), path, "doc_id")
    # v3: doc 2 deleted
    V.delete_version(
        spark.createDataFrame([(2,)], "doc_id long"), path, "doc_id"
    )

    changes = V.incremental_scan(spark, path, 1)
    net_del, net_up = _net_changes(changes, "doc_id")
    assert {r.doc_id for r in net_del.collect()} == {2}
    got = {(r.doc_id, r.item) for r in net_up.collect()}
    assert got == {(1, "b"), (1, "c"), (1, "d")}, (
        "winning commit's full row-set must survive the net fold"
    )


def test_bloom_stale_fraction_rebuild_policy(spark, tmp_path):
    """VERDICT r09 #7: deletes past the stale threshold trigger
    exactly ONE republish; live-key probe verdicts are identical
    before/after (only stale false positives disappear) and the
    fraction resets."""
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        bloom_stale_fraction,
        cdf_update_bloom_epoch,
        probe_bloom_epoch,
        publish_bloom_epoch,
    )
    from end_to_end_database_pipeline_project_spark.sources import versioned as V

    corpus_path = str(tmp_path / "corpus")
    art_path = str(tmp_path / "bloom")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, content_hash string")
    V.write_version(mk([(i, f"h{i}") for i in range(10)]), corpus_path)  # v1
    publish_bloom_epoch(
        V.read_version(spark, corpus_path), "content_hash", art_path,
        corpus_version=1,
    )
    assert bloom_stale_fraction(spark, art_path) == 0.0

    def probe(keys):
        got = probe_bloom_epoch(
            spark,
            art_path,
            mk([(i, k) for i, k in enumerate(keys)]),
            "content_hash",
            "doc_id",
        )
        return [r.maybe_dup for r in got.orderBy("doc_id").collect()]

    live = [f"h{i}" for i in range(3, 10)]
    before = probe(live)
    assert all(before), "live keys flag before the rebuild"
    assert probe(["h0"]) == [True]

    # small delete first: below threshold -> recorded, not acted on
    V.delete_version(
        spark.createDataFrame([(0,)], "doc_id long"), corpus_path, "doc_id"
    )  # v2
    r1 = cdf_update_bloom_epoch(
        spark, corpus_path, art_path, 1, rebuild_stale_ratio=0.2
    )
    assert not r1["rebuilt"] and 0 < r1["stale_fraction"] <= 0.2
    assert probe(["h0"]) == [True], "stale key still a sound false positive"

    # big delete: past threshold -> exactly one republish
    V.delete_version(
        spark.createDataFrame([(1,), (2,)], "doc_id long"), corpus_path, "doc_id"
    )  # v3
    r2 = cdf_update_bloom_epoch(
        spark, corpus_path, art_path, 2, rebuild_stale_ratio=0.2
    )
    assert r2["rebuilt"] and r2["stale_fraction"] == 0.0
    rebuilds = [e for e in V.versions(art_path) if e.get("bloom_rebuild")]
    assert len(rebuilds) == 2, "initial publish + exactly one policy republish"
    assert bloom_stale_fraction(spark, art_path) == 0.0
    after = probe(live)
    assert after == before, "live-key verdicts identical across republish"
    assert probe(["h0", "h1", "h2"]) == [False, False, False], (
        "stale false positives gone after the rebuild"
    )
    # idempotent retry at the cursor: no further commits
    from end_to_end_database_pipeline_project_spark.pipeline.artifacts import (
        artifact_corpus_cursor,
    )

    assert artifact_corpus_cursor(art_path) == 3
