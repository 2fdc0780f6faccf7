"""Build-once / probe-many lifecycle for ANN & dedup epoch artifacts.

At 100 TB the expensive derived tables an ingest pipeline leans on —
the Bloom words of the standing corpus's content hashes, the IVF
centroid table with its cell-occupancy histogram — are NOT rebuilt per
batch. They are published once per corpus epoch and probed by every
batch until the next epoch, exactly the split the drift monitors
already model for their reference artifacts (streaming/drift.py:66)
and the reference models with its precomputed gold tables
(clickhouse_etl.py:301-456). This module is that split made explicit:

- ``publish_*_epoch`` builds the artifact FROM the corpus and commits
  it through ``sources.versioned``'s manifest-swap, so a crashed
  publish leaves the previous epoch current and readable, historical
  epochs stay addressable (probe a pinned version to reproduce an old
  batch's admission decisions), and a concurrent probe never sees a
  half-written artifact.
- ``probe_*`` / ``*_report`` read the COMMITTED artifact (latest or a
  pinned version) and touch only the batch — the corpus never enters
  the probe plan. Tests pin this by swapping the corpus after publish
  and asserting the probe verdicts still reflect the published epoch.

Both artifacts are metadata-sized (≤ ``M_BITS/64`` Bloom words; one
row per IVF cell), so a probe broadcasts them regardless of corpus
size, and ``versions(path)`` is the staleness ledger: the probe-side
report carries the artifact's version so a consumer can see how many
epochs behind the current corpus its verdicts are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import build_bloom, probe_bloom
from ..operators.similarity import assign_clusters
from ..sources.versioned import (
    incremental_scan,
    read_version,
    versions,
    write_version,
)

_R = 6
#: occupancy-PSI threshold above which the batch's cell distribution
#: has drifted enough from the epoch's that the centroids should be
#: re-fit (same 0.2 convention as streaming/drift.PSI_ALERT)
REBUILD_PSI = 0.2
#: stale-key fraction above which a Bloom epoch should be republished
#: from the corpus: deletes can't be subtracted from the filter, so
#: every erased key lingers as a false positive — past stale/live >
#: 0.2 the accumulated FP drag outweighs one rebuild pass (the Bloom
#: analog of the IVF occupancy-PSI trigger, same 0.2 convention)
BLOOM_REBUILD_STALE = 0.2


def env_scratch_dir(prefix: str, env_var: str) -> str:
    """A fresh scratch directory whose PARENT is injectable via
    ``env_var`` (shared storage on a real cluster; local tempdir
    default, correct for local[all]) — the one copy of the
    env-injected landing idiom, shared by the artifact stores here and
    the binaryFile landing in `plans.source_queries`."""
    import os
    import tempfile

    base = os.environ.get(env_var)
    if base:
        os.makedirs(base, exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=base or None)


def scratch_artifact_dir(prefix: str) -> str:
    """A fresh artifact-store directory for fixture-run lifecycle
    queries. ``SPARK_GRAFT_ARTIFACT_DIR`` injects the parent (shared
    storage on a real cluster — the artifact table must be readable by
    every probing session). Production callers pass their own durable
    table path to the publish/probe functions directly."""
    return env_scratch_dir(prefix, "SPARK_GRAFT_ARTIFACT_DIR")


# ----------------------------------------------------- bloom dedup epochs


def publish_bloom_epoch(
    corpus: DataFrame,
    key_col: str,
    path: str,
    corpus_version: int | None = None,
) -> int:
    """Build the Bloom words table over the corpus keys and commit it
    as the next artifact epoch. ONE corpus pass (the partial-``bit_or``
    aggregation — no extra counting scan); the committed table is ≤
    ``M_BITS/64`` rows (operators/bloom.py geometry). The entry is
    stamped ``bloom_rebuild`` — the baseline marker
    `bloom_stale_fraction` accumulates stales against (the live-key
    denominator comes from the FILTER's own set-bit cardinality
    estimate, never a corpus count); ``corpus_version`` optionally
    records the CDF cursor the incremental maintainer advances from."""
    meta: dict = {"bloom_rebuild": True}
    if corpus_version is not None:
        meta["corpus_version"] = corpus_version
    return write_version(build_bloom(corpus, key_col), path, meta=meta)


def bloom_cardinality(words: DataFrame) -> float:
    """Distinct-key estimate of a committed Bloom words table from its
    set-bit count — the standard estimator
    ``n̂ = -(m/k) · ln(1 − X/m)`` (X = set bits, m = filter bits,
    k = hashes). One aggregate over the ≤ ``M_BITS/64``-row table;
    counts every DISTINCT key ever inserted (re-upserting an existing
    key sets no new bits, so updates never inflate it — the property
    the stale-fraction denominator needs). A saturated filter
    (X == m) estimates ``m`` keys — effectively infinite staleness
    tolerance, at which point the filter needs RESIZING, not just a
    rebuild."""
    import math

    from ..operators.bloom import K_HASHES, M_BITS

    x = (
        words.agg(
            F.coalesce(F.sum(F.bit_count("bits")), F.lit(0)).alias("x")
        ).collect()[0]["x"]
    )
    if x >= M_BITS:
        return float(M_BITS)
    return -(M_BITS / K_HASHES) * math.log(1.0 - x / M_BITS)


def bloom_stale_fraction(spark: SparkSession, artifact_path: str) -> float:
    """Stale-key fraction of the committed Bloom epoch: tombstoned
    keys accumulated since the last REBUILD commit, over the live-key
    estimate ``bloom_cardinality(filter) − stales``. The cardinality
    comes from the filter itself (one aggregate over ≤ ``M_BITS/64``
    rows — no corpus scan), so update-heavy CDF windows cannot inflate
    the denominator: re-upserts of existing keys set no new bits,
    while genuinely new keys do — the row-count meta (``n_added``)
    stays reporting-only. 0.0 for an artifact that predates the
    rebuild stamps (no baseline: the republish cadence is then manual,
    as before r10)."""
    vs = versions(artifact_path)
    base_i = max(
        (i for i, e in enumerate(vs) if e.get("bloom_rebuild")), default=None
    )
    if base_i is None:
        return 0.0
    stale = sum(e.get("stale_deletes", 0) for e in vs[base_i + 1 :])
    if not stale:
        return 0.0
    live = bloom_cardinality(read_version(spark, artifact_path)) - stale
    return stale / max(live, 1.0)


def probe_bloom_epoch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    key_col: str,
    id_col: str,
    version: int | None = None,
) -> DataFrame:
    """Tag ``batch`` with ``maybe_dup`` against a COMMITTED Bloom
    epoch (latest, or a pinned ``version`` for time travel). The plan
    reads the persisted words table — the corpus that built it is not
    touched, so probing costs one pass over the batch no matter how
    the corpus has grown since the epoch was published."""
    return probe_bloom(batch, read_version(spark, path, version), key_col, id_col)


# -------------------------------------------------- minhash/LSH epochs


def publish_minhash_epoch(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_version: int | None = None,
) -> int:
    """Commit the standing corpus's LSH BUCKET table as an epoch
    artifact — the near-dup analog of the Bloom epoch. The bucket
    table (``bands`` rows per doc), not the raw signatures, is what a
    batch probe joins against; the signature build is the expensive
    corpus pass this artifact amortizes across every batch probed
    until the next epoch. ``corpus_version`` (when the corpus lives in
    a versioned table) stamps the epoch with the corpus version it was
    built from — the CURSOR `cdf_update_minhash_epoch` and the
    streaming maintainer advance from."""
    from ..operators.dedup import lsh_buckets, minhash_signatures

    meta = (
        {"corpus_version": corpus_version} if corpus_version is not None else None
    )
    return write_version(
        lsh_buckets(minhash_signatures(corpus, text_col, id_col)),
        path,
        meta=meta,
    )


def probe_minhash_epoch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    version: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs of ``batch`` against a COMMITTED
    bucket epoch: batch-sized signature build + one equi-join on
    (band, bucket) whose right side is the persisted bucket TABLE —
    the corpus itself is never rescanned, so per-batch cost is
    O(|batch| + collisions). Returns distinct ``(new_id, old_id)``
    candidates (verify survivors with the exact-Jaccard pass, as in
    `incremental_neardup_batch`)."""
    from ..operators.dedup import lsh_buckets, minhash_signatures

    # minhash_signatures/lsh_buckets normalize the id column to
    # 'doc_id' regardless of id_col (which names the INPUT column), so
    # both the committed artifact and the batch buckets carry 'doc_id'
    old_b = read_version(spark, path, version).select(
        F.col("doc_id").alias("old_id"), "band", "bucket"
    )
    new_b = lsh_buckets(minhash_signatures(batch, text_col, id_col)).select(
        F.col("doc_id").alias("new_id"), "band", "bucket"
    )
    return new_b.join(old_b, ["band", "bucket"]).select("new_id", "old_id").distinct()


# ------------------------------------------------------ pq codebook epochs


def publish_pq_epoch(
    ref: DataFrame, path: str, m: int = 16, sub: int = 4, k: int = 256
) -> int:
    """Commit a product-quantization epoch artifact: the sampled
    codebook NORMALIZED to one row per (subspace, codeword) —
    ``(s, j, cw, ref_recon_cos)`` — plus the epoch's own quality
    baseline (the reference corpus's mean reconstruction cosine under
    this codebook) riding on every row, so the artifact is one
    self-contained table like `streaming/drift.reference_histogram`.
    ≤ m*k rows (4096 at the defaults) — broadcast-sized forever."""
    from ..operators.similarity import pq_codebook, pq_recon_stats

    cb = pq_codebook(ref, m, sub, k).localCheckpoint(eager=False)
    # r12: fused encode + recon-cosine partials (one Python crossing,
    # per-batch partial sums) instead of pq_apply + per-row HOF cosine
    baseline = pq_recon_stats(ref, cb, m, sub).agg(
        F.round(F.sum("c_sum") / F.sum("n"), _R).alias("ref_recon_cos")
    )
    rows = (
        cb.select(
            F.posexplode("cb").alias("s", "sub_cb")
        )
        .select("s", F.posexplode("sub_cb").alias("j", "cw"))
        .crossJoin(F.broadcast(baseline))
        .select(
            F.col("s").cast("int").alias("s"),
            F.col("j").cast("int").alias("j"),
            "cw",
            "ref_recon_cos",
        )
    )
    return write_version(rows, path)


def _nest_pq_rows(rows: DataFrame) -> DataFrame:
    """Reassemble the committed (s, j, cw) rows into the one-row
    nested ``cb`` frame `operators.similarity.pq_apply` consumes —
    exact inverse of the publish-side posexplode (struct array_sort
    orders by the leading int field, so codeword and subspace order
    are restored bit-identically)."""
    return (
        rows.groupBy("s")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "cw"))), lambda x: x.cw
            ).alias("sub_cb")
        )
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "sub_cb"))),
                lambda x: x.sub_cb,
            ).alias("cb")
        )
    )


def pq_quantization_report(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    m: int = 16,
    sub: int = 4,
    version: int | None = None,
) -> DataFrame:
    """Encode ``batch`` with a COMMITTED codebook epoch (no
    re-derivation — the reference corpus never enters the plan) and
    report the batch's quantization quality against the epoch's own
    baseline:

    ``(artifact_version, n_batch, batch_recon_cos, ref_recon_cos,
    degraded)``

    ``degraded`` fires when the batch reconstructs > 0.1 cosine worse
    than the epoch's reference did — the batch distribution has moved
    off the codebook's support and the codebook needs re-sampling (the
    PQ analog of `centroid_maintenance_report`'s occupancy trigger).
    Per-batch cost: one batch pass against the broadcast codebook —
    since r12 a FUSED pass (`pq_recon_stats`): encode and recon cosine
    in one Python crossing, per-batch partial sums back to the JVM."""
    from ..operators.similarity import pq_recon_stats

    # resolve the version label FIRST, then pin the read to it: a
    # publish committing between a latest-read and a second manifest
    # lookup would otherwise label the report with a version newer
    # than the epoch actually probed (review finding, r08)
    if version is None:
        vs = versions(path)
        if not vs:
            raise FileNotFoundError(f"no committed versions at {path}")
        version = vs[-1]["version"]
    rows = read_version(spark, path, version)
    ver = version
    cb = _nest_pq_rows(rows)
    baseline = rows.agg(F.first("ref_recon_cos").alias("ref_recon_cos"))
    stats = pq_recon_stats(batch, cb, m, sub).agg(
        # coalesce: an empty batch emits no partials — count() read 0
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_batch"),
        F.round(F.sum("c_sum") / F.sum("n"), _R).alias("batch_recon_cos"),
    )
    return stats.crossJoin(F.broadcast(baseline)).select(
        F.lit(ver).cast("long").alias("artifact_version"),
        "n_batch",
        "batch_recon_cos",
        "ref_recon_cos",
        F.coalesce(
            F.col("batch_recon_cos") < F.col("ref_recon_cos") - 0.1, F.lit(False)
        ).alias("degraded"),
    )


# ----------------------------------------------------- ivf centroid epochs


def publish_centroid_epoch(
    ref: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Commit an IVF epoch artifact: one row per cell, carrying the
    centroid vector AND the reference occupancy count — the
    self-contained table an incremental maintenance pass needs to both
    assign a new batch (vectors) and judge occupancy drift (counts)
    without ever rescanning the reference corpus."""
    assigned = assign_clusters(ref, centroids, id_col, vec_col)
    occ = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("ref_n")
    )
    cent = centroids.select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("embedding")
    )
    artifact = cent.join(
        occ, cent["cell_id"] == occ["cluster_id"], "left"
    ).select(
        "cell_id",
        "embedding",
        F.coalesce("ref_n", F.lit(0)).cast("long").alias("ref_n"),
    )
    return write_version(artifact, path)


def centroid_maintenance_report(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: int | None = None,
) -> DataFrame:
    """Assign ``batch`` to the EXISTING committed centroids (broadcast
    argmax — no re-fit, no reference rescan) and report, per cell:

    ``(cell_id, ref_n, batch_n, total_n, artifact_version,
    occupancy_psi, rebuild_recommended)``

    ``occupancy_psi`` is the add-1-smoothed PSI between the epoch's
    reference cell histogram (read from the artifact) and the batch's
    — when batch vectors stop landing where the reference did, the
    Voronoi partition no longer balances the scan and the centroids
    need a re-fit. ``rebuild_recommended`` fires at the standard 0.2.
    The per-batch cost is one batch pass against a broadcast artifact
    (cells × (vector + count)); emitting the signal costs nothing more
    than the assignment the batch needed anyway."""
    # resolve-then-pin (same rationale as pq_quantization_report): the
    # label must name the epoch actually read, even if a publish races
    if version is None:
        vs = versions(path)
        if not vs:
            raise FileNotFoundError(f"no committed versions at {path}")
        version = vs[-1]["version"]
    artifact = read_version(spark, path, version)
    ver = version
    assigned = assign_clusters(
        batch,
        artifact.select(F.col("cell_id").alias(id_col), F.col("embedding").alias(vec_col)),
        id_col,
        vec_col,
    )
    bc = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("batch_n")
    )
    cells = (
        artifact.select("cell_id", "ref_n")
        .join(bc, artifact["cell_id"] == bc["cluster_id"], "left")
        .select(
            "cell_id",
            "ref_n",
            F.coalesce("batch_n", F.lit(0)).cast("long").alias("batch_n"),
        )
        # three consumers (totals, psi, final report) — materialize the
        # batch assignment once instead of re-running it per branch
        .localCheckpoint(eager=False)
    )
    # scalar totals BEFORE any crossJoin (empty-fixture totality
    # discipline): one row each even over zero cells
    tot = cells.agg(
        F.coalesce(F.sum("ref_n"), F.lit(0)).alias("rt"),
        F.coalesce(F.sum("batch_n"), F.lit(0)).alias("bt"),
        F.count(F.lit(1)).alias("ncells"),
    )
    pr = (F.col("ref_n") + 1.0) / (F.col("rt") + F.col("ncells"))
    pc = (F.col("batch_n") + 1.0) / (F.col("bt") + F.col("ncells"))
    # no events, no verdict (the psi_against_reference contract): an
    # EMPTY batch's add-1-smoothed histogram is uniform, so a skewed
    # reference would read as PSI > 0.2 and recommend a rebuild on
    # zero evidence — withhold the verdict (NULL psi, no flag) while
    # still reporting the per-cell occupancy merge (review finding, r08)
    psi = (
        cells.crossJoin(F.broadcast(tot))
        .select(((pr - pc) * F.log(pr / pc)).alias("term"), "bt")
        .agg(
            F.when(
                F.first("bt") > 0, F.round(F.sum("term"), _R)
            ).alias("occupancy_psi")
        )
    )
    return (
        cells.crossJoin(F.broadcast(psi))
        .select(
            "cell_id",
            "ref_n",
            "batch_n",
            (F.col("ref_n") + F.col("batch_n")).cast("long").alias("total_n"),
            F.lit(ver).cast("long").alias("artifact_version"),
            "occupancy_psi",
            F.coalesce(F.col("occupancy_psi") > REBUILD_PSI, F.lit(False)).alias(
                "rebuild_recommended"
            ),
        )
    )


# -------------------------------------------- CDF-driven maintenance
# (VERDICT r08 #5: the last step from build-once/probe-many to true
# incremental index maintenance — advance an artifact from corpus
# version A to B using ONLY the change-data-feed rows between them,
# never a corpus rescan. Parity with a full rebuild is pinned in
# tests/test_artifact_lifecycle.py.)


def _net_changes(changes: DataFrame, key_col: str):
    """Collapse a CDF window to its NET effect per key (last COMMIT
    wins — a key deleted then re-inserted within the window is an
    upsert, one upserted twice keeps the final image): returns
    ``(net_deleted_keys, net_upserted_rows)``. The winner is the key's
    highest ``_commit_version`` and ALL of that commit's rows for the
    key survive — the multi-row-per-key LIST fold ``upsert_version``
    documents (e.g. a doc's whole LSH bucket row-set in one commit)
    nets correctly instead of dropping all but an arbitrary row
    (ADVICE r09). Sound because one commit has one change type: a
    key's winning rows are never a delete/insert mix. One window
    shuffle over O(changed rows)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col)
    last = (
        changes.withColumn("__maxv", F.max("_commit_version").over(w))
        .where(F.col("_commit_version") == F.col("__maxv"))
        .drop("__maxv")
    )
    net_del = (
        last.where(F.col("_change_type") == "delete").select(key_col).distinct()
    )
    net_up = last.where(F.col("_change_type") != "delete").drop(
        "_commit_version", "_change_type"
    )
    return net_del, net_up


def cdf_update_minhash_epoch(
    spark: SparkSession,
    corpus_path: str,
    artifact_path: str,
    from_version: int,
    to_version: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Advance the committed LSH BUCKET artifact from corpus version
    ``from_version`` to ``to_version`` at O(delta) cost: the corpus
    CDF's net-deleted keys become a tombstone commit on the artifact,
    and the net-inserted/upserted docs' bucket rows land as ONE atomic
    replace commit (``upsert_version`` keyed on doc_id supersedes the
    changed docs' old bucket rows and inserts the new ones — bucket
    tables are multi-row-per-key, which the replace fold handles:
    every row of the commit inserts). The corpus enters the plan only
    through its delta directories; a full epoch republish
    (`publish_minhash_epoch`) is now only needed to re-base the
    artifact chain (compaction cadence). Returns
    ``{"artifact_version", "n_deleted", "n_upserted"}``.

    Crash-idempotence: the ``corpus_version`` cursor is stamped ONLY on
    the LAST commit of a sync (when a window nets both deletes and
    upserts, the tombstone commit carries no cursor). A crash between
    the two leaves the cursor at its pre-sync value, so the retry
    re-runs the whole window — re-deleting already-deleted keys and
    re-upserting the same rows are both no-ops on the artifact's
    visible content (ADVICE r09: a cursor stamped on the delete would
    make the retry SKIP the sync and lose the upserted rows)."""
    from ..operators.dedup import lsh_buckets, minhash_signatures
    from ..sources.versioned import _entry as _resolve_entry
    from ..sources.versioned import delete_version, upsert_version

    changes = incremental_scan(spark, corpus_path, from_version, to_version)
    synced_to = _resolve_entry(versions(corpus_path), corpus_path, to_version)[
        "version"
    ]
    net_del, net_up = _net_changes(changes, id_col)
    # bounded driver scalars (the CDF window is the batch being
    # applied), needed to skip empty commits
    n_del = net_del.count()
    n_up = net_up.count()
    cursor = {"corpus_version": synced_to}
    ver = None
    if n_del:
        ver = delete_version(
            net_del.select(F.col(id_col).alias("doc_id")),
            artifact_path,
            "doc_id",
            meta=None if n_up else cursor,
        )
    if n_up:
        ver = upsert_version(
            lsh_buckets(minhash_signatures(net_up, text_col, id_col)),
            artifact_path,
            "doc_id",
            meta=cursor,
        )
    if ver is None:
        ver = versions(artifact_path)[-1]["version"]
    return {"artifact_version": ver, "n_deleted": n_del, "n_upserted": n_up}


def artifact_corpus_cursor(artifact_path: str) -> int:
    """The corpus version the committed artifact is synced to: the
    max ``corpus_version`` any manifest entry carries. This is what
    lets a PER-BATCH maintainer (the streaming twin) advance the
    artifact exactly once per corpus commit — a replayed batch finds
    the cursor already at its version and the update nets to zero
    commits. Raises if the artifact was never stamped (publish with
    ``corpus_version=...``)."""
    cur = max(
        (e.get("corpus_version", -1) for e in versions(artifact_path)),
        default=-1,
    )
    if cur < 0:
        raise ValueError(
            f"artifact at {artifact_path} carries no corpus_version cursor "
            "— publish the epoch with corpus_version=<version> first"
        )
    return cur


def cdf_update_bloom_epoch(
    spark: SparkSession,
    corpus_path: str,
    artifact_path: str,
    from_version: int,
    to_version: int | None = None,
    key_col: str = "content_hash",
    id_col: str = "doc_id",
    rebuild_stale_ratio: float | None = None,
) -> dict:
    """Advance the committed Bloom words epoch from the corpus CDF:
    net-new keys OR into the existing words (bit_or over the ≤
    ``M_BITS/64``-row table — Bloom insertion is monotone, so the
    incremental union EQUALS the full rebuild for insert/upsert
    windows). Deletes cannot be subtracted from a Bloom filter: they
    are counted and recorded in the commit's manifest meta as
    ``stale_deletes`` — the filter stays SOUND (it only over-approximates,
    so a deleted key costs a false positive, never a miss). Returns
    ``{"artifact_version", "n_added", "stale_deletes",
    "stale_fraction", "rebuilt"}``. The net fold runs on ``id_col`` —
    the corpus's TOMBSTONE key, which every CDF row carries (a delete
    row has no ``key_col`` content to hash anyway); the filter words
    come from the net-upserted rows' ``key_col``.

    ``rebuild_stale_ratio`` (e.g. `BLOOM_REBUILD_STALE`) ACTS on the
    stale count instead of merely recording it (VERDICT r09 #7): when
    the accumulated `bloom_stale_fraction` exceeds the threshold after
    this window, the epoch is REPUBLISHED from the corpus snapshot at
    the synced version — one corpus pass that forgets every stale key,
    resetting the fraction to 0 — mirroring the IVF occupancy-PSI
    trigger. Live-key probe verdicts are identical before and after a
    republish (pinned in tests/test_artifact_lifecycle.py); only stale
    false positives disappear."""
    from ..sources.versioned import _entry as _resolve_entry
    from ..sources.versioned import write_version as _wv

    changes = incremental_scan(spark, corpus_path, from_version, to_version)
    synced_to = _resolve_entry(versions(corpus_path), corpus_path, to_version)[
        "version"
    ]
    net_del, net_up = _net_changes(changes, id_col)
    n_stale = net_del.count()
    n_up = net_up.count() if key_col in changes.columns else 0
    old = read_version(spark, artifact_path)
    # a delete-only window has no key_col at all (tombstone rows carry
    # only the table key): nothing to OR in
    merged = (
        old.unionByName(build_bloom(net_up, key_col))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
        if n_up
        else old
    )
    ver = _wv(
        merged,
        artifact_path,
        meta={
            "stale_deletes": n_stale,
            "n_added": n_up,
            "corpus_version": synced_to,
        },
    )
    frac = bloom_stale_fraction(spark, artifact_path)
    rebuilt = False
    if rebuild_stale_ratio is not None and frac > rebuild_stale_ratio:
        ver = publish_bloom_epoch(
            read_version(spark, corpus_path, synced_to),
            key_col,
            artifact_path,
            corpus_version=synced_to,
        )
        frac = 0.0
        rebuilt = True
    return {
        "artifact_version": ver,
        "n_added": n_up,
        "stale_deletes": n_stale,
        "stale_fraction": round(frac, 6),
        "rebuilt": rebuilt,
    }


def cdf_update_ivf_index(
    spark: SparkSession,
    corpus_path: str,
    centroid_path: str,
    index_path: str,
    from_version: int,
    to_version: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Maintain the IVF INDEX (vec_id → cell_id → vector, itself a
    versioned table — the bucketed posting lists a real IVF structure
    is) from the corpus CDF: net-changed vectors assign to the
    COMMITTED centroid epoch (broadcast argmax — no re-fit) and land
    as one replace commit; net-deleted keys land as a tombstone. The
    index read then serves BOTH per-cell occupancy
    (`ivf_index_occupancy` — the decrement-on-delete a count-only
    artifact cannot do: a CDF delete carries the key, not the vector;
    the index looks up the cell by key) and in-cell ANN probing
    (`ann_index_incremental_probe`: batch → cell via broadcast argmax,
    equi-join the index on cell_id, exact cosine within the cell).
    Returns ``{"index_version", "n_deleted", "n_upserted"}``.
    Crash-idempotence: as in `cdf_update_minhash_epoch`, the
    ``corpus_version`` cursor rides only the LAST commit of the sync,
    so a crash between tombstone and replace re-runs the window as a
    no-op retry instead of skipping it (ADVICE r09)."""
    from ..sources.versioned import _entry as _resolve_entry
    from ..sources.versioned import delete_version, upsert_version

    changes = incremental_scan(spark, corpus_path, from_version, to_version)
    synced_to = _resolve_entry(versions(corpus_path), corpus_path, to_version)[
        "version"
    ]
    cursor = {"corpus_version": synced_to}
    net_del, net_up = _net_changes(changes, id_col)
    n_del = net_del.count()
    n_up = net_up.count()
    cents = read_version(spark, centroid_path).select(
        F.col("cell_id").alias(id_col), F.col("embedding").alias(vec_col)
    )
    ver = None
    if n_del:
        ver = delete_version(
            net_del.select(F.col(id_col).alias("vec_id")),
            index_path,
            "vec_id",
            meta=None if n_up else cursor,
        )
    if n_up:
        assigned = assign_clusters(net_up, cents, id_col, vec_col).select(
            "vec_id", F.col("cluster_id").alias("cell_id"), "embedding"
        )
        ver = upsert_version(assigned, index_path, "vec_id", meta=cursor)
    if ver is None:
        ver = versions(index_path)[-1]["version"]
    return {"index_version": ver, "n_deleted": n_del, "n_upserted": n_up}


def ivf_index_occupancy(spark: SparkSession, index_path: str) -> DataFrame:
    """Per-cell occupancy of the maintained assignment index:
    ``(cell_id, n)`` — one groupBy over the index table (O(corpus keys),
    never the vectors)."""
    return (
        read_version(spark, index_path)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
