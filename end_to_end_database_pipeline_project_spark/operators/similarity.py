"""Similarity search over embedding columns (``array<float>``).

Two execution paths:

- **Expression path** (default): cosine via built-in higher-order
  functions (``functions.vector``) — JVM-side, codegen'd, zero Python.
  Brute-force top-k is a broadcast of the (small) query set against the
  corpus + per-query heap (window rank), i.e. one pass over the corpus
  with no shuffle of the corpus itself.
- **Pandas-UDF matrix path**: ``mapInPandas`` batches the corpus through
  NumPy, computing a queries×batch dot-product GEMM per Arrow batch.
  Wins when |queries| is large enough that per-row expression evaluation
  loses to BLAS. Same results, pick by shape.

The scale path is **IVF**: partition the corpus by nearest centroid
(here: deterministic seed vectors; at 100 TB a k-means fit), then search
only the probe's cluster — corpus scan cost drops by the cluster fan-out
factor and the cluster assignment is a broadcast join, not a shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.vector import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries, rank per query.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, self
    excluded, ties broken by neighbor id."""
    from ..session import fan_out

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            "rank",
        )
    )


def pq_codebook(emb: DataFrame, m: int = 16, sub: int = 4, k: int = 256) -> DataFrame:
    """One-row nested product-quantization codebook
    ``cb: array<array<array<double>>>`` (m x <=k x sub) — the
    deterministic sampled codebook: the ``k`` lowest-id corpus
    vectors' subvectors (k-means init without iterations; a k-means
    refinement drops in without changing the shape). Sampling is a
    distributed top-k on vec_id (TakeOrderedAndProject), not a
    ``vec_id < k`` predicate: a sparse/filtered id space (e.g. the
    even-id reference in `pq_codebook_lifecycle`) still yields
    min(k, n) actual codewords instead of silently undersampling the
    book (r08 review finding). Split from the encode so the codebook
    can be BUILT once per corpus epoch and persisted
    (`pipeline.artifacts.publish_pq_epoch`) instead of re-derived
    in-plan per run."""
    return (
        emb.orderBy("vec_id").limit(k)
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("vec_id", "embedding"))),
                lambda s: s.embedding,
            ).alias("cands")
        )
        .select(
            # slice(cands, 1, k), not element_at over sequence(0, k-1):
            # slice caps at the actual candidate count, so a corpus
            # with fewer than k vectors yields a min(k, n)-codeword
            # book instead of an out-of-bounds element_at (identical
            # output whenever n >= k)
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> "
                f"transform(slice(cands, 1, {k}), c -> "
                f"slice(c, s * {sub} + 1, {sub})))"
            ).alias("cb")
        )
    )


def _collect_codebook(cb: DataFrame):
    """Driver-side collect of the one-row nested codebook frame as a
    float64 ndarray (m, k_actual, sub). EAGER: runs a (tiny) Spark job
    at DataFrame-construction time — the bounded-broadcast pattern the
    guide sanctions (~130 KB at m=16,k=256), but it does mean a plan
    that only needs ``explain`` still executes the codebook subtree.
    A zero-row codebook frame fails loudly here instead of a
    ``NoneType`` crash inside the kernel (ADVICE r11)."""
    import numpy as np

    row = cb.select("cb").head()
    if row is None:
        raise ValueError(
            "pq_apply: codebook frame has no rows — build it with "
            "pq_codebook over a non-empty corpus"
        )
    return np.asarray(row["cb"], dtype=np.float64)


def _pq_encode_np(x, book, m: int, sub: int):
    """The PQ encode kernel body, shared by every consumer so parity
    holds by construction: ``x`` is an (n, >=m*sub) float64 ndarray,
    ``book`` the (m, k, sub) codebook; returns the (n, m*sub) float64
    reconstruction. Bit-identical to ``_pq_apply_expr``: per-codeword
    distance uses the same left-associative IEEE-754 add order as the
    ``(d1 + d2) + d3 + d4`` expression, ``np.argmin`` takes the first
    minimum exactly like ``array_position(ds, array_min(ds))``, NaN
    distances are masked to +inf (Spark's array_min never returns NaN
    over non-NaN elements), and the output copies codebook doubles
    verbatim. Finite, non-null embeddings assumed (a row mixing NaN
    and true +inf codeword distances may pick a different — equally
    infinite-distance — codeword than the expression form)."""
    import numpy as np

    n = x.shape[0]
    n_codes = book.shape[1] if book.ndim == 3 else 0
    # bound the (rows, m, k, sub) distance tensor to ~32 MB per slab
    step = max(1, (1 << 22) // max(1, m * n_codes * sub))
    arange_m = np.arange(m)[None, :]
    xr = np.ascontiguousarray(x[:, : m * sub], dtype=np.float64).reshape(
        n, m, 1, sub
    )
    dq = np.empty((n, m * sub), dtype=np.float64)
    for lo in range(0, n, step):
        d = xr[lo : lo + step] - book[None]  # (b, m, k, sub)
        d *= d
        # left-associative add, same order as the SQL expression
        acc = d[..., 0]
        for i in range(1, sub):
            acc = acc + d[..., i]
        if np.isnan(acc).any():
            acc = np.where(np.isnan(acc), np.inf, acc)
        codes = np.argmin(acc, axis=2)  # first minimum
        chosen = book[arange_m, codes]  # (b, m, sub) verbatim doubles
        dq[lo : lo + step] = chosen.reshape(len(chosen), m * sub)
    return dq


def pq_apply(
    emb: DataFrame,
    cb: DataFrame,
    m: int = 16,
    sub: int = 4,
    extra_cols: tuple = (),
) -> DataFrame:
    """Encode ``emb`` against a GIVEN one-row codebook frame (in-plan
    or read back from a committed epoch): (vec_id, embedding, dq),
    dq = the PQ-reconstructed vector. ``extra_cols`` carries named
    pass-through columns (lets a consumer encode AFTER a selective
    join, so dq is computed only for surviving rows).

    r11 (guide §4.2): the m×k codeword argmin is a ``mapInPandas``
    NumPy kernel — the previous Catalyst form ran the k×sub distance
    sweep through interpreted higher-order-function lambdas (transform/
    array_min/array_position do not whole-stage-codegen), ~19 ms/row at
    m=16,k=256; the batched kernel is one vectorized subtract/square/
    argmin per Arrow batch (measured 1.23 s -> 0.08 s on the sf0.1
    encode). Output is bit-identical to the retained expression form
    `_pq_apply_expr` for finite, non-null embeddings — the kernel body
    and the parity argument live in :func:`_pq_encode_np` (pinned by
    tests/test_r11_fused_paths.py). The one-row codebook rides to
    executors inside the task closure (~130 KB at m=16,k=256 — the
    same bounded-scalar class as the broadcast it replaces); collecting
    it is EAGER (see :func:`_collect_codebook`)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    book = _collect_codebook(cb)
    # (m, k_actual, sub); k_actual = min(k, |corpus|) per the sampled book
    src = emb.select("vec_id", "embedding", *extra_cols)
    out_schema = StructType(
        src.schema.fields + [StructField("dq", ArrayType(DoubleType()))]
    )

    def encode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.vstack(pdf["embedding"].to_numpy())
            dq = _pq_encode_np(x, book, m, sub)
            pdf = pdf.copy()
            pdf["dq"] = list(dq)
            yield pdf

    return src.mapInPandas(encode, out_schema)


def pq_recon_stats(
    emb: DataFrame, cb: DataFrame, m: int = 16, sub: int = 4
) -> DataFrame:
    """Fused encode + reconstruction-quality partials: one Python
    crossing computes each row's PQ reconstruction (``_pq_encode_np``,
    the shared kernel body) AND its reconstruction cosine
    ``cos(embedding, dq)``, emitting per-batch partial sums
    ``(n long, c_sum double)`` — the §2.3 map-side-aggregate shape.
    ``sum(c_sum)/sum(n)`` is the mean reconstruction cosine.

    Replaces ``pq_apply(...)`` + per-row interpreted HOF cosine + avg:
    the (embedding, dq) columns no longer cross back to the JVM at all
    (2 doubles per batch instead of ~1 KB per row), and the cosine is
    two vectorized products per batch instead of ~10 interpreted
    lambda frames per row. Arithmetic parity with the HOF form: the
    HOF multiplies ``float`` embeddings pairwise in FLOAT32 (zip_with
    on array<float> rounds each product to float32) and accumulates in
    float64 — the kernel reproduces the float32 product rounding
    exactly and sums in float64 (summation order differs: pairwise vs
    left-associative — a ~1e-15 relative difference, the same class as
    Spark's own partition-order-dependent avg), so a mean rounded at
    1e-6 is stable. Pinned against the unfused plan in
    tests/test_r12_pq_paths.py."""
    import numpy as np

    book = _collect_codebook(cb)
    src = emb.select("embedding")

    def stats(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            xn = np.vstack(pdf["embedding"].to_numpy())  # native dtype
            x = xn.astype(np.float64)
            dq = _pq_encode_np(x, book, m, sub)
            # cosine(embedding, dq) in the HOF form: zip_with promotes
            # the float side to double (mixed float/double lambda), so
            # the dot products are FLOAT64; norm(embedding)'s squares
            # are native-dtype products (rounded to FLOAT32 iff the
            # column is array<float>) accumulated in float64; norm(dq)
            # is all-float64
            dot = np.sum(x * dq, axis=1)
            ne = np.sqrt(np.sum((xn * xn).astype(np.float64), axis=1))
            ndq = np.sqrt(np.sum(dq * dq, axis=1))
            c = dot / (ne * ndq)
            yield pd.DataFrame(
                {"n": [len(pdf)], "c_sum": [float(np.sum(c))]}
            )

    return src.mapInPandas(stats, schema="n long, c_sum double")


def pq_adc_pair_scores(
    emb: DataFrame,
    cb: DataFrame,
    queries_pdf: pd.DataFrame,
    m: int = 16,
    sub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fused corpus encode + exact/ADC pair scoring against a bounded
    probe set (r12, VERDICT r11 "Next round #5"): ONE Python crossing
    encodes each corpus batch (``_pq_encode_np``, the shared kernel
    body) and scores it against every probe vector — exact cosine on
    the raw embeddings and ADC cosine on the PQ reconstructions — as
    vectorized batch×probe products instead of ~10 interpreted HOF
    lambda frames per pair per cosine. Emits
    ``(query_id, vec_id, exact_cos, approx_cos)`` for every
    (probe, corpus) pair with ``vec_id != query_id``.

    The probe side arrives as a DRIVER-side pandas frame (id, vector)
    — the ``near_dup_pairs_pandas`` bounded-left-slab shape; its PQ
    reconstruction is computed here with the SAME kernel body, so
    probe and corpus encodes stay bit-identical. Arithmetic parity
    with the HOF pair plan it replaces: exact-cosine products are
    float32×float32 — rounded to float32 exactly as ``zip_with`` on
    two array<float> columns rounds them — accumulated in float64;
    ADC-cosine products are float64 (both reconstructions are
    array<double>). Only the summation ORDER differs (~1e-15
    relative), far below the probe/candidate cosine gaps that decide
    the downstream ranks; rank parity vs the unfused plan is pinned in
    tests/test_r12_pq_paths.py."""
    import numpy as np

    book = _collect_codebook(cb)
    if queries_pdf.empty:
        return emb.sparkSession.createDataFrame(
            [],
            "query_id long, vec_id long, exact_cos double, approx_cos double",
        )
    q_ids = queries_pdf[id_col].to_numpy()
    qn = np.vstack(queries_pdf[vec_col].to_numpy())  # native dtype
    q_dq = _pq_encode_np(qn.astype(np.float64), book, m, sub)
    q_norm = np.sqrt(np.sum((qn * qn).astype(np.float64), axis=1))
    q_dq_norm = np.sqrt(np.sum(q_dq * q_dq, axis=1))

    src = emb.select(id_col, vec_col)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            xn = np.vstack(pdf[vec_col].to_numpy())  # native dtype
            dq = _pq_encode_np(xn.astype(np.float64), book, m, sub)
            x_norm = np.sqrt(np.sum((xn * xn).astype(np.float64), axis=1))
            dq_norm = np.sqrt(np.sum(dq * dq, axis=1))
            out = []
            for qi, qid in enumerate(q_ids):
                # native-dtype product rounding (float32 iff the column
                # is array<float> — exactly zip_with on two same-typed
                # arrays), float64 accumulation
                ex = np.sum((xn * qn[qi]).astype(np.float64), axis=1)
                ex /= x_norm * q_norm[qi]
                ap = dq @ q_dq[qi]
                ap /= dq_norm * q_dq_norm[qi]
                keep = ids != qid
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(int(keep.sum()), qid),
                            "vec_id": ids[keep],
                            "exact_cos": ex[keep],
                            "approx_cos": ap[keep],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return src.mapInPandas(
        score,
        schema="query_id long, vec_id long, exact_cos double, approx_cos double",
    )


def _pq_apply_expr(
    emb: DataFrame,
    cb: DataFrame,
    m: int = 16,
    sub: int = 4,
    extra_cols: tuple = (),
) -> DataFrame:
    """The pre-r11 pure-Catalyst encode (interpreted HOF argmin) —
    retained as the parity reference for :func:`pq_apply`; the kernel
    must reproduce it bit-for-bit."""
    # unrolled over the sub dims (no aggregate-HOF lambda frames —
    # measured ~1.3x on the K=64 encode vs the aggregate form)
    dist = " + ".join(
        f"(element_at(embedding, s * {sub} + {i + 1}) - element_at(cv, {i + 1}))"
        f" * (element_at(embedding, s * {sub} + {i + 1}) - element_at(cv, {i + 1}))"
        for i in range(sub)
    )
    # let-binding idiom (the cdc_chunk_dedup trick): bind the per-
    # subspace distance array once via a one-element transform, so
    # array_position and array_min share it instead of recomputing the
    # k x sub distance sweep twice (2x on the K=64 encode)
    dq_expr = (
        f"flatten(transform(sequence(0, {m - 1}), s -> "
        f"element_at(transform("
        f"array(transform(element_at(cb, s + 1), cv -> {dist})), "
        f"ds -> element_at(element_at(cb, s + 1), "
        f"cast(array_position(ds, array_min(ds)) as int))), 1)))"
    )
    return emb.crossJoin(F.broadcast(cb)).select(
        "vec_id", "embedding", *extra_cols, F.expr(dq_expr).alias("dq")
    )


def assign_clusters(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cluster assignment: nearest centroid by cosine (argmax,
    centroid-id tie-break). Centroids broadcast; no corpus shuffle."""
    from ..session import fan_out

    cent = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
    )
    scored = fan_out(corpus).crossJoin(F.broadcast(cent)).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        "centroid_id",
        cosine(F.col(vec_col), F.col("cent_vec")).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("centroid_id").alias("cluster_id"))
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: search within the query's top-``nprobe`` clusters.

    Approximate (recall < 1 when true neighbors fall across a cluster
    boundary); the per-query scan cost is nprobe·|corpus|/n_clusters.
    ``nprobe`` is the standard recall/cost dial: each extra probed
    cluster recovers the neighbors that sorted just across the Voronoi
    boundary.  Each corpus vector lives in exactly one cluster and the
    probed clusters are distinct, so no (query, neighbor) pair is scored
    twice — no dedup pass needed.  nprobe=1 reduces to searching the
    query's own cluster (the query ranks its own centroid first)."""
    assigned = assign_clusters(corpus, centroids, id_col, vec_col)
    cent = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
    )
    qv = corpus.join(
        queries.select(F.col(id_col).alias(id_col)), id_col, "left_semi"
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("cent_cos"), F.asc("centroid_id")
    )
    q = (
        qv.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "q_vec",
            "centroid_id",
            cosine(F.col("q_vec"), F.col("cent_vec")).alias("cent_cos"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "q_vec", F.col("centroid_id").alias("q_cluster"))
    )
    scored = (
        assigned.join(
            F.broadcast(q),
            (F.col("cluster_id") == F.col("q_cluster"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_vec"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank")
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matrix-kernel variant: queries held as a NumPy matrix, corpus
    streamed through mapInPandas, one GEMM per Arrow batch, local top-k
    per batch then a global window to cut to k. Demonstrates the
    vectorized-Python slow path done right (Arrow batches, no per-row
    Python)."""
    import numpy as np

    if queries_pdf.empty:
        # empty probe set (empty corpus slice): nothing to score —
        # np.vstack would raise on zero arrays
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank long"
        )
    q_ids = queries_pdf[id_col].to_numpy()
    q_mat = np.vstack(queries_pdf[vec_col].to_numpy()).astype("float64")
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            c_mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = q_norm @ c_norm.T  # |Q| x |batch|
            n_ids = pdf[id_col].to_numpy()
            out = []
            for qi, qid in enumerate(q_ids):
                # local top-k within the batch bounds the shuffled rows
                row = sims[qi]
                take = min(k + 1, len(row))
                idx = np.argpartition(-row, take - 1)[:take]
                for j in idx:
                    if n_ids[j] != qid:
                        out.append((int(qid), int(n_ids[j]), float(row[j])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cos"])

    from ..session import fan_out

    scored = fan_out(corpus).select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank")
    )


def near_dup_pairs_pandas(
    corpus: DataFrame,
    left_pdf: pd.DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, matrix-kernel form: the bounded
    left side rides along as a NumPy matrix, the corpus streams through
    ``mapInPandas``, and each Arrow batch is one |left|×|batch| GEMM.
    Emits (vec_a, vec_b, cosine) with vec_a < vec_b and cosine ≥
    threshold.

    Replaces the per-pair higher-order-function cosine (a
    BroadcastNestedLoopJoin evaluating interpreted lambdas per element —
    ~30× slower at 2k×64d); the 100 TB form shards the left matrix so
    each executor holds one slab."""
    import numpy as np

    if left_pdf.empty:
        # empty left slab (empty corpus slice): nothing to pair —
        # np.vstack would raise on zero arrays
        return corpus.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, cosine double"
        )
    l_ids = left_pdf[id_col].to_numpy()
    l_mat = np.vstack(left_pdf[vec_col].to_numpy()).astype("float64")
    l_norm = l_mat / np.linalg.norm(l_mat, axis=1, keepdims=True)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            c_mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = l_norm @ c_norm.T  # |left| x |batch|
            c_ids = pdf[id_col].to_numpy()
            li, ci = np.nonzero(sims >= threshold)
            keep = l_ids[li] < c_ids[ci]
            yield pd.DataFrame(
                {
                    "vec_a": l_ids[li][keep],
                    "vec_b": c_ids[ci][keep],
                    "cosine": sims[li, ci][keep],
                }
            )

    from ..session import fan_out

    return fan_out(corpus).select(id_col, vec_col).mapInPandas(
        score, schema="vec_a long, vec_b long, cosine double"
    )


def all_pairs_blocked(
    corpus: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT all-pairs cosine >= threshold with NO driver collection —
    the block-grid self-join. Vectors hash to ``n_blocks`` blocks; each
    unordered block pair (i, j), i <= j, is one cogrouped
    ``applyInPandas`` task whose kernel runs a |block_i| x |block_j|
    GEMM. Emits (vec_a, vec_b, cosine) with vec_a < vec_b, each
    unordered pair exactly once (diagonal blocks keep the upper
    triangle; off-diagonal blocks orient by id).

    Scale shape: per-task memory is two blocks, not the corpus; shuffle
    replication is ~n_blocks/2 per side (choose n_blocks so a block is
    one executor slab — the O(N^2/P) compare cost is inherent to exact
    all-pairs, which is why the production near-dup paths bound
    candidates with LSH/IVF first and reserve this kernel for
    verification or moderate grains). Replaces the driver-side
    ``toPandas()`` slab collection, which OOMs the driver on any
    unbounded corpus."""
    import numpy as np

    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    e = corpus.select(id_col, vec_col).withColumn("__blk", blk)
    left = e.select(
        F.col("__blk").alias("__bi"),
        F.explode(F.sequence(F.col("__blk"), F.lit(n_blocks - 1))).alias("__bj"),
        id_col,
        vec_col,
    )
    # the right side's data columns are renamed: with both sides built
    # from the same lineage, identically-named attributes get pruned
    # out of the cogroup's right pdf (self-cogroup dedup quirk)
    right = e.select(
        F.explode(F.sequence(F.lit(0), F.col("__blk"))).alias("__bi"),
        F.col("__blk").alias("__bj"),
        F.col(id_col).alias("__rid"),
        F.col(vec_col).alias("__rvec"),
    )

    def gemm(key, l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["vec_a", "vec_b", "cosine"]
        if l_pdf.empty or r_pdf.empty:
            return pd.DataFrame(columns=cols)
        l_ids = l_pdf[id_col].to_numpy()
        r_ids = r_pdf["__rid"].to_numpy()
        l_mat = np.vstack(l_pdf[vec_col].to_numpy()).astype("float64")
        r_mat = np.vstack(r_pdf["__rvec"].to_numpy()).astype("float64")
        l_mat /= np.linalg.norm(l_mat, axis=1, keepdims=True)
        r_mat /= np.linalg.norm(r_mat, axis=1, keepdims=True)
        sims = l_mat @ r_mat.T
        li, ri = np.nonzero(sims >= threshold)
        a, b, s = l_ids[li], r_ids[ri], sims[li, ri]
        if key[0] == key[1]:
            keep = a < b  # same block on both sides: upper triangle only
            a, b, s = a[keep], b[keep], s[keep]
        else:  # distinct blocks meet exactly once: orient pair by id
            lo = np.minimum(a, b)
            b = np.maximum(a, b)
            a = lo
        return pd.DataFrame({"vec_a": a, "vec_b": b, "cosine": s})

    return (
        left.groupby("__bi", "__bj")
        .cogroup(right.groupby("__bi", "__bj"))
        .applyInPandas(gemm, schema="vec_a long, vec_b long, cosine double")
    )


def partial_gramian(
    corpus: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Distributed Gramian accumulation — the single corpus pass behind
    PCA / covariance / linear-probe fitting at scale.

    Each Arrow batch contributes its local ``X'^T X'`` where
    ``X' = [X | 1]`` (the augmented ones column folds the column sums
    and the row count into the same (d+1)x(d+1) matrix — one pass
    yields Gram, mean and n simultaneously). Kernels emit only the
    upper triangle as (i, j, s) rows; a groupBy(i, j) sum merges the
    per-batch partials. Driver-side work is then O(d^2) reconstruction
    + O(d^3) eigendecomposition of a d x d matrix, independent of
    corpus size — the correct split at 100 TB (the scan is
    distributed, only the tiny sufficient statistic is centralized)."""
    import numpy as np

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            xa = np.hstack([x, np.ones((x.shape[0], 1))])
            g = xa.T @ xa
            iu, ju = np.triu_indices(g.shape[0])
            yield pd.DataFrame({"i": iu, "j": ju, "s": g[iu, ju]})

    parts = corpus.select(vec_col).mapInPandas(
        kernel, schema="i int, j int, s double"
    )
    return parts.groupBy("i", "j").agg(F.sum("s").alias("s"))


def srp_hyperplanes(n_planes: int, dim: int, seed: int = 42):
    """Deterministic signed-random-projection hyperplanes (Gaussian,
    fixed seed) — the LSH family for cosine similarity: P[same sign] =
    1 - angle/pi. Returned as a plain list-of-lists so callers can
    inline the SAME literals into engine-portable expressions (both the
    Spark plan and a SQL oracle)."""
    import numpy as np

    rs = np.random.RandomState(seed)
    return rs.randn(n_planes, dim).tolist()


def srp_bucket_expr(vec_col: str, planes) -> "F.Column":
    """SRP bucket id as a pure column expression: bit j = sign of the
    dot product with hyperplane j. Evaluated once per vector — O(dim x
    planes) per row, no shuffle."""
    bucket = None
    for j, h in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in h])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket


def srp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    hamming_probe: int = 1,
) -> DataFrame:
    """LSH-bucketed ANN (the second scale path besides IVF): vectors
    hash to 2^n_planes sign-pattern buckets; each query searches its
    own bucket plus (``hamming_probe=1``, the default) every bucket one
    sign-flip away — multi-probe recovers the neighbors that landed
    just across a hyperplane for (1+n_planes)/2^n_planes of the corpus
    scanned, the standard recall/cost dial of multi-probe LSH. Unlike
    IVF there is no centroid fit — the hash family is
    data-independent, so bucketing a 100 TB corpus is a single
    stateless pass (and new data buckets without re-clustering); the
    trade is less adaptive bucket balance."""
    from ..session import fan_out

    probe = corpus.select(vec_col).first()
    if probe is None:
        # empty corpus: no dimensionality to hash — nothing to search
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank long"
        )
    dim = len(probe[0])
    planes = srp_hyperplanes(n_planes, dim, seed)
    assigned = fan_out(corpus).withColumn(
        "bucket", srp_bucket_expr(vec_col, planes)
    )
    probe_masks = [0] + (
        [1 << j for j in range(n_planes)] if hamming_probe >= 1 else []
    )
    q = (
        assigned.join(
            queries.select(F.col(id_col).alias(id_col)), id_col, "left_semi"
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(m) for m in probe_masks])
            ).alias("q_bucket"),
        )
    )
    scored = (
        assigned.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col(id_col) != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("q_vec"), F.col(vec_col)).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank")
    )


def cluster_dedup_stats(
    emb: DataFrame,
    threshold: float,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster semantic-dedup statistics (the SemDeDup report),
    matrix-kernel form: one ``applyInPandas`` per cluster, pairwise
    cosine as blocked GEMM, keep-lowest-id drop policy. Returns
    (cluster, n_vecs, n_dup_pairs, n_dropped).

    Replaces the per-pair higher-order-function cosine self-join — a
    K=16 stress run showed the expression form going quadratic-slow
    (146 s at 32k vectors / 10 clusters) while one BLAS call per
    1024-row block does the same 51M dot products in seconds. Memory is
    bounded by block x |cluster| scores, not |cluster|^2. At 100 TB the
    cluster key already bounds candidate pairs (N^2/k); a single
    oversized cluster is the skew case — shard its rows into slabs and
    join slabs on the cluster key, exactly the sharded form of
    ``near_dup_pairs_pandas``."""
    import numpy as np

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        n = len(pdf)
        cluster = pdf[cluster_col].iloc[0]
        mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        n_pairs = 0
        dropped = np.zeros(n, dtype=bool)
        block = 1024
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            sims = mat[lo:hi] @ mat.T  # (hi-lo) x n
            # upper triangle only: global row index < column index
            rows, cols = np.nonzero(sims >= threshold)
            keep = (rows + lo) < cols
            n_pairs += int(keep.sum())
            dropped[cols[keep]] = True
        return pd.DataFrame(
            {
                cluster_col: [cluster],
                "n_vecs": [n],
                "n_dup_pairs": [n_pairs],
                "n_dropped": [int(dropped.sum())],
            }
        )

    # mirror the input's cluster dtype (fixture label is int32): the
    # oracle convention pins integer widths, and a silently-widened
    # grouping column fails a dtype-comparing gate on identical values
    cluster_t = emb.schema[cluster_col].dataType.simpleString()
    out_schema = (
        f"{cluster_col} {cluster_t}, n_vecs long, n_dup_pairs long, n_dropped long"
    )
    return (
        emb.select(cluster_col, id_col, vec_col)
        .groupBy(cluster_col)
        .applyInPandas(stats, schema=out_schema)
    )
