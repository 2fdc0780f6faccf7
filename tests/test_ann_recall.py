"""ANN quality: the approximate paths must actually find neighbors.

Plan-shape tests prove IVF/SRP-LSH scan less; these prove they still
RETRIEVE — recall@k against the exact brute-force top-k. Bounds are
loose (single-probe bucketed ANN on 64-d synthetic data) but a
regression to near-zero recall (e.g. a broken bucket function hashing
everything apart) fails immediately.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.operators import similarity as SIM
from end_to_end_database_pipeline_project_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def _emb(spark):
    e = load_table(spark, SF, "embeddings")
    return e.withColumn("embedding", F.col("embedding").cast("array<double>"))


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx, exact):
    hits = total = 0
    for q, truth in exact.items():
        got = approx.get(q, set())
        hits += len(got & truth)
        total += len(truth)
    return hits / total


def test_ivf_and_srp_recall_against_exact(spark):
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 10)
    exact = _topk_sets(SIM.brute_force_topk(emb, queries, k=3))

    ivf = _topk_sets(
        SIM.ivf_topk(emb, emb.where(F.col("vec_id") < 8), queries, k=3)
    )
    srp = _topk_sets(SIM.srp_lsh_topk(emb, queries, k=3, n_planes=6))

    r_ivf, r_srp = _recall(ivf, exact), _recall(srp, exact)
    assert r_ivf >= 0.2, f"IVF recall collapsed: {r_ivf}"
    assert r_srp >= 0.2, f"SRP-LSH recall collapsed: {r_srp}"
    # and every query must at least get SOME candidates back
    assert set(exact) == set(ivf) == set(srp)


def test_ivf_multiprobe_recall_is_monotone(spark):
    """nprobe is the recall dial: each extra probed cluster may only add
    scanned corpus, so recall@k must be non-decreasing in nprobe (and
    printed so the measured lift is visible in the test log)."""
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 10)
    centroids = emb.where(F.col("vec_id") < 8)
    exact = _topk_sets(SIM.brute_force_topk(emb, queries, k=3))

    recalls = {}
    for nprobe in (1, 2, 4):
        approx = _topk_sets(
            SIM.ivf_topk(emb, centroids, queries, k=3, nprobe=nprobe)
        )
        recalls[nprobe] = _recall(approx, exact)
    print(f"IVF recall@3 by nprobe: {recalls}")
    assert recalls[1] <= recalls[2] <= recalls[4], recalls
    # with half the clusters probed, most true neighbors must be found
    assert recalls[4] >= 0.5, recalls
