"""Embedding-quality evaluation wave: the distributed Gramian operator
behind embedding_pca_certificate, plus the certificate semantics.

knn_label_accuracy / centroid_classifier_confusion are value-checked by
the oracle gate; here we pin the parts the oracle cannot see — that the
Gramian partials reconstruct the exact X'^T X' and that the PCA
certificate is self-consistent.
"""

import numpy as np
import pytest

from end_to_end_database_pipeline_project_spark.operators.similarity import (
    partial_gramian,
)
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401
from end_to_end_database_pipeline_project_spark.plans.registry import QUERIES
from end_to_end_database_pipeline_project_spark.session import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-embedding-eval")


def test_partial_gramian_reconstructs_exact_augmented_gram(spark):
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .selectExpr("cast(embedding as array<double>) as embedding")
    )
    rows = partial_gramian(emb).collect()
    d1 = max(r["i"] for r in rows) + 1
    g = np.zeros((d1, d1))
    for r in rows:
        g[r["i"], r["j"]] = r["s"]
        g[r["j"], r["i"]] = r["s"]
    x = np.vstack(
        [np.asarray(r["embedding"]) for r in emb.collect()]
    ).astype("float64")
    xa = np.hstack([x, np.ones((x.shape[0], 1))])
    expect = xa.T @ xa
    # partials sum float64 in a different order than one big GEMM:
    # exact to float tolerance, not bit-for-bit
    assert np.allclose(g, expect, rtol=0, atol=1e-9 * np.abs(expect).max())
    # the ones-column corner carries n, the border carries column sums
    assert g[d1 - 1, d1 - 1] == x.shape[0]
    assert np.allclose(g[:-1, d1 - 1], x.sum(axis=0))


def test_pca_certificate_is_certified_and_ordered(spark):
    out = QUERIES["embedding_pca_certificate"](spark, SF).collect()
    assert len(out) == 4
    assert [r["component"] for r in out] == [1, 2, 3, 4]
    evs = [r["eigenvalue"] for r in out]
    assert evs == sorted(evs, reverse=True)
    assert all(r["certified"] for r in out)
    assert all(0 < r["explained_var_ratio"] <= 1 for r in out)
    # residuals certify against the covariance itself
    assert all(r["residual_norm"] <= 1e-8 * evs[0] for r in out)
