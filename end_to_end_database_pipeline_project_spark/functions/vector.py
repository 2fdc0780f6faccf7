"""Vector (embedding) column expressions.

Embeddings are plain ``array<float>`` columns; all kernels below are
built-in higher-order functions (``aggregate`` / ``zip_with``) — JVM-
side, no Python in the hot path. (r11 measured note: HOF lambdas are
*interpreted*, not whole-stage-codegen'd, but an unrolled 64-term
``element_at`` sum — which DOES codegen — measured 2.3x SLOWER on the
sf0.1 pair scan: 192 element_at calls blow past the JIT-friendly
method size. The HOF form stays.) A pandas-UDF matrix kernel exists in
``operators/similarity.py`` for the cases where NumPy BLAS beats
per-row expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.transform(a, lambda v: v / n)


def euclidean(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
