"""Round-11 optimization parity pins.

Two operator-internal changes this round must be result-identical to
the shapes they replace:

1. The fused multimodal synth+decode kernels (`text_to_*_features`)
   vs the two-step column-then-extract pipelines they fuse — same
   bytes, same features, one Python crossing instead of two.
(An in-array pair-expansion variant of `ngram_jaccard_pairs` was tried
and reverted — measured slower than the self-join; the test below now
pins that a doc-frequency cap far above every real doc frequency is a
no-op relative to the uncapped path.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.operators import multimodal as MM
from end_to_end_database_pipeline_project_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "a completely different document with its own words inside"),
        (4, "the quick brown fox jumps over the lazy cat again and again"),
        (5, ""),
        (6, "one"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "fused, synth, extract",
    [
        (
            MM.text_to_jpeg_features,
            MM.text_to_jpeg_column,
            MM.extract_jpeg_features,
        ),
        (
            MM.text_to_mjpeg_features,
            MM.text_to_mjpeg_avi_column,
            MM.extract_mjpeg_features,
        ),
        (
            MM.text_to_mulaw_features,
            MM.text_to_mulaw_wav_column,
            MM.extract_mulaw_features,
        ),
        (
            MM.text_to_adpcm_features,
            MM.text_to_adpcm_wav_column,
            MM.extract_adpcm_features,
        ),
    ],
    ids=["jpeg", "mjpeg", "mulaw", "adpcm"],
)
def test_fused_equals_two_step(docs, fused, synth, extract):
    two_step = extract(synth(docs))
    one_step = fused(docs)
    assert one_step.columns == two_step.columns
    assert _sorted_rows(one_step) == _sorted_rows(two_step)


def test_fused_plan_has_single_python_eval(docs):
    plan = MM.text_to_jpeg_features(docs)._jdf.queryExecution().executedPlan().toString()
    crossings = plan.count("MapInPandas") + plan.count("ArrowEvalPython")
    assert crossings == 1, plan


def test_ngram_generous_cap_is_noop(docs):
    # a cap far above any doc frequency must not change the output
    capped = DD.ngram_jaccard_pairs(docs, threshold=0.0, max_doc_freq=10_000)
    joined = DD.ngram_jaccard_pairs(docs, threshold=0.0, max_doc_freq=None)
    assert _sorted_rows(capped) == _sorted_rows(joined)
    assert capped.where(F.col("doc_a") >= F.col("doc_b")).count() == 0


def test_capped_shingle_index_releases_uncapped_storage(docs):
    # r12 (ADVICE r11): the uncapped exploded index persisted inside a
    # max_doc_freq shingle_index must be RELEASABLE once everything
    # derived from it is materialized — not pinned for the session
    raw = DD.shingle_index(docs, max_doc_freq=10_000)
    inner = raw._uncapped_index
    assert inner.storageLevel.useMemory or inner.storageLevel.useDisk
    out = raw.localCheckpoint()
    DD.free_uncapped_index(raw)
    lvl = inner.storageLevel
    assert not lvl.useMemory and not lvl.useDisk
    # the outer checkpoint still serves the capped rows
    assert out.count() > 0
    # uncapped results carry no handle; the free is a no-op
    DD.free_uncapped_index(DD.shingle_index(docs))


def test_pq_apply_kernel_matches_expression_form(spark):
    # the Arrow/NumPy PQ encode must reproduce the retained Catalyst
    # expression form bit-for-bit: same left-associative distance
    # arithmetic, first-minimum argmin, verbatim codeword doubles —
    # including on distance TIES (rows 100.. are exact copies of
    # codeword vectors, so every codeword at distance 0 ties with
    # itself only; row 999 sits exactly between codewords 0 and 1 in
    # subspace 0, forcing the first-position tie-break).
    from end_to_end_database_pipeline_project_spark.operators.similarity import (
        _pq_apply_expr,
        pq_apply,
        pq_codebook,
    )

    base = [
        (i, [float((i * 7 + d * 3) % 13) - 6.0 for d in range(8)])
        for i in range(24)
    ]
    # exact codeword copies (ties at distance 0) + a midpoint row
    base += [(100 + i, list(base[i][1])) for i in range(4)]
    mid = [
        (a + b) / 2.0 for a, b in zip(base[0][1], base[1][1])
    ]
    base += [(999, mid)]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    for m, sub, k in [(2, 4, 8), (1, 4, 4), (2, 2, 16)]:
        cb = pq_codebook(emb, m=m, sub=sub, k=k).localCheckpoint()
        got = {
            r["vec_id"]: r["dq"]
            for r in pq_apply(emb, cb, m=m, sub=sub).collect()
        }
        want = {
            r["vec_id"]: r["dq"]
            for r in _pq_apply_expr(emb, cb, m=m, sub=sub).collect()
        }
        assert got == want and len(got) == len(base)


def test_pq_apply_passes_extra_cols(spark):
    from end_to_end_database_pipeline_project_spark.operators.similarity import (
        pq_apply,
        pq_codebook,
    )

    emb = spark.createDataFrame(
        [(i, [float(i + d) for d in range(4)], f"t{i}") for i in range(6)],
        "vec_id long, embedding array<double>, tag string",
    )
    cb = pq_codebook(emb, m=1, sub=4, k=4).localCheckpoint()
    out = pq_apply(emb, cb, m=1, sub=4, extra_cols=("tag",))
    rows = {r["vec_id"]: (r["tag"], len(r["dq"])) for r in out.collect()}
    assert rows == {i: (f"t{i}", 4) for i in range(6)}
