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
