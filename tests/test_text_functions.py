"""Edge-case unit tests for the text-analysis function library."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.functions import text as TX


def _eval(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "t string")
    return [r[0] for r in df.select(col_fn(F.col("t")).alias("o")).collect()]


def test_word_count_edges(spark):
    out = _eval(spark, TX.word_count, ["", "   ", "one", "two  words", "a b c"])
    assert out == [0, 0, 1, 2, 3]


def test_token_count_bpe_ish(spark):
    # word runs count once; each punctuation mark counts separately
    out = _eval(spark, TX.token_count, ["hello, world!", "a.b", ""])
    assert out == [4, 3, 0]


def test_punct_ratio_edges(spark):
    out = _eval(spark, TX.punct_ratio, ["", "abcd", "!!!!", "ab!!"])
    assert out[0] == 0.0
    assert out[1] == 0.0
    assert out[2] == 1.0
    assert out[3] == 0.5


def test_shingles_short_doc(spark):
    # documents shorter than k words yield one whole-text shingle
    df = spark.createDataFrame([("tiny doc",), ("one two three four",)], "t string")
    out = [r[0] for r in df.select(TX.shingles(F.col("t"), 3).alias("s")).collect()]
    assert out[0] == ["tiny doc"]
    assert out[1] == ["one two three", "two three four"]


def test_shingles_distinct(spark):
    df = spark.createDataFrame([("a b a b a b",)], "t string")
    out = df.select(TX.shingles(F.col("t"), 3).alias("s")).collect()[0][0]
    assert sorted(out) == ["a b a", "b a b"]


def test_lang_id_charsets(spark):
    samples = [
        "the cat sat on the mat and it is a good day in the sun",
        "это текст на русском языке с кириллицей",
        "",
    ]
    out = _eval(spark, TX.lang_id, samples)
    assert out[0] == "en"
    assert out[1] == "ru"
    assert out[2] == "unknown"


def test_fingerprint_whitespace_normalized(spark):
    # differing whitespace must not change the fingerprint
    df = spark.createDataFrame(
        [("hello   world",), ("hello world",), ("hello worlds",)], "t string"
    )
    out = [r[0] for r in df.select(TX.fingerprint64(F.col("t")).alias("f")).collect()]
    assert out[0] == out[1]
    assert out[0] != out[2]
