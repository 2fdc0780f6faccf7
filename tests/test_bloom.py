"""Bloom-prefiltered incremental dedup (operators/bloom.py).

The oracle-parity of the end result is covered by the registered
`bloom_incremental_dedup` query; these tests pin the *mechanism*: no
false negatives ever, a false-positive rate in the expected regime, and
the prefilter actually shrinking the exact-join's probe side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.operators import bloom as BLOOM


def _keys(spark, prefix: str, n: int):
    return spark.range(n).select(
        F.col("id").alias("kid"), F.concat(F.lit(prefix), F.col("id")).alias("key")
    )


def test_no_false_negatives(spark):
    corpus = _keys(spark, "k", 2000)
    bloom = BLOOM.build_bloom(corpus, "key")
    tagged = BLOOM.probe_bloom(corpus, bloom, "key", "kid")
    # every corpus key must probe positive
    assert tagged.where(~F.col("maybe_dup")).count() == 0


def test_false_positive_rate_in_regime(spark):
    corpus = _keys(spark, "k", 2000)
    fresh = _keys(spark, "other", 2000)  # disjoint key space
    bloom = BLOOM.build_bloom(corpus, "key")
    tagged = BLOOM.probe_bloom(fresh, bloom, "key", "kid")
    fp = tagged.where(F.col("maybe_dup")).count()
    # with m=2^20 bits, k=5, n=2000: fpp ~ (1 - e^(-5*2000/2^20))^5 ≈ 8e-11.
    # allow generous slack — the assertion is "not a broken filter", i.e.
    # far below the 50% a degenerate single-bit filter would show.
    assert fp <= 20, f"false positive count {fp} far above geometry prediction"


def test_incremental_dedup_exact(spark):
    corpus = _keys(spark, "k", 1000)
    # batch: 300 re-deliveries + 100 new keys
    redeliv = corpus.where(F.col("kid") < 300).select(
        (F.col("kid") + 5000).alias("kid"), "key"
    )
    new = _keys(spark, "new", 100).select((F.col("kid") + 9000).alias("kid"), "key")
    batch = redeliv.unionByName(new)
    out = BLOOM.incremental_dedup(corpus, batch, "key", "kid")
    rows = {r.key for r in out.collect()}
    assert rows == {f"new{i}" for i in range(100)}


def test_prefilter_shrinks_exact_join_side(spark):
    """The scale contract: only maybe-dups reach the anti-join. With a
    disjoint batch, the maybe-side should be ~empty (only FPs)."""
    corpus = _keys(spark, "k", 2000)
    batch = _keys(spark, "b", 2000)
    bloom = BLOOM.build_bloom(corpus, "key")
    tagged = BLOOM.probe_bloom(batch, bloom, "key", "kid")
    n_maybe = tagged.where(F.col("maybe_dup")).count()
    assert n_maybe <= 20  # join probe side collapsed from 2000 to ~0


def test_scan_probe_matches_batch_probe(spark):
    # probe_bloom_scan (chained broadcast-hash fact probe) must agree
    # bit-for-bit with probe_bloom (explode+groupBy batch probe): same
    # hash family, same words table, different physical shape
    corpus = _keys(spark, "k", 2000)
    batch = _keys(spark, "b", 3000)
    bloom = BLOOM.build_bloom(corpus, "key")
    a = {
        r["kid"]: r["maybe_dup"]
        for r in BLOOM.probe_bloom(batch, bloom, "key", "kid")
        .select("kid", "maybe_dup")
        .collect()
    }
    b = {
        r["kid"]: r["maybe_dup"]
        for r in BLOOM.probe_bloom_scan(batch, bloom, "key")
        .select("kid", "maybe_dup")
        .collect()
    }
    assert a == b and len(a) == 3000


def test_scan_probe_adds_no_fact_side_exchange(spark):
    # the fact side of the scan probe must not shuffle: every Exchange
    # in the plan belongs to the (tiny) filter build, which ends in the
    # bit_or aggregate — walk the tree and assert no Exchange has the
    # fact scan as a descendant
    corpus = _keys(spark, "k", 2000)
    batch = _keys(spark, "b", 3000)
    bloom = BLOOM.build_bloom(corpus, "key").localCheckpoint(eager=False)
    plan = (
        BLOOM.probe_bloom_scan(batch, bloom, "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # chained broadcast hash joins, never a sort-merge join (which
    # would imply a fact-side exchange)
    assert plan.count("BroadcastHashJoin") == BLOOM.K_HASHES
    assert "SortMergeJoin" not in plan


def test_delivery_stream_ids_never_collide(spark, tmp_path):
    """r07 review regression, extended r08 to EVERY fleet site that
    manufactures synthetic ids: the synthetic streams must stay
    disjoint (from each other and, where they coexist with real ids,
    from the corpus id space) for ANY corpus id span. Under the old
    additive offsets (+100000/+200000), doc_id 14 (14%7==0 -> 200014)
    and doc_id 100014 (100014%3==0 -> 200014) collided, merging two
    rows' probe verdicts in probe_bloom's per-id bool_and. The
    injective constructions (disjoint residues doc_id*10+{1,2} /
    doc_id*2+{0,1}; negated ids -doc_id-1) cannot collide; this pins
    them on exactly the old counterexample by running each query on a
    wide-id-span fixture against its oracle."""
    import duckdb

    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import (
        ORACLES,
        QUERIES,
    )
    from tools.check_oracle import compare

    rows = [
        (14, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
        (100014, "a completely different document body here", "en", "web", 41),
        (3, "third doc delivered once and redelivered", "en", "books", 40),
        (13, "a thirteenth document to exercise the added branch", "en", "web", 50),
    ]
    d = tmp_path / "wide_ids"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"
    )

    sdf = QUERIES["bloom_incremental_dedup"](spark, str(d)).toPandas()
    assert sdf["doc_id"].is_unique, "synthetic batch ids collided"

    # every query that manufactures synthetic ids, vs its oracle on the
    # wide-span fixture (a collision shows up as a value mismatch)
    synthetic_id_sites = [
        "bloom_incremental_dedup",
        "incremental_curation_packing",
        "incremental_neardup_batch",
        "boilerplate_lines",
        "corpus_snapshot_diff",
    ]
    for name in synthetic_id_sites:
        got = compare(name, QUERIES[name](spark, str(d)).toPandas(),
                      con.sql(ORACLES[name]).df())
        assert not got, f"{name} diverged from oracle on wide-id fixture: {got}"
