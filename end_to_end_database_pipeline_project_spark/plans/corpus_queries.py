"""Round-3 corpus-curation operators: semantic dedup, importance
resampling, weighted reservoir sampling, and quantized ANN.

These complete the LLM-data surface with the *embedding-era* curation
passes a 100 TB training-data pipeline runs after the lexical ones
(``llm_data_queries``/``curation_queries``):

- **SemDeDup-style semantic dedup** — near-duplicate *meaning*, not
  text: pairwise cosine inside an embedding cluster, keep-lowest-id.
  The cluster bounds the quadratic (the whole point of the method);
  here the fixture's ``label`` column is the cluster assignment so the
  report is exactly oracle-checkable (the k-means variant of cluster
  assignment lives in ``ivf_kmeans_topk``, rows-only by nature).
- **DSIR-style hashed importance weights** — per-doc log-likelihood
  ratio of target-domain vs corpus bigram distributions over a hashed
  (256-bucket) feature space: the importance-resampling score used to
  up-weight target-like documents at mixture time.
- **Weighted reservoir sampling (A-ES)** — one-pass per-source top-k
  by ``u^(1/w)``: the distributed, deterministic (hash-seeded, no
  ``rand()``) form of weighted sampling-without-replacement.
- **Scalar-quantized (int8) ANN** — the 4x-compressed approximate
  scan with an in-query recall certificate against the exact top-k
  (the ``approx_distinct_orders`` certificate pattern).

All oracle-checked on ``documents`` / ``embeddings`` per the registry
conventions (identical aliases both sides, doubles rounded to 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine
from ..operators import similarity as SIM_PQ
from ..session import fan_out
from ..sources.catalog import load_table
from .registry import query

_R = 6

# The five "target-domain" sources for importance resampling.
_DSIR_TARGETS = ("src0", "src1", "src2", "src3", "src4")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return fan_out(e.withColumn("embedding", F.col("embedding").cast("array<double>")))


# ----------------------------------------------------- semantic dedup


@query(
    "semantic_dedup_report",
    oracle="""WITH p AS (
  SELECT a.label, a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.32
),
d AS (
  SELECT label,
         CAST(count(*) AS BIGINT) AS n_dup_pairs,
         CAST(count(DISTINCT vb) AS BIGINT) AS n_dropped
  FROM p GROUP BY 1
)
SELECT e.label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(coalesce(any_value(d.n_dup_pairs), 0) AS BIGINT) AS n_dup_pairs,
       CAST(coalesce(any_value(d.n_dropped), 0) AS BIGINT) AS n_dropped,
       CAST(count(*) - coalesce(any_value(d.n_dropped), 0) AS BIGINT) AS n_kept
FROM embeddings e LEFT JOIN d ON d.label = e.label
GROUP BY 1""",
)
def semantic_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication report: within each
    embedding cluster (the fixture ``label``), cosine >= 0.32 pairs are
    semantic duplicates and the higher id of each pair is dropped
    (keep-lowest-id, deterministic). Per cluster: vectors, duplicate
    pairs, dropped, kept.

    Scale shape: the pairwise probe is **cluster-bounded** — candidate
    pairs are sum(|c|^2/2) over clusters, never |corpus|^2/2 (with
    balanced k-means clusters at 100 TB, |c| ~ N/k and the probe is
    N^2/2k — the SemDeDup paper's cost model). One shuffle on
    ``label`` co-locates each cluster, then each cluster's pairwise
    cosine is ONE blocked NumPy GEMM inside ``applyInPandas``
    (``operators/similarity.cluster_dedup_stats``): the per-pair
    higher-order-function self-join form measured 146 s at K=16 stress
    (32k vectors, 51M pairs); the BLAS kernel does the identical math
    in ~2 s. Arrow-batched Python on the bounded per-cluster matrix —
    not a hot-path row-at-a-time UDF."""
    from ..operators import similarity as SIM

    emb = _emb(spark, sf_dir)
    stats = SIM.cluster_dedup_stats(emb, threshold=0.32, cluster_col="label")
    return stats.select(
        "label",
        "n_vecs",
        "n_dup_pairs",
        "n_dropped",
        (F.col("n_vecs") - F.col("n_dropped")).alias("n_kept"),
    )


# ------------------------------------------- DSIR importance weights


@query(
    "dsir_importance_weights",
    oracle=r"""WITH w AS (
  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS b
  FROM w WHERE len(ws) >= 2
),
bh AS (
  SELECT doc_id,
         source IN ('src0','src1','src2','src3','src4') AS is_tgt,
         (strpos('0123456789abcdef', substr(md5(b), 1, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(md5(b), 2, 1)) - 1 AS h
  FROM bg
),
bk AS (
  SELECT h,
         sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS tgt_n,
         count(*) AS all_n
  FROM bh GROUP BY 1
),
tot AS (SELECT sum(tgt_n) AS t_tot, sum(all_n) AS a_tot FROM bk),
bw AS (
  SELECT h, ln(((tgt_n + 1.0) / (t_tot + 256)) / ((all_n + 1.0) / (a_tot + 256))) AS lw
  FROM bk, tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(sum(lw) / count(*), 6) AS dsir_logweight
FROM bh JOIN bw USING (h)
GROUP BY 1""",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance-resampling weights: hash each document's
    bigrams into 256 buckets (first two hex chars of md5 — the
    engine-portable hash), estimate the target-domain (sources
    src0-src4) and whole-corpus bucket distributions with add-one
    smoothing, and score each doc by its mean log-likelihood ratio.
    Positive weight = looks like the target domain; the mixture sampler
    upweights accordingly.

    Scale shape: one bigram explode (the only row-multiplying step),
    then a 256-row bucket aggregate — partial map-side combine makes it
    one tiny shuffle — whose log-ratio table and the 1-row totals ride
    back as broadcasts. Per-doc scoring is a broadcast hash join + one
    groupBy(doc_id) that reuses the explode's partitioning. No Python,
    no rand(): the hash is the sample."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ws = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = docs.select("doc_id", "source", ws.alias("ws"))
    # the < 2-token guard lives INSIDE the array expression (empty array
    # -> explode emits nothing, identical to the old `where(size >= 2)`):
    # a `where` on the derived column gets pushed below the fan-out
    # exchange as `size(split(...)) >= 2`, re-running the regex split
    # over the whole corpus on the pre-repartition single split — twice,
    # once per pass (guide §2.3 project-before-the-exchange, inverted)
    bigram = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("ws", i), F.element_at("ws", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # the exploded bigram table feeds both the bucket aggregate and the
    # per-doc scoring join, and is deliberately RECOMPUTED for each (the
    # codegen'd explode is cheap): materializing it with localCheckpoint
    # measured 44.2 s at K=64 stress vs 4.3 s for this shipped form
    # (recomputed explode + window totals; 110M rows — per-row java
    # object materialization and GC dwarf the second explode).
    # At 100 TB the shared form is a PERSISTED PARQUET feature
    # table, never an executor-memory checkpoint of token-grain rows.
    bh = (
        base.select(
            "doc_id",
            F.col("source").isin(*_DSIR_TARGETS).alias("is_tgt"),
            F.explode(bigram).alias("b"),
        )
        .withColumn("h", F.conv(F.substring(F.md5("b"), 1, 2), 16, 10).cast("int"))
        .select("doc_id", "is_tgt", "h")
    )
    bk = bh.groupBy("h").agg(
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("tgt_n"),
        F.count(F.lit(1)).alias("all_n"),
    )
    # corpus totals as a window over the 256-row bucket table (NOT a
    # separate aggregate, which would re-run the bigram explode a third
    # time): the unpartitioned frame is fine at 256 rows forever.
    w_all = Window.partitionBy()
    bw = bk.select(
        "h",
        F.log(
            ((F.col("tgt_n") + 1.0) / (F.sum("tgt_n").over(w_all) + 256))
            / ((F.col("all_n") + 1.0) / (F.sum("all_n").over(w_all) + 256))
        ).alias("lw"),
    )
    return (
        bh.join(F.broadcast(bw), "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("lw") / F.count(F.lit(1)), _R).alias("dsir_logweight"),
        )
    )


# ------------------------------------- weighted reservoir sampling


@query(
    "source_weighted_topk_sample",
    oracle="""WITH k AS (
  SELECT source, doc_id,
         pow(
           ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 + 1.0)
             / 257.0,
           100.0 / least(n_chars, 500)
         ) AS sample_key
  FROM documents
),
r AS (
  SELECT source, doc_id, sample_key,
         row_number() OVER (PARTITION BY source
                            ORDER BY sample_key DESC, doc_id) AS sample_rank
  FROM k
)
SELECT source, CAST(sample_rank AS BIGINT) AS sample_rank, doc_id,
       round(sample_key, 6) AS sample_key
FROM r WHERE sample_rank <= 5""",
)
def source_weighted_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, one pass, deterministic:
    the A-ES reservoir scheme — each doc draws u in (0,1] from a hash
    of its id (md5, not rand(): retry-safe) and keeps key = u^(1/w)
    with weight w = min(n_chars, 500)/100; the top-5 keys per source
    are an exact weighted sample without replacement.

    Scale shape: per-group top-k is a rank-limit window —
    Spark 4 rewrites ``row_number() <= k`` into WindowGroupLimit
    (running top-k per partition, then per group), so no group is ever
    fully sorted or materialized. One shuffle on ``source``; the
    reservoir property is what makes this a *streaming* sampler at
    100 TB — partial top-5s merge associatively across partitions."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast(
            "double"
        )
        + 1.0
    ) / 257.0
    w = F.least(F.col("n_chars"), F.lit(500)) / 100.0
    keyed = docs.select(
        "source", "doc_id", F.pow(u, F.lit(1.0) / w).alias("sample_key")
    )
    win = Window.partitionBy("source").orderBy(
        F.desc("sample_key"), F.asc("doc_id")
    )
    return (
        keyed.withColumn("sample_rank", F.row_number().over(win))
        .where(F.col("sample_rank") <= 5)
        .select(
            "source",
            F.col("sample_rank").cast("long").alias("sample_rank"),
            "doc_id",
            F.round("sample_key", _R).alias("sample_key"),
        )
    )


# ------------------------------------------- scalar-quantized ANN


@query(
    "sq8_ann_topk",
    oracle="""WITH p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cid,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])) AS cos
  FROM embeddings q
  JOIN embeddings c ON c.vec_id != q.vec_id
  WHERE q.vec_id < 5
),
r AS (
  SELECT query_id, cid,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cid) AS rk
  FROM p
)
SELECT query_id,
       CAST(max(CASE WHEN rk = 1 THEN cid END) AS BIGINT) AS exact_top1,
       TRUE AS recall_ge_07
FROM r GROUP BY 1""",
)
def sq8_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8) approximate nearest neighbor with an
    in-query recall certificate. Corpus vectors are compressed 4x:
    per-dimension min/max (one aggregate pass) map each float to an
    8-bit code; the approximate scan scores dequantized codes. For the
    first 5 query vectors the query computes BOTH rankings — exact
    cosine and quantized cosine — and certifies recall@10 >= 0.7; the
    oracle independently derives the exact top-1 and asserts the
    certificate as a constant (the ``approx_distinct_orders``
    bounded-error pattern: a broken quantizer flips the boolean and
    fails the value hash).

    Scale shape: quantization stats are a 64-row aggregate collected
    into one broadcast row; encoding is a single ``transform`` over the
    scan (no shuffle); at 100 TB the int8 codes are the resident
    index (4x smaller cache footprint) and this ADC scan composes with
    the IVF bucketing in ``operators/similarity.py`` — probe a cluster,
    score codes, re-rank survivors with exact floats."""
    emb = _emb(spark, sf_dir)
    dims = emb.select(F.posexplode("embedding").alias("dim", "v"))
    stats = (
        dims.groupBy("dim")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mn"))), lambda s: s.mn
            ).alias("mns"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mx"))), lambda s: s.mx
            ).alias("mxs"),
        )
        # r11: the one-row per-dim min/max artifact is materialized once
        # (localCheckpoint, ~1 KB) — its posexplode + two-level aggregate
        # used to run as a separate job under BOTH the corpus-encode and
        # the broadcast probe-encode subtrees.
        .localCheckpoint()
    )
    # quantize q_i = round(255*(x_i-mn_i)/(mx_i-mn_i)); score on the
    # dequantized reconstruction (ADC). element_at is 1-based.
    dq = F.transform(
        "embedding",
        lambda x, i: F.element_at("mns", i + 1)
        + F.round(
            F.lit(255.0)
            * (x - F.element_at("mns", i + 1))
            / (F.element_at("mxs", i + 1) - F.element_at("mns", i + 1)),
            0,
        )
        * (F.element_at("mxs", i + 1) - F.element_at("mns", i + 1))
        / 255.0,
    )
    enc = emb.crossJoin(F.broadcast(stats)).select(
        "vec_id", "embedding", dq.alias("dq")
    )
    queries = enc.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("dq").alias("q_dq"),
    )
    pairs = enc.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        cosine(F.col("embedding"), F.col("q_emb")).alias("exact_cos"),
        cosine(F.col("dq"), F.col("q_dq")).alias("approx_cos"),
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.desc("exact_cos"), F.asc("vec_id")
    )
    w_approx = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("vec_id")
    )
    ranked = pairs.select(
        "query_id",
        "vec_id",
        F.row_number().over(w_exact).alias("exact_rk"),
        F.row_number().over(w_approx).alias("approx_rk"),
    ).where((F.col("exact_rk") <= 10) | (F.col("approx_rk") <= 10))
    # recall denominator = number of TRUE top-10 neighbors, not a flat
    # 10: on a corpus with fewer than 11 vectors a query has < 10
    # candidates and dividing by 10 fails the certificate vacuously
    # (identical on any fixture with >= 11 vectors, where the exact
    # top-10 always has 10 rows)
    n_true = F.sum(F.when(F.col("exact_rk") <= 10, 1).otherwise(0))
    return ranked.groupBy("query_id").agg(
        F.max(F.when(F.col("exact_rk") == 1, F.col("vec_id"))).alias("exact_top1"),
        (
            F.sum(
                F.when((F.col("exact_rk") <= 10) & (F.col("approx_rk") <= 10), 1).otherwise(0)
            )
            / n_true.cast("double")
            >= 0.7
        ).alias("recall_ge_07"),
    )


_LOGREG_FEATS_SQL = """feats AS (
  SELECT 1.0 AS x0,
         ln(1 + length(text)) AS x1,
         length(regexp_replace(text, '[a-zA-Z ]', '', 'g'))
           * 1.0 / (length(text) + 1) AS x2,
         (length(text) - length(replace(text, ' ', '')))
           * 1.0 / (length(text) + 1) AS x3,
         CASE WHEN source IN ('src0','src1','src2','src3','src4')
              THEN 1.0 ELSE 0.0 END AS y
  FROM documents
)"""


def _logreg_iter_sql(r: int) -> str:
    """One unrolled batch-GD iteration for the DuckDB oracle: sigmoid
    of the previous weights' dot product, gradient sums, step."""
    return f"""
g{r} AS (
  SELECT w{r - 1}.w0 - 1.0 * sum((1.0 / (1.0 + exp(-(w{r - 1}.w0 * x0
           + w{r - 1}.w1 * x1 + w{r - 1}.w2 * x2 + w{r - 1}.w3 * x3))) - y)
           * x0) / count(*) AS w0,
         w{r - 1}.w1 - 1.0 * sum((1.0 / (1.0 + exp(-(w{r - 1}.w0 * x0
           + w{r - 1}.w1 * x1 + w{r - 1}.w2 * x2 + w{r - 1}.w3 * x3))) - y)
           * x1) / count(*) AS w1,
         w{r - 1}.w2 - 1.0 * sum((1.0 / (1.0 + exp(-(w{r - 1}.w0 * x0
           + w{r - 1}.w1 * x1 + w{r - 1}.w2 * x2 + w{r - 1}.w3 * x3))) - y)
           * x2) / count(*) AS w2,
         w{r - 1}.w3 - 1.0 * sum((1.0 / (1.0 + exp(-(w{r - 1}.w0 * x0
           + w{r - 1}.w1 * x1 + w{r - 1}.w2 * x2 + w{r - 1}.w3 * x3))) - y)
           * x3) / count(*) AS w3
  FROM feats CROSS JOIN w{r - 1}
  GROUP BY w{r - 1}.w0, w{r - 1}.w1, w{r - 1}.w2, w{r - 1}.w3
),
w{r} AS (SELECT * FROM g{r})"""


@query(
    "quality_logreg_classifier",
    oracle="WITH "
    + _LOGREG_FEATS_SQL
    + ", w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),"
    + ",".join(_logreg_iter_sql(r) for r in (1, 2, 3))
    + """
SELECT round(w0, 6) AS w_bias, round(w1, 6) AS w_loglen,
       round(w2, 6) AS w_nonalpha, round(w3, 6) AS w_space,
       round(avg(-y * ln(p) - (1 - y) * ln(1 - p)), 6) AS train_logloss,
       round(avg(CASE WHEN (p >= 0.5) = (y = 1.0)
             THEN 1.0 ELSE 0.0 END), 6) AS train_acc,
       CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT w.w0 AS w0, w.w1 AS w1, w.w2 AS w2, w.w3 AS w3, y,
         greatest(least(1.0 / (1.0 + exp(-(w.w0 * x0 + w.w1 * x1
           + w.w2 * x2 + w.w3 * x3))), 1.0 - 1e-12), 1e-12) AS p
  FROM feats CROSS JOIN w3 w
) t
GROUP BY w0, w1, w2, w3""",
)
def quality_logreg_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-plan iterative ML: a quality/domain classifier (the
    fastText-classifier shape behind classifier-based corpus filtering
    — CCNet, DCLM, FineWeb-Edu) trained as 3 batch-gradient-descent
    logistic-regression iterations entirely inside the plan. Features
    are cheap text statistics (bias, log-length, non-alpha ratio,
    whitespace ratio); the label is membership in the DSIR target
    sources; output is the trained weights plus train log-loss and
    accuracy.

    Scale shape: each iteration is ONE corpus aggregate producing a
    4-value gradient (map-side combined), with the weights riding as a
    one-row broadcast into the next pass — 3 iterations = 3 scans,
    zero driver round-trips, no collect. This is the sufficient-
    statistics discipline every distributed GLM trainer uses (Spark
    MLlib's LBFGS does the same treeAggregate per iteration); the
    oracle unrolls the identical recurrence in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    ln = F.length("text")
    feats = fan_out(docs).select(
        F.lit(1.0).alias("x0"),
        F.log1p(ln).alias("x1"),
        (
            F.length(F.regexp_replace("text", "[a-zA-Z ]", ""))
            / (ln + 1)
        ).alias("x2"),
        (
            (ln - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
            / (ln + 1)
        ).alias("x3"),
        F.col("source").isin(*_DSIR_TARGETS).cast("double").alias("y"),
        # r11: materialize the 5-double feature table once — every GD
        # iteration and the final scoring pass used to re-run the two
        # regexp sweeps over the raw text (4x the feature cost; at
        # scale this is the cached training matrix every GLM trainer
        # materializes before iterating)
    ).localCheckpoint()
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{i}") for i in range(4)]
    )
    sig = None
    for _ in range(3):
        joined = feats.crossJoin(F.broadcast(w))
        z = sum(F.col(f"w{i}") * F.col(f"x{i}") for i in range(4))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = joined.groupBy(*[f"w{i}" for i in range(4)]).agg(
            *[
                F.sum((p - F.col("y")) * F.col(f"x{i}")).alias(f"g{i}")
                for i in range(4)
            ],
            F.count(F.lit(1)).alias("n"),
        ).select(
            *[
                (F.col(f"w{i}") - F.lit(1.0) * F.col(f"g{i}") / F.col("n")).alias(
                    f"w{i}"
                )
                for i in range(4)
            ]
        )
    joined = feats.crossJoin(F.broadcast(w))
    z = sum(F.col(f"w{i}") * F.col(f"x{i}") for i in range(4))
    # clamp the scoring sigmoid away from exact 0/1: a saturated p
    # makes Spark's log(0) return NULL (row silently dropped from the
    # avg) while DuckDB's ln(0) raises — the clamp keeps both engines
    # on the same finite arithmetic (gradients need no clamp: they
    # never take a log)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    p = F.least(F.greatest(p, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    y = F.col("y")
    return joined.groupBy(*[f"w{i}" for i in range(4)]).agg(
        F.round(
            F.avg(-y * F.log(p) - (F.lit(1.0) - y) * F.log(F.lit(1.0) - p)), _R
        ).alias("train_logloss"),
        F.round(
            F.avg(
                F.when((p >= 0.5) == (y == 1.0), F.lit(1.0)).otherwise(0.0)
            ),
            _R,
        ).alias("train_acc"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).select(
        F.round("w0", _R).alias("w_bias"),
        F.round("w1", _R).alias("w_loglen"),
        F.round("w2", _R).alias("w_nonalpha"),
        F.round("w3", _R).alias("w_space"),
        "train_logloss",
        "train_acc",
        "n_docs",
    )


@query(
    "pq_adc_topk",
    oracle="""WITH p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cid,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])) AS cos
  FROM embeddings q
  JOIN embeddings c ON c.vec_id != q.vec_id
  WHERE q.vec_id < 5
),
r AS (
  SELECT query_id, cid,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cid) AS rk
  FROM p
)
SELECT query_id,
       CAST(max(CASE WHEN rk = 1 THEN cid END) AS BIGINT) AS exact_top1,
       TRUE AS recall_ge_04
FROM r GROUP BY 1""",
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN with asymmetric distance computation — the
    compression scheme behind billion-scale IVF-PQ indexes (Jégou et
    al., TPAMI 2011): each 64-d vector splits into m=16 4-d subvectors,
    each encoded as its nearest centroid among k=256 per-subspace
    codewords, so a vector stores as 16 bytes (16x under float32).
    The codebook here is deterministic — the first 256 corpus vectors'
    subvectors (a sampled codebook, k-means init without iterations) —
    keeping the whole query engine-reproducible; a k-means refinement
    drops in without changing the plan shape (see ``ivf_kmeans_topk``).

    Certificate: for 5 probe vectors the query ranks candidates BOTH
    ways — exact cosine and reconstructed (ADC) cosine — and certifies
    recall@10 >= 0.4 per probe (measured 0.5–0.9 across sf0.001–0.1);
    the oracle independently derives the exact top-1 and asserts the
    certificate constant, so a broken encoder fails the value hash.

    Scale shape: the codebook is a one-row task-closure constant
    (16x256x4 doubles); encoding is a batched Arrow/NumPy argmin kernel
    (``pq_apply``, guide §4.2 — no shuffle, one vectorized sweep per
    batch); at 100 TB the 16-byte codes are the resident index and
    this ADC scan slots behind the IVF bucketing as the in-cluster
    scorer, with exact re-rank on the top survivors."""
    emb = _emb(spark, sf_dir)
    # r11: build the codebook once (a `vec_id < 5` filter cannot be
    # pushed below the opaque Arrow encode, so the probe side filters
    # first). r12 (VERDICT r11 "Next round #5"): the broadcast pair
    # join + two interpreted HOF cosines per pair are FUSED into the
    # encode kernel — one Python crossing encodes each corpus batch
    # and scores it against the 5 probes as vectorized batch×probe
    # products (`pq_adc_pair_scores`); the probe side is a bounded
    # driver-side slab (the `near_dup_pairs_pandas` shape) encoded
    # with the same kernel body. Rank parity vs the unfused plan is
    # pinned in tests/test_r12_pq_paths.py.
    cb = SIM_PQ.pq_codebook(emb).localCheckpoint()
    queries_pdf = (
        emb.where(F.col("vec_id") < 5).select("vec_id", "embedding").toPandas()
    )
    pairs = SIM_PQ.pq_adc_pair_scores(emb, cb, queries_pdf)
    w_exact = Window.partitionBy("query_id").orderBy(
        F.desc("exact_cos"), F.asc("vec_id")
    )
    w_approx = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("vec_id")
    )
    ranked = pairs.select(
        "query_id",
        "vec_id",
        F.row_number().over(w_exact).alias("exact_rk"),
        F.row_number().over(w_approx).alias("approx_rk"),
    ).where((F.col("exact_rk") <= 10) | (F.col("approx_rk") <= 10))
    # recall denominator = actual exact-top-10 size (see sq8_ann_topk):
    # flat /10 vacuously fails the certificate on a sub-11-vector corpus
    n_true = F.sum(F.when(F.col("exact_rk") <= 10, 1).otherwise(0))
    return ranked.groupBy("query_id").agg(
        F.max(F.when(F.col("exact_rk") == 1, F.col("vec_id"))).alias(
            "exact_top1"
        ),
        (
            F.sum(
                F.when(
                    (F.col("exact_rk") <= 10) & (F.col("approx_rk") <= 10), 1
                ).otherwise(0)
            )
            / n_true.cast("double")
            >= 0.4
        ).alias("recall_ge_04"),
    )


@query(
    "ivfpq_topk",
    oracle="""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, v, centroid_id AS cluster_id FROM (
    SELECT e.vec_id, e.v, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                      cent.centroid_id) AS rn
    FROM e CROSS JOIN cent
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, v AS qv, cluster_id AS q_cluster
  FROM assigned WHERE vec_id < 5
),
scored AS (
  SELECT query_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(qv, a.v) AS cos
  FROM assigned a JOIN q
    ON a.cluster_id = q.q_cluster AND a.vec_id <> q.query_id
),
r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id,
       CAST(max(CASE WHEN rk = 1 THEN neighbor_id END) AS BIGINT)
         AS bucket_top1,
       TRUE AS recall_ge_04
FROM r GROUP BY 1""",
)
def ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the composition behind billion-scale ANN indexes (FAISS
    IVFPQ, Jégou et al.) — a coarse quantizer (8 seed centroids)
    restricts each query to its Voronoi bucket, and within the bucket
    candidates are ranked by TRUE asymmetric distance computation:
    exact query vector against PQ-reconstructed candidates (16x4-d
    subspaces, 256 codewords each, via the shared ``pq_apply`` Arrow/NumPy kernel).

    Certificate: for 5 probe vectors the query ranks the bucket BOTH
    ways — exact cosine and ADC — and certifies per-probe recall@10
    >= 0.4 (measured 0.5-0.9 across sf0.001-0.1); the oracle
    independently derives the coarse assignment and the exact
    within-bucket top-1, so a broken coarse quantizer OR a broken
    encoder fails the value hash.

    Scale shape: the PQ codebook and the 8 centroids are one-row
    broadcasts; assignment is a codegen'd expression on the scan and
    the encode a batched Arrow/NumPy kernel (guide §4.2); the candidate join hits only the query's bucket (cost
    divides by the cluster count — nprobe rides the same dial as
    ``ivf_multiprobe_topk``); at 100 TB the 16-byte codes are the
    resident index, buckets are the partitioning key, and the exact
    re-rank touches only ADC survivors."""
    emb = _emb(spark, sf_dir)
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("centroid_id")
    )
    # r11 (guide §1.2): coarse-assign on the RAW vectors first — the
    # expensive PQ encode (16 x 256 codeword argmin per row) used to
    # ride into this window AND be re-derived under the broadcast query
    # subtree, where the probe columns don't even use dq. Encoding now
    # happens once, AFTER the bucket join, so only rows in a probed
    # bucket ever pay it (exactly the rows whose dq the scorer reads —
    # per-row dq is deterministic, so the output is unchanged).
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "centroid_id",
            cosine(F.col("embedding"), F.col("cv")).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("centroid_id").alias("cluster_id"))
        # materialized once (localCheckpoint): the assignment IS the
        # resident IVF index at scale; without it the broadcast probe
        # subtree re-runs the centroid join + window as separate jobs
        # (measured ~2x on the whole query at sf0.1)
        .localCheckpoint()
    )
    queries = assigned.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cluster_id").alias("q_cluster"),
    )
    bucket = assigned.join(
        F.broadcast(queries),
        (F.col("cluster_id") == F.col("q_cluster"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select("vec_id", "embedding", "query_id", "q_emb")
    cb = SIM_PQ.pq_codebook(emb).localCheckpoint()
    # the encode is CPU-heavy per row while the bucket rows are tiny in
    # bytes — AQE's byte-based coalescing funnels them into a few
    # post-shuffle partitions and serializes the argmin sweeps (AQE
    # sizes by bytes, blind to per-row CPU), so spread the survivors
    # with an explicit round-robin repartition, which AQE does not
    # coalesce (measured 6.5 s -> sub-second at sf0.1; the shuffle
    # moves only the bucket survivors)
    spread = bucket.repartition(
        spark.sparkContext.defaultParallelism
    )
    cands = SIM_PQ.pq_apply(
        spread, cb, extra_cols=("query_id", "q_emb")
    ).select(
        "query_id",
        "vec_id",
        cosine(F.col("embedding"), F.col("q_emb")).alias("exact_cos"),
        # TRUE ADC: exact query vector vs reconstructed candidate
        cosine(F.col("dq"), F.col("q_emb")).alias("adc_cos"),
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.desc("exact_cos"), F.asc("vec_id")
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cos"), F.asc("vec_id")
    )
    ranked = cands.select(
        "query_id",
        "vec_id",
        F.row_number().over(w_exact).alias("exact_rk"),
        F.row_number().over(w_adc).alias("adc_rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("query_id"))
        .alias("n_cand"),
    ).where((F.col("exact_rk") <= 10) | (F.col("adc_rk") <= 10))
    return ranked.groupBy("query_id").agg(
        F.max(F.when(F.col("exact_rk") == 1, F.col("vec_id"))).alias(
            "bucket_top1"
        ),
        (
            F.sum(
                F.when(
                    (F.col("exact_rk") <= 10) & (F.col("adc_rk") <= 10), 1
                ).otherwise(0)
            )
            / F.least(F.lit(10), F.max("n_cand"))
            >= 0.4
        ).alias("recall_ge_04"),
    )


# ----------------------------------------- source-overlap governance


@query(
    "source_overlap_matrix",
    oracle="""WITH h AS (
  SELECT DISTINCT source, md5(text) AS ch FROM documents
),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY 1),
common AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM h a JOIN h b ON a.ch = b.ch AND a.source < b.source
  GROUP BY 1, 2
)
SELECT c.source_a, c.source_b, c.n_shared,
       round(c.n_shared * 1.0 / (sa.n + sb.n - c.n_shared), 6)
         AS content_jaccard
FROM common c
JOIN sz sa ON sa.source = c.source_a
JOIN sz sb ON sb.source = c.source_b""",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level duplication governance: for every source pair that
    shares verbatim content, the shared-document count and content
    Jaccard — the "which feeds mirror each other" view that decides
    whether a new crawl source adds anything (license audits and
    mixture design both start here).

    Scale shape: docs collapse to DISTINCT (source, content-hash) rows
    first — the join runs on the hash key over the collapsed table, so
    a source-pair's cost is its shared-hash count, never |source_a| x
    |source_b|; per-source sizes ride back as a broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        docs.select("source", F.md5("text").alias("ch"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sz = h.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = h.select(F.col("source").alias("source_a"), "ch")
    b = h.select(F.col("source").alias("source_b"), "ch")
    common = (
        a.join(b, "ch")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        common.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")),
                _R,
            ).alias("content_jaccard"),
        )
    )


# ----------------------------------------- cross-source quantile norm


@query(
    "quantile_normalized_scores",
    oracle="""WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ntile(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id)
           AS bucket
  FROM documents
),
src_bucket AS (
  SELECT source, bucket, avg(n_chars) AS src_mean
  FROM ranked GROUP BY 1, 2
),
ref AS (SELECT bucket, avg(src_mean) AS ref_mean FROM src_bucket GROUP BY 1)
SELECT bucket, round(ref_mean, 6) AS ref_mean,
       round(max(abs(src_mean - ref_mean)), 6) AS max_source_dev,
       CAST(count(*) AS BIGINT) AS n_sources
FROM src_bucket JOIN ref USING (bucket)
GROUP BY bucket, ref_mean""",
)
def quantile_normalized_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources (the microarray-classic
    calibration, applied to corpus curation): per-source score
    distributions are mapped onto a common reference curve — the
    cross-source mean of each decile's mean — so one global quality
    threshold means the same thing for every feed. A raw threshold on
    heterogeneous sources silently over-prunes the verbose feeds and
    under-prunes the terse ones; the per-decile reference curve plus
    each source's max deviation from it is the calibration report that
    says how badly, and supplies the mapping that fixes it.

    Scale shape: the rank pass is a per-source window (each source
    sorts independently under one shuffle by source key — at extreme
    per-source cardinality the same decile assignment comes from
    approx_percentile boundaries instead, trading exactness for a
    sort-free pass); everything after operates on |sources| x 10 rows.
    Deterministic tie-break (n_chars, doc_id) pins ntile assignment
    bit-for-bit across engines."""
    docs = load_table(spark, sf_dir, "documents")
    ranked = docs.select(
        "source",
        "n_chars",
        F.ntile(10)
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("bucket"),
    )
    # materialize the |sources| x 10 bucket table: it feeds both the
    # reference-curve aggregate and the deviation join, and without the
    # checkpoint each consumer re-runs the corpus-sized rank window.
    # (The inverse of the DSIR rule: HERE the shared subplan is tiny
    # and the recompute is the expensive part — materialize it.)
    src_bucket = (
        ranked.groupBy("source", "bucket")
        .agg(F.avg("n_chars").alias("src_mean"))
        .localCheckpoint(eager=False)
    )
    ref = src_bucket.groupBy("bucket").agg(F.avg("src_mean").alias("ref_mean"))
    return (
        src_bucket.join(F.broadcast(ref), "bucket")
        .groupBy("bucket", "ref_mean")
        .agg(
            F.round(F.max(F.abs(F.col("src_mean") - F.col("ref_mean"))), _R).alias(
                "max_source_dev"
            ),
            F.count(F.lit(1)).alias("n_sources"),
        )
        .select(
            "bucket",
            F.round("ref_mean", _R).alias("ref_mean"),
            "max_source_dev",
            "n_sources",
        )
    )


# ------------------------------------------- embedding-quality evaluation
#
# The eval side of the embedding-era pipeline: before an embedding table
# is trusted for semantic dedup / retrieval / mixing decisions, measure
# how well its geometry reflects the labels — kNN leave-one-out
# accuracy, nearest-centroid confusion, and the principal spectrum.


@query(
    "knn_label_accuracy",
    oracle="""WITH q AS (
  SELECT vec_id AS query_id, label AS true_label,
         CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 50
),
scored AS (
  SELECT query_id, true_label, e.label AS nlabel, e.vec_id AS nid,
         list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS cos
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
top5 AS (
  SELECT query_id, true_label, nlabel
  FROM (SELECT query_id, true_label, nlabel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, nid) AS rnk
        FROM scored)
  WHERE rnk <= 5
),
votes AS (
  SELECT query_id, true_label, nlabel, count(*) AS v
  FROM top5 GROUP BY 1, 2, 3
)
SELECT query_id, CAST(true_label AS INT) AS true_label,
       CAST(nlabel AS INT) AS predicted_label,
       CAST(v AS BIGINT) AS votes,
       CAST(CASE WHEN true_label = nlabel THEN 1 ELSE 0 END AS INT)
         AS correct
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY v DESC, nlabel) AS pr
      FROM votes)
WHERE pr = 1""",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN leave-one-out label evaluation — the standard embedding
    quality probe: for each of the first 50 vectors, take the 5 nearest
    corpus neighbors by cosine (self excluded) and predict the majority
    label (vote-count desc, label asc tie-break). Per probe: true vs
    predicted label, winning vote count, correctness flag.

    Plan shape: probes broadcast against one corpus pass (the
    ``brute_force_topk`` kernel), vote counting and the argmax are
    per-probe windows over <= 5-row frames. At 100 TB the probe set
    stays O(sample) by construction — accuracy is estimated on a fixed
    probe sample, never all-pairs."""
    from ..operators import similarity as SIM

    emb = _emb(spark, sf_dir)
    probes = emb.where(F.col("vec_id") < 50)
    top5 = SIM.brute_force_topk(emb, probes, k=5)
    labels = emb.select("vec_id", "label")
    votes = (
        top5.join(
            F.broadcast(labels.withColumnRenamed("vec_id", "neighbor_id")),
            "neighbor_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("v"), F.asc("label"))
    pred = (
        votes.withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") == 1)
        .select(
            "query_id",
            F.col("label").alias("predicted_label"),
            F.col("v").cast("long").alias("votes"),
        )
    )
    truth = labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    ).where(F.col("query_id") < 50)
    return (
        pred.join(F.broadcast(truth), "query_id")
        .select(
            "query_id",
            F.col("true_label").cast("int"),
            F.col("predicted_label").cast("int"),
            "votes",
            (F.col("true_label") == F.col("predicted_label"))
            .cast("int")
            .alias("correct"),
        )
    )


@query(
    "centroid_classifier_confusion",
    oracle="""WITH dims AS (
  SELECT label, u['i'] AS i, avg(u['v']) AS m
  FROM (SELECT label,
               unnest(list_transform(range(1, len(embedding) + 1),
                      k -> {'i': k,
                            'v': CAST(embedding[CAST(k AS INT)] AS DOUBLE)}))
                 AS u
        FROM embeddings)
  GROUP BY 1, 2
),
cent AS (
  SELECT label AS c_label, list(m ORDER BY i) AS cv FROM dims GROUP BY 1
),
assigned AS (
  SELECT e.vec_id, e.label AS true_label, c.c_label,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) AS cos
  FROM embeddings e CROSS JOIN cent c
),
best AS (
  SELECT vec_id, true_label, c_label AS assigned_label
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, c_label) AS rn
        FROM assigned)
  WHERE rn = 1
)
SELECT CAST(true_label AS INT) AS true_label,
       CAST(assigned_label AS INT) AS assigned_label,
       CAST(count(*) AS BIGINT) AS n
FROM best GROUP BY 1, 2""",
)
def centroid_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classifier confusion matrix: per-label
    mean embeddings as class prototypes, every vector assigned to its
    highest-cosine centroid (centroid-label tie-break), confusion
    grouped by (true, assigned). The off-diagonal mass is the classic
    label-noise / cluster-overlap diagnostic run before trusting labels
    for stratified mixing.

    Plan shape: centroids are a per-(label, dim) mean — one posexplode
    + two narrow groupBys, output O(labels x dim); assignment is a
    broadcast of the tiny centroid table against one corpus pass with a
    per-vector argmax window over |labels| rows. No corpus self-join
    anywhere."""
    emb = _emb(spark, sf_dir)
    dims = (
        emb.select("label", F.posexplode("embedding").alias("i", "v"))
        .groupBy("label", "i")
        .agg(F.avg("v").alias("m"))
    )
    cent = (
        dims.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("i"), F.col("m")))
            ).alias("pairs")
        )
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(pairs, p -> p.m)").alias("cv"),
        )
    )
    assigned = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.col("label").alias("true_label"),
        "c_label",
        cosine(F.col("embedding"), F.col("cv")).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("c_label"))
    best = (
        assigned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("true_label", F.col("c_label").alias("assigned_label"))
    )
    return best.groupBy(
        F.col("true_label").cast("int").alias("true_label"),
        F.col("assigned_label").cast("int").alias("assigned_label"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@query("embedding_pca_certificate")  # rows-only: eigendecomposition is
# not ANSI-SQL-expressible; the result carries its own certificate
def embedding_pca_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Principal spectrum of the embedding covariance with an IN-QUERY
    CERTIFICATE (the ``approx_distinct_orders`` pattern for
    non-SQL-expressible results): top-4 eigenpairs of the d x d
    covariance, each row carrying its eigen-residual
    ||C v - lambda v|| and a ``certified`` flag (residual <= 1e-8 x
    lambda_max), plus the explained-variance ratio against trace(C) —
    so the checker can validate the eigendecomposition claim without
    re-deriving it.

    Scale split: the corpus-sized work is ONE distributed pass — the
    augmented-Gramian kernel (``operators/similarity.partial_gramian``:
    per-batch GEMM of [X|1], upper-triangle partials merged by a
    groupBy sum into (d+1)^2/2 rows). The O(d^3) eigendecomposition is
    corpus-size-independent and runs in a single-task ``mapInPandas``
    over the coalesced Gramian rows, so the whole query is LAZY like
    every other registered plan — building it (plan dumps, EXPLAIN
    tooling, the scan audit) costs nothing; the corpus scan happens
    only on action. PCA over 100 TB of embeddings is exactly this
    shape (the alternative — collecting vectors — is the driver OOM
    this repo's scan audit forbids)."""
    from ..operators.similarity import partial_gramian

    emb = _emb(spark, sf_dir)
    gram = partial_gramian(emb).coalesce(1)  # (d+1)^2/2 rows — O(d^2)

    def eigen_kernel(batches):
        import numpy as np
        import pandas as pd

        parts = list(batches)
        if not parts:  # empty source partition: no output rows
            return
        rows = pd.concat(parts, ignore_index=True)
        d1 = int(rows["i"].max()) + 1
        g = np.zeros((d1, d1))
        for i, j, s in zip(rows["i"], rows["j"], rows["s"]):
            g[int(i), int(j)] = s
            g[int(j), int(i)] = s
        n = g[d1 - 1, d1 - 1]
        mean = g[:-1, d1 - 1] / n
        cov = g[:-1, :-1] / n - np.outer(mean, mean)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:4]
        trace = float(np.trace(cov))
        lam_max = float(evals[order[0]])
        out = []
        for rank, idx in enumerate(order, start=1):
            lam, v = float(evals[idx]), evecs[:, idx]
            resid = float(np.linalg.norm(cov @ v - lam * v))
            out.append(
                (
                    rank,
                    round(lam, 9),
                    round(lam / trace, 9),
                    round(resid, 12),
                    bool(resid <= 1e-8 * max(lam_max, 1e-300)),
                )
            )
        yield pd.DataFrame(
            out,
            columns=[
                "component",
                "eigenvalue",
                "explained_var_ratio",
                "residual_norm",
                "certified",
            ],
        )

    return gram.mapInPandas(
        eigen_kernel,
        schema="component int, eigenvalue double, explained_var_ratio double,"
        " residual_norm double, certified boolean",
    )


# ------------------------------------------------- corpus-growth laws


# --- shared guarded log-log OLS (heaps_law_fit + zipf_law_fit) --------
#
# Single source of truth for the degeneracy-guarded power-law fit, in
# BOTH dialects, so the four copies (2 queries x plan/oracle) cannot
# drift (the r06 review caught exactly such a drift: the Spark r2
# carried ANSI-division shields the oracle CASE lacked). Degeneracy
# signal discipline: the EXACT countDistinct of the fit inputs (dx/dy),
# never `variance == 0` on floats — over identical inputs the variance
# is summation noise whose zeroness varies by engine and run; the ==0
# disjuncts remain only as division shields (DuckDB yields NULL on /0,
# Spark under ANSI would raise).

# DuckDB fragment: consumes a `fit` CTE with (n, sx, sy, sxx, sxy, syy,
# dx, dy); yields `sl` with (num, xden, yden, slope_raw) plus the three
# guarded output expressions (interpolate with .format(slope=..)).
_OLS_SL_CTE = """sl AS (
  SELECT n, sx, sy, dx, dy,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS xden,
         n * syy - sy * sy AS yden,
         CASE WHEN dx <= 1 OR n * sxx - sx * sx = 0 THEN 0.0
              ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope_raw
  FROM fit
)"""
_OLS_SLOPE_SQL = "round(slope_raw, 6) + 0.0"
_OLS_SCALE_SQL = "round(exp((sy - slope_raw * sx) / n), 6) + 0.0"
_OLS_R2_SQL = (
    "round(CASE WHEN dx <= 1 OR dy <= 1 OR xden = 0 OR yden = 0 THEN 1.0"
    " ELSE num * num / (xden * yden) END, 6) + 0.0"
)

# the matching fit-CTE aggregate list (both engines aggregate the same
# six sufficient statistics plus the two distinct counts)
_OLS_FIT_SQL = """  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy,
         count(DISTINCT x) AS dx, count(DISTINCT y) AS dy
  FROM ll"""


def _ols_fit_agg(ll):
    """The Spark twin of ``_OLS_FIT_SQL``: one aggregate over an
    (x, y) frame."""
    return ll.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.countDistinct("x").alias("dx"),
        F.countDistinct("y").alias("dy"),
    )


def _ols_guarded_columns():
    """(slope, scale, r2) Column triple over ``_ols_fit_agg``'s output —
    the Spark twin of ``_OLS_SL_CTE`` + the three output fragments."""
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    xden = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    yden = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when((F.col("dx") <= 1) | (xden == 0), F.lit(0.0)).otherwise(
        num / xden
    )
    scale = F.exp((F.col("sy") - slope * F.col("sx")) / F.col("n"))
    r2 = F.when(
        (F.col("dx") <= 1) | (F.col("dy") <= 1) | (xden == 0) | (yden == 0),
        F.lit(1.0),
    ).otherwise(num * num / (xden * yden))
    return slope, scale, r2


@query(
    "heaps_law_fit",
    oracle=r"""WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents WHERE trim(text) <> ''
),
cuts AS (
  SELECT unnest(range(1, 11)) AS decile
),
bounds AS (
  SELECT decile,
         (SELECT max(doc_id) FROM documents) * decile // 10 AS max_id
  FROM cuts
),
pts AS (
  SELECT b.decile,
         CAST(count(*) AS DOUBLE) AS n_tokens,
         CAST(count(DISTINCT t.term) AS DOUBLE) AS vocab
  FROM bounds b JOIN toks t ON t.doc_id <= b.max_id
  GROUP BY 1
),
ll AS (
  SELECT ln(n_tokens) AS x, ln(vocab) AS y FROM pts
  WHERE n_tokens > 0 AND vocab > 0
),
fit AS (
{fit}
),
tot AS (
  SELECT CAST(max(n_tokens) AS BIGINT) AS total_tokens,
         CAST(max(vocab) AS BIGINT) AS total_vocab
  FROM pts
),
{sl}
SELECT {slope} AS beta,
       {scale} AS k,
       {r2} AS r2,
       CAST(n AS BIGINT) AS n_points,
       total_tokens, total_vocab
FROM sl, tot""".format(
        fit=_OLS_FIT_SQL,
        sl=_OLS_SL_CTE,
        slope=_OLS_SLOPE_SQL,
        scale=_OLS_SCALE_SQL,
        r2=_OLS_R2_SQL,
    ),
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(N) = K * N^beta of vocabulary growth — the
    corpus statistic behind tokenizer/vocab sizing decisions (how many
    new types will the next 10x of data bring?): vocabulary and token
    counts measured at ten doc-id-prefix cuts of the corpus, the
    power law fitted by OLS in log-log space via the same one-pass
    sufficient-statistics discipline as ``ols_daily_trend``, with R²
    certifying the fit.

    Plan shape: ONE token explode feeds all ten measurement points (the
    bounds table is 10 rows broadcast against it; each point is a
    filtered count + count-distinct); the regression then runs on ten
    (x, y) pairs — corpus-scan cost independent of the number of cuts,
    and no iterative fitting anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs.where(F.trim("text") != "")).select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    )
    max_id = docs.agg(F.max("doc_id").alias("mx"))
    bounds = (
        spark.range(1, 11)
        .withColumnRenamed("id", "decile")
        .crossJoin(F.broadcast(max_id))
        .select("decile", F.expr("mx * decile div 10").alias("max_id"))
    )
    pts = (
        toks.join(F.broadcast(bounds), F.col("doc_id") <= F.col("max_id"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_tokens"),
            F.countDistinct("term").cast("double").alias("vocab"),
        )
    )
    ll = pts.where((F.col("n_tokens") > 0) & (F.col("vocab") > 0)).select(
        F.log("n_tokens").alias("x"), F.log("vocab").alias("y")
    )
    totals = F.broadcast(
        pts.agg(
            F.max("n_tokens").cast("long").alias("total_tokens"),
            F.max("vocab").cast("long").alias("total_vocab"),
        )
    )
    fit = _ols_fit_agg(ll)
    beta, k, r2 = _ols_guarded_columns()
    # signed-zero normalization is fleet-wide (registry.
    # normalize_signed_zero); the oracle-side `+ 0.0` twins are the
    # load-bearing half here
    return fit.crossJoin(totals).select(
        F.round(beta, _R).alias("beta"),
        F.round(k, _R).alias("k"),
        F.round(r2, _R).alias("r2"),
        F.col("n").cast("long").alias("n_points"),
        "total_tokens",
        "total_vocab",
    )


@query(
    "zipf_law_fit",
    oracle=r"""WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents WHERE trim(text) <> ''
),
tf AS (SELECT term, count(*) AS freq FROM toks GROUP BY 1),
top AS (
  SELECT term, freq FROM tf ORDER BY freq DESC, term LIMIT 500
),
ranked AS (
  SELECT freq,
         row_number() OVER (ORDER BY freq DESC, term) AS rnk
  FROM top
),
ll AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
       FROM ranked),
fit AS (
{fit}
),
{sl}
SELECT {slope} AS zipf_slope,
       {scale} AS c,
       {r2} AS r2,
       CAST(n AS BIGINT) AS n_terms
FROM sl""".format(
        fit=_OLS_FIT_SQL,
        sl=_OLS_SL_CTE,
        slope=_OLS_SLOPE_SQL,
        scale=_OLS_SCALE_SQL,
        r2=_OLS_R2_SQL,
    ),
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit freq(rank) ~ C * rank^s over the top-500 term
    frequencies — the companion corpus statistic to ``heaps_law_fit``
    (together they characterize the vocabulary's head and growth, the
    inputs to vocab-size and stop-list decisions; natural text sits
    near s = -1, and large deviations flag templated/synthetic
    corpora).

    Plan shape: term frequencies are one map-side-combined aggregate;
    the top-500 cut is a TakeOrderedAndProject (per-partition heaps,
    never a full sort); ranking and the log-log OLS then run on 500
    rows — the only corpus-sized work is the token count."""
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs.where(F.trim("text") != "")).select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    top = tf.orderBy(F.desc("freq"), F.asc("term")).limit(500)
    w = Window.orderBy(F.desc("freq"), F.asc("term"))  # 500-row frame
    ranked = top.withColumn("rnk", F.row_number().over(w))
    ll = ranked.select(
        F.log(F.col("rnk").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    fit = _ols_fit_agg(ll)
    slope, c, r2 = _ols_guarded_columns()
    return fit.select(
        F.round(slope, _R).alias("zipf_slope"),
        F.round(c, _R).alias("c"),
        F.round(r2, _R).alias("r2"),
        F.col("n").cast("long").alias("n_terms"),
    )


# ------------------------------------------------ MMR diversified retrieval


def _mmr_round_sql(k: int) -> str:
    """One unrolled MMR greedy round as SQL CTEs: from candidates not
    yet in s{k-1}, score 0.7*rel - 0.3*max(sim to selected), pick the
    per-query argmax (rounded score, cand_id tie-break)."""
    prev = k - 1
    return f""",
r{k} AS (
  SELECT c.query_id, c.cand_id, c.rel,
         round(0.7 * c.rel - 0.3 * max(s.sim), 6) AS mmr
  FROM cand c
  JOIN sims s ON s.query_id = c.query_id AND s.ca = c.cand_id
  JOIN s{prev} ON s{prev}.query_id = s.query_id AND s{prev}.cand_id = s.cb
  WHERE NOT EXISTS (SELECT 1 FROM s{prev} x
                    WHERE x.query_id = c.query_id AND x.cand_id = c.cand_id)
  GROUP BY 1, 2, 3
),
p{k} AS (
  SELECT query_id, cand_id, rel, mmr FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY mmr DESC, cand_id) AS rk
    FROM r{k}) WHERE rk = 1
),
s{k} AS (SELECT query_id, cand_id FROM s{prev}
         UNION ALL SELECT query_id, cand_id FROM p{k})"""


_MMR_ORACLE = (
    """WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
rel AS (
  SELECT q.query_id, e.vec_id AS cand_id,
         round(list_cosine_similarity(q.qv, e.v), 6) AS rel
  FROM q JOIN e ON e.vec_id <> q.query_id
),
cand AS (
  SELECT query_id, cand_id, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, cand_id) AS rk
    FROM rel) WHERE rk <= 10
),
sims AS (
  SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
         round(list_cosine_similarity(ea.v, eb.v), 6) AS sim
  FROM cand a
  JOIN cand b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
  JOIN e ea ON ea.vec_id = a.cand_id
  JOIN e eb ON eb.vec_id = b.cand_id
),
p1 AS (
  SELECT query_id, cand_id, rel, rel AS mmr FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, cand_id) AS rk
    FROM cand) WHERE rk = 1
),
s1 AS (SELECT query_id, cand_id FROM p1)"""
    + _mmr_round_sql(2)
    + _mmr_round_sql(3)
    + _mmr_round_sql(4)
    + """
SELECT query_id, CAST(1 AS INT) AS rank, cand_id,
       rel AS relevance, mmr AS mmr_score FROM p1
UNION ALL SELECT query_id, 2, cand_id, rel, mmr FROM p2
UNION ALL SELECT query_id, 3, cand_id, rel, mmr FROM p3
UNION ALL SELECT query_id, 4, cand_id, rel, mmr FROM p4"""
)


@query("mmr_diversified_topk", oracle=_MMR_ORACLE)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein '98)
    diversified retrieval: for each of 3 query vectors, take the
    top-10 cosine candidates, then greedily pick 4 where each pick
    maximizes 0.7*relevance - 0.3*max-similarity-to-already-picked —
    the rerank RAG stacks run so the context window isn't 5 copies of
    the same paragraph (the diversity twin of `hybrid_rrf_retrieval`'s
    fusion).

    Scale shape: ONE corpus pass scores relevance (broadcast queries,
    same kernel as `knn_topk`); everything after — the pairwise
    similarity matrix (<= 90 rows/query) and the 4 unrolled greedy
    rounds — runs on the bounded per-query candidate frames, so the
    iterative argmax chain never touches the corpus again. Every
    argmax uses ROUNDED scores + cand_id tie-break, so the greedy
    decisions (and thus the whole chain) are engine-portable by
    construction."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    rel = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine(F.col("qv"), F.col("v")), _R).alias("rel"),
            F.col("v").alias("cv"),
        )
    )
    w_rel = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("cand_id"))
    # checkpoints are LAZY (perf-only: candidate/sim frames feed 4
    # greedy rounds) so the corpus relevance join stays visible to the
    # plan audit; recomputation is harmless because every decision is
    # on ROUNDED scores with id tie-breaks — any evaluation order
    # yields the same picks
    cand = (
        rel.withColumn("rk", F.row_number().over(w_rel))
        .where(F.col("rk") <= 10)
        .drop("rk")
        .localCheckpoint(eager=False)
    )
    a = cand.select("query_id", F.col("cand_id").alias("ca"), F.col("cv").alias("va"))
    b = cand.select(
        F.col("query_id").alias("qb"), F.col("cand_id").alias("cb"), F.col("cv").alias("vb")
    )
    sims = (
        a.join(b, (F.col("query_id") == F.col("qb")) & (F.col("ca") != F.col("cb")))
        .select(
            "query_id",
            "ca",
            "cb",
            F.round(cosine(F.col("va"), F.col("vb")), _R).alias("sim"),
        )
        .localCheckpoint(eager=False)
    )
    cands = cand.select("query_id", "cand_id", "rel")
    pick = (
        cands.withColumn("rk", F.row_number().over(w_rel))
        .where(F.col("rk") == 1)
        .select("query_id", "cand_id", "rel", F.col("rel").alias("mmr"))
    )
    selected = pick.select("query_id", "cand_id")
    out = pick.select(
        "query_id",
        F.lit(1).cast("int").alias("rank"),
        "cand_id",
        F.col("rel").alias("relevance"),
        F.col("mmr").alias("mmr_score"),
    )
    for step in (2, 3, 4):
        pen = (
            sims.join(
                selected.select(
                    F.col("query_id").alias("qs"), F.col("cand_id").alias("cs")
                ),
                (F.col("query_id") == F.col("qs")) & (F.col("cb") == F.col("cs")),
            )
            .groupBy("query_id", "ca")
            .agg(F.max("sim").alias("pen"))
        )
        rem = cands.join(selected, ["query_id", "cand_id"], "left_anti")
        r = rem.join(
            pen,
            (rem["query_id"] == pen["query_id"]) & (rem["cand_id"] == pen["ca"]),
        ).select(
            rem["query_id"],
            "cand_id",
            "rel",
            F.round(0.7 * F.col("rel") - 0.3 * F.col("pen"), _R).alias("mmr"),
        )
        w_mmr = Window.partitionBy("query_id").orderBy(F.desc("mmr"), F.asc("cand_id"))
        p = (
            r.withColumn("rk", F.row_number().over(w_mmr))
            .where(F.col("rk") == 1)
            .select("query_id", "cand_id", "rel", "mmr")
        )
        out = out.unionByName(
            p.select(
                "query_id",
                F.lit(step).cast("int").alias("rank"),
                "cand_id",
                F.col("rel").alias("relevance"),
                F.col("mmr").alias("mmr_score"),
            )
        )
        selected = selected.unionByName(p.select("query_id", "cand_id"))
    return out


# ------------------------------------ greedy submodular source coverage


def _cov_round_sql(k: int) -> str:
    """One unrolled greedy coverage round: marginal gain = tokens not
    yet covered (ZERO for fully-covered sources — a saturated corpus
    still yields a 4-row report), argmax with source-name tie-break,
    covered set grows."""
    prev = k - 1
    return f""",
u{k} AS (
  SELECT st.source, CAST(count(*) AS BIGINT) AS gain
  FROM st
  WHERE NOT EXISTS (SELECT 1 FROM c{prev} WHERE c{prev}.token = st.token)
  GROUP BY 1
),
g{k} AS (
  SELECT srcs.source, CAST(coalesce(u{k}.gain, 0) AS BIGINT) AS gain
  FROM srcs LEFT JOIN u{k} ON srcs.source = u{k}.source
  WHERE NOT EXISTS (SELECT 1 FROM p{prev} WHERE p{prev}.source = srcs.source)
),
pick{k} AS (
  SELECT source, gain FROM g{k} ORDER BY gain DESC, source LIMIT 1
),
p{k} AS (SELECT source FROM p{prev} UNION ALL SELECT source FROM pick{k}),
c{k} AS (SELECT token FROM c{prev}
         UNION SELECT st.token FROM st JOIN pick{k} USING (source))"""


_COVERAGE_ORACLE = (
    r"""WITH tok AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
  FROM documents
),
st AS (SELECT DISTINCT source, token FROM tok WHERE token <> ''),
srcs AS (SELECT DISTINCT source FROM st),
g1 AS (SELECT source, CAST(count(*) AS BIGINT) AS gain FROM st GROUP BY 1),
pick1 AS (SELECT source, gain FROM g1 ORDER BY gain DESC, source LIMIT 1),
p1 AS (SELECT source FROM pick1),
c1 AS (SELECT st.token FROM st JOIN pick1 USING (source))"""
    + _cov_round_sql(2)
    + _cov_round_sql(3)
    + _cov_round_sql(4)
    + """
SELECT CAST(1 AS INT) AS pick_rank, source, gain AS marginal_new_tokens
FROM pick1
UNION ALL SELECT 2, source, gain FROM pick2
UNION ALL SELECT 3, source, gain FROM pick3
UNION ALL SELECT 4, source, gain FROM pick4"""
)


@query("greedy_source_coverage", oracle=_COVERAGE_ORACLE)
def greedy_source_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy submodular source selection by marginal vocabulary
    coverage: pick 4 sources, each maximizing the number of token
    types NOT covered by the already-picked set — the facility-
    location objective data-mixing work optimizes when choosing which
    domains to ingest first (greedy is (1-1/e)-optimal for coverage,
    Nemhauser et al.), and the measured complement to the pairwise
    `source_token_js_divergence` matrix.

    Scale shape: ONE distinct over (source, token) (a shuffle bounded
    by type counts, not token counts); each of the 4 unrolled rounds
    is a token-keyed LEFT ANTI join against the covered-set frame plus
    a <=|sources|-row argmax (exact integer gains, source-name
    tie-break — engine-portable greedy chain, same discipline as
    `mmr_diversified_topk`). The covered frame never exceeds the
    corpus vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    tok = fan_out(docs).select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    st = tok.where(F.col("token") != "").select("source", "token").distinct()
    st = st.localCheckpoint(eager=False)
    srcs = st.select("source").distinct()

    picked = None  # DataFrame(source)
    covered = None  # DataFrame(token)
    out = None
    for step in (1, 2, 3, 4):
        uncov = st
        if covered is not None:
            uncov = uncov.join(covered, "token", "left_anti")
        u = uncov.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("g0"))
        g = srcs.join(u, "source", "left").select(
            "source", F.coalesce(F.col("g0"), F.lit(0)).cast("long").alias("gain")
        )
        if picked is not None:
            g = g.join(picked, "source", "left_anti")
        pick = g.orderBy(F.desc("gain"), F.asc("source")).limit(1)
        row = pick.select(
            F.lit(step).cast("int").alias("pick_rank"),
            "source",
            F.col("gain").alias("marginal_new_tokens"),
        )
        out = row if out is None else out.unionByName(row)
        psrc = pick.select("source")
        picked = psrc if picked is None else picked.unionByName(psrc)
        newly = st.join(psrc, "source").select("token")
        covered = newly if covered is None else covered.unionByName(newly).distinct()
    return out


@query(
    "pq_codebook_lifecycle",
    oracle="""WITH r AS (
  SELECT CAST(count(*) AS BIGINT) AS n_ref FROM embeddings WHERE vec_id % 2 = 0
),
b AS (
  SELECT CAST(count(*) AS BIGINT) AS n_batch FROM embeddings WHERE vec_id % 2 = 1
)
SELECT CAST(1 AS BIGINT) AS artifact_version, b.n_batch,
       r.n_ref > 64 AS book_live,
       TRUE AS recon_ok,
       FALSE AS degraded_flag
FROM r CROSS JOIN b""",
)
def pq_codebook_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persist-and-probe lifecycle for the PQ codebook — the fourth
    epoch artifact family (`pipeline.artifacts.publish_pq_epoch` /
    `pq_quantization_report`, next to the Bloom words, MinHash buckets
    and IVF centroids): the reference half of the corpus samples a
    64-codeword-per-subspace codebook, committed as one normalized
    (subspace, codeword, centroid, ref_recon_cos) table through the
    versioned manifest swap — the artifact carries its OWN quality
    baseline, the reference's mean reconstruction cosine. The batch
    half is then encoded against the COMMITTED book (re-nested from
    the artifact rows; the reference never enters the probe plan) and
    certified:

      (artifact_version, n_batch, book_live, recon_ok, degraded_flag)

    - ``book_live``: the baseline is meaningful only when the
      reference EXCEEDS the book capacity (n_ref > 64 codewords) —
      below that the book memorizes the reference, the baseline
      saturates at 1.0, and any batch reads as degraded (the
      `ivf_kmeans_certificate` vacuous-regime discipline; the fixture
      family is live at all three SFs, vacuous only on the tiny/mid
      test fixtures).
    - ``recon_ok`` certifies batch mean reconstruction cosine >= 0.7
      in the live regime (measured 0.82 at sf0.001/0.01/0.1 vs the
      ~0.84 reference baseline; the oracle asserts the constant, so a
      broken encode/re-nest/commit fails the value hash).
    - ``degraded_flag`` = live AND batch reconstructs > 0.1 worse
      than the epoch baseline — the recode/re-sample trigger, the PQ
      analog of `ivf_centroid_maintenance`'s occupancy PSI (FALSE on
      the stationary fixture; the firing path is pinned on a shifted
      synthetic batch in tests/test_artifact_lifecycle.py).

    Scale shape: publish = two reference passes (codebook sample +
    baseline encode), once per epoch; probe = one batch pass against
    the broadcast (<=1024-row) artifact."""
    from ..pipeline.artifacts import (
        pq_quantization_report,
        publish_pq_epoch,
        scratch_artifact_dir,
    )

    emb = _emb(spark, sf_dir)
    ref = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    path = scratch_artifact_dir("pq_epoch_")
    publish_pq_epoch(ref, path, k=64)
    rep = pq_quantization_report(spark, path, batch)
    n_ref = ref.agg(F.count(F.lit(1)).cast("long").alias("n_ref"))
    live = F.col("n_ref") > 64
    return rep.crossJoin(F.broadcast(n_ref)).select(
        "artifact_version",
        "n_batch",
        live.alias("book_live"),
        F.coalesce(
            ~live | (F.col("batch_recon_cos") >= 0.7), F.lit(True)
        ).alias("recon_ok"),
        F.coalesce(live & F.col("degraded"), F.lit(False)).alias(
            "degraded_flag"
        ),
    )
