"""Deduplication operators for large-scale corpus curation.

Four families, all pure DataFrame compositions (no Python in the hot
path), designed so every stage is a hash-partition-friendly groupBy/join:

- **exact**: content-hash groupBy (md5) — one shuffle on the hash key.
- **n-gram Jaccard**: shingle inverted index self-join — exact set
  similarity on candidate pairs that share ≥1 shingle.
- **MinHash + LSH**: k independent min-hashes per doc, banded into
  buckets; only bucket-colliding pairs are compared. Hashes are
  ``md5(seed || shingle)`` with *lexicographic-min* semantics, which
  keeps the construction engine-portable (any engine with md5 yields
  identical signatures — the DuckDB oracle reproduces them exactly).
- **SimHash**: 16-bit charwise-md5 sign-aggregate fingerprint; collision
  groups are near-dup candidates.

Scale notes: the shingle inverted index is the classic quadratic risk —
a shingle appearing in f docs emits f·(f-1)/2 candidate pairs. The
mitigation at 100 TB is the MinHash/LSH path (bounded k·bands work per
doc) plus dropping ultra-frequent "stop shingles" before the join;
n-gram Jaccard here is the exact-verification stage run on LSH survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles

MINHASH_SEEDS = 16
LSH_BANDS = 4  # 4 bands x 4 rows


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5-content groups with representative = min id.

    One shuffle keyed on the 128-bit content hash; count(*) per group is
    the duplication factor (reference analog: re-delivered observations,
    README.md:236-244)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def shingle_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Inverted index: one row per (doc, distinct word-k-gram shingle).

    The source is fanned out to full parallelism first: the explode
    multiplies rows ~50x, so it must run on every core, not on however
    few splits the (locally tiny) input file happens to have.

    ``max_doc_freq`` drops *stop shingles* — shingles appearing in more
    than that many documents — before any self-join consumer.  This is
    the quadratic-blowup guard: a shingle shared by f docs emits
    f·(f-1)/2 candidate pairs, so one boilerplate phrase in 1M docs is
    5·10¹¹ pairs at 100 TB.  Heavy hitters are by definition few, so the
    hot set is broadcast and removed with a map-side anti-join (no extra
    shuffle of the index itself)."""
    from ..session import fan_out

    idx = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), k)).alias("shingle"),
    )
    if max_doc_freq is not None:
        # r11 (guide §2.4): materialize the exploded index ONCE — the
        # hot-shingle aggregate and the anti-join input are two plan
        # branches, and without it each re-ran the full shingle explode
        # (two Generate subtrees over the same scan). At 100 TB this is
        # the persisted inverted-index table the docstring already
        # promises; the hot set and the capped index are both derived
        # from it in one pass over the stored rows. r12 (ADVICE r11):
        # persist() instead of localCheckpoint() so the uncapped index
        # is RELEASABLE — callers that eagerly checkpoint the capped
        # result free it via ``free_uncapped_index`` instead of pinning
        # both copies in executor storage for the session's lifetime
        # (the broadcast hot-set job runs first and populates the
        # cache, so the anti-join probe still reads stored rows, not a
        # second explode).
        from pyspark import StorageLevel

        idx = idx.persist(StorageLevel.MEMORY_AND_DISK_DESER)
        hot = (
            idx.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        out = idx.join(F.broadcast(hot), "shingle", "left_anti")
        out._uncapped_index = idx  # handle for free_uncapped_index
        return out
    return idx


def free_uncapped_index(capped: DataFrame) -> None:
    """Release the uncapped shingle index persisted inside a
    ``max_doc_freq`` :func:`shingle_index` result, once the caller has
    eagerly materialized everything derived from it (e.g. an outer
    ``localCheckpoint`` of the capped index). No-op for uncapped
    results (ADVICE r11: without this, both the uncapped and the
    capped index stayed pinned in executor storage per invocation)."""
    inner = getattr(capped, "_uncapped_index", None)
    if inner is not None:
        inner.unpersist()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.6,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    |A∩B| from the shingle join, |A|/|B| from per-doc shingle counts:
    J = c / (|A| + |B| - c). Emits (doc_a, doc_b, jaccard) for J ≥
    threshold, doc_a < doc_b.

    The shingle index is materialized once (localCheckpoint — a
    persisted index table at scale): it feeds both self-join sides and
    the per-doc size aggregate, and re-exploding the text three times
    costs more than the join itself.

    ``max_doc_freq`` applies the stop-shingle cap (see
    :func:`shingle_index`); Jaccard is then computed over the capped
    shingle sets on both the numerator and the sizes, which is the
    standard stop-word-removed set similarity."""
    raw = shingle_index(df, text_col, id_col, k, max_doc_freq)
    sh = raw.localCheckpoint()
    free_uncapped_index(raw)  # the outer checkpoint holds the rows now
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # (r11 note: a groupBy(shingle) + in-array ordered-pair expansion
    # was A/B-tested against this self-join and measured ~10% SLOWER at
    # sf0.1 — the per-singleton collect_list/array overhead outweighs
    # the saved join side when most posting lists have length 1 — so
    # the self-join stays.)
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_on_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_freq: int | None = None,
    containment: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard for an explicit candidate-pair list — the
    verification stage that makes the inverted-index join scale-safe.

    Instead of self-joining the full corpus index (quadratic in hot
    shingles), only documents that appear in ``pairs`` are shingled and
    joined, and the join is driven BY the pair list: pairs ⨝ shingles(a)
    on doc_a, then ⨝ shingles(b) on (doc_b, shingle) — a composite-key
    equi-join whose row count is Σ_pairs |A|, linear in the candidate
    set.  With LSH upstream (`minhash_lsh_dedup`) the candidate set is
    bounded per doc, so the whole fused pipeline is shuffle-bounded at
    100 TB.  Pairs with zero surviving common shingles keep a row
    (jaccard 0) via the left join.

    ``containment=True`` emits the asymmetric measures |A∩B|/|A| and
    |A∩B|/|B| instead of Jaccard — the quote/subset detector (full
    containment of a short doc in a long one scores ~1.0 where Jaccard
    is diluted by the long side's union)."""
    pairs = pairs.select("doc_a", "doc_b").localCheckpoint()
    wanted = (
        pairs.select(F.col("doc_a").alias(id_col))
        .unionByName(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sub = df.join(wanted, id_col, "left_semi")
    raw = shingle_index(sub, text_col, id_col, k, max_doc_freq)
    sh = raw.localCheckpoint()
    free_uncapped_index(raw)  # the outer checkpoint holds the rows now
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    c = F.coalesce(F.col("c"), F.lit(0))
    joined = (
        pairs.join(common, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
    )
    if containment:
        return joined.select(
            "doc_a",
            "doc_b",
            (c / F.col("na")).alias("containment_a_in_b"),
            (c / F.col("nb")).alias("containment_b_in_a"),
        )
    return joined.select(
        "doc_a",
        "doc_b",
        (c / (F.col("na") + F.col("nb") - c)).alias("jaccard"),
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3, seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """Wide MinHash signatures: one row per doc with columns s0..s{n-1},
    si = lexicographic min over shingles of md5(i || '|' || shingle).

    md5-as-hash keeps the signature engine-portable (the DuckDB oracle
    computes the identical min). The wide layout matters for scale: all
    ``seeds`` hashes ride one (doc, shingle) row, so the signature build
    is a single groupBy with ``seeds`` min-aggregates — no seed explode,
    no ``seeds``×-wider shuffle, and map-side partial aggregation
    collapses each input split to ≤|docs-in-split| rows before the
    exchange."""
    sh = shingle_index(df, text_col, id_col, k)
    hashed = sh.select(
        "doc_id",
        *[
            F.md5(F.concat_ws("|", F.lit(str(i)), F.col("shingle"))).alias(f"h{i}")
            for i in range(seeds)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"s{i}") for i in range(seeds)]
    )


def lsh_buckets(
    sigs: DataFrame, bands: int = LSH_BANDS, seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """Band-bucket projection of a wide signature table: ``bands`` rows
    per doc, bucket = md5 of the '|'-joined signature components of the
    band. Pure projection + bounded explode — shared by the self-join
    candidate generator below and the batch-vs-corpus incremental probe
    (`plans.llm_data_queries.incremental_neardup_batch`)."""
    if seeds % bands:
        raise ValueError(
            f"seeds ({seeds}) must divide evenly into bands ({bands}) — "
            "trailing signature components would silently never bucket"
        )
    rows_per_band = seeds // bands
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"s{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = LSH_BANDS, seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """LSH banding: hash each band of rows_per_band signature components
    to a bucket; pairs sharing any bucket are candidates.

    Bucket construction: md5 of the '|'-joined sigs in seed order —
    a pure projection over the wide signature row (no groupBy), fanned
    to ``bands`` rows per doc only for the (band, bucket) self-join.
    Each bucket of f docs emits f·(f-1)/2 pairs, but LSH bounds f to
    true-ish near-dups."""
    buckets = lsh_buckets(sigs, bands, seeds)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    est_threshold: float = 0.5,
    seeds: int = MINHASH_SEEDS,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signatures -> banded buckets
    -> candidate pairs -> estimated Jaccard (matching signature fraction)
    filtered at est_threshold.

    Signatures are materialized once (localCheckpoint) before fan-out:
    they feed the band self-join (both sides) and both sides of the
    estimation join, and recomputing the shingle explosion four times
    dominates the runtime otherwise. At 100 TB the checkpoint becomes a
    persisted signature table. Estimation is join-then-project on the
    wide rows — comparing all ``seeds`` components in one codegen'd
    expression per pair, not a per-(pair, seed) join + re-aggregate."""
    sigs = minhash_signatures(df, text_col, id_col, k, seeds).localCheckpoint()
    cands = lsh_candidate_pairs(sigs, seeds=seeds)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"s{i}").alias(f"a{i}") for i in range(seeds)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"s{i}").alias(f"b{i}") for i in range(seeds)],
    )
    matches = None
    for i in range(seeds):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        matches = term if matches is None else matches + term
    est = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(matches.cast("double") / F.lit(float(seeds)), 6).alias(
                "est_jaccard"
            ),
        )
    )
    return est.where(F.col("est_jaccard") >= est_threshold)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph by iterative
    min-label propagation: every node starts labeled with its own id;
    each round, a node adopts the minimum label among itself and its
    neighbors; fixpoint = components labeled by their minimum member.

    This is THE missing primitive between pair emission and actual
    dedup: LSH/Jaccard emit *pairs*, but "keep one copy" needs the
    transitive closure (A~B, B~C => drop two of three even though A,C
    never paired). Near-dup graphs are dense clique-ish clusters, so
    the iteration count is the cluster diameter — almost always <= 3 —
    and each round is one shuffle (edge join) + one aggregate, all
    hash-partitioned on node id. Labels are localCheckpoint'd per round
    to truncate the growing lineage (the classic iterative-algorithm
    discipline; a persisted table at 100 TB), and the loop exits early
    on the first round with zero label changes — the convergence probe
    is a count() on the changed set, O(1) result per round.

    Returns (doc_id, component_id); singleton nodes keep their own id.
    """
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    sym = sym.localCheckpoint()  # reused every round; stop re-deriving pairs
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("comp")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new = (
            labels.alias("l")
            .join(nbr.alias("n"), F.col("l.node") == F.col("n.src"), "left")
            .select(
                F.col("l.node").alias("node"),
                F.least(
                    F.col("l.comp"), F.coalesce(F.col("n.nbr_comp"), F.col("l.comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("a")
            .join(labels.alias("b"), F.col("a.node") == F.col("b.node"))
            .where(F.col("a.comp") != F.col("b.comp"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), F.col("comp").alias("component_id"))


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """16-bit SimHash fingerprint per document.

    For bit j (0..15): take hex digit j//4 of each shingle's md5, test
    bit j%4; sum +1/-1 votes over shingles; bit set iff sum >= 0.
    Engine-portable by the same md5 argument as MinHash."""
    # one conv() of the first 4 hex chars per shingle (not 16 per-digit
    # convs): v packs digits 1..4 big-endian, so digit j//4+1 sits at
    # nibble 3-(j//4) and bit j of the fingerprint scheme is
    # (v >> (4*(3-j//4) + j%4)) & 1 — pure bitwise ops after a single
    # string decode, ~16x less expression work per shingle row
    sh = shingle_index(df, text_col, id_col, k).withColumn(
        "v", F.conv(F.substring(F.md5(F.col("shingle")), 1, 4), 16, 10).cast("long")
    )
    # one conditional-sum aggregate per bit instead of a 16x row explode:
    # votes_j = sum(+1/-1 over shingles), all 16 in a single groupBy, so
    # the shuffle carries one row per doc rather than 16 per shingle
    aggs = []
    for j in range(16):
        shift = 4 * (3 - j // 4) + (j % 4)
        bit = F.shiftright(F.col("v"), shift).bitwiseAND(F.lit(1))
        aggs.append(F.sum(F.when(bit > 0, 1).otherwise(-1)).alias(f"v{j}"))
    votes = sh.groupBy("doc_id").agg(*aggs)
    fingerprint = None
    for j in range(16):
        term = F.when(F.col(f"v{j}") >= 0, F.lit(1 << j)).otherwise(0)
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select("doc_id", fingerprint.cast("long").alias("simhash"))


def simhash_collision_groups(df: DataFrame, **kwargs) -> DataFrame:
    """SimHash near-dup candidates: fingerprint collision groups."""
    return (
        simhash16(df, **kwargs)
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("representative_id"), F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )
