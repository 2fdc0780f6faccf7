"""Fleet-wide plan audit: flag unpruned scans and unbounded join
strategies in every query.

Two checks per registered query's executed plan:

1. **Scan pruning** — `Scan parquet` nodes whose ReadSchema column
   count equals the source table's width mean column pruning failed
   (or the query genuinely needs all columns — the report says which
   query/table so a human can judge). At 100 TB an unpruned lineitem
   scan is the single most expensive plan bug, and it is invisible in
   small-fixture wall-clock.
2. **Join strategy** — `CartesianProduct` and non-tiny
   `BroadcastNestedLoopJoin` nodes are O(|L|·|R|) row-compare joins;
   at scale every intentional use in this repo is a one-row broadcast
   stat ride (scalar aggregates, centroid fans), which Spark plans as
   BroadcastNestedLoopJoin over a single-row build side. The audit
   flags any BNLJ/cartesian whose plan context doesn't show the
   one-row-aggregate shape, catching accidental theta joins.

Usage: python tools/scan_audit.py [query ...]
Prints one line per finding; exits 0 always (report tool).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_database_pipeline_project_spark.plans import QUERIES
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401
from end_to_end_database_pipeline_project_spark.session import get_spark

SF = "/root/testdata/sf0.001"

TABLE_WIDTHS = {
    "region": 2, "nation": 3, "customer": 5, "supplier": 4, "part": 6,
    "orders": 6, "lineitem": 11, "events": 6, "documents": 5, "embeddings": 3,
}

SCAN_RE = re.compile(
    r"FileScan parquet \[(?P<cols>[^\]]*)\][^\n]*?Location: [^\n]*?/(?P<table>\w+)\.parquet",
)

# Queries whose BroadcastNestedLoopJoin is intentional and BOUNDED —
# the broadcast side is a handful of rows by construction, so the
# nested loop is O(|corpus| * tiny). Each entry is
# (max BNLJ nodes in the executed plan, boundedness argument): the cap
# pins the DOCUMENTED joins only, so a future accidental unbounded
# theta join in a whitelisted query raises the count past its cap and
# FAILS the audit instead of riding the exemption (ADVICE r11).
# (pq_adc_topk left the list in r12: the fused pair-scoring kernel
# removed its BNLJs outright; mmr_diversified_topk's greedy rounds
# plan without any BNLJ at the audit SF.)
BNLJ_ALLOWED = {
    "knn_topk": (1, "broadcast side = 10 query vectors (self-exclusion theta)"),
    "ivf_topk": (2, "broadcast sides = 8 centroids + 10 probed queries"),
    "ivf_multiprobe_topk": (2, "broadcast sides = 8 centroids + 10 probed queries"),
    "ivf_kmeans_topk": (2, "broadcast sides = 8 fitted centroids + 10 queries"),
    "price_band_join": (1, "documented small-side theta demo; binned_price_band_join is the scale path"),
    "fuzzy_nation_match": (1, "dim x dim (25x25) edit-distance self-join; blocking bounds it at scale"),
    "hard_negative_mining": (1, "broadcast side = 3 anchor vectors (label-inequality theta)"),
    "rolling_distinct_users_7d": (1, "days x id-buckets densify grid (bounded state: #days * id_space/2^15)"),
    "idw_station_interpolation": (1, "broadcast side = 20 probe grid points (forecast grid, bounded by construction)"),
    "knn_label_accuracy": (1, "broadcast side = 50 probe vectors (self-exclusion theta, fixed probe sample)"),
    "sq8_ann_topk": (3, "broadcast sides = the checkpointed 1-row per-dim quantization-stats frame + 5 probe vectors (self-exclusion theta; r11: the stats localCheckpoint replaced the in-plan keys=[] aggregate with an ExistingRDD scan, so the signature left the plan — the build sides are unchanged and bounded)"),
    "centroid_classifier_confusion": (1, "broadcast side = |labels| centroid prototypes (10 rows)"),
    "bitmap_set_algebra": (3, "all joins over the KB-sized (type, bucket) bitmap state: type-pair self-join (|types| rows) + OR-membership tag (|pairs| rows)"),
    "quality_logreg_classifier": (4, "broadcast side = the 1-row weight vector each GD iteration (spark.range(1) seed, then groupBy over the single weight row — provably 1 row, but no keys=[] aggregate signature in the plan)"),
    "source_token_js_divergence": (1, "broadcast side = the |sources|-row totals frame (20 rows) building the all-pairs matrix skeleton"),
    "mann_kendall_trend_test": (3, "O(days^2) pair theta-join on the bounded day-grain rollup (same documented class as theil_sen_trend)"),
    "ann_index_incremental_probe": (1, "broadcast sides = the committed 8-row centroid epoch (assign_clusters centroid fan, for the query batch and the CDF delta)"),
    "weekday_seasonality_strength": (5, "+/-3-day moving-average range self-join on the bounded day-grain rollup"),
}


# Queries allowed to carry row-at-a-time Python, each on a BOUNDED
# input by construction (the registered demo exists to document the
# ~100x cost of this path, not to use it on a fact table).
PYTHON_ROW_ALLOWED = {
    "udtf_sentence_split": "UDTF cost demo; posexplode owns production",
    "udtf_dynamic_stats": "polymorphic UDTF on the 5-row per-type partials",
}


# Source files allowed to build GLOBAL windows (Window.orderBy with no
# partitionBy — a single-reducer funnel at scale): (max occurrences,
# boundedness argument). Docstrings/comments are excluded by the
# tokenizer, so only real call sites count. Anything above the cap or
# in an unlisted file is a finding.
WINDOW_GLOBAL_ALLOWED = {
    "plans/corpus_queries.py": (1, "zipf rank over the 500-row term-frequency frame"),
    "plans/llm_data_queries.py": (2, "RRF rank windows over top-20 candidate frames"),
    "plans/analytics_queries.py": (3, "event-islands prefix windows over the day-grain series + trigram rank over the <=|event_types|^3-row path frame"),
    "plans/eval_queries.py": (4, "CUSUM prefix + argmax rank + ACF/CCF row indexes over the day-grain series (<= #days rows)"),
    "plans/reference_queries.py": (1, "month-grain rollup series (<= #months rows)"),
    "plans/relational_queries.py": (1, "day-grain rolling average (<= #days rows)"),
    "operators/scale.py": (2, "offset windows over <= num_partitions subtotal rows"),
}


def audit(spark, name: str) -> list[str]:
    try:
        plan = QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    except Exception as e:
        return [f"{name}: BUILD ERROR {str(e)[:100]}"]
    out = []
    for m in SCAN_RE.finditer(plan):
        table = m.group("table")
        width = TABLE_WIDTHS.get(table)
        if width is None or width <= 4:
            continue
        ncols = len([c for c in m.group("cols").split(",") if c.strip()])
        if ncols >= width:
            out.append(f"{name}: scan of {table} reads all {ncols} columns")
    if "CartesianProduct" in plan:
        out.append(f"{name}: CartesianProduct in plan")
    # BNLJ is acceptable only as a one-row broadcast stat ride: the
    # build side must be an aggregate that collapses to a single row
    # (HashAggregate with an empty grouping key feeding the broadcast)
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    if name in BNLJ_ALLOWED:
        cap, _why = BNLJ_ALLOWED[name]
        if n_bnlj > cap:
            out.append(
                f"{name}: {n_bnlj} BroadcastNestedLoopJoin exceed the "
                f"whitelist's documented cap of {cap} — a new undocumented "
                "theta join entered the plan"
            )
    elif n_bnlj and "keys=[]" not in plan:
        out.append(
            f"{name}: {n_bnlj} BroadcastNestedLoopJoin without a "
            "scalar-aggregate build side or whitelist entry"
        )
    # row-at-a-time Python (BatchEvalPython) is never acceptable in the
    # hot path; the UDTF demos exist to document the cost and run on
    # bounded inputs. Arrow-batched forms (ArrowEvalPython / InPandas /
    # PythonUDTF on pre-aggregated rows) are the sanctioned slow path.
    if "BatchEvalPython" in plan and name not in PYTHON_ROW_ALLOWED:
        out.append(f"{name}: row-at-a-time BatchEvalPython in plan")
    return out


def _code_name_sites(path: str, names: tuple[str, ...]) -> dict[str, list[int]]:
    """Line numbers of NAME-token occurrences, excluding strings and
    comments (so docstrings discussing an anti-pattern don't count)."""
    import tokenize

    sites: dict[str, list[int]] = {n: [] for n in names}
    with open(path, "rb") as fh:
        toks = list(tokenize.tokenize(fh.readline))
    skip = (
        tokenize.NL,
        tokenize.NEWLINE,
        tokenize.COMMENT,
        tokenize.INDENT,
        tokenize.DEDENT,
    )

    def prev_significant(i: int) -> int:
        # inside parentheses a chained call can line-wrap:
        # `Window\n  .orderBy(...)` tokenizes with NL/COMMENT tokens
        # between the parts — walking raw i-1/i-2 would miss the site
        j = i - 1
        while j >= 0 and toks[j].type in skip:
            j -= 1
        return j

    for i, t in enumerate(toks):
        if t.type != tokenize.NAME or t.string not in names:
            continue
        if t.string == "orderBy":
            # count only `Window.orderBy` (a spec STARTING with orderBy
            # has no partitionBy), not `.partitionBy(...).orderBy(...)`
            j1 = prev_significant(i)
            j2 = prev_significant(j1) if j1 >= 0 else -1
            if (
                j2 >= 0
                and toks[j1].string == "."
                and toks[j2].string == "Window"
            ):
                sites[t.string].append(t.start[0])
        else:
            sites[t.string].append(t.start[0])
    return sites


def audit_source(pkg: str | None = None) -> list[str]:
    """Source-level checks that no plan string can show.

    1. An unbounded ``toPandas()`` collects a whole table to the driver
       — a guaranteed OOM at 100 TB, invisible in a small-fixture plan.
       Any driver collection must carry an explicit ``< N`` slab bound
       in the same expression (the bounded-slab GEMM kernels).
    2. ``Window.orderBy`` with no partitionBy funnels everything to one
       reducer; only the allow-listed bounded frames may use it.
    3. ``repartitionByRange`` samples its boundaries per run — banned
       from registered plans (``plans/``); the deterministic
       ``operators.scale`` binning or the write-time ``operators.layout``
       use are the sanctioned forms."""
    if pkg is None:
        pkg = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "end_to_end_database_pipeline_project_spark",
        )
    out = []
    window_counts: dict[str, list[int]] = {}
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, pkg)
            with open(path) as fh:
                for i, line in enumerate(fh, 1):
                    if ".toPandas()" in line and not re.search(r"<\s*\d+", line):
                        out.append(
                            f"{fn}:{i}: unbounded driver toPandas(): {line.strip()}"
                        )
            sites = _code_name_sites(path, ("orderBy", "repartitionByRange"))
            if sites["orderBy"]:
                window_counts[rel] = sites["orderBy"]
            if sites["repartitionByRange"] and rel.startswith("plans" + os.sep):
                for ln in sites["repartitionByRange"]:
                    out.append(
                        f"{rel}:{ln}: repartitionByRange in a registered plan "
                        "(sampled boundaries are nondeterministic; use "
                        "operators.scale deterministic bins)"
                    )
    for rel, lines in sorted(window_counts.items()):
        cap, _why = WINDOW_GLOBAL_ALLOWED.get(rel, (0, ""))
        if len(lines) > cap:
            out.append(
                f"{rel}:{lines}: {len(lines)} global Window.orderBy "
                f"(no partitionBy) sites exceed the documented allowance "
                f"of {cap}"
            )
    return out


def main() -> None:
    spark = get_spark("scan_audit", cpus=8)
    names = sys.argv[1:] or sorted(QUERIES)
    flags = audit_source()
    for n in names:
        flags.extend(audit(spark, n))
    for f in flags:
        print(f)
    print(f"-- audited {len(names)} queries, {len(flags)} wide-unpruned scans")


if __name__ == "__main__":
    main()
