"""Physical-plan audits: the plans we'd want at 100 TB, pinned as tests.

Wall-clock at sf0.001 proves nothing about scale; these assertions do.
Each checks the optimizer artifact that makes the query viable on a
1000-executor cluster: filters reaching the parquet scan, scans pruned
to the referenced columns, dimensions broadcast, partial aggregation
before the shuffle.
"""

from __future__ import annotations

from end_to_end_database_pipeline_project_spark.plans import QUERIES
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_rollup_scan_is_pruned_and_pushed(spark):
    plan = _plan(spark, "daily_weather_rollup")
    # the not-null measure filter reaches the parquet reader...
    assert "PushedFilters: [IsNotNull(value)]" in plan
    # ...and the scan reads only the two referenced columns (ts's
    # physical type varies by fixture generation: raw-nanos bigint vs
    # micros timestamp — pruning is what's asserted, not the type)
    assert (
        "ReadSchema: struct<ts:bigint,value:double>" in plan
        or "ReadSchema: struct<ts:timestamp,value:double>" in plan
    )


def test_rollup_has_partial_aggregation(spark):
    plan = _plan(spark, "daily_weather_rollup")
    assert "partial_avg" in plan, "map-side combine missing from rollup"


def test_star_join_broadcasts_dims_and_merges_facts(spark):
    plan = _plan(spark, "regional_revenue")
    # dimensions ride broadcast joins; the fact-fact join must be a
    # shuffle join (facts can't be broadcast at scale)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan, (
        "lineitem⋈orders should merge-join, never broadcast a fact:\n" + plan
    )


def test_pure_dim_join_is_broadcast_only(spark):
    plan = _plan(spark, "nation_region_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "dim⋈dim should broadcast, not shuffle both sides:\n" + plan
    )


def test_date_filters_push_to_both_fact_scans(spark):
    plan = _plan(spark, "shipping_priority")
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_topk_uses_take_ordered_not_full_sort(spark):
    plan = _plan(spark, "top_orders_global")
    assert "TakeOrderedAndProject" in plan, (
        "top-k should plan TakeOrderedAndProject, not a global sort:\n" + plan
    )


def test_widest_join_tree_merges_facts_broadcasts_dims(spark):
    # Q8 shape: 7 join hops — exactly ONE shuffle join (lineitem⋈orders);
    # every dimension hop (part/supplier/customer/nation×2/region) broadcasts
    plan = _plan(spark, "market_share")
    assert plan.count("SortMergeJoin") == 1, (
        "market_share must merge-join exactly the fact-fact edge:\n" + plan
    )
    assert plan.count("BroadcastHashJoin") >= 5
    # selective dim predicates reach their scans
    assert "EqualTo(p_type,ECONOMY)" in plan
    assert "EqualTo(r_name,ASIA)" in plan


def test_disjunctive_predicate_pushes_to_fact_scan(spark):
    # Q19 shape: Catalyst must push the lineitem-side residual of the
    # three-way OR down to the parquet reader, not evaluate it post-join
    plan = _plan(spark, "disjunctive_predicate_revenue")
    assert "Or(Or(" in plan and "l_quantity" in plan.split("Or(Or(")[1][:200], (
        "quantity disjunction should reach the lineitem scan:\n" + plan
    )


def test_large_volume_customers_single_lineitem_pass(spark):
    # Q18 shape: the IN-subquery aggregate IS the outer aggregate —
    # lineitem must be scanned/aggregated once, not once per subquery
    plan = _plan(spark, "large_volume_customers")
    assert plan.count("Scan parquet") == 3, (
        "expected one scan each of lineitem/orders/customer:\n" + plan
    )


def test_no_unpruned_wide_scans_in_headliners(spark):
    # fleet-rule: no headline query may scan every column of a wide
    # table (tools/scan_audit.py runs the same check over all queries)
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.scan_audit import audit
    from bench import HEADLINE

    flags = []
    for name in HEADLINE:
        flags.extend(audit(spark, name))
    assert not flags, flags


def test_partitioned_silver_read_prunes_partitions(spark, tmp_path):
    # partition pruning: a date-filtered read of the date-partitioned
    # silver table must show the filter under PartitionFilters (pruned
    # at planning/AQE time — 100 TB of history, one day's files read)
    from pyspark.sql import functions as F

    from end_to_end_database_pipeline_project_spark.pipeline.medallion import (
        build_bronze,
        bronze_to_silver,
        write_silver,
    )

    silver = bronze_to_silver(build_bronze(spark, SF))
    out = str(tmp_path / "silver")
    write_silver(silver, out)
    day = spark.read.parquet(out).select(F.min("obs_date")).collect()[0][0]
    filtered = spark.read.parquet(out).where(F.col("obs_date") == F.lit(day))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(obs_date" in plan, plan


def test_dynamic_partition_pruning_on_partitioned_gold(spark, tmp_path):
    """DPP: joining a month-partitioned fact against a filtered dim must
    inject a runtime partition filter (dynamicpruning subquery) into the
    fact scan, so only the dim-selected partitions are read — the
    runtime twin of the static partition-pruning test. At 100 TB this is
    what makes star-join queries over partitioned gold read days, not
    history."""
    from pyspark.sql import functions as F

    from end_to_end_database_pipeline_project_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events")
    gold = str(tmp_path / "gold")
    (
        ev.withColumn("obs_month", F.date_format("ts", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("obs_month")
        .parquet(gold)
    )
    months = [r["obs_month"] for r in spark.read.parquet(gold).select("obs_month").distinct().collect()]
    assert len(months) >= 1
    # the dim must be a FILE source: a LocalRelation dim folds its
    # filter at plan time and no *dynamic* pruning is needed
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(m, f"label_{m}") for m in months], "obs_month string, label string"
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).where(F.col("label") == f"label_{months[0]}")

    fact = spark.read.parquet(gold)
    joined = fact.join(dim, "obs_month").groupBy("label").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "DPP filter missing from fact scan"


# ------------------------------------------------- round-3 additions


def test_span_dedup_materializes_spans_once_with_partial_agg(spark):
    # the shingle explode (the dominant cost) runs once into a
    # checkpointed span table; BOTH aggregates read that state, and the
    # span document-frequency aggregate combines map-side
    plan = _plan(spark, "duplicate_span_stats")
    assert plan.count("Scan ExistingRDD") == 2
    assert "FileScan" not in plan  # no re-explode of the documents scan
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_variant_scan_reads_props_only(spark):
    plan = _plan(spark, "variant_event_props")
    assert "ReadSchema: struct<props:string>" in plan
    assert "parseJson" in plan  # VARIANT path, not per-row from_json


def test_heavy_hitters_sketch_is_mergeable_partial(spark):
    # the approx_top_k sketch must be a partial aggregate merged across
    # partitions — that's the whole 100 TB point of the operator
    plan = _plan(spark, "heavy_hitter_users")
    assert "partial_approx_top_k" in plan
    assert "merge_approx_top_k" in plan


def test_month_spine_recurses_in_plan_with_pruned_scan(spark):
    plan = _plan(spark, "monthly_order_spine")
    assert "UnionLoop" in plan  # recursion executes in-plan, no driver loop
    assert "ReadSchema: struct<o_totalprice:double,o_orderdate:timestamp>" in plan


def test_bitmap_rollup_scans_facts_once(spark):
    # both grains must read the checkpointed day-grain bitmap state;
    # a second FileScan of events would break the merge-from-sketches claim
    plan = _plan(spark, "bitmap_distinct_users")
    assert "FileScan" not in plan
    assert plan.count("Scan ExistingRDD") == 2
    assert "bitmap_or_agg" in plan


def test_chunking_is_shuffle_free(spark):
    # chunking is embarrassingly parallel: scan -> project -> explode in
    # one pipelined stage; the only exchange is the fan_out round-robin
    plan = _plan(spark, "doc_chunks_overlap")
    assert "Exchange hashpartitioning" not in plan
    assert "Generate explode" in plan


def test_bpe_pairs_aggregate_over_vocab_with_topk(spark):
    plan = _plan(spark, "bpe_pair_stats")
    # top-20 is a TakeOrderedAndProject, never a global sort
    assert "TakeOrderedAndProject" in plan
    # pair counts map-side combined before the exchange
    assert "partial_sum" in plan
    # the pair explode runs over the distinct-word aggregate (term,c),
    # not over raw corpus tokens
    assert "Generate explode(transform" in plan


def test_quota_cap_pushes_rank_limit_below_shuffle(spark):
    # Spark's WindowGroupLimit must prune each map partition to the top
    # 15 per source BEFORE the exchange — at 100 TB this is the
    # difference between shuffling the corpus and shuffling ~the output
    plan = _plan(spark, "source_quota_cap")
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_bloom_words_table_is_broadcast(spark):
    plan = _plan(spark, "bloom_incremental_dedup")
    # the probe joins the batch against a BROADCAST bloom words table
    assert "BroadcastHashJoin" in plan
    # and the exact re-verification is an anti-join, not a full join
    assert "LeftAnti" in plan


def test_tfidf_broadcasts_query_vectors(spark):
    plan = _plan(spark, "tfidf_cosine_topk")
    # the 5 query docs' sparse vectors ride broadcast; the corpus-side
    # weights table is never broadcast
    assert "BroadcastHashJoin" in plan


def test_bigram_lm_single_explode_with_partial_counts(spark):
    plan = _plan(spark, "bigram_lm_scores")
    # the bigram table is checkpointed once and feeds both count models
    # and the scorer — no second explode of the corpus
    assert plan.count("Generate explode") <= 1
    assert "partial_count" in plan
    # vocabulary size rides as a one-row broadcast
    assert "BroadcastNestedLoopJoin" in plan


def test_spatial_join_meets_on_grid_cells(spark):
    plan = _plan(spark, "stations_within_500km")
    # candidates meet by equi-join on (cell_lat, cell_lon) — the
    # haversine is a join-condition filter, never a cross product
    assert "BroadcastHashJoin [cell_lat" in plan
    assert "CrossJoin" not in plan and "CartesianProduct" not in plan


def test_skyline_sweep_has_no_global_window(spark):
    plan = _plan(spark, "order_value_frontier")
    # the running max must be partitioned by the physical partition id
    # (two-pass prefix max) — a no-PARTITION-BY window is one reducer
    assert "windowspecdefinition(__pid" in plan
    import re
    assert not re.search(r"windowspecdefinition\((?:price|epoch_day)", plan), (
        "global (no-partition) window leaked into the skyline sweep"
    )


def test_pmi_topk_is_take_ordered(spark):
    plan = _plan(spark, "collocation_pmi_top")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_quality_suite_is_one_pass_plus_anti_joins(spark):
    # deequ shape: every single-table constraint folds into ONE
    # aggregate over orders (one FileScan feeding a partial_ HashAggregate
    # with all the metrics), FK checks are LeftAnti joins
    plan = _plan(spark, "data_quality_report")
    assert plan.count("LeftAnti") == 2
    assert "partial_count(1), partial_count(o_orderkey" in plan, (
        "constraint metrics must fold into one aggregate pass:\n" + plan
    )


def test_weighted_sample_uses_window_group_limit(spark):
    # per-source top-5 must plan the running rank-limit (partial before
    # the shuffle, final after) — never a full per-group sort
    plan = _plan(spark, "source_weighted_topk_sample")
    assert plan.count("WindowGroupLimit") == 2, plan
    assert "Partial" in plan and "Final" in plan


def test_dsir_recomputes_explode_and_broadcasts_model(spark):
    # the bigram explode is deliberately recomputed per consumer (two
    # Generate nodes): checkpointing 110M token-grain rows measured
    # 44.2 s vs 4.3 s (~10x) for this form at K=64. The 256-row
    # log-ratio model and totals ride back as broadcasts.
    plan = _plan(spark, "dsir_importance_weights")
    assert plan.count("Generate explode") == 2, plan
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan


def test_semantic_dedup_is_one_grouped_gemm_per_cluster(spark):
    # the pairwise probe is one shuffle on the cluster key feeding a
    # grouped Arrow kernel (blocked GEMM per cluster) — no per-pair
    # join, no cartesian; the K=16 stress showed the HOF self-join form
    # at 146 s vs ~2 s for this plan
    plan = _plan(spark, "semantic_dedup_report")
    assert "FlatMapGroupsInPandas" in plan, plan
    assert plan.count("Exchange hashpartitioning(label") == 1, plan
    assert "CartesianProduct" not in plan and "Join" not in plan, plan


def test_mad_runs_median_on_daily_aggregate_only(spark):
    # the only full-data pass is the (type, day) partial aggregate;
    # medians run on the tiny daily table and ride back as broadcasts
    plan = _plan(spark, "mad_outlier_days")
    assert "partial_avg" in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_ewma_windows_share_one_sort(spark):
    # both running sums and the row_number ride the same
    # (event_type, obs_date) sort order — one Sort under the two
    # Window operators, no re-sort between them; exactly the daily-agg
    # exchange plus the per-type window exchange
    plan = _plan(spark, "ewma_daily_value")
    assert plan.count("+- Sort") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_triangle_join_broadcasts_collapsed_edges(spark):
    # triangle enumeration self-joins run on the collapsed nation-pair
    # edge list (broadcast), and the heavy distinct reuses a hash
    # partitioning rather than a cartesian
    plan = _plan(spark, "trading_triangles")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sq8_quantizes_in_plan_without_python(spark):
    # quantization stats ride a 1-row broadcast; encode + ADC scoring
    # are transform()/aggregate() expressions — no BatchEvalPython /
    # ArrowEvalPython anywhere in the plan
    plan = _plan(spark, "sq8_ann_topk")
    assert "EvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ols_is_one_pass_sufficient_stats(spark):
    # the fit is two hash aggregates (daily grain, then the five
    # sufficient sums) over ONE scan of events — no window, no
    # iterative solver, no second pass for R^2
    plan = _plan(spark, "ols_daily_trend")
    assert plan.count("Scan parquet") == 1, plan
    assert "partial_" in plan
    assert "Window" not in plan, "OLS must not need a window:\n" + plan


def test_chi2_touches_facts_once(spark):
    # raw events feed exactly one aggregate; margins and the statistic
    # run over the R x C contingency table (dozens of rows)
    plan = _plan(spark, "event_weekday_chi2")
    assert plan.count("Scan parquet") == 1, plan
    assert "partial_" in plan


def test_bfs_min_hop_semantics(spark):
    # final-frame plan audit is blinded by the per-round checkpoints
    # (Scan ExistingRDD), so pin the operator's SEMANTICS instead:
    # multi-source min-distance on a hand-built graph with a shortcut
    # edge — a node reachable in 1 hop via one seed and 3 via another
    # must label 1, and an unreachable node must not appear.
    from end_to_end_database_pipeline_project_spark.operators.graph import (
        bfs_hops,
    )

    seeds = spark.createDataFrame([("a",), ("b",)], "node STRING")
    und = [("a", "x"), ("x", "y"), ("y", "z"), ("b", "z"), ("q", "r")]
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src STRING, dst STRING"
    )
    got = {r["node"]: r["hop"] for r in bfs_hops(seeds, edges, 3).collect()}
    assert got == {"a": 0, "b": 0, "x": 1, "z": 1, "y": 2}, got


def test_hybrid_rrf_sides_are_topk_bounded(spark):
    # each retrieval side must end in its own partial top-k
    # (TakeOrderedAndProject) BEFORE rank assignment and fusion — the
    # unpartitioned rank windows then run on 20-row frames, bounded by
    # the candidate count, never the corpus
    plan = _plan(spark, "hybrid_rrf_retrieval")
    assert plan.count("TakeOrderedAndProject") >= 2, plan


def test_quantile_norm_window_is_source_partitioned(spark):
    # the rank pass must partition by source (independent per-source
    # sorts under one shuffle), and the scan reads only the three
    # referenced columns
    plan = _plan(spark, "quantile_normalized_scores")
    # the corpus-sized ntile rank pass is materialized ONCE behind the
    # checkpointed bucket table; both consumers (reference aggregate,
    # deviation join) read that shared state — so the final plan shows
    # two ExistingRDD reads and NO re-planned rank window
    assert plan.count("Scan ExistingRDD") == 2, plan
    assert "ntile" not in plan, plan


def test_transition_matrix_has_partial_agg(spark):
    # the transition aggregate map-side combines before its exchange;
    # the per-user lead window is the only fact-sized shuffle
    plan = _plan(spark, "event_transition_matrix")
    assert "partial_count" in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_mix_shift_single_pass_conditional_agg(spark):
    # both periods computed in one conditional aggregate — no second
    # scan of orders, no union of per-period subplans
    plan = _plan(spark, "mix_shift_decomposition")
    assert plan.count("Scan parquet") == 2, plan  # orders + customer
    assert "partial_sum" in plan, plan


def test_survival_scans_events_once(spark):
    # the horizon derives from the checkpointed user-grain aggregate
    # (per-user max ts -> one-row max), so the corpus is scanned once
    # and both consumers read the shared user table
    plan = _plan(spark, "conversion_survival")
    assert "FileScan" not in plan and plan.count("Scan ExistingRDD") == 2, plan


def test_ab_ztest_single_pass(spark):
    # assignment is a hash EXPRESSION (no join against an assignment
    # table): one scan, one user-grain aggregate with map-side combine,
    # one scalar reduction
    plan = _plan(spark, "ab_conversion_ztest")
    assert plan.count("Scan parquet") == 1, plan
    assert "partial_" in plan and "Join" not in plan, plan


def test_linear_interp_exact_values(spark):
    # row-grain semantics of the interpolation (the registered query
    # aggregates to user grain because per-cell rationals land on
    # 6th-decimal rounding ties): a 10 -> 20 ramp across a 4-hour gap
    # must read 12/14/16/18, and edge gaps take the one-sided value
    from datetime import datetime

    from pyspark.sql import functions as F

    from end_to_end_database_pipeline_project_spark.plans.relational_queries import (
        _interp_table,
    )

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 30), 10.0),
            (1, datetime(2024, 1, 1, 5, 30), 20.0),
        ],
        "user_id INT, ts TIMESTAMP, value DOUBLE",
    )
    b = _interp_table(ev)
    vi = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.unix_timestamp("h") - F.unix_timestamp("ph")).cast("double")
            / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
        )
    )
    got = {
        r["h"].hour: r["vi"]
        for r in b.select("h", vi.alias("vi")).collect()
    }
    assert got == {0: 10.0, 1: 12.0, 2: 14.0, 3: 16.0, 4: 18.0, 5: 20.0}, got


def test_rfm_quartiles_have_no_global_entity_window(spark):
    # three distributed_ntile passes: every per-row window must be
    # partitioned by the physical partition id; only the subtotal
    # offsets (O(#partitions) rows) may run unpartitioned
    plan = _plan(spark, "customer_rfm_segments")
    import re
    assert "windowspecdefinition(__pid" in plan
    assert "ntile" not in plan, "window ntile leaked back into the plan"
    assert not re.search(
        r"windowspecdefinition\((?:last_order|frequency|monetary|o_custkey)", plan
    ), "global (no-partition) window over the customer grain:\n" + plan


def test_pareto_prefix_sum_is_distributed(spark):
    plan = _plan(spark, "supplier_pareto_abc")
    import re
    assert "windowspecdefinition(__pid" in plan
    assert not re.search(
        r"windowspecdefinition\((?:revenue|l_suppkey)", plan
    ), "global (no-partition) cumulative window over the supplier grain:\n" + plan


def test_no_unbounded_topandas_in_plans():
    # a driver-side toPandas() is only legal on an explicitly bounded
    # slab (a `< N` id filter in the same expression) — the full-corpus
    # collection that used to live in embedding_dedup_components is the
    # one driver-OOM shape this engine bans
    import pathlib
    import re

    plans_dir = (
        pathlib.Path(__file__).resolve().parents[1]
        / "end_to_end_database_pipeline_project_spark"
    )
    offenders = []
    for py in plans_dir.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if ".toPandas()" in line and not re.search(r"<\s*\d+", line):
                offenders.append(f"{py.name}:{i}: {line.strip()}")
    assert not offenders, "unbounded driver collection:\n" + "\n".join(offenders)


# ------------------------------------------------- round-4 additions


def test_token_budget_prefix_sum_is_distributed(spark):
    # the running token total must be the two-pass form: per-row windows
    # partitioned by the physical partition id, offsets broadcast back —
    # never a global ORDER BY window over the document grain
    plan = _plan(spark, "token_budget_selection")
    import re
    assert "windowspecdefinition(__pid" in plan
    assert not re.search(
        r"windowspecdefinition\((?:quality_permille|n_tokens|doc_id)", plan
    ), "global (no-partition) window over the document grain:\n" + plan


def test_kneser_ney_models_read_checkpointed_type_table(spark):
    # the bigram explode runs once into a checkpoint; ALL model
    # statistics (bigram counts, context totals, continuation counts,
    # type count) then derive from the checkpointed bigram-TYPE table —
    # no second explode, no FileScan re-read; the type count rides as a
    # one-row broadcast
    plan = _plan(spark, "kneser_ney_scores")
    assert "FileScan" not in plan, plan
    assert "Generate explode" not in plan, "the corpus re-exploded:\n" + plan
    assert "BroadcastNestedLoopJoin" in plan  # one-row type count
    assert "partial_count" in plan or "partial_sum" in plan


def test_cdc_chunking_stays_native_with_one_explode(spark):
    # boundary detection + slicing are array expressions (no Python
    # evaluator anywhere); only the chunk explode generates rows, and
    # the distinct aggregate combines map-side
    plan = _plan(spark, "cdc_chunk_dedup")
    assert "EvalPython" not in plan, plan
    assert plan.count("Generate explode") == 1, plan
    assert "partial_count" in plan


def test_knn_probes_broadcast_against_one_corpus_pass(spark):
    # the probe set rides a broadcast (the non-equi self-exclusion join
    # plans as BroadcastNestedLoopJoin); the corpus is never self-joined
    plan = _plan(spark, "knn_label_accuracy")
    assert "BroadcastNestedLoopJoin BuildRight" in plan, plan
    assert "CartesianProduct" not in plan


def test_centroid_confusion_broadcasts_prototypes(spark):
    # the |labels|-row centroid table must broadcast against the corpus
    # scan; assignment is an argmax window per vector, never a shuffle
    # of the corpus against itself
    plan = _plan(spark, "centroid_classifier_confusion")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan


def test_bitmap_set_algebra_reads_stored_state_only(spark):
    # every count (per-type, union, intersection) derives from the
    # checkpointed (type, bucket) bitmap table — a second FileScan of
    # events would break the stored-sketch claim; unions OR-merge and
    # intersections come from inclusion-exclusion, so no bitmap_and
    plan = _plan(spark, "bitmap_set_algebra")
    assert "FileScan" not in plan, plan
    assert "bitmap_or_agg" in plan
    # the checkpointed KB-sized state may be re-read per consumer
    # (totals x2 for the pair self-join, the union path, the final
    # join) — cheap by construction; what matters is zero fact scans
    assert plan.count("Scan ExistingRDD") >= 2, plan


def test_edit_distance_verifier_has_no_cartesian(spark):
    # the O(len^2) Levenshtein DP must only run on LSH survivor pairs:
    # texts join back by id (hash joins), never an all-pairs product
    plan = _plan(spark, "edit_distance_on_lsh_survivors")
    assert "levenshtein" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_prefix_sum_partition_assignment_is_pinned(spark):
    # regression for the round-3/4 range-partition consistency bug:
    # the sampled range partitioner derives boundaries from the RUN
    # (input-split order, session sampling), so two plan branches (or
    # two sessions) could assign the same row to different partitions,
    # silently corrupting the global rank. The round-5 fix removes
    # sampling entirely — the bin id is a pure function of the data
    # (hash-bucket MIN-key candidates -> in-plan boundaries -> per-row
    # boundary count). The plan must therefore contain NO sampled
    # range exchange and NO checkpoint scan: determinism by
    # construction, not by materialization.
    for name in ("token_budget_selection", "customer_rfm_segments",
                 "supplier_pareto_abc", "order_value_frontier",
                 "sequence_packing_report", "event_id_islands"):
        plan = _plan(spark, name)
        assert "rangepartitioning" not in plan, name + ":\n" + plan
        assert "REPARTITION_BY_RANGE" not in plan, name
        assert "Scan ExistingRDD" not in plan, (
            name + ": checkpoint in plan — determinism must not depend "
            "on per-run materialization\n" + plan
        )
        # the deterministic candidate pass is present
        assert "xxhash64" in plan, name + ":\n" + plan
