"""Empty-input totality: the queries that used to crash or diverge on
a zero-row corpus stay fixed.

At 100 TB an empty slice is routine — a partition with no rows for a
date, a tenant with no documents, a cold-start table. A round-6 sweep
of the whole fleet over an all-empty fixture (same schemas, zero rows)
found 22 queries that crashed (ANSI DIVIDE_BY_ZERO, INVALID_ARRAY_INDEX
building range-partition boundaries, np.vstack on zero arrays, KMeans
fit on nothing, schema inference over empty JSON/XML round-trips,
driver-side max() of an empty list) or rendered NULL differently from
their oracles. Each got a deterministic empty branch in plan and/or
oracle; this suite pins STRICT parity for all of them on exactly that
input. The other ~258 queries already passed untouched (their run is
the tools/check_oracle.py sweep, kept out of pytest for time).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import compare  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

if not os.path.isdir(SRC_SF):  # pragma: no cover - machine without fixtures
    pytest.skip(f"fixture dir {SRC_SF} missing", allow_module_level=True)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# every query the round-6 empty-fixture sweep flagged, by failure class
FIXED_ON_EMPTY = [
    # range-partition boundary build on an empty candidate array
    "sequence_packing_report",
    "packing_efficiency_report",
    "event_id_islands",
    # ANSI division by zero on zero counts
    "approx_distinct_orders",
    "hll_partitioned_distinct",
    "cdc_chunk_dedup",
    "data_quality_report",
    # driver-side scalar reads of an empty result
    "gold_partition_refresh",
    "http_api_source_scan",
    "srp_lsh_topk",
    "knn_topk_pandas",
    "embedding_near_dup_pairs",
    "ivf_kmeans_certificate",
    # schema inference over empty round-trip files
    "json_source_stations",
    "xml_roundtrip_nations",
    "binaryfile_corpus_ingest",  # empty landing dir -> typed empty frame
    # NULL-rendering / empty-aggregate semantics aligned with oracle
    "multimodal_decode_quarantine",
    "value_psi_drift",
    "null_handling_defaults",
    "serving_json_envelope",
    "rollup_returnflag_status",
    "cube_status_priority",
    # r10: inputFiles-proof columns hold VACUOUSLY on an empty slice
    # (an all-pruned read touches only schema-bearing empty files; an
    # empty partitioned write lands a flat schema file by design)
    "versioned_partition_pruned_read",
    "versioned_writer_sink",
    "versioned_file_skipping_read",
    "versioned_date_partition_pruning",
    "versioned_partitioned_format_write",
    "versioned_column_drop",
    "versioned_struct_evolution",
    "versioned_cdf_format_read",
    # r11: schema inference must stay deterministic on zero-row chains
    # (empty commits land schema-bearing files, so footer-fold + dir
    # typing still produce the same inferred signature), and the
    # lifecycle's proof columns hold vacuously
    "versioned_schema_inference",
    "versioned_operational_lifecycle",
    "versioned_timestamp_travel",
    "versioned_cdf_stream_sync",
]

ROWS_ONLY_ON_EMPTY = ["ivf_kmeans_topk"]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{SRC_SF}/{t}.parquet' LIMIT 0)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.fixture(scope="module")
def oracle_con(empty_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{empty_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", FIXED_ON_EMPTY)
def test_empty_input_parity(spark, empty_dir, oracle_con, name):
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import (
        ORACLES,
        QUERIES,
    )

    sdf = QUERIES[name](spark, empty_dir).toPandas()
    odf = oracle_con.sql(ORACLES[name]).df()
    errs = compare(name, sdf, odf)
    assert not errs, f"{name} on empty input: {errs}"


@pytest.mark.parametrize("name", ROWS_ONLY_ON_EMPTY)
def test_empty_input_runs(spark, empty_dir, name):
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import QUERIES

    assert QUERIES[name](spark, empty_dir).count() == 0
