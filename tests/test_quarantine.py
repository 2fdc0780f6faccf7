"""Error-row policy (SURVEY.md §7.4): drop-for-parity vs quarantine."""

from __future__ import annotations

from end_to_end_database_pipeline_project_spark.pipeline.medallion import (
    build_bronze,
    bronze_to_silver,
)

SF = "/root/testdata/sf0.001"


def test_quarantine_flag_keeps_every_row(spark):
    bronze = build_bronze(spark, SF)
    dropped = bronze_to_silver(bronze)                  # reference parity: drop
    kept = bronze_to_silver(bronze, quarantine=True)    # audit mode: flag
    assert "_quarantined" in kept.columns
    assert "_quarantined" not in dropped.columns
    assert kept.count() >= dropped.count()
    assert kept.where("NOT _quarantined").count() == dropped.count()


def test_permissive_json_source_quarantines_corrupt_records(spark, tmp_path):
    """§7.4 at the SOURCE layer: the reference swallows unparseable
    rows (clickhouse_etl.py:254-256); the Spark reader surfaces them
    instead — PERMISSIVE mode lands malformed JSON lines in
    _corrupt_record with every data column null, so the pipeline can
    count/quarantine them rather than silently drop."""
    p = tmp_path / "landing.jsonl"
    p.write_text(
        '{"station_id": "S1", "temperature_c": 21.5}\n'
        "{this is not json}\n"
        '{"station_id": "S2", "temperature_c": 19.0}\n'
        '{"station_id": "S3", "temperature_c": "not-a-number"}\n'
    )
    df = (
        spark.read.schema(
            "station_id string, temperature_c double, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["station_id"] for r in good} == {"S1", "S2"}
    # both the syntax error and the type mismatch are quarantined with
    # the original line preserved for debugging
    assert len(bad) == 2
    assert any("not json" in r["_corrupt_record"] for r in bad)
    assert any("not-a-number" in r["_corrupt_record"] for r in bad)

    # FAILFAST is the strict alternative: same file must raise, and the
    # error must actually be the malformed-record failure
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    strict = (
        spark.read.schema("station_id string, temperature_c double")
        .option("mode", "FAILFAST")
        .json(str(p))
    )
    with pytest.raises(
        (PySparkException, Py4JJavaError), match="MALFORMED_RECORD|FAILFAST|Malformed"
    ):
        strict.collect()
