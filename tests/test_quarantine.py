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
