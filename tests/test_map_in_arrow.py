"""mapInArrow: the zero-copy Arrow-batch variant of mapInPandas —
RecordBatch in, RecordBatch out, no pandas materialization. Pinned
against the pure-expression result so the Arrow path can never drift
from the Catalyst one."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_map_in_arrow_matches_expression_path(spark):
    ev = load_table(spark, SF, "events").select("event_id", "value")

    def scale(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("event_id"),
                    pc.multiply(batch.column("value"), pa.scalar(2.0)),
                ],
                names=["event_id", "doubled"],
            )

    arrow = ev.mapInArrow(scale, schema="event_id long, doubled double")
    expr = ev.select("event_id", (F.col("value") * 2.0).alias("doubled"))
    got = {(r["event_id"], r["doubled"]) for r in arrow.collect()}
    want = {(r["event_id"], r["doubled"]) for r in expr.collect()}
    assert got == want
