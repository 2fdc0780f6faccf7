"""As-of join edge cases on hand-crafted frames.

The oracle-parity test covers the bulk behavior; these pin the corner
semantics both implementations must share:

- tie at identical timestamps: the right row IS visible (right sorts
  before left at equal time);
- left key with no right rows: left rows survive with null as-of
  columns;
- right rows strictly after every left row: nulls, not the "nearest"
  future row (backward direction only);
- the union+window and merge_asof paths agree row-for-row.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.operators.asof import (
    asof_join,
    asof_join_pandas,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2025-01-01T10:00:00"), "u1"),
            (2, _ts("2025-01-01T11:00:00"), "u1"),
            (3, _ts("2025-01-01T09:00:00"), "u2"),  # before any right row
            (4, _ts("2025-01-01T12:00:00"), "u3"),  # key with no right rows
        ],
        "event_id long, ts timestamp, user_id string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10.0, _ts("2025-01-01T10:00:00")),  # tie with left #1
            ("u1", 20.0, _ts("2025-01-01T10:30:00")),
            ("u2", 30.0, _ts("2025-01-01T09:30:00")),  # after left #3
        ],
        "user_id string, purchase_value double, purchase_ts timestamp",
    )
    return left, right


def _expected():
    return {
        1: 10.0,   # tie: right row at the same instant is visible
        2: 20.0,   # latest at-or-before 11:00
        3: None,   # right row exists but only in the future
        4: None,   # no right rows for the key at all
    }


def _check(rows):
    got = {r["event_id"]: r["purchase_value_asof"] for r in rows}
    assert got == _expected()


def test_asof_union_window_edges(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="ts", by="user_id", right_on="purchase_ts",
        right_cols=["purchase_value"],
    )
    _check(out.collect())


def test_asof_pandas_edges(spark):
    left, right = _frames(spark)
    out = asof_join_pandas(
        left, right, on="ts", by="user_id", right_on="purchase_ts",
        right_cols=["purchase_value"],
    )
    _check(out.collect())


def test_asof_paths_agree(spark):
    left, right = _frames(spark)
    a = asof_join(
        left, right, on="ts", by="user_id", right_on="purchase_ts",
        right_cols=["purchase_value"],
    ).select("event_id", "purchase_value_asof")
    b = asof_join_pandas(
        left, right, on="ts", by="user_id", right_on="purchase_ts",
        right_cols=["purchase_value"],
    ).select("event_id", "purchase_value_asof")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
