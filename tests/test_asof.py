"""Edge-case tests for the as-of join operator (operators/asof.py):
inclusive-at-equal-ts, no-prior-row NULL, tie collapse, key isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from traffic_data_pipeline_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame([
        Row(k=1, ts=_ts("2024-01-01 00:05:00"), ev="a"),   # after r1
        Row(k=1, ts=_ts("2024-01-01 00:10:00"), ev="b"),   # == r2 (inclusive)
        Row(k=1, ts=_ts("2024-01-01 00:00:30"), ev="c"),   # before any right
        Row(k=2, ts=_ts("2024-01-01 09:00:00"), ev="d"),   # other key: no right rows
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=_ts("2024-01-01 00:01:00"), v=10.0),
        Row(k=1, ts=_ts("2024-01-01 00:10:00"), v=20.0),
    ])
    out = {
        r["ev"]: r["val"]
        for r in asof_join(left, right, "k", "ts", "ts", "v", "val").collect()
    }
    assert out == {"a": 10.0, "b": 20.0, "c": None, "d": None}


def test_asof_right_ties_collapse_to_max(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01 01:00:00"))])
    right = spark.createDataFrame([
        Row(k=1, ts=_ts("2024-01-01 00:30:00"), v=5.0),
        Row(k=1, ts=_ts("2024-01-01 00:30:00"), v=7.0),  # same (k, ts)
    ])
    [row] = asof_join(left, right, "k", "ts", "ts", "v").collect()
    assert row["v"] == 7.0


def test_asof_left_duplicates_preserved(spark):
    left = spark.createDataFrame([
        Row(k=1, ts=_ts("2024-01-01 01:00:00"), tag="x"),
        Row(k=1, ts=_ts("2024-01-01 01:00:00"), tag="y"),
    ])
    right = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01 00:00:00"), v=1.0)])
    rows = asof_join(left, right, "k", "ts", "ts", "v").collect()
    assert len(rows) == 2 and all(r["v"] == 1.0 for r in rows)


def test_asof_single_shuffle_plan(spark):
    """The union-tag formulation must cost ONE hash exchange (on the key),
    not a join: that's the property that makes it survive 100x data."""
    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01 01:00:00"))])
    right = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01 00:00:00"), v=1.0)])
    plan = (
        asof_join(left, right, "k", "ts", "ts", "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    # one exchange for the right-side tie collapse + one for the window is
    # acceptable only if they share partitioning; require <= 2 and no
    # broadcast/sort-merge join machinery
    assert plan.count("Exchange hashpartitioning") <= 2
