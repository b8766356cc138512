"""Shape/behavior tests for the applyInPandas per-node seasonal model
(ml/modeling.py) — the U4 GAM stand-in. No SQL oracle exists for an
iterative fit; these assertions are the correctness gate."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from traffic_data_pipeline_spark.ml.modeling import modeling_node
from traffic_data_pipeline_spark.operators.compare import hourly_spine


def _true_volume(ts: pd.Timestamp) -> int:
    """Deterministic seasonal ground truth: weekday rush-hour bump."""
    weekday = ts.dayofweek < 5
    diurnal = max(0.0, math.sin(2 * math.pi * (ts.hour - 5) / 24.0))
    base = 40.0 + (120.0 if weekday else 30.0) * diurnal
    return int(round(base))


@pytest.fixture(scope="module")
def model_out(spark):
    hours = pd.date_range("2023-01-02", "2023-03-27", freq="h", inclusive="left")
    train = pd.DataFrame({
        "node_name": "nA",
        "ts": hours,
        "volume_sum": [_true_volume(t) for t in hours],
    })
    # a second node with too little history -> must be skipped
    tiny = train.head(10).assign(node_name="nB")
    train_df = spark.createDataFrame(pd.concat([train, tiny]))
    nodes = spark.createDataFrame([("nA",), ("nB",)], "node_name string")
    spine = hourly_spine(spark, "2023-04-03 00:00:00", "2023-04-09 23:00:00",
                         nodes)
    out = modeling_node(train_df, spine, "hour").cache()
    yield out
    out.unpersist()


def test_schema_and_coverage(model_out):
    assert [f.name for f in model_out.schema.fields] == [
        "NODE_NAME", "PREDICT_TIME", "VOLUMN_PREDICTION"]
    rows = model_out.collect()
    # nA scores the full 7-day spine; nB (10 train rows) is dropped
    assert {r.NODE_NAME for r in rows} == {"nA"}
    assert len(rows) == 7 * 24


def test_day_grain_weekly_structure():
    """Day-grain fit (the RTMC_PREDICT_DAY path) recovers the
    weekday-vs-weekend level difference from daily totals."""
    import numpy as np

    from traffic_data_pipeline_spark.session import get_spark

    spark = get_spark("tdp-tests", shuffle_partitions=8)
    days = pd.date_range("2023-01-02", "2023-03-27", freq="D")
    train = pd.DataFrame({
        "node_name": "nA",
        "ts": days,
        "volume_sum": [2000 if t.dayofweek < 5 else 900 for t in days],
    })
    nodes = spark.createDataFrame([("nA",)], "node_name string")
    spine = hourly_spine(spark, "2023-04-03 00:00:00", "2023-04-09 00:00:00",
                         nodes, step="1 day")
    out = modeling_node(spark.createDataFrame(train), spine, "day")
    pred = {r.PREDICT_TIME.weekday(): r.VOLUMN_PREDICTION for r in out.collect()}
    assert len(pred) == 7
    weekday_mean = np.mean([pred[d] for d in range(5)])
    weekend_mean = np.mean([pred[d] for d in (5, 6)])
    assert weekday_mean > 1.5 * weekend_mean
    assert abs(weekday_mean - 2000) / 2000 < 0.15


def test_seasonal_structure_recovered(model_out):
    pred = {(r.PREDICT_TIME.weekday(), r.PREDICT_TIME.hour): r.VOLUMN_PREDICTION
            for r in model_out.collect()}
    # weekday rush hour >> weekday night
    assert pred[(1, 11)] > pred[(1, 3)]
    # weekday rush hour >> same hour on Sunday
    assert pred[(1, 11)] > pred[(6, 11)]
    # magnitudes in the right ballpark of the generating process
    true_mean = sum(_true_volume(t) for t in pd.date_range(
        "2023-04-03", "2023-04-10", freq="h", inclusive="left")) / (7 * 24)
    got_mean = sum(pred.values()) / len(pred)
    assert abs(got_mean - true_mean) / true_mean < 0.15
    assert all(v >= 0 for v in pred.values())
