"""Seasonal-profile prediction + actual-vs-predicted comparison
(SURVEY.md §2: F11 calendar spine, J12, P3;
reference §3.3 /root/reference/R/_analyze_data.R:308-387 and the
prediction-table build :227-300).

The reference fits a GAM per node (U4) and scores a dense 2020-2030 grid.
The SQL-expressible stand-in here is the same *shape*: a per-(node,
weekday, hour-of-day) historical average profile scored onto a dense
hourly spine — which is exactly the seasonal component the reference GAM
models (`s(itime, by=weekday) + weekday`). The applyInPandas GLM variant
lives in ml/modeling.py; this one is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_spine(spark: SparkSession, start: str, stop: str,
                 nodes: DataFrame, step: str = "1 hour") -> DataFrame:
    """F11: sequence() + explode calendar spine x node dimension
    (/root/reference/R/_analyze_data.R:227-232 builds seq.POSIXt per node;
    the daily model uses a 1-day step, R/2) SensorData-Modeling-Daily-
    RunOnce.R:22). One sequence literal exploded then cross-joined with
    the (tiny, broadcast) node dim — the spine itself never shuffles."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(stop).cast("timestamp"),
                F.expr(f"INTERVAL {step}"),
            )
        ).alias("predict_time")
    )
    return spine.crossJoin(F.broadcast(nodes))


def seasonal_profile(train: DataFrame) -> DataFrame:
    """Per-(node, weekday, hour-of-day) mean volume over the training slice.

    weekday encoded 0=Sunday..6 (matches DuckDB's dayofweek()); the
    reference's GAM uses the same two seasonal features
    (/root/reference/R/_analyze_data.R:219-225).
    """
    return (
        train.groupBy(
            "node_name",
            (F.dayofweek("ts") - 1).alias("dow"),
            F.hour("ts").alias("hod"),
        )
        .agg(
            F.round(
                F.sum(F.col("volume_sum").cast("decimal(18,6)")).cast("double")
                / F.count("volume_sum")
            ).cast("int").alias("VOLUMN_PREDICTION")  # sic — reference DDL
        )
    )


def compare_actual_predicted(actual: DataFrame, predicted: DataFrame) -> DataFrame:
    """J12 + P3: inner join on (node, time), VOLUME_DIFF = actual - predicted
    (/root/reference/R/_analyze_data.R:369-384)."""
    return (
        actual.alias("a")
        .join(
            predicted.alias("p"),
            (F.col("a.node_name") == F.col("p.node_name"))
            & (F.col("a.ts") == F.col("p.predict_time")),
            "inner",
        )
        .select(
            F.col("a.node_name").alias("node_name"),
            F.col("a.ts").alias("start_datetime"),
            F.col("a.volume_sum").alias("volume_sum"),
            F.col("p.VOLUMN_PREDICTION").alias("VOLUMN_PREDICTION"),
            (F.col("a.volume_sum") - F.col("p.VOLUMN_PREDICTION")).alias("VOLUME_DIFF"),
        )
    )
