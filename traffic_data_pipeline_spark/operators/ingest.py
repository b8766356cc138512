"""End-to-end sensor ingest pipeline (reference lifecycle §3.1,
/root/reference/R/Run_Pipline_PullData.R -> GetSensor at
/root/reference/R/_pull_data.R:368-717).

The reference forks 5 OS processes and loops sensors/days; here the whole
nightly ingest is ONE lazy DataFrame DAG:

    30-sec readings
      -> clean + 15-min window agg (operators.aggregate)
      -> imputation cascade        (operators.impute)
      -> config enrich join J8     (/root/reference/R/_pull_data.R:456-464)
      -> RTMC_15MIN-shaped fact

At scale the output is written partitioned by START_DATE (the reference
appends one day per dbWriteTable call, :712-715 — partition overwrite makes
the nightly re-run idempotent instead of double-inserting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.operators.aggregate import aggregate_detector
from traffic_data_pipeline_spark.operators.impute import impute
from traffic_data_pipeline_spark.sources.sensor import detector_config, sensor_readings


# One materialized fact per (session, sf_dir): the reference PERSISTS
# RTMC_15MIN and every downstream job reads the table rather than re-running
# the ingest (/root/reference/R/_pull_data.R:712-715); the session-scoped
# persist is that table's in-process stand-in for the seven fact-derived
# queries (roll-ups, QAQC, model, comparison).
_FACT_CACHE: dict[tuple[str, str], DataFrame] = {}


def build_rtmc_15min(spark: SparkSession, sf_dir: str,
                     use_cache: bool = True) -> DataFrame:
    """Full ingest DAG producing the RTMC_15MIN fact shape
    (DDL: /root/reference/R/2) Write-Historical-SensorData-RunOnce.R:8-18)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if use_cache and key in _FACT_CACHE:
        return _FACT_CACHE[key]
    readings = sensor_readings(spark, sf_dir)
    # The config dimension is tiny but (as a fixture stand-in) derived by a
    # full distinct over events; cache it so its two uses (field_length for
    # the speed formula, node/corridor enrich) compute it once. In
    # production it is a stored dimension table — the cache mirrors that.
    config = detector_config(spark, sf_dir).cache()
    agg = aggregate_detector(readings, config)
    imputed = impute(agg)
    enriched = imputed.join(
        F.broadcast(config.select("sensor", "node_name", "corridor_route")),
        "sensor", "left",
    )
    out = enriched.select(
        F.col("sensor").alias("DETECTOR_NAME"),
        F.col("start_datetime").alias("START_DATETIME"),
        F.to_date("start_datetime").alias("START_DATE"),
        F.col("volume_pct_null").alias("VOLUME_PCT_NULL"),
        F.col("volume_sum").alias("VOLUME_SUM"),
        F.col("volume_sum_impute").alias("VOLUME_SUM_IMPUTE"),
        F.col("occupancy_pct_null").alias("OCCUPANCY_PCT_NULL"),
        F.col("occupancy_sum").alias("OCCUPANCY_SUM"),
        F.col("occupancy_sum_impute").alias("OCCUPANCY_SUM_IMPUTE"),
        F.col("speed").alias("SPEED"),
        F.col("node_name").alias("NODE_NAME"),
        F.col("corridor_route").alias("CORRIDOR_ROUTE"),
    )
    if use_cache:
        out = out.persist()
        _FACT_CACHE[key] = out
    return out


def write_rtmc_15min(df: DataFrame, path: str) -> None:
    """Idempotent per-date sink: dynamic partition overwrite by START_DATE
    replaces the reference's blind append (K2) so nightly re-runs don't
    double-insert (SURVEY.md §2.8 note)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("START_DATE")
        .parquet(path)
    )


def write_rtmc_15min_bucketed(df: DataFrame, table: str, path: str,
                              buckets: int = 32) -> None:
    """Scale-path sink: bucket the fact by DETECTOR_NAME (and sort within
    buckets by START_DATETIME) so detector-keyed consumers — the lag-join
    formulation of imputation, detector enrichment, per-detector model
    inputs — read co-partitioned, co-sorted data and join/window WITHOUT a
    shuffle. At 100 TB the one-time bucketed write amortizes across every
    nightly consumer; SURVEY.md §7 ("facts partitioned by date + bucketed
    by detector")."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, "DETECTOR_NAME")
        .sortBy("DETECTOR_NAME", "START_DATETIME")
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )
