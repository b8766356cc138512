"""Explicit StructTypes for every persisted table.

The reference creates each output table with a handwritten CREATE TABLE
(/root/reference/R/1) Get-Historical-Configuration-Data-RunOnce.R:8-18,
 R/2) Write-Historical-SensorData-RunOnce.R:8-25,
 R/1) SensorData-Modeling-Hourly-RunOnce.R:9-19). These are the Spark
equivalents (SURVEY.md §1.2 type mapping). NUMERIC(4,1) columns are
DoubleType rounded to 1 decimal in app code, matching the reference's own
round-then-write behavior (/root/reference/R/_pull_data.R:674-688).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw 30-second detector readings — input contract of
# tc.sensors::pull_sensor as consumed at /root/reference/R/_pull_data.R:414-434
# (2,880 rows per sensor-day; volume/occupancy nullable).
SENSOR_30S = T.StructType([
    T.StructField("sensor", T.StringType(), False),
    T.StructField("start_datetime", T.TimestampType(), False),
    T.StructField("date", T.DateType(), False),
    T.StructField("volume", T.IntegerType(), True),
    T.StructField("occupancy", T.IntegerType(), True),
])

# RTMC_15MIN fact — DDL at
# /root/reference/R/2) Write-Historical-SensorData-RunOnce.R:8-18
RTMC_15MIN = T.StructType([
    T.StructField("DETECTOR_NAME", T.StringType(), False),
    T.StructField("START_DATETIME", T.TimestampType(), False),
    T.StructField("START_DATE", T.DateType(), False),
    T.StructField("VOLUME_PCT_NULL", T.DoubleType(), True),
    T.StructField("VOLUME_SUM", T.IntegerType(), True),
    T.StructField("VOLUME_SUM_IMPUTE", T.IntegerType(), True),
    T.StructField("OCCUPANCY_PCT_NULL", T.DoubleType(), True),
    T.StructField("OCCUPANCY_SUM", T.IntegerType(), True),
    T.StructField("OCCUPANCY_SUM_IMPUTE", T.IntegerType(), True),
    T.StructField("SPEED", T.DoubleType(), True),
    T.StructField("NODE_NAME", T.StringType(), True),
    T.StructField("CORRIDOR_ROUTE", T.StringType(), True),
])

# Flattened config snapshot — output contract of GetHistoricalData
# (/root/reference/R/_pull_data.R:109-136); one row per detector per snapshot.
CONFIG_SNAPSHOT = T.StructType([
    T.StructField("DETECTOR_NAME", T.StringType(), False),
    T.StructField("DETECTOR_LABEL", T.StringType(), True),
    T.StructField("DETECTOR_CATEGORY", T.StringType(), True),
    T.StructField("DETECTOR_LANE", T.IntegerType(), True),
    T.StructField("DETECTOR_FIELD", T.DoubleType(), True),
    T.StructField("DETECTOR_ABANDONED", T.StringType(), True),  # 't'/'f'
    T.StructField("NODE_NAME", T.StringType(), True),
    T.StructField("NODE_N_TYPE", T.StringType(), True),
    T.StructField("NODE_TRANSITION", T.StringType(), True),
    T.StructField("NODE_LABEL", T.StringType(), True),
    T.StructField("NODE_LON", T.DoubleType(), True),
    T.StructField("NODE_LAT", T.DoubleType(), True),
    T.StructField("NODE_LANES", T.IntegerType(), True),
    T.StructField("NODE_SHIFT", T.IntegerType(), True),
    T.StructField("NODE_S_LIMIT", T.IntegerType(), True),
    T.StructField("NODE_STATION_ID", T.StringType(), True),
    T.StructField("NODE_ATTACH_SIDE", T.StringType(), True),
    T.StructField("CORRIDOR_ROUTE", T.StringType(), True),
    T.StructField("CORRIDOR_DIR", T.StringType(), True),
    T.StructField("SNAPSHOT_DATE", T.DateType(), False),
])

# SCD-2 dimension RTMC_CONFIG_HISTORICAL — CONFIG_SNAPSHOT minus
# SNAPSHOT_DATE plus change stamp + validity interval; sentinels
# 1900-01-01 / 2100-01-01
# (/root/reference/R/1) Get-Historical-Configuration-Data-RunOnce.R:23-25;
# LAST_CHANGE_DATE mutated per update, R/_pull_data.R:257,273,289).
CONFIG_HISTORICAL = T.StructType(
    [f for f in CONFIG_SNAPSHOT.fields if f.name != "SNAPSHOT_DATE"]
    + [
        T.StructField("LAST_CHANGE_DATE", T.DateType(), True),
        T.StructField("START_DATE", T.DateType(), False),
        T.StructField("END_DATE", T.DateType(), False),
        T.StructField("DEACTIVATE", T.BooleanType(), False),
    ]
)

# Append-only changelog RTMC_CONFIG_CHANGELOG
# (/root/reference/R/1) Get-Historical-Configuration-Data-RunOnce.R:8-11).
CONFIG_CHANGELOG = T.StructType([
    T.StructField("Update_Date", T.DateType(), False),
    T.StructField("Change", T.StringType(), False),
    T.StructField("DETECTOR_NAME", T.StringType(), False),
    T.StructField("Old_Value", T.StringType(), True),
    T.StructField("New_Value", T.StringType(), True),
    T.StructField("Last_Update_Date", T.DateType(), True),
])

# RTMC_PREDICT_{HOUR,DAY} — DDL at
# /root/reference/R/1) SensorData-Modeling-Hourly-RunOnce.R:9-12 (the
# reference misspells VOLUMN_PREDICTION; we keep the name for parity).
PREDICT = T.StructType([
    T.StructField("NODE_NAME", T.StringType(), False),
    T.StructField("PREDICT_TIME", T.TimestampType(), False),
    T.StructField("VOLUMN_PREDICTION", T.IntegerType(), True),
    T.StructField("CORRIDOR_ROUTE", T.StringType(), True),
])

SENTINEL_START = "1900-01-01"
SENTINEL_END = "2100-01-01"
ABANDONED_BACKDATE = "2019-07-31"  # /root/reference/R/_pull_data.R:267-284
