"""Derive the traffic-domain inputs from the shared fixture tables.

The reference's raw feed is 30-second detector readings pulled per
sensor-day from the MnDOT API (S4, /root/reference/R/_pull_data.R:414-417).
There is no network here, so the `events` fixture stands in
(FIXTURES.md §1 "stand-in mapping"): `user_id → sensor`, `ts →
start_datetime`, and deterministic arithmetic on `value` yields nullable
volume/occupancy with injected impossible values, so the cleaning (U2) and
null-percentage (F15) paths are exercised. Every expression here has an
exact ANSI-SQL twin in `__spark_entry__.oracle_sql` — keep them in sync.

Only floor/mod arithmetic is used (identical semantics in Spark and
DuckDB; `round()` tie-breaking is avoided on purpose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.sources.tables import load_table

# SQL fragment mirrored by the DuckDB oracles; the Spark side below must
# stay expression-for-expression equivalent.
SENSOR_VIEW_SQL = """
SELECT CAST(user_id AS VARCHAR)                                    AS sensor,
       ts                                                          AS start_datetime,
       CAST(ts AS DATE)                                            AS reading_date,
       CASE WHEN event_type = 'error' THEN NULL
            ELSE CAST(FLOOR(value) % 25 AS INTEGER) END            AS volume,
       CASE WHEN event_type = 'signup' THEN NULL
            ELSE CAST(FLOOR(value * 37.0) % 2000 AS INTEGER) END   AS occupancy
FROM events
"""

CONFIG_VIEW_SQL = """
SELECT CAST(user_id AS VARCHAR)                                   AS sensor,
       300.0 + CAST(user_id % 10 AS DOUBLE) * 50.0                AS field_length,
       'node_' || CAST(user_id % 20 AS VARCHAR)                   AS node_name,
       'corr_' || CAST(user_id % 5 AS VARCHAR)                    AS corridor_route
FROM (SELECT DISTINCT user_id FROM events)
"""


def sensor_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-sec-style readings view over `events` (Spark twin of SENSOR_VIEW_SQL)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("sensor"),
        F.col("ts").alias("start_datetime"),
        F.to_date("ts").alias("reading_date"),
        F.when(F.col("event_type") == "error", F.lit(None))
         .otherwise((F.floor("value") % 25).cast("int")).alias("volume"),
        F.when(F.col("event_type") == "signup", F.lit(None))
         .otherwise((F.floor(F.col("value") * 37.0) % 2000).cast("int")).alias("occupancy"),
    )


def detector_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor dimension (field_length, node, corridor).

    Stands in for the flattened metro_config detector dimension the
    reference reads per run (S7, /root/reference/R/_pull_data.R:371-374).
    Small by construction — always broadcast it into joins.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id").distinct().select(
        F.col("user_id").cast("string").alias("sensor"),
        (F.lit(300.0) + (F.col("user_id") % 10).cast("double") * 50.0).alias("field_length"),
        F.concat(F.lit("node_"), (F.col("user_id") % 20).cast("string")).alias("node_name"),
        F.concat(F.lit("corr_"), (F.col("user_id") % 5).cast("string")).alias("corridor_route"),
    )


# --- derived config snapshots for the SCD-2 suite -------------------------
# Per-detector attribute state computed over a time slice of `events`
# (value > 150 keeps the per-slice detector sets overlapping-but-different,
# so every SCD-2 transition class — added / removed / attribute change /
# abandoned flips — is populated; see FIXTURES.md §2).

def snapshot_sql(pred: str) -> str:
    """DuckDB-SQL twin of config_snapshot for a given ts predicate."""
    return f"""
SELECT CAST(user_id AS VARCHAR)                                  AS DETECTOR_NAME,
       CAST(COUNT(*) % 5 AS INTEGER)                             AS DETECTOR_LANE,
       'cat_' || CAST(COUNT(DISTINCT event_type) AS VARCHAR)     AS DETECTOR_CATEGORY,
       CAST(CAST(SUM(FLOOR(value)) AS BIGINT) % 1000 AS DOUBLE)  AS DETECTOR_FIELD,
       CASE WHEN COUNT(*) % 3 = 0 THEN 't' ELSE 'f' END          AS DETECTOR_ABANDONED
FROM events
WHERE value > 150 AND {pred}
GROUP BY 1
"""


SNAPSHOT_SPLIT = "2024-01-16 00:00:00"
SNAPSHOT_OLD_PRED = f"ts < TIMESTAMP '{SNAPSHOT_SPLIT}'"
SNAPSHOT_NEW_PRED = f"ts >= TIMESTAMP '{SNAPSHOT_SPLIT}'"

# Three-slice variant for the multi-day SCD-2 replay (bootstrap + two
# nightly deltas): thirds of the Jan 2024 events span.
SNAPSHOT_CUT_A = "2024-01-11 00:00:00"
SNAPSHOT_CUT_B = "2024-01-21 00:00:00"
_SLICE_PREDS = {
    "t1": f"ts < TIMESTAMP '{SNAPSHOT_CUT_A}'",
    "t2": (f"ts >= TIMESTAMP '{SNAPSHOT_CUT_A}' AND "
           f"ts < TIMESTAMP '{SNAPSHOT_CUT_B}'"),
    "t3": f"ts >= TIMESTAMP '{SNAPSHOT_CUT_B}'",
    "old": SNAPSHOT_OLD_PRED,
    "new": SNAPSHOT_NEW_PRED,
}


def slice_pred(half: str) -> str:
    """SQL predicate for a named snapshot slice (for oracle construction)."""
    return _SLICE_PREDS[half]


def config_snapshot(spark: SparkSession, sf_dir: str, half: str) -> DataFrame:
    """Flattened config snapshot derived from a time slice of the events
    span: 'old'/'new' (halves at SNAPSHOT_SPLIT) or 't1'/'t2'/'t3' (thirds
    for the multi-day replay). Spark twin of ``snapshot_sql``.
    """
    if half not in _SLICE_PREDS:
        raise ValueError(half)
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 150)
    if half == "old":
        ev = ev.filter(F.col("ts") < F.lit(SNAPSHOT_SPLIT).cast("timestamp"))
    elif half == "new":
        ev = ev.filter(F.col("ts") >= F.lit(SNAPSHOT_SPLIT).cast("timestamp"))
    elif half == "t1":
        ev = ev.filter(F.col("ts") < F.lit(SNAPSHOT_CUT_A).cast("timestamp"))
    elif half == "t2":
        ev = ev.filter(
            (F.col("ts") >= F.lit(SNAPSHOT_CUT_A).cast("timestamp"))
            & (F.col("ts") < F.lit(SNAPSHOT_CUT_B).cast("timestamp")))
    else:
        ev = ev.filter(F.col("ts") >= F.lit(SNAPSHOT_CUT_B).cast("timestamp"))
    cnt = F.count(F.lit(1))
    return ev.groupBy(F.col("user_id").cast("string").alias("DETECTOR_NAME")).agg(
        (cnt % 5).cast("int").alias("DETECTOR_LANE"),
        F.concat(F.lit("cat_"), F.countDistinct("event_type").cast("string")).alias("DETECTOR_CATEGORY"),
        ((F.sum(F.floor("value")).cast("bigint")) % 1000).cast("double").alias("DETECTOR_FIELD"),
        F.when(cnt % 3 == 0, F.lit("t")).otherwise(F.lit("f")).alias("DETECTOR_ABANDONED"),
    )
