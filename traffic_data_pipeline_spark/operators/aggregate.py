"""Core 30-sec → 15-min detector aggregation (SURVEY.md §2: U1/U2/A1/F12/F15/P6).

Re-expresses `aggregate_detector` (/root/reference/R/_pull_data.R:324-366)
as one declarative DataFrame pipeline:

  clean (replace_impossible, U2)
  → tumbling 15-min window agg (A1): sums + null-percentages (F15)
  → occupancy% + speed formula (F12)
  → drop all-null intervals (P6, /root/reference/R/_pull_data.R:440-441)

The reference runs this per sensor-day inside 5 forked R processes
(/root/reference/R/_pull_data.R:409-412). Here it is a single shuffle on
(sensor, window): map-side partial aggregation handles the 2,880-rows/day
fan-in, so at 100 TB the only data movement is the pre-aggregated partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# occupancy denominator: 0.25 h x 216,000 scans/h
# (/root/reference/R/_pull_data.R:326)
INTERVAL_SCANS = 54_000

# published defaults of tc.sensors::replace_impossible, called at
# /root/reference/R/_pull_data.R:329-332
VOLUME_RANGE = (0, 20)
OCCUPANCY_RANGE = (0, 1800)


def replace_impossible(df: DataFrame,
                       volume_range: tuple[int, int] = VOLUME_RANGE,
                       occupancy_range: tuple[int, int] = OCCUPANCY_RANGE) -> DataFrame:
    """Null out physically impossible 30-sec readings (U2)."""
    lo_v, hi_v = volume_range
    lo_o, hi_o = occupancy_range
    return df.withColumns({
        "volume": F.when(F.col("volume").between(lo_v, hi_v), F.col("volume")),
        "occupancy": F.when(F.col("occupancy").between(lo_o, hi_o), F.col("occupancy")),
    })


def _pct_null(col: str) -> Column:
    """F15: 100 * count(nulls) / count(*), one decimal
    (/root/reference/R/_pull_data.R:341-342)."""
    return F.round(
        100.0 * F.sum(F.col(col).isNull().cast("int")) / F.count(F.lit(1)), 1
    )


def aggregate_detector(readings: DataFrame,
                       config: DataFrame | None = None,
                       interval: str = "15 minutes",
                       interval_scans: int = INTERVAL_SCANS,
                       default_field_length: float = 500.0) -> DataFrame:
    """30-sec readings → per-(sensor, 15-min) fact rows.

    Input columns: sensor, start_datetime, volume, occupancy.
    ``config`` (sensor, field_length) supplies the speed formula's
    field_length; the reference looks it up per detector
    (/root/reference/R/_pull_data.R:325-327) — here it is a broadcast join.

    Semantics matched to /root/reference/R/_pull_data.R:336-364:
    - sums use na.rm=TRUE (R `sum(all-NA, na.rm=T)` is 0 → coalesce to 0)
    - occupancy_pct = occupancy_sum / 54,000
    - speed = volume_sum * 2 * field_length / (5280 * occupancy_pct),
      NULL unless volume_sum != 0 and occupancy_pct >= 0.002
    - intervals where both measures are 100% null are dropped
      (/root/reference/R/_pull_data.R:440-441)
    """
    cleaned = replace_impossible(readings)
    agg = (
        cleaned
        .groupBy("sensor", F.window("start_datetime", interval).alias("w"))
        .agg(
            F.coalesce(F.sum("volume"), F.lit(0)).cast("int").alias("volume_sum"),
            _pct_null("volume").alias("volume_pct_null"),
            F.coalesce(F.sum("occupancy"), F.lit(0)).cast("int").alias("occupancy_sum"),
            _pct_null("occupancy").alias("occupancy_pct_null"),
        )
        .withColumn("start_datetime", F.col("w.start"))
        .drop("w")
    )
    if config is not None:
        agg = agg.join(F.broadcast(config.select("sensor", "field_length")),
                       "sensor", "left")
        field_length = F.coalesce(F.col("field_length"), F.lit(default_field_length))
    else:
        field_length = F.lit(default_field_length)

    occ_pct = F.col("occupancy_sum") / F.lit(float(interval_scans))
    out = (
        agg
        .withColumn("occupancy_pct", occ_pct)
        .withColumn(
            "speed",
            F.when(
                (F.col("volume_sum") != 0) & (F.col("occupancy_pct") >= 0.002),
                F.round(
                    F.col("volume_sum") * 2.0 * field_length
                    / (5280.0 * F.col("occupancy_pct")), 1),
            ),
        )
        .filter((F.col("volume_pct_null") < 100) | (F.col("occupancy_pct_null") < 100))
    )
    return out.drop("field_length") if config is not None else out


def scrub_sensor(df: DataFrame,
                 key_cols: tuple[str, ...] = ("sensor", "start_datetime")) -> DataFrame:
    """U3: tc.sensors::scrub_sensor's observable contract — dedupe the raw
    pull so each (sensor, reading-time) appears once (called at
    /root/reference/R/_pull_data.R:436). The fixture feed is clean, so the
    default ingest path skips this shuffle; wire it in front of
    aggregate_detector when the upstream can double-deliver (API retries,
    at-least-once file drops)."""
    return df.dropDuplicates(list(key_cols))
