"""Streaming SCD-2 (T5): config snapshots arriving as files drive the same
set-based dimension updates as the batch path, in snapshot-date order,
resuming from the checkpoint."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from traffic_data_pipeline_spark.streaming.pipeline import start_config_cdc

ATTRS = ["DETECTOR_LANE", "DETECTOR_ABANDONED"]
SCHEMA = ("DETECTOR_NAME string, DETECTOR_LANE int, "
          "DETECTOR_ABANDONED string, SNAPSHOT_DATE date")


def _drop(spark, src, rows, mode):
    spark.createDataFrame(
        [(n, l, a, dt.date.fromisoformat(d)) for n, l, a, d in rows], SCHEMA
    ).write.mode(mode).parquet(src)


def _run(spark, src, state, log, ckpt):
    snaps = spark.readStream.schema(SCHEMA).parquet(src)
    q = start_config_cdc(snaps, state, log, ATTRS, ckpt)
    q.awaitTermination(300)


def test_cdc_stream_applies_snapshots_in_order(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")

    # drop 1: bootstrap day + a delta day in the SAME batch (order matters)
    _drop(spark, src,
          [("d1", 1, "f", "2024-01-01"), ("d2", 1, "f", "2024-01-01"),
           ("d1", 2, "f", "2024-01-02"), ("d2", 1, "f", "2024-01-02")],
          "overwrite")
    _run(spark, src, state, log, ckpt)
    st = {r.DETECTOR_NAME: r for r in spark.read.parquet(state).collect()}
    assert st["d1"].DETECTOR_LANE == 2      # day-2 patch applied after day-1
    chg = spark.read.parquet(log)
    assert chg.filter((F.col("Change") == "DETECTOR_LANE")
                      & (F.col("DETECTOR_NAME") == "d1")).count() == 1

    # drop 2 (restart from checkpoint): d2 disappears on day 3
    _drop(spark, src, [("d1", 2, "f", "2024-01-03")], "append")
    _run(spark, src, state, log, ckpt)
    st = {r.DETECTOR_NAME: r for r in spark.read.parquet(state).collect()}
    assert st["d2"].DEACTIVATE and st["d2"].END_DATE == dt.date(2024, 1, 3)
    assert not st["d1"].DEACTIVATE
