"""Stateful gap detector: state must carry across micro-batches AND across
query restarts (checkpointed), detecting silences that no single batch can
see on its own."""

from __future__ import annotations

from pyspark.sql import functions as F

from traffic_data_pipeline_spark.streaming.pipeline import stream_readings
from traffic_data_pipeline_spark.streaming.stateful import detect_gaps

MK = "sensor string, start_datetime string, volume int, occupancy int"


def _write(spark, path, rows, mode):
    (spark.createDataFrame(rows, MK)
     .withColumn("start_datetime", F.col("start_datetime").cast("timestamp"))
     .write.mode(mode).parquet(path))


def _run(spark, src, sink, ckpt):
    gaps = detect_gaps(stream_readings(spark, src), gap_seconds=3600.0)
    q = (gaps.writeStream.outputMode("append")
         .format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)


def test_gap_detected_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # run 1: continuous readings, no gap
    _write(spark, src, [("s1", "2024-01-01 00:00:00", 1, 1),
                        ("s1", "2024-01-01 00:30:00", 1, 1),
                        ("s2", "2024-01-01 00:00:00", 1, 1)], "overwrite")
    _run(spark, src, sink, ckpt)
    assert spark.read.parquet(sink).count() == 0

    # run 2 (fresh query, same checkpoint): s1 resumes 5h later — the gap
    # spans the restart and is only visible through persisted state
    _write(spark, src, [("s1", "2024-01-01 05:30:00", 1, 1),
                        ("s2", "2024-01-01 00:45:00", 1, 1)], "append")
    _run(spark, src, sink, ckpt)
    gaps = {(r.sensor, str(r.gap_start), str(r.gap_end), r.gap_seconds)
            for r in spark.read.parquet(sink).collect()}
    assert ("s1", "2024-01-01 00:30:00", "2024-01-01 05:30:00",
            5 * 3600.0) in gaps
    assert all(g[0] != "s2" for g in gaps)  # s2 never went silent


def test_intra_batch_gap(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, src, [("s1", "2024-01-01 00:00:00", 1, 1),
                        ("s1", "2024-01-01 02:00:00", 1, 1)], "overwrite")
    _run(spark, src, sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1
    assert rows[0].gap_seconds == 2 * 3600.0
