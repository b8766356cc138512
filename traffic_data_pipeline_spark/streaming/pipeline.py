"""Structured-Streaming face of the 15-min ingest (SURVEY.md §2.8 T1-T6).

The reference implements streaming-shaped semantics in batch: a nightly
task re-pulls `MAX(START_DATE)+1 .. today-3` (watermark probe S9 plus a
fixed 3-day lateness allowance, /root/reference/R/4) Update-SensorData-
Nightly.R:7-13) and blindly appends (K2). The Spark-native translation:

- the 30-sec feed is a file-source stream (`readStream`), one or more
  parquet drops per day;
- the SAME `aggregate_detector` DAG runs over it — `groupBy(sensor,
  window('15 minutes'))` is identical code batch or stream (T1);
- `withWatermark('start_datetime', '3 days')` encodes the reference's
  3-day lag as an engine-managed watermark (T3): a window finalizes and
  emits exactly once, when the watermark passes it — the nightly "wait 3
  days before trusting the data" rule, minus the hand-rolled date math;
- late rows inside the allowance update their window before it emits;
  rows later than 3 days are dropped, which the reference silently
  mis-handles (blind append would double-insert on re-pull — README's
  known-issues list, /root/reference/README.md:34-37);
- the sink is `foreachBatch` writing parquet partitioned by
  (batch_id, start_date). In append mode one date's windows close across
  MANY micro-batches (the watermark boundary is never at midnight), so
  overwriting whole date partitions per batch would silently delete the
  date's earlier-batch windows; scoping the dynamic overwrite under the
  batch_id keeps replay idempotent (a re-run of batch N rewrites exactly
  batch N's output) without ever touching other batches' rows. A
  transactional table format (MERGE on window key) would make it
  exactly-once; plain parquet gets exactly-once-per-batch-replay, which
  is what checkpoint recovery needs.

Nightly `trigger(availableNow=True)` processes whatever files arrived
since the checkpoint and stops — the scheduled-batch cadence of
/root/reference/R/schedule_task.R:14-17 with checkpointed (not
hand-rolled) progress tracking. Scale: state is one row per open
(sensor, window); with a 3-day watermark that bounds state to
sensors x 288 windows regardless of history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from traffic_data_pipeline_spark.operators.aggregate import aggregate_detector

READINGS_SCHEMA = (
    "sensor string, start_datetime timestamp, volume int, occupancy int"
)


def stream_readings(spark: SparkSession, source_dir: str,
                    max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of 30-sec readings (S4 as a stream, T6)."""
    reader = spark.readStream.schema(READINGS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def stream_15min_agg(readings: DataFrame,
                     config: DataFrame | None = None,
                     watermark: str = "3 days",
                     interval: str = "15 minutes") -> DataFrame:
    """T1+T3: watermarked tumbling-window aggregation, batch-identical
    semantics (same operator code as the batch path)."""
    return aggregate_detector(
        readings.withWatermark("start_datetime", watermark),
        config=config, interval=interval,
    )


def start_parquet_sink(agg: DataFrame, sink_path: str, checkpoint: str,
                       available_now: bool = True) -> StreamingQuery:
    """Append-mode foreachBatch sink: closed windows land as parquet
    partitioned by (batch_id, start_date).

    Idempotency is per BATCH, not per date: after a failure, foreachBatch
    replays the last uncommitted batch with the same batch_id, and the
    dynamic overwrite rewrites exactly that batch's partitions — so a
    replay cannot double-insert (the K2 blind-append fix) and, unlike a
    date-level overwrite, cannot delete windows that earlier batches
    emitted for the same date (one date's windows close across many
    batches; the watermark boundary is never at midnight). Readers see
    start_date as a normal partition column (second level), so date
    pruning still works; `batch_id` is physical lineage — drop it on read.
    """
    def write_batch(batch: DataFrame, batch_id: int) -> None:
        (
            batch.withColumn("start_date", F.to_date("start_datetime"))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            # cluster rows by their target partition first: otherwise every
            # one of the agg's shuffle partitions writes a sliver into every
            # date dir (dates x shuffle-partitions small files per batch —
            # measured ~2x the whole query's cost at sf0.1)
            .repartition(F.col("start_date"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "start_date")
            .parquet(sink_path)
        )

    writer = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def high_water_mark(spark: SparkSession, fact_path: str):
    """S9 watermark probe over the published fact table — the batch
    fallback when no streaming checkpoint exists
    (/root/reference/R/4) Update-SensorData-Nightly.R:7)."""
    try:
        df = spark.read.parquet(fact_path)
    except Exception:
        return None
    return df.agg(F.max("start_date")).first()[0]


def start_config_cdc(snapshots: DataFrame, state_path: str,
                     changelog_path: str, attrs: list[str],
                     checkpoint: str,
                     available_now: bool = True) -> StreamingQuery:
    """T5: SCD-2 change tracking as a stream.

    ``snapshots`` is a streaming DataFrame of flattened config rows carrying
    a SNAPSHOT_DATE column (one daily document per drop). Each micro-batch
    applies the same set-based scd2_apply as the batch path via
    foreachBatch — the engine-managed replacement for the reference's
    nightly Track_Config_Change mutation loop
    (/root/reference/R/_pull_data.R:140-322). Snapshots inside one batch
    are applied in date order, so a backlog catch-up replays history
    faithfully.
    """
    from traffic_data_pipeline_spark.pipeline import run_config_update

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        days = [r[0] for r in
                batch.select("SNAPSHOT_DATE").distinct().collect()]
        for day in sorted(d for d in days if d is not None):
            snap = (batch.filter(F.col("SNAPSHOT_DATE") == F.lit(day))
                    .drop("SNAPSHOT_DATE"))
            run_config_update(batch.sparkSession, snap, state_path,
                              changelog_path, day, attrs)

    writer = (
        snapshots.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch(apply_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
