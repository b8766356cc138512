"""The always-on monitor contract, in ONE place (VERDICT r9 ask #6:
consolidate the shared monitor/state-contract helpers duplicated across
plans/staged_ops_r7/r8/r9/r10).

Every streaming monitor in the registry follows the same published
contract, established by streaming_conformal_monitor (round 8) and
reused verbatim since:

- **Landing zone**: the batch fixture table split into N parquet files
  by key residue so ``maxFilesPerTrigger=1`` yields N micro-batches
  (``residue_landing_zone``) — memoized per sf_dir with dangling-path
  revalidation (``tmpdirs.cached_dir_valid``).
- **Seeded state/output sinks**: empty typed parquet tables written
  before the stream starts (``seed_parquet``), so the first batch's
  read of accumulated state and the final read of the published report
  are schema-stable even if a batch never fires.
- **batchId-stamped partials** (``stamp``): every state append carries
  the micro-batch id, so a crash-replay of the last batch re-appends
  IDENTICAL rows and a full-row DISTINCT collapses the double-append —
  the standard exactly-once-effect closure over foreachBatch's
  at-least-once contract.
- **availableNow run** (``run_monitor``): one bounded
  ``foreachBatch`` pass over the landing zone with a checkpoint dir,
  through plans.queries.run_available_now so the per-query stream
  progress lands in LAST_STREAM_PROGRESS for the bench detail.
- **Per-batch block hygiene**: handlers wrap their body in
  ``batch_scope.scoped_local_checkpoints`` so per-batch
  localCheckpoints free their blocks once the batch publishes.

Keeping the contract here means a new monitor differs from its siblings
ONLY in its partial-fold and its shared batch plan owner — the two
things its oracle actually pins.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.functions.tmpdirs import (
    cached_dir_valid,
    scratch_dir,
)


def stamp(df: DataFrame, batch_id: int) -> DataFrame:
    """Append the micro-batch id to a partials frame before the state
    append — deterministic partials + the recorded batch_id make a
    crash-replay double-append collapsible by full-row DISTINCT."""
    return df.withColumn("batch_id", F.lit(batch_id).cast("long"))


def seed_parquet(spark: SparkSession, *dirs_and_schemas: tuple[str, str]
                 ) -> None:
    """Write an empty typed parquet table to each (path, schema DDL)
    pair — the pre-stream seed that keeps state reads and the published
    report schema-stable from batch zero."""
    for path, ddl in dirs_and_schemas:
        spark.createDataFrame([], ddl).write.mode("overwrite").parquet(path)


def residue_landing_zone(spark: SparkSession, cache: dict, sf_dir: str,
                         prefix: str, frame: DataFrame,
                         residue_col: str | Column,
                         out_cols: Sequence[str],
                         n_batches: int = 3) -> str:
    """Build (once per sf_dir) the file-source landing zone: ``frame``
    split into ``n_batches`` parquet files by ``residue_col % n``, so
    ``maxFilesPerTrigger=1`` replays the fixture as n deterministic
    micro-batches. The residue key is a stable id column (NOT arrival
    order), so the split — and therefore every monitor's per-batch
    partials — is reproducible across runs. Memoized in ``cache`` with
    dangling-path revalidation."""
    if not cached_dir_valid(cache, sf_dir):
        src = scratch_dir(prefix=prefix)
        key = F.col(residue_col) if isinstance(residue_col, str) \
            else residue_col
        for r in range(n_batches):
            frame.filter(key % n_batches == r).select(*out_cols) \
                .coalesce(1).write.mode("append").parquet(src)
        cache[sf_dir] = src
    return cache[sf_dir]


def run_monitor(spark: SparkSession, name: str, src: str, schema_ddl: str,
                handle: Callable[[DataFrame, int], None], ckpt: str) -> None:
    """One bounded availableNow pass of the monitor's foreachBatch
    handler over the landing zone — the fixture-sized stand-in for the
    always-on deployment, identical machinery."""
    from traffic_data_pipeline_spark.plans.queries import run_available_now

    stream = (spark.readStream
              .schema(schema_ddl)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    run_available_now(
        spark, name,
        start=lambda: (stream.writeStream.foreachBatch(handle)
                       .option("checkpointLocation", ckpt)
                       .trigger(availableNow=True).start()))
