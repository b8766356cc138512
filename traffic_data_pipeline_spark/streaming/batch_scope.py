"""Block-manager hygiene for ``foreachBatch`` monitor handlers.

The always-on monitors keep their cross-batch state in batchId-stamped
parquet tables (bounded, documented per op), but several handlers also
``localCheckpoint(eager=True)`` an intermediate frame inside the batch —
directly (the δ-presence cell frame, the RFM per-customer frame) or via
a shared plan owner (``_shard_rank`` under the RFM cube,
``_tail_index_from_counts`` / ``_changepoint_from_daily`` under the
round-9 monitors). A locally-checkpointed RDD's blocks stay in the
block manager until explicitly unpersisted, so an actual always-on
deployment would accumulate one set of blocks per micro-batch without
bound — harmless for the 3-batch fixture runs, wrong for the stated
production form.

``scoped_local_checkpoints`` closes that: it snapshots the persistent
RDD ids at handler entry and, after the handler body has published its
output (every monitor writes its full state/report to parquet before
returning, so nothing outside the batch ever reads the checkpointed
blocks), unpersists exactly the persistent RDDs created inside the
scope. Pre-existing persistent frames — the session CC component table,
prewarmed pair streams, setup-time centroid frames — are in the entry
snapshot and are never touched. Best-effort by design: the free goes
through the JVM ``SparkContext.getPersistentRDDs`` map (PySpark exposes
no unpersist handle for localCheckpoint), and any py4j surprise must
not fail a batch that has already committed its output, so failures
are swallowed.

Scope: one handler invocation on one session. Concurrent jobs on the
same SparkContext could in principle register a persistent RDD between
snapshot and free and see it unpersisted; the monitors run one
pipeline per session (the repo-wide convention), so the race is
documented rather than defended.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Set

from pyspark.sql import SparkSession


def _persistent_rdd_ids(spark: SparkSession) -> Set[int]:
    """Ids of RDDs currently holding blocks in the block manager."""
    sc = spark.sparkContext._jsc.sc()
    return {info.id() for info in sc.getRDDStorageInfo()}


def free_new_persistent_rdds(spark: SparkSession,
                             before: Set[int]) -> int:
    """Unpersist (non-blocking) every persistent RDD not in ``before``.

    Returns the number freed; swallows JVM-side failures — the caller
    has already published its output, and hygiene must not fail it.
    """
    freed = 0
    try:
        rdd_map = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = rdd_map.iterator()
        while it.hasNext():
            entry = it.next()
            if entry._1() not in before:
                entry._2().unpersist(False)
                freed += 1
    except Exception:  # noqa: BLE001 — best-effort by contract (above)
        pass
    return freed


@contextmanager
def scoped_local_checkpoints(spark: SparkSession) -> Iterator[None]:
    """Free every persistent RDD created inside the ``with`` body.

    Wrap a ``foreachBatch`` handler body in this so per-batch
    ``localCheckpoint`` frames (including ones made by shared plan
    owners) release their block-manager blocks once the batch's
    parquet output is committed, keeping always-on monitor memory
    bounded by ONE batch's working set instead of the stream's
    lifetime. The free runs even when the body raises — a failed batch
    is retried by the engine and must not strand blocks either.
    """
    before = _persistent_rdd_ids(spark)
    try:
        yield
    finally:
        free_new_persistent_rdds(spark, before)
