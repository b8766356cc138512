"""Exact crash-replay capture for foreachBatch tests (ADVICE r8).

FileStreamSource batch-to-file assignment follows listing order, so a
test that replays "the residue-2 slice as batchId 2" assumes the r==2
file was processed as batch 2 — if the files list in a different order
the replayed append is NOT a duplicate of that batch's rows, the
full-row DISTINCT keeps both, and the test fails flakily. Instead, wrap
the real handler to capture each micro-batch's ACTUAL rows keyed by its
ACTUAL batchId, and replay the recorded last batch verbatim.
"""

from __future__ import annotations


def capturing(handle, tmp_path):
    """Wrap a foreachBatch handler so each micro-batch's exact rows are
    parqueted under tmp_path keyed by its actual batchId. Returns
    (recording_handle, caps) where caps maps batchId -> capture path."""
    caps: dict[int, str] = {}

    def recording_handle(df, batch_id):
        cap = str(tmp_path / f"replay_cap_{int(batch_id)}")
        df.write.mode("overwrite").parquet(cap)
        caps[int(batch_id)] = cap
        handle(df, batch_id)

    return recording_handle, caps


def replay_last(spark, handle, caps) -> None:
    """Re-invoke the REAL handler with the recorded last batch under its
    recorded batchId — the crash-between-append-and-commit scenario."""
    last = max(caps)
    handle(spark.read.parquet(caps[last]), last)
