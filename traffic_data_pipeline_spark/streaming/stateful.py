"""Custom stateful streaming operator: per-sensor silence/gap detection
via applyInPandasWithState (SURVEY.md §2.8 T4/T5 — the engine-managed
replacement for the reference's planned "auto-identify missing days",
/root/reference/README.md:36-37, which the R pipeline never implemented).

Semantics: for each sensor, remember the last reading timestamp across
micro-batches (and across restarts — state lives in the checkpoint).
Whenever a new reading reveals silence longer than ``gap_seconds``, emit
one row describing the gap. This is the streaming complement of the batch
imputation cascade: imputation fills small holes after the fact; the gap
detector surfaces dead detectors while they are dead.

Scale: state is one timestamp per sensor — O(sensors), not O(readings);
the grouping shuffle is on the same sensor key as the 15-min aggregation,
so a combined job reuses the partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SCHEMA = ("sensor string, gap_start timestamp, gap_end timestamp, "
              "gap_seconds double")
STATE_SCHEMA = "last_seen timestamp"


def _detect(key, pdfs: Iterator[pd.DataFrame], state: GroupState,
            gap_seconds: float):
    last = pd.Timestamp(state.get[0]) if state.exists else None
    times: list[pd.Timestamp] = []
    for pdf in pdfs:
        times.extend(pd.to_datetime(pdf["start_datetime"]))
    times.sort()
    rows = []
    for t in times:
        if last is not None:
            silent = (t - last).total_seconds()
            if silent > gap_seconds:
                rows.append((key[0], last, t, silent))
        last = t
    if last is not None:
        state.update((last.to_pydatetime(),))
    yield pd.DataFrame(rows, columns=["sensor", "gap_start", "gap_end",
                                      "gap_seconds"])


def detect_gaps(readings: DataFrame, gap_seconds: float = 3600.0) -> DataFrame:
    """(sensor, start_datetime, ...) stream -> one row per detected gap."""
    def fn(key, pdfs, state):
        return _detect(key, pdfs, state, gap_seconds)

    return (
        readings.groupBy("sensor")
        .applyInPandasWithState(
            fn, GAP_SCHEMA, STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
