"""Execution helpers shared by operators whose algorithms self-join a
derived frame (LSH band pairing, prefix-filtered Jaccard, hyperplane
bucketing)."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Every frame persisted through materialize(), so a harness can release
# operator-internal caches between queries (bench.py does, keeping each
# query's timing and memory footprint independent of what ran before it).
_LIVE: list[DataFrame] = []


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist (and by default fill the cache NOW). A lazily-persisted
    frame does not help a self-join: its two scan stages launch
    concurrently, so both sides recompute the full upstream before any
    partition lands in the cache. Eager materialization turns that into
    one computation + two cache reads (measured: the sf0.1 dedup trio went
    44s -> 24s). ``eager=False`` is for frames whose consumers run
    sequentially (the first action fills the cache for the rest) — it
    still registers the frame for release()."""
    df = df.persist()
    if eager:
        df.count()
    _LIVE.append(df)
    return df


def release() -> None:
    """Unpersist every frame materialize() has registered since the last
    release. Long-lived session caches (e.g. the RTMC fact) are managed
    elsewhere and are not affected."""
    while _LIVE:
        _LIVE.pop().unpersist(False)
