"""Bin-bucketed interval-overlap join.

The naive overlap predicate `l.start < r.end AND r.start < l.end` is
non-equi: Spark can only run it as a (broadcast) nested-loop join, which
is O(|L|·|R|) and falls over the moment both sides are large. The classic
fix (Databricks' range-join binning; also how interval trees are
flattened into SQL) is to quantize both interval sets onto a grain: every
interval explodes into the buckets it touches, and buckets equi-join
(hash join, co-keyed shuffle at scale). A pair of intervals that overlap
across several shared buckets would match once PER shared bucket — the
textbook formulation dedups those matches afterwards, which costs a
shuffle of the whole match stream. This one instead makes each match
unique BY CONSTRUCTION: the join keeps a (l, r) pair only in the single
bucket containing `greatest(l_start, r_start)` (the first instant of the
overlap, which both exploded ranges provably cover), so no dedup pass —
and no dedup exchange — exists at any scale. Duplicate input rows then
multiply exactly like a SQL join, with no hidden keying on row values
(round-3 advisor finding). Cost moves from |L|·|R| to Σ span/grain —
linear in the data for any fixed grain, with the grain as the tuning
knob (match it to the typical interval length so most intervals hit 1-2
buckets).

Used by `session_surge_overlap` (plans/analysis_ops.py); property-tested
against the naive nested-loop join in tests/test_rangejoin.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    grain_seconds: int = 3600,
    broadcast_right: bool = False,
) -> DataFrame:
    """Join rows whose half-open timestamp intervals [l_start, l_end) and
    [r_start, r_end) strictly overlap; adds `ov_us` (exact overlap in
    integer microseconds, always > 0).

    Buckets are epoch-aligned multiples of `grain_seconds`, so both
    sides always quantize onto the same grid regardless of grain. Each
    overlapping pair matches in exactly one bucket (see module
    docstring), so duplicate input rows are legal and each produces its
    own match rows. Column names must not collide across the two frames
    (checked). `broadcast_right=True` pins a broadcast of the exploded
    right side — for a small dimension of windows (surge islands,
    maintenance windows); leave False to let AQE pick the co-keyed
    shuffle join when both sides are large.
    """
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(
            f"overlap_join: column names collide across sides: {sorted(clash)}")
    gs = int(grain_seconds)

    def bins(start: str, end: str):
        # floor-to-grain of [start, end]: end-bucket inclusion is harmless
        # (the exact predicate re-checks) and required when the interval
        # crosses into it
        return F.explode(F.expr(
            f"sequence(floor(unix_timestamp({start}) / {gs}),"
            f" floor(unix_timestamp({end}) / {gs}))"))

    lb = left.withColumn("_bin", bins(l_start, l_end))
    rb = right.withColumn("_bin", bins(r_start, r_end))
    if broadcast_right:
        rb = F.broadcast(rb)
    # the overlap's first instant lies in exactly one bucket, and both
    # exploded ranges cover it: max(starts) >= each side's start, and
    # (for a true overlap) max(starts) < min(ends) <= each side's end
    first_overlap_bin = F.floor(
        F.greatest(F.unix_timestamp(F.col(l_start)),
                   F.unix_timestamp(F.col(r_start))) / gs)
    return (
        lb.join(rb, "_bin")
        .filter(F.col("_bin") == first_overlap_bin)
        .select(*left.columns, *right.columns)
        .withColumn(
            "ov_us",
            F.least(F.unix_micros(F.col(l_end)), F.unix_micros(F.col(r_end)))
            - F.greatest(F.unix_micros(F.col(l_start)),
                         F.unix_micros(F.col(r_start))))
        .filter(F.col("ov_us") > 0)
    )
