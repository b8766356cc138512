"""As-of (temporal nearest-prior) join — an operator Spark lacks natively.

Semantics: for every left row, attach the right row with the greatest
``right_ts <= left_ts`` within the same key group (DuckDB/kdb ``ASOF JOIN``,
pandas ``merge_asof``). The reference pipeline never needed it, but any
time-series enrichment at scale does (attach the in-effect toll rate /
config / exchange rate to each observation).

Implementation is the union-tag formulation, NOT a range join:

1. union the right rows (tagged) into the left stream,
2. one shuffle on the join key, one sort on (ts, tag),
3. ``last(value, ignorenulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT,
4. keep only left rows.

Why this shape at 100 TB: a naive formulation is a non-equi join
(``l.ts >= r.ts`` + window-max dedup) whose candidate space is |L|x|R| per
key; Spark would BNL it. The union-window form is exactly ONE shuffle and
ONE sort over |L|+|R| rows — the same cost as a groupBy over the union —
and AQE can split skewed keys. Right-side ties on (key, ts) are collapsed
with max() first so the operator is deterministic (DuckDB ASOF leaves the
tie choice unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Attach to each left row the latest ``value_col`` from ``right`` whose
    ``right_ts <= left_ts`` for the same ``key`` (NULL when no prior row).

    Output: all left columns + ``out_col`` (default ``value_col``).
    """
    out_col = out_col or value_col
    # deterministic right side: collapse (key, ts) ties to the max value
    r = (
        right.groupBy(F.col(key).alias(key), F.col(right_ts).alias("_asof_ts"))
        .agg(F.max(value_col).alias("_asof_val"))
        .withColumn("_asof_tag", F.lit(1))
    )
    left_cols = left.columns
    l = (
        left.withColumn("_asof_ts", F.col(left_ts))
        .withColumn("_asof_val", F.lit(None).cast(r.schema["_asof_val"].dataType))
        .withColumn("_asof_tag", F.lit(0))
    )
    unioned = l.select(
        *left_cols, "_asof_ts", "_asof_val", "_asof_tag"
    ).unionByName(
        r.select(
            key,
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left_cols if c != key],
            "_asof_ts", "_asof_val", "_asof_tag",
        )
    )
    # tag desc within a timestamp -> right rows sort BEFORE left rows at the
    # same ts, so a left row at ts T sees a right row at ts T (inclusive >=).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_tag").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(out_col, F.last("_asof_val", ignorenulls=True).over(w))
        .filter(F.col("_asof_tag") == 0)
        .select(*left_cols, out_col)
    )
