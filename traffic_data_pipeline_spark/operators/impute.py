"""Missing-value imputation cascade over the 15-min fact
(SURVEY.md §2: F13 / W1 / J9 / J10 / P8 / P4).

Re-expresses /root/reference/R/_pull_data.R:467-657 as three declarative
stages per measure (volume, occupancy), applied in priority order:

1. scaling (F13, :467-482): partial-null intervals scale the observed sum
   up by the null fraction: sum / (1 - pct_null/100); all-null -> NULL.
2. centered rolling mean (W1, :486-518): width-5 row frame per sensor
   ordered by time, null-skipping. frollapply leaves NA where the frame is
   incomplete at series edges — encoded with a count(*)-over-frame == 5
   guard (SURVEY.md §2.6 edge-semantics note).
3. same-weekday history (J9/J10 + P8, :532-657): the value at the same
   clock slot 7 and 14 days earlier, then the null-aware row-mean of the
   two historical values.

The reference runs stage 3 as per-sensor-day SQL lookups inside forked
workers (one DB query per sensor per day). The join formulation (shift the
series +7/+14 days, left equi-join on (sensor, ts)) costs one shuffle per
lag per measure; but (sensor, ts) is unique after the 15-min aggregation,
so "the row exactly N days earlier, if present" is exactly a window frame
`rangeBetween(-N days, -N days)` over seconds-since-epoch ordering — an
empty frame yields NULL just like the unmatched left join. Every stage
(rolling mean + both lags x both measures) therefore shares ONE
`partitionBy(sensor)` shuffle and ONE sort: at 100 TB the whole cascade
moves the fact once, instead of five times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROLL_WIDTH = 5  # frollapply(x, 5, align='center') — /root/reference/R/_pull_data.R:486


def scale_partial_nulls(sum_col: Column, pct_null_col: Column) -> Column:
    """F13: scale an interval sum by its observed fraction; NULL if nothing
    was observed (/root/reference/R/_pull_data.R:467-482)."""
    return F.when(
        pct_null_col < 100.0,
        F.round(sum_col / (1.0 - pct_null_col / 100.0)).cast("int"),
    )


# Materialized epoch-seconds ordering column: every window in the cascade
# orders by this ONE attribute, so Catalyst proves the child is already
# sorted and elides all but the first sort (distinct per-stage
# unix_timestamp() projections would each force a re-sort).
TS_SEC = "_ts_sec"


def rolling_mean_impute(df: DataFrame, col: str, order_col: str = TS_SEC,
                        partition_col: str = "sensor") -> Column:
    """W1: centered width-5 rolling mean, NULL at incomplete edges
    (/root/reference/R/_pull_data.R:486-518)."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(-(ROLL_WIDTH // 2), ROLL_WIDTH // 2)
    )
    full_frame = F.count(F.lit(1)).over(w) == ROLL_WIDTH
    return F.when(full_frame, F.round(F.avg(F.col(col)).over(w)).cast("int"))


def row_mean2(a: Column, b: Column) -> Column:
    """P8: null-aware mean of two columns — rowMeans(.SD, na.rm=TRUE)
    (/root/reference/R/_pull_data.R:578-585)."""
    n = a.isNotNull().cast("int") + b.isNotNull().cast("int")
    return F.when(n > 0, (F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))) / n)


def lag_history_impute(df: DataFrame, col: str,
                       key_col: str = "sensor") -> DataFrame:
    """J9/J10 + P8: fill from the same clock slot 7 and 14 days earlier.

    The reference issues one DB query per sensor-day
    (/root/reference/R/_pull_data.R:539-575). (sensor, ts) is unique here,
    so the slot exactly N days back is a degenerate range frame
    `rangeBetween(-N, -N)` over epoch seconds — an empty frame gives NULL,
    matching the unmatched left join of the shifted-series formulation,
    without a per-lag shuffle. Adds column ``{col}_hist`` (the null-aware
    row-mean of the two lags, rounded to int).
    """
    base = Window.partitionBy(key_col).orderBy(TS_SEC)
    h1 = F.max(F.col(col)).over(base.rangeBetween(-7 * 86400, -7 * 86400))
    h2 = F.max(F.col(col)).over(base.rangeBetween(-14 * 86400, -14 * 86400))
    return df.withColumn(f"{col}_hist", F.round(row_mean2(h1, h2)).cast("int"))


def impute_measure(df: DataFrame, measure: str) -> DataFrame:
    """Full cascade for one measure: scaling, then rolling mean, then
    lag-7/14 history; first non-null wins (P4 coalesce chain,
    /root/reference/R/_pull_data.R:497-501,650-655).

    Expects columns ``{measure}_sum`` and ``{measure}_pct_null``; adds
    ``{measure}_sum_impute``.
    """
    sum_c, pct_c = f"{measure}_sum", f"{measure}_pct_null"
    impute_c = f"{measure}_sum_impute"
    scaled = df.withColumn(impute_c, scale_partial_nulls(F.col(sum_c), F.col(pct_c)))
    rolled = scaled.withColumn(
        impute_c, F.coalesce(F.col(impute_c), rolling_mean_impute(scaled, impute_c))
    )
    hist = lag_history_impute(rolled, impute_c)
    return hist.withColumn(
        impute_c, F.coalesce(F.col(impute_c), F.col(f"{impute_c}_hist"))
    ).drop(f"{impute_c}_hist")


def impute(df: DataFrame) -> DataFrame:
    """Impute both measures of the 15-min fact.

    Expects a ``start_datetime`` timestamp; materializes the shared
    ordering key once so the whole cascade is one shuffle + one sort.
    """
    with_key = df.withColumn(TS_SEC, F.unix_timestamp("start_datetime"))
    return impute_measure(impute_measure(with_key, "volume"),
                          "occupancy").drop(TS_SEC)
