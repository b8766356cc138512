"""Node-level roll-up, validity-interval join, and QAQC filters
(SURVEY.md §2: A2-A8, J11, J13, W2, F8-F10;
reference /root/reference/R/_analyze_data.R:35-182,308-353).

The reference pushes the two-level GROUP BY into SQL Server as a
handwritten string (:121-154) because R can't do it fast; in Spark the
same shape is two chained groupBy's over the parquet fact — partial
aggregation makes the first level map-side, and the second level shuffles
only (node, hour) rows, ~1/100th of the fact.

Float determinism: speed averages are computed as
SUM(CAST(speed AS DECIMAL))/COUNT(speed) so results are identical across
partitionings and engines (see plans/queries.dsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _davg(col: str):
    """Order-independent average of a double column (null-skipping)."""
    return (F.sum(F.col(col).cast("decimal(18,6)")).cast("double")
            / F.count(F.col(col)))


def two_level_rollup(fact: DataFrame, time_level: str = "hour") -> DataFrame:
    """A2: detector-hour roll-up, then node-hour roll-up
    (/root/reference/R/_analyze_data.R:121-154; the commented intended
    semantics at :2-30 — this implements the intent, see SURVEY §3.3 on the
    stats::aggregate latent bug).

    ``fact`` needs: sensor, w_start, volume_sum_impute, occupancy_sum_impute,
    speed, node_name, corridor_route.
    """
    lvl1 = (
        fact.groupBy(
            "sensor", "node_name", "corridor_route",
            F.date_trunc(time_level, F.col("w_start")).alias("ts"),
        )
        .agg(
            F.sum("volume_sum_impute").cast("bigint").alias("vol"),
            F.sum("occupancy_sum_impute").cast("bigint").alias("occ"),
            _davg("speed").alias("avg_speed"),
        )
    )
    return (
        lvl1.groupBy("node_name", "ts", "corridor_route")
        .agg(
            F.sum("vol").cast("bigint").alias("volume_sum"),
            F.count("vol").alias("volume_num"),
            F.sum("occ").cast("bigint").alias("occupancy_sum"),
            F.count("occ").alias("occupancy_num"),
            _davg("avg_speed").alias("speed"),
            F.count("avg_speed").alias("speed_num"),
        )
    )


def detectors_per_node(state: DataFrame) -> DataFrame:
    """A3: detector count per node per validity interval
    (/root/reference/R/_analyze_data.R:104-112). ``state`` is the SCD-2
    dimension; node derived from the detector key as in the config view."""
    return (
        state.withColumn(
            "node_name",
            F.concat(F.lit("node_"),
                     (F.col("DETECTOR_NAME").cast("bigint") % 20).cast("string")),
        )
        .groupBy("node_name", "START_DATE", "END_DATE")
        .agg(F.count("DETECTOR_NAME").alias("detector_num"))
    )


def join_validity(facts: DataFrame, dim: DataFrame) -> DataFrame:
    """J11 + A4: inner range join of node-time facts against validity
    intervals, then re-aggregate the detector count — overlapping intervals
    sum up (/root/reference/R/_analyze_data.R:157-171).

    The equi key (node_name) keeps this a hash join with a residual range
    predicate — never a cartesian product; the dim side is tiny, so Catalyst
    broadcasts it and the fact is not shuffled at all.
    """
    fact_date = F.to_date(F.col("f.ts"))
    joined = facts.alias("f").join(
        F.broadcast(dim).alias("d"),
        (F.col("f.node_name") == F.col("d.node_name"))
        & (fact_date >= F.col("d.START_DATE"))
        & (fact_date <= F.col("d.END_DATE")),
        "inner",
    )
    measure_cols = [c for c in facts.columns if c != "node_name"]
    return (
        joined.select(F.col("f.node_name").alias("node_name"),
                      *[F.col(f"f.{c}").alias(c) for c in measure_cols],
                      F.col("d.detector_num"))
        .groupBy("node_name", *measure_cols)
        .agg(F.sum("detector_num").cast("bigint").alias("detector_num"))
    )


def qaqc_for_model(df: DataFrame,
                   median_min: float,
                   slots: int,
                   completeness_min: float,
                   report_ratio: float = 1.0,
                   min_rows: int = 100) -> DataFrame:
    """Sequential QAQC tests 1-4 + J13 semi-join
    (/root/reference/R/_analyze_data.R:35-76):

    1. volume_num >= detector_num * report_ratio. With the default
       ratio 1.0 this is the reference's equality test "all detectors
       reported" (volume_num never exceeds detector_num); fixtures use a
       lower ratio because the synthetic feed is sparse.
    2. per-node row count > 100
    3. per-node median volume >= median_min (reference: 40 hourly / 960 daily)
    4. per-(node, year) completeness = rows/slots >= completeness_min, and a
       node survives only if its MINIMUM yearly completeness passes (A8+J13).

    Each test filters before the next computes, matching the reference's
    chained data.table semantics. Implementation is the reference's own W2
    shape — per-node scalars broadcast onto rows as unbounded window
    aggregates (/root/reference/R/_analyze_data.R:54-57,64-66) — rather
    than groupBy + re-join: a re-join per test would recompute the whole
    upstream DAG once per side, while windows make the four tests ONE
    shuffle on node_name followed by chained WindowExecs (the (node, year)
    window is satisfied by the node partitioning, so no second exchange).
    """
    wn = Window.partitionBy("node_name")
    wy = Window.partitionBy("node_name", "_yr")

    q1 = df.filter(F.col("volume_num") >= F.col("detector_num") * report_ratio)
    q2 = (q1.withColumn("_n", F.count(F.lit(1)).over(wn))
          .filter(F.col("_n") > min_rows).drop("_n"))
    q3 = (q2.withColumn("_med", F.median("volume_sum").over(wn))
          .filter(F.col("_med") >= median_min).drop("_med"))
    return (
        q3.withColumn("_yr", F.year("ts"))
        .withColumn("_pct", F.count(F.lit(1)).over(wy) / F.lit(float(slots)))
        .withColumn("_min_pct", F.min("_pct").over(wn))
        .filter(F.col("_min_pct") >= completeness_min)
        .drop("_yr", "_pct", "_min_pct")
    )


def weighted_median(df: DataFrame, part_col: str, value_col: str,
                    weight_col: str) -> DataFrame:
    """Exact weighted (lower) median of `value_col` under integer
    `weight_col` per `part_col` group: the smallest value whose
    cumulative weight reaches half the group total.

    Formulated as a RANGE-frame cumulative weight over value order —
    the frame makes tied values peers, so every row of a tie run
    carries the run-closing cumulative weight and the result is
    deterministic under any intra-tie order — with the division-free
    bound 2·cumw >= tot on exact integers. One exchange per group
    partition carries both windows and the final min; at any scale the
    sort is in-partition. Property-tested against the brute-force
    definition in tests/test_dss_properties.py."""
    wc = Window.partitionBy(part_col).orderBy(value_col) \
        .rangeBetween(Window.unboundedPreceding, 0)
    wp = Window.partitionBy(part_col)
    c = df.select(
        part_col, value_col,
        F.sum(weight_col).over(wc).alias("_cumw"),
        F.sum(weight_col).over(wp).alias("_tot"),
    )
    return (
        c.filter(2 * F.col("_cumw") >= F.col("_tot"))
        .groupBy(part_col)
        .agg(F.min("_tot").cast("bigint").alias("total_weight"),
             F.min(value_col).alias("w_median"))
    )
