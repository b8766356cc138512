"""Round-3 continuation: the decision-support correlated-subquery canon
and pipeline data-quality operators.

The reference's query surface is nightly ETL + roll-ups; a warehouse user
switching to this engine also runs the classic correlated-subquery shapes
(TPC-H Q2/Q11/Q20/Q21 — the Q17/Q22 analogues landed earlier in
plans/analysis_ops.py). Each query here is the DECORRELATED Spark plan —
correlated scalar subqueries become co-keyed window aggregates,
EXISTS/NOT-EXISTS quantifiers become window counts over one partitioning —
while the DuckDB oracle keeps the textbook correlated formulation, so the
hash check proves the rewrite, not just the arithmetic.

Also here: a Deequ-style one-pass data-quality constraint report (the
check suite every ingest job should publish next to its output) and a
per-sensor least-squares volume trend whose moments are exact integers
(the Welch-t-test precedent: accumulate exactly, divide once).

Cross-engine exactness tactics (same playbook as plans/mining_ops.py):
MIN/MAX of raw doubles are order-independent and bit-identical; money
sums accumulate as DECIMAL(18,6); threshold comparisons are exact
rationals on the decimal/integer side (2·sq > tot, 50·val > total —
never a division against an average); doubles appear only in final
single-expression projections mirrored verbatim in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.plans.queries import ORACLES, dsum, register
from traffic_data_pipeline_spark.sources.sensor import (
    CONFIG_VIEW_SQL,
    SENSOR_VIEW_SQL,
)
from traffic_data_pipeline_spark.sources.tables import load_table


def _dec(col):
    """Exact decimal accumulator for a double expression — dsum WITHOUT
    the final double cast, for callers that compare or re-aggregate the
    exact decimal (rational HAVING bounds, window totals). Where the
    double output is wanted directly, use queries.dsum instead."""
    return F.sum(col.cast("decimal(18,6)"))


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: min-cost supplier per part (correlated scalar MIN)
# ---------------------------------------------------------------------------

@register("part_min_cost_supplier", """
WITH offers AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS best_price
  FROM lineitem GROUP BY 1, 2)
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
       o.best_price AS min_price
FROM offers o
JOIN part p ON p.p_partkey = o.l_partkey AND p.p_size >= 40
JOIN supplier s ON s.s_suppkey = o.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.best_price = (SELECT MIN(o2.best_price) FROM offers o2
                      WHERE o2.l_partkey = o.l_partkey)
""")
def q_part_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each large part, the supplier(s) offering its
    minimum observed line price. The oracle keeps Q2's correlated scalar
    subquery; the Spark plan decorrelates it into a window MIN over the
    (part, supplier) offer frame — the offers aggregate and the per-part
    window share one hash partitioning lineage, so the correlation costs
    one exchange, not a join-per-row. Part/supplier/nation dims broadcast.
    MIN over raw doubles picks an existing bit pattern, so the equality
    against the correlated min can never miss by an ulp (the top_supplier
    precedent). Ref parity: the reference has no correlated-subquery
    surface; this is §2-beyond DSS coverage."""
    li = load_table(spark, sf_dir, "lineitem")
    offers = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("best_price"))
    )
    part_min = F.min("best_price").over(Window.partitionBy("l_partkey"))
    best = (
        offers.withColumn("part_min", part_min)
        .filter(F.col("best_price") == F.col("part_min"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
                F.col("best_price").alias("min_price"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: value-share HAVING against a correlated group total
# ---------------------------------------------------------------------------

@register("nation_brand_value_share", """
WITH rev AS (
  SELECT n.n_name, p.p_brand,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
           AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2)
SELECT n_name, p_brand,
       CAST(val AS DOUBLE) AS brand_value,
       ROUND(CAST(val AS DOUBLE) /
             (SELECT CAST(SUM(r2.val) AS DOUBLE) FROM rev r2
              WHERE r2.n_name = rev.n_name), 6) AS share
FROM rev
WHERE 50 * val > (SELECT SUM(r3.val) FROM rev r3 WHERE r3.n_name = rev.n_name)
""")
def q_nation_brand_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: brands holding more than 2% of their supplier
    nation's line revenue. The oracle keeps the correlated group-total
    subquery (twice: the HAVING bound and the share denominator); the
    Spark plan computes the nation total as a window SUM over the
    (nation, brand) aggregate — the fact shuffles once for the aggregate,
    the correlation rides a tiny post-agg frame. The 2% bound is the
    exact rational 50·val > total on decimals — never a division against
    the total, so the boundary row set is identical in both engines; the
    share division happens only in the final displayed projection."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("n_name", "p_brand")
        .agg(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("val"))
    )
    total = F.sum("val").over(Window.partitionBy("n_name"))
    return (
        rev.withColumn("total", total)
        .filter(F.col("val") * 50 > F.col("total"))
        .select(
            "n_name", "p_brand",
            F.col("val").cast("double").alias("brand_value"),
            F.round(F.col("val").cast("double")
                    / F.col("total").cast("double"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: EXISTS + NOT EXISTS + correlated max, as window scalars
# ---------------------------------------------------------------------------

@register("waiting_orders_suppliers", """
WITH os AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS smax
  FROM lineitem GROUP BY 1, 2)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
FROM os o1
JOIN orders ord ON ord.o_orderkey = o1.l_orderkey
                AND ord.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = o1.l_suppkey
WHERE EXISTS (SELECT 1 FROM os o2
              WHERE o2.l_orderkey = o1.l_orderkey
                AND o2.l_suppkey <> o1.l_suppkey)
  AND o1.smax = (SELECT MAX(o3.smax) FROM os o3
                 WHERE o3.l_orderkey = o1.l_orderkey)
  AND NOT EXISTS (SELECT 1 FROM os o4
                  WHERE o4.l_orderkey = o1.l_orderkey
                    AND o4.l_suppkey <> o1.l_suppkey
                    AND o4.smax = o1.smax)
GROUP BY 1, 2
""")
def q_waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: in finished multi-supplier orders, the supplier
    whose shipment was STRICTLY the last one ("kept the order waiting").
    The oracle is Q21's quantifier trio — EXISTS (another supplier),
    correlated MAX (was the latest), NOT EXISTS (sole latest). The Spark
    plan folds all three into window scalars over ONE l_orderkey
    partitioning of the per-(order, supplier) max-shipdate frame:
    n_suppliers (EXISTS = n >= 2), order max, and achiever count
    (NOT EXISTS = exactly one). Three semi/anti self-joins become zero
    joins; the orders status filter is a co-keyed join pushed to the
    scan, supplier dim broadcasts. MAX of timestamps is exact, so
    'achieved the max' is unambiguous cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("smax"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        os_.withColumn("omax", F.max("smax").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_latest",
            F.sum(F.when(F.col("smax") == F.col("omax"), 1).otherwise(0))
            .over(w))
        .filter((F.col("smax") == F.col("omax"))
                & (F.col("n_supp") >= 2) & (F.col("n_latest") == 1))
    )
    orders = load_table(spark, sf_dir, "orders") \
        .filter(F.col("o_orderstatus") == "F")
    sup = load_table(spark, sf_dir, "supplier")
    return (
        flagged.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: nested-IN over a correlated aggregate threshold
# ---------------------------------------------------------------------------

@register("excess_supply_suppliers", """
WITH sel AS (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'),
sp AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq
  FROM lineitem JOIN sel ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_dominated,
       CAST(SUM(sp.sq) AS DOUBLE) AS dominated_qty
FROM sp
JOIN supplier s ON s.s_suppkey = sp.l_suppkey
WHERE 2 * sp.sq > (SELECT SUM(sp2.sq) FROM sp sp2
                   WHERE sp2.l_partkey = sp.l_partkey)
GROUP BY 1, 2
""")
def q_excess_supply_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped the MAJORITY of a gear
    part's 1996 volume (nested IN → correlated aggregate threshold in
    the oracle). Spark decorrelates to a window SUM over l_partkey on
    the per-(part, supplier) quantity aggregate: the name-filtered part
    list broadcasts into the fact scan (a semi-join the optimizer keeps
    next to the pushed date range), quantities accumulate as exact
    decimals, and 'majority' is the rational 2·sq > tot — the division-
    free boundary, so both engines keep the same suppliers. One fact
    shuffle + one tiny window exchange total."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = load_table(spark, sf_dir, "part") \
        .filter(F.col("p_name").like("%gear%")).select("p_partkey")
    sp = (
        li.filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1997-01-01"))
        .join(F.broadcast(sel), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(_dec(F.col("l_quantity")).alias("sq"))
    )
    tot = F.sum("sq").over(Window.partitionBy("l_partkey"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sp.withColumn("tot", tot)
        .filter(F.col("sq") * 2 > F.col("tot"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated"),
             F.sum("sq").cast("double").alias("dominated_qty"))
    )


# ---------------------------------------------------------------------------
# Data-quality constraint report (Deequ-style analyzer pass)
# ---------------------------------------------------------------------------

@register("dq_constraint_report", """
SELECT 'orders' AS tbl, 'row_count' AS chk,
       CAST(COUNT(*) AS BIGINT) AS value FROM orders
UNION ALL SELECT 'orders', 'null_custkey',
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) FROM orders
UNION ALL SELECT 'orders', 'dup_orderkey',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
UNION ALL SELECT 'orders', 'freshness_days',
       CAST(datediff('day', MAX(o_orderdate), TIMESTAMP '2002-01-01')
            AS BIGINT) FROM orders
UNION ALL SELECT 'lineitem', 'row_count',
       CAST(COUNT(*) AS BIGINT) FROM lineitem
UNION ALL SELECT 'lineitem', 'discount_range_viol',
       CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
            AS BIGINT) FROM lineitem
UNION ALL SELECT 'lineitem', 'nonpositive_qty',
       CAST(COUNT(*) FILTER (WHERE l_quantity <= 0) AS BIGINT) FROM lineitem
UNION ALL SELECT 'lineitem', 'dup_order_line',
       CAST(COUNT(*) - COUNT(DISTINCT
              COALESCE(CAST(l_orderkey AS VARCHAR), '~null~') || '|' ||
              COALESCE(CAST(l_linenumber AS VARCHAR), '~null~')) AS BIGINT)
       FROM lineitem
UNION ALL SELECT 'lineitem', 'orphan_orderkey', CAST(COUNT(*) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
""")
def q_dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality report: completeness, uniqueness,
    range, freshness, and referential-integrity checks as ONE long-form
    frame (tbl, chk, value). Each base table is scanned once — all its
    analyzer metrics ride a single map-side-combined aggregate row that
    a stack() unpivots — plus one left-anti count for the foreign-key
    check (broadcast at fixture scale, AQE picks shuffle-anti at 100 TB;
    either way the probe never materializes the orphan rows). This is
    the publish-next-to-your-output shape: at 100 TB the report costs
    one pass over each fact, not one pass per check. The analyzer body
    lives in dq_report() so tests can feed it frames with PLANTED
    violations — the fixture itself is clean, and a check that has never
    fired is not a check."""
    return dq_report(load_table(spark, sf_dir, "orders"),
                     load_table(spark, sf_dir, "lineitem"))


def dq_report(orders: DataFrame, li: DataFrame) -> DataFrame:
    o_row = orders.agg(
        F.count(F.lit(1)).alias("row_count"),
        # count(when(cond, 1)) not sum(when...otherwise(0)): count is 0
        # on an empty table (matching COUNT(*) FILTER), sum is NULL — and
        # an empty ingest is exactly when a DQ report must read 0, not NULL
        F.count(F.when(F.col("o_custkey").isNull(), 1))
        .alias("null_custkey"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .alias("dup_orderkey"),
        F.datediff(F.lit("2002-01-01"), F.max("o_orderdate"))
        .alias("freshness_days"),
    )
    o_checks = o_row.select(F.expr(
        "stack(4, 'row_count', cast(row_count as bigint),"
        " 'null_custkey', cast(null_custkey as bigint),"
        " 'dup_orderkey', cast(dup_orderkey as bigint),"
        " 'freshness_days', cast(freshness_days as bigint))"
        " as (chk, value)"
    )).select(F.lit("orders").alias("tbl"), "chk", "value")
    l_row = li.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.count(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1),
                       1)).alias("discount_range_viol"),
        F.count(F.when(F.col("l_quantity") <= 0, 1))
        .alias("nonpositive_qty"),
        # NULL-safe composite key: Spark's multi-column countDistinct
        # SKIPS rows with any NULL column while DuckDB counts the tuple —
        # a NULL linenumber would both miscount and break the oracle, and
        # NULL keys are exactly what a DQ report must measure
        (F.count(F.lit(1))
         - F.countDistinct(F.concat_ws(
             "|",
             F.coalesce(F.col("l_orderkey").cast("string"),
                        F.lit("~null~")),
             F.coalesce(F.col("l_linenumber").cast("string"),
                        F.lit("~null~")))))
        .alias("dup_order_line"),
    )
    l_checks = l_row.select(F.expr(
        "stack(4, 'row_count', cast(row_count as bigint),"
        " 'discount_range_viol', cast(discount_range_viol as bigint),"
        " 'nonpositive_qty', cast(nonpositive_qty as bigint),"
        " 'dup_order_line', cast(dup_order_line as bigint))"
        " as (chk, value)"
    )).select(F.lit("lineitem").alias("tbl"), "chk", "value")
    orphans = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"),
                "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("value"))
        .select(F.lit("lineitem").alias("tbl"),
                F.lit("orphan_orderkey").alias("chk"), "value")
    )
    return o_checks.unionByName(l_checks).unionByName(orphans)


# ---------------------------------------------------------------------------
# Per-sensor least-squares volume trend (exact integer moments)
# ---------------------------------------------------------------------------

_TREND_CTE = f"""
s AS ({SENSOR_VIEW_SQL}),
d AS (
  SELECT sensor,
         CAST(datediff('day', DATE '1995-01-01', reading_date) AS HUGEINT)
           AS x,
         CAST(SUM(volume) AS HUGEINT) AS y
  FROM s WHERE volume IS NOT NULL
  GROUP BY sensor, reading_date),
m AS (
  SELECT sensor, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy
  FROM d GROUP BY 1)
"""


@register("sensor_volume_trend", f"""
WITH {_TREND_CTE}
SELECT sensor, CAST(n AS BIGINT) AS n_days,
       ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
             / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope,
       ROUND(CAST(sy*sxx - sx*sxy AS DOUBLE)
             / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS intercept,
       ROUND(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
             / (CAST(n*sxx - sx*sx AS DOUBLE)
                * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2
FROM m
WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
""")
def q_sensor_volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor least-squares trend of daily volume (is this detector's
    traffic growing?). The five regression moments (n, Σx, Σy, Σxy, Σx²,
    Σy²) accumulate as exact 128-bit integers — DECIMAL(38,0) here,
    HUGEINT in the oracle (the chi² precedent): a long high-volume
    per-sensor history overflows Σy² in BIGINT, where non-ANSI Spark
    nulls silently while DuckDB widens, a cross-engine divergence
    (advisor finding r3). The widened band is not infinite — DECIMAL
    (38,0) caps at 1e38 vs HUGEINT's ~1.7e38, a residual 0.7e38 sliver
    where the engines would again differ — but reaching it needs ~1e16
    more volume than any physical detector history; the BIGINT band
    (~9e18) was the realistic one. Order-independent exact sums mean
    slope /
    intercept / r² are each ONE double expression evaluated identically
    in both engines (the Welch-t-test tactic; never regr_slope, whose
    internal double accumulation is reduction-order-dependent). Plan:
    one (sensor, day) aggregate shuffle, then a per-sensor re-aggregate
    that rides the same key prefix; degenerate fits (single day,
    constant volume) drop via integer predicates, so no division guard
    is ever evaluated in doubles. Ref parity: the reference fits per-node
    GAMs (R/_analyze_data.R:206-225); this is the screening-pass linear
    twin a 100 TB run uses to pick which detectors merit the GLM."""
    from traffic_data_pipeline_spark.sources.sensor import sensor_readings

    daily = (
        sensor_readings(spark, sf_dir)
        .filter(F.col("volume").isNotNull())
        .groupBy("sensor", "reading_date")
        .agg(F.sum("volume").cast("bigint").alias("y"))
        .withColumn(
            "x",
            F.datediff(F.col("reading_date"), F.lit("1995-01-01"))
            .cast("bigint"))
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    m = daily.groupBy("sensor").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    inum = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    return (
        m.filter((den > 0) & (den_y > 0))
        .select(
            "sensor",
            F.col("n").cast("bigint").alias("n_days"),
            F.round(num.cast("double") / den.cast("double"), 6)
            .alias("slope"),
            F.round(inum.cast("double") / den.cast("double"), 6)
            .alias("intercept"),
            F.round(num.cast("double") * num.cast("double")
                    / (den.cast("double") * den_y.cast("double")), 6)
            .alias("r2"),
        )
    )


# ---------------------------------------------------------------------------
# Stream-static broadcast enrich (the remaining streaming join shape)
# ---------------------------------------------------------------------------

@register("streaming_static_enrich", f"""
WITH readings AS ({SENSOR_VIEW_SQL}),
cfg AS ({CONFIG_VIEW_SQL})
SELECT c.corridor_route,
       strftime(TIMESTAMP '1970-01-01 00:00:00'
                  + to_seconds(FLOOR(epoch(r.start_datetime) / 900) * 900),
                '%Y-%m-%d %H:%M:%S') AS w_start,
       CAST(COALESCE(SUM(r.volume), 0) AS BIGINT) AS volume_sum,
       CAST(COALESCE(SUM(r.occupancy), 0) AS BIGINT) AS occupancy_sum,
       COUNT(*) AS n_obs
FROM readings r JOIN cfg c ON c.sensor = r.sensor
GROUP BY 1, 2
""")
def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2's remaining join shape: stream-STATIC enrich. The 30-sec
    reading stream broadcast-joins the static detector dimension (no
    state — the dim is a plain broadcast into every micro-batch, the
    production shape for stream x slowly-changing-dim at any scale),
    then rolls up per (corridor, 15-min window) under a 3-day watermark
    through the append-mode parquet sink. The flush sentinel advances
    the watermark even though the join drops it: watermark stats are
    collected at the EventTimeWatermark node BEFORE the join, so a
    dimension miss can never stall window finalization. Oracle is the
    batch join+rollup SQL — streaming==batch is the check, like every
    streaming query here."""
    from traffic_data_pipeline_spark.functions.tmpdirs import scratch_dir
    from traffic_data_pipeline_spark.plans.queries import (
        FLUSH_SENSOR,
        fmt_ts,
        stream_source_dir,
    )
    from traffic_data_pipeline_spark.sources.sensor import detector_config

    src = stream_source_dir(spark, sf_dir)
    sink = scratch_dir(prefix="tdp_sse_sink_")
    ckpt = scratch_dir(prefix="tdp_sse_ckpt_")
    cfg = detector_config(spark, sf_dir).select("sensor", "corridor_route")
    stream = (
        spark.readStream.schema(
            "sensor string, start_datetime timestamp,"
            " volume int, occupancy int")
        .parquet(src)
        .withWatermark("start_datetime", "3 days")
    )
    agg = (
        stream.join(F.broadcast(cfg), "sensor")
        .groupBy("corridor_route",
                 F.window("start_datetime", "15 minutes").alias("w"))
        .agg(F.coalesce(F.sum("volume"), F.lit(0)).cast("bigint")
             .alias("volume_sum"),
             F.coalesce(F.sum("occupancy"), F.lit(0)).cast("bigint")
             .alias("occupancy_sum"),
             F.count(F.lit(1)).alias("n_obs"))
        .select("corridor_route", F.col("w.start").alias("w_start"),
                "volume_sum", "occupancy_sum", "n_obs")
    )
    from traffic_data_pipeline_spark.plans.queries import run_available_now

    # state = open (corridor, window) rows, not batch width
    run_available_now(spark, "streaming_static_enrich",
                      agg=agg, sink=sink, ckpt=ckpt)
    # sentinel never reaches the sink: the config join drops it
    return spark.read.parquet(sink).select(
        "corridor_route", fmt_ts("w_start").alias("w_start"),
        "volume_sum", "occupancy_sum", "n_obs",
    )


# ---------------------------------------------------------------------------
# Exact weighted median (volume-weighted corridor speed)
# ---------------------------------------------------------------------------

def _wmedian_oracle() -> str:
    from traffic_data_pipeline_spark.plans.queries import NODEFACT_CTES

    return f"""
WITH {NODEFACT_CTES},
base AS (
  SELECT corridor_route, speed, volume_sum FROM lvl2
  WHERE corridor_route IS NOT NULL AND speed IS NOT NULL
    AND volume_sum > 0),
c AS (
  SELECT corridor_route, speed, volume_sum,
         SUM(volume_sum) OVER (PARTITION BY corridor_route ORDER BY speed
                               RANGE BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cumw,
         SUM(volume_sum) OVER (PARTITION BY corridor_route) AS tot
  FROM base)
SELECT corridor_route,
       CAST(MIN(tot) AS BIGINT) AS total_weight,
       MIN(speed) AS w_median_speed
FROM c WHERE 2 * cumw >= tot GROUP BY 1
"""


@register("corridor_weighted_median", None)
def q_corridor_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted median corridor speed — the congestion statistic
    where every hour votes by its traffic, not one-hour-one-vote (a
    deserted 3am hour shouldn't pull the median like a rush hour). No
    built-in computes it; the exact formulation is a RANGE-frame
    cumulative weight over speed order (the frame makes tied speeds
    peers, so every row of a tie run carries the run-closing cumulative
    weight and the result is deterministic under any intra-tie order),
    then the smallest speed whose cumulative weight reaches half —
    2·cumw >= tot on exact integer weights, no division. One exchange
    per corridor partition carries both windows and the final min.
    At 100 TB the same plan holds: corridors are the partition key and
    the sort is in-partition."""
    from traffic_data_pipeline_spark.operators.rollup import (
        two_level_rollup,
        weighted_median,
    )
    from traffic_data_pipeline_spark.plans.queries import _node_fact

    roll = two_level_rollup(_node_fact(spark, sf_dir), "hour")
    base = roll.filter(
        F.col("corridor_route").isNotNull() & F.col("speed").isNotNull()
        & (F.col("volume_sum") > 0)
    ).select("corridor_route", "speed", "volume_sum")
    return weighted_median(base, "corridor_route", "speed", "volume_sum") \
        .select("corridor_route", "total_weight",
                F.col("w_median").alias("w_median_speed"))


ORACLES["corridor_weighted_median"] = _wmedian_oracle()


# ---------------------------------------------------------------------------
# Equi-depth histogram (exact percentile boundaries + recount)
# ---------------------------------------------------------------------------

_ED_FRACS = [i / 8 for i in range(1, 8)]
_ED_FRACS_SQL = ", ".join(f"{f}D" for f in _ED_FRACS)


def _equidepth_recount(li: DataFrame, boundary_expr: str) -> DataFrame:
    """Shared recount stage of the equi-depth histogram twins: evaluate
    the 7-cut boundary aggregate over a spread scan (one-file fixtures
    otherwise build the percentile state in ONE task), broadcast the
    one-row cut frame back, and re-bucket by summing seven codegen'd
    comparisons. The exact and approx twins differ ONLY in
    ``boundary_expr`` — the accuracy-pin test compares their outputs, so
    the recount must be literally the same code in both."""
    spread = li.repartition(
        li.sparkSession.sparkContext.defaultParallelism)
    b = spread.agg(F.expr(boundary_expr).alias("q"))
    # ROUND the cuts before comparing: DuckDB's quantile_cont lerps as
    # a*(1-f) + b*f, which can land 1 ulp off the a + (b-a)*f value
    # Spark computes (even when a == b — hypothesis-found counterexample
    # in tests/test_staged_properties.py), and an unrounded cut 1 ulp
    # below a repeated price would flip that price's bucket cross-engine
    bs = b.select(*[F.round(F.col("q")[j], 6).alias(f"b{j}")
                    for j in range(7)])
    # coalesce each comparison to 0 so a NULL price lands in bucket 0
    # exactly like the oracle's CASE WHEN ... THEN 1 ELSE 0 END — without
    # it the summed NULLs would mint a spurious bucket=NULL group
    bucket = sum(
        F.coalesce((F.col("l_extendedprice") > F.col(f"b{j}")).cast("int"),
                   F.lit(0))
        for j in range(7)
    )
    return (
        li.crossJoin(F.broadcast(bs))
        .groupBy(bucket.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("l_extendedprice").alias("min_price"),
             F.max("l_extendedprice").alias("max_price"))
    )


@register("price_equidepth_hist", f"""
WITH b AS (
  SELECT quantile_cont(l_extendedprice,
                       [{', '.join(str(f) for f in _ED_FRACS)}]) AS q
  FROM lineitem)
SELECT CAST({' + '.join(f'(CASE WHEN l_extendedprice > round(q[{j}], 6) THEN 1 ELSE 0 END)' for j in range(1, 8))}
            AS INTEGER) AS bucket,
       COUNT(*) AS n,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem, b GROUP BY 1
""")
def q_price_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) 8-bucket histogram of line prices —
    the optimizer-statistics / drift-report shape where equi-WIDTH bins
    would starve the dense region. Two passes: one shared-state exact
    percentile call yields the 7 interior boundaries (a one-row frame
    broadcast back), then the scan re-buckets each row by summing seven
    codegen'd comparisons — no higher-order function, no per-row array.
    Boundaries are interpolated order statistics over eighth fractions,
    ROUNDed to 6 dp in BOTH engines before comparing — DuckDB's
    two-product lerp can drift 1 ulp from Spark's a + (b-a)*f form on
    repeated values (DEVIATIONS.md float-parity note), and the true
    cuts (multiples of 0.00125 on 2-dp prices) are 6-dp-exact, so the
    rounded cuts are fully deterministic and the bucket assignment
    cannot straddle. At 100 TB the boundary pass swaps to
    percentile_approx (the registered-twin precedent) and the recount
    is unchanged."""
    return _equidepth_recount(
        load_table(spark, sf_dir, "lineitem"),
        f"percentile(l_extendedprice, array({_ED_FRACS_SQL}))")


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join with a residual non-equi condition
# ---------------------------------------------------------------------------

@register("order_priority_check", """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1
""")
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: quarterly order counts by priority, restricted to
    orders with at least one line shipped after the order date. The
    EXISTS runs as a LEFT SEMI join on the equi key with the non-equi
    date comparison as a residual condition — one co-keyed shuffle (AQE
    broadcasts the filtered quarter at fixture scale), never a
    count-then-filter materialization of the match multiplicity."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01"))
    li = load_table(spark, sf_dir, "lineitem")
    hit = orders.join(
        li, (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")), "left_semi")
    return hit.groupBy("o_orderpriority") \
        .agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: outer-join count distribution
# ---------------------------------------------------------------------------

@register("customer_order_histogram", """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders GROUP BY 1
""")
def q_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts
    (zero-order customers included — the LEFT join is the point; an
    inner join silently drops the biggest histogram bar). COUNT of the
    join-side key counts non-matches as zero in both engines. Two
    aggregations: the per-customer count rides the join's customer
    partitioning; the histogram re-agg is rows ≈ distinct counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count") \
        .agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: conditional-aggregate revenue share
# ---------------------------------------------------------------------------

@register("promo_revenue_share", """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS promo_share,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
""")
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month — conditional
    and unconditional aggregates in ONE pass over the broadcast part
    join (never two scans), both accumulating as exact decimals so the
    share is a single double division identical in both engines. The
    ship-date range is a pushed scan predicate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01"))
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(F.lit(100.0) * F.sum(promo).cast("double")
                    / F.sum(rev).cast("double"), 6).alias("promo_share"),
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity bands
# ---------------------------------------------------------------------------

@register("discounted_special_revenue", """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 5 AND l_quantity <= 15)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 10 AND l_quantity <= 20)
""")
def q_discounted_special_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of conjunctive
    brand x size x quantity bands — the predicate form that defeats
    naive single-column pushdown. The part side broadcasts with only
    the columns the predicate needs; the cross-table OR evaluates once
    in the join output (Catalyst also derives the union of part-only
    filters for the build side). One scan, one broadcast, one
    aggregate row of exact decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part") \
        .select("p_partkey", "p_brand", "p_size")
    band = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(5, 15))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(10, 20))
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(band)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bidirectional nation-pair trade volume by year
# ---------------------------------------------------------------------------

@register("nation_pair_trade", """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
    OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
""")
def q_nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations in both
    directions, split by year. The five-way star resolves with every
    dimension broadcast (orders is the only co-keyed join) and the
    bidirectional pair predicate evaluates once on the joined row;
    Catalyst pushes the derived single-nation filters into each
    broadcast build, so non-pair customers/suppliers never enter the
    hash tables. Year extraction + decimal revenue keep the grouping
    and sums exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    nc = nat.select(F.col("n_nationkey").alias("c_nk"),
                    F.col("n_name").alias("cust_nation"))
    ns = nat.select(F.col("n_nationkey").alias("s_nk"),
                    F.col("n_name").alias("supp_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_3")
         & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7")
           & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("c_nk") == F.col("c_nationkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("s_nk") == F.col("s_nationkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: per-year national market share within a region
# ---------------------------------------------------------------------------

@register("nation_market_share", """
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       ROUND(CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
                  THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = nc.n_regionkey AND r.r_name = 'ASIA'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
GROUP BY 1
""")
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's ECONOMY-part
    market per year — the conditional-over-total ratio where BOTH sums
    ride one pass (never a self-join of filtered against unfiltered).
    The seven-way star broadcasts every dimension; the region and
    part-type filters prune their broadcast builds before the fact sees
    them. Share = one double division of exact decimal sums per year
    row."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA")
    nc = nat.select(F.col("n_nationkey").alias("c_nk"),
                    F.col("n_regionkey").alias("c_rk"))
    ns = nat.select(F.col("n_nationkey").alias("s_nk"),
                    F.col("n_name").alias("supp_nation"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    target = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero)
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("c_nk") == F.col("c_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("c_rk"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("s_nk") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(F.sum(target).cast("double")
                    / F.sum(rev).cast("double"), 6).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: revenue by supplier nation and order year for a part line
# ---------------------------------------------------------------------------

@register("nation_year_part_profit", """
SELECT ns.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS amount,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
""")
def q_nation_year_part_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit sans the partsupp cost leg the fixture
    lacks): revenue on a name-matched part line by supplier nation and
    order year. The LIKE-filtered part list broadcasts into the fact
    scan first — the most selective dimension prunes before the orders
    join moves anything — and the (nation, year) grouping is
    two-orders-of-magnitude smaller than the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("amount"),
             F.count(F.lit(1)).alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: top returned-revenue customers (deterministic top-k)
# ---------------------------------------------------------------------------

@register("returned_item_customers", """
WITH rev AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18,6))) AS lost
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
               AND o.o_orderdate >= TIMESTAMP '1996-01-01'
               AND o.o_orderdate < TIMESTAMP '1996-07-01'
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE l.l_returnflag = 'R'
  GROUP BY 1, 2, 3)
SELECT c_custkey, c_name, n_name, CAST(lost AS DOUBLE) AS lost_revenue
FROM rev ORDER BY lost DESC, c_custkey LIMIT 20
""")
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue
    in a half-year window. Top-k runs as TakeOrderedAndProject
    (per-partition heaps + driver merge of 20-row candidates — no
    global sort), ordered by the EXACT decimal total with c_custkey as
    the tiebreak so the k-boundary is deterministic in both engines
    even under revenue ties. Return-flag and date predicates push to
    the scans; customer/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01"))
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("lost"))
    )
    return (
        rev.orderBy(F.col("lost").desc(), "c_custkey").limit(20)
        .select("c_custkey", "c_name", "n_name",
                F.col("lost").cast("double").alias("lost_revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: distinct-supplier counts with a NOT-IN blacklist
# ---------------------------------------------------------------------------

@register("part_supplier_diversity", """
SELECT p.p_brand, p.p_type,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (5, 10, 15, 20, 25)
  AND l.l_suppkey IS NOT NULL
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0
                            AND s_suppkey IS NOT NULL)
GROUP BY 1, 2
""")
def q_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct (non-blacklisted) suppliers
    serve each brand x type — the supply-chain-diversity readout. The
    NOT IN decorrelates to a broadcast LEFT ANTI join against the
    negative-balance blacklist. NOT IN is null-hostile on BOTH sides —
    one NULL in the LIST makes every row's predicate UNKNOWN (zero
    groups), and a NULL probe row evaluates UNKNOWN and drops in SQL
    (except against an EMPTY list, where NOT IN is vacuously TRUE) —
    so BOTH sides filter nulls explicitly AND the oracle pins both
    rules in its own text (IS NOT NULL on probe and subquery — the
    standard NOT-IN hygiene; a no-op on clean data, identical
    semantics on dirty). The size filter prunes the broadcast
    part build; COUNT(DISTINCT) expands on the (brand, type) grouping —
    two-level partial aggregation, never a row-level distinct of the
    fact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey").isNotNull())
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 10, 15, 20, 25))
    bad = load_table(spark, sf_dir, "supplier").filter(
        (F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull()
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").cast("bigint")
             .alias("supplier_cnt"))
    )


@register("price_equidepth_hist_approx")
def q_price_equidepth_hist_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-safe twin of price_equidepth_hist: boundary cut points
    from approx_percentile (Greenwald-Khanna sketch, accuracy 1e4 —
    constant memory, map-side mergeable) instead of the exact
    shared-state percentile whose merge task holds the full value-count
    map. Recount pass identical. Rows-only by design (sketch cut points
    are engine-specific); tests/test_approx_percentiles.py pins every
    bucket count within the GK rank-error bound of the exact twin."""
    return _equidepth_recount(
        load_table(spark, sf_dir, "lineitem"),
        f"approx_percentile(l_extendedprice, array({_ED_FRACS_SQL}), 10000)")


# ---------------------------------------------------------------------------
# Universal quantifier: per-priority order fulfillment (ALL lines on time)
# ---------------------------------------------------------------------------

@register("order_fulfillment_rate", """
SELECT o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN NOT EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = o.o_orderkey
                  AND l2.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
       ROUND(CAST(SUM(CASE WHEN NOT EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = o.o_orderkey
                  AND l2.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS fill_rate
FROM orders o
WHERE o.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey)
GROUP BY 1
""")
def q_order_fulfillment_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Universal-quantifier shape: the fraction of finished orders whose
    EVERY line shipped within 60 days. The oracle states it as the
    textbook NOT EXISTS (a violating line); the Spark plan rewrites
    for-all into an aggregate — MAX(l_shipdate) per order against the
    deadline — so the quantifier costs one co-keyed per-order aggregate
    instead of an anti-join per order, and the EXISTS(any line) guard
    falls out of the same inner join. The MAX rewrite is NOT
    null-equivalent to NOT EXISTS by itself: an order whose every
    l_shipdate is NULL has no violating witness in SQL (NULL > d is
    UNKNOWN) and counts FULFILLED, while MAX over all-NULLs is NULL —
    the coalesce(..., True) restores the for-all-over-empty-witness-set
    semantics. Counts are exact integers; the rate is one double
    division mirrored verbatim."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    ontime = F.coalesce(
        F.col("last_ship") <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.lit(True),
    ).cast("int")
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(ontime).cast("bigint").alias("n_fulfilled"),
        F.round(F.sum(ontime).cast("double") / F.count(F.lit(1)), 6)
        .alias("fill_rate"),
    )
