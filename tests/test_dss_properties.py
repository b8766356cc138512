"""Randomized property tests for the round-3 DSS rewrites:
weighted_median vs the brute-force definition, the Q21 window
decorrelation vs DuckDB's correlated-quantifier SQL on generated data
(tie-heavy shapes the fixture may never produce), and equi-depth
histogram invariants."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from traffic_data_pipeline_spark.operators.rollup import weighted_median
from traffic_data_pipeline_spark.plans.queries import ORACLES, QUERIES

wm_rows = st.lists(
    st.tuples(st.integers(0, 2),          # group
              st.integers(-5, 5),         # value (ties likely)
              st.integers(1, 9)),         # weight
    min_size=1, max_size=20)


def _brute_wmedian(rows):
    out = {}
    for g in {r[0] for r in rows}:
        vw = sorted((v, w) for gg, v, w in rows if gg == g)
        tot = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if 2 * cum >= tot:
                out[g] = (tot, v)
                break
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=wm_rows)
def test_weighted_median_matches_brute_force(spark, rows):
    df = spark.createDataFrame(rows, "g int, v int, w int")
    got = {r.g: (r.total_weight, r.w_median)
           for r in weighted_median(df, "g", "v", "w").collect()}
    assert got == _brute_wmedian(rows)


q21_rows = st.lists(
    st.tuples(st.integers(1, 5),          # orderkey
              st.integers(1, 4),          # suppkey
              st.integers(1, 6)),         # shipdate day (ties likely)
    min_size=1, max_size=25, unique=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=q21_rows)
def test_q21_window_rewrite_matches_correlated_sql(spark, rows, tmp_path_factory):
    """The three-quantifier Q21 decorrelation must agree with DuckDB
    running the textbook EXISTS / correlated-MAX / NOT-EXISTS SQL on
    the same generated data — especially when several suppliers tie on
    an order's max ship date (n_latest > 1 drops the order)."""
    sf = str(tmp_path_factory.mktemp("q21"))
    li = spark.createDataFrame(
        [(o, s, f"1996-01-0{d}") for o, s, d in rows],
        "l_orderkey long, l_suppkey long, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    orders = spark.createDataFrame(
        [(o, "F" if o % 2 else "O") for o in range(1, 6)],
        "o_orderkey long, o_orderstatus string")
    sup = spark.createDataFrame(
        [(s, f"supp{s}") for s in range(1, 5)],
        "s_suppkey long, s_name string")
    li.write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    orders.write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    sup.write.mode("overwrite").parquet(f"{sf}/supplier.parquet")

    got = sorted(
        (r.s_suppkey, r.s_name, r.numwait)
        for r in QUERIES["waiting_orders_suppliers"](spark, sf).collect())
    con = duckdb.connect()
    for t in ("lineitem", "orders", "supplier"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet/*.parquet')")
    want = sorted(map(tuple, con.execute(
        ORACLES["waiting_orders_suppliers"]).fetchall()))
    assert got == want


def test_equidepth_hist_invariants(spark, sf_dir):
    from traffic_data_pipeline_spark.sources.tables import load_table

    rows = {r.bucket: r for r in
            QUERIES["price_equidepth_hist"](spark, sf_dir).collect()}
    n_total = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n for r in rows.values()) == n_total
    # buckets partition the value axis: ranges never overlap
    for b in sorted(rows):
        if b + 1 in rows:
            assert rows[b].max_price <= rows[b + 1].min_price
    # equal-frequency: every bucket within 2x of the ideal eighth
    # (ties can imbalance, but the fixture's prices are near-unique)
    ideal = n_total / 8
    for r in rows.values():
        assert 0.5 * ideal <= r.n <= 2 * ideal


q2_rows = st.lists(
    st.tuples(st.integers(1, 6),          # partkey
              st.integers(1, 4),          # suppkey
              st.integers(1, 5)),         # price (ties likely)
    min_size=1, max_size=25, unique=True)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=q2_rows)
def test_q2_window_min_matches_correlated_sql(spark, rows, tmp_path_factory):
    """Min-price ties must keep EVERY achieving supplier (the window-min
    filter and the correlated scalar agree on the whole tie set)."""
    sf = str(tmp_path_factory.mktemp("q2"))
    spark.createDataFrame(
        [(p, s, float(pr)) for p, s, pr in rows],
        "l_orderkey long, l_suppkey long, l_extendedprice double",
    ).withColumn("l_partkey", F.col("l_orderkey")) \
        .write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(p, f"part{p}", 45) for p in range(1, 7)],
        "p_partkey long, p_name string, p_size int",
    ).write.mode("overwrite").parquet(f"{sf}/part.parquet")
    spark.createDataFrame(
        [(s, f"supp{s}", s % 3) for s in range(1, 5)],
        "s_suppkey long, s_name string, s_nationkey int",
    ).write.mode("overwrite").parquet(f"{sf}/supplier.parquet")
    spark.createDataFrame(
        [(n, f"nation{n}") for n in range(3)],
        "n_nationkey int, n_name string",
    ).write.mode("overwrite").parquet(f"{sf}/nation.parquet")

    got = sorted(
        (r.p_partkey, r.s_suppkey, r.min_price)
        for r in QUERIES["part_min_cost_supplier"](spark, sf).collect())
    con = duckdb.connect()
    for t in ("lineitem", "part", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet/*.parquet')")
    want = sorted((p, s, m) for p, _, s, _, _, m in con.execute(
        ORACLES["part_min_cost_supplier"]).fetchall())
    assert got == want


def test_q20_majority_boundary_is_strict(spark, tmp_path_factory):
    """2*sq > tot is STRICT: a supplier holding exactly half a part's
    volume is not dominant — the division-free boundary both engines
    share."""
    sf = str(tmp_path_factory.mktemp("q20"))
    rows = [
        # part 1: supplier 1 ships 5 of 10 (exactly half -> excluded)
        (1, 1, 5.0), (1, 2, 5.0),
        # part 2: supplier 1 ships 6 of 10 (majority -> included)
        (2, 1, 6.0), (2, 2, 4.0),
    ]
    spark.createDataFrame(
        [(p, s, q, "1996-06-01") for p, s, q in rows],
        "l_partkey long, l_suppkey long, l_quantity double, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp")) \
        .withColumn("l_orderkey", F.col("l_partkey")) \
        .write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(1, "alpha gear"), (2, "beta gear")],
        "p_partkey long, p_name string",
    ).write.mode("overwrite").parquet(f"{sf}/part.parquet")
    spark.createDataFrame(
        [(1, "supp1"), (2, "supp2")],
        "s_suppkey long, s_name string",
    ).write.mode("overwrite").parquet(f"{sf}/supplier.parquet")

    got = {(r.s_suppkey, r.n_dominated, r.dominated_qty)
           for r in QUERIES["excess_supply_suppliers"](spark, sf).collect()}
    assert got == {(1, 1, 6.0)}
