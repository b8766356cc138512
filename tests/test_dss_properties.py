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
