"""Structural properties of the round-3 analysis ops, beyond the oracle
hash gate: Bloom-filter recall, interpolation geometry, sweep-line
bounds, robust-z thresholding, KL non-negativity, and triangle-count
consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from traffic_data_pipeline_spark.plans.queries import QUERIES


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """A Bloom filter may over-flag (false positives) but must NEVER
    under-flag: every doc the exact gram join marks contaminated must be
    marked by the bitset probe too, and both paths must see the same
    per-doc gram universe."""
    exact = QUERIES["doc_decontaminate"](spark, sf_dir).select(
        "doc_id", F.col("n_grams").alias("g_exact"),
        F.col("contaminated").alias("c_exact"))
    bloom = QUERIES["doc_decontaminate_bloom"](spark, sf_dir).select(
        "doc_id", F.col("n_grams").alias("g_bloom"),
        F.col("contaminated").alias("c_bloom"))
    j = exact.join(bloom, "doc_id", "full").collect()
    assert len(j) > 0
    for r in j:
        assert r["g_exact"] == r["g_bloom"], f"gram universe drift: {r}"
        if r["c_exact"] == 1:
            assert r["c_bloom"] == 1, f"false negative at doc {r['doc_id']}"


def test_bloom_false_positive_rate_bounded(spark, sf_dir):
    """With m=16384 bits and k=3 probes over the fixture's benchmark gram
    count the theoretical doc-level FP inflation is small; assert the
    bloom flag set is not wildly larger than the exact one (a sanity rail
    that the probe/bitset math is wired right, not a statistical test)."""
    exact = QUERIES["doc_decontaminate"](spark, sf_dir)
    bloom = QUERIES["doc_decontaminate_bloom"](spark, sf_dir)
    n_exact = exact.filter(F.col("contaminated") == 1).count()
    n_bloom = bloom.filter(F.col("contaminated") == 1).count()
    assert n_bloom >= n_exact
    total = bloom.count()
    assert n_bloom - n_exact <= max(5, total // 10)


def test_interpolation_geometry(spark, sf_dir):
    """Interpolated points lie on the segment between their neighbors:
    every filled value is within [min, max] of the two bracketing
    observations; non-null readings pass through exactly; docs = rows
    with no bracketing pair stay null."""
    out = QUERIES["sensor_interpolate"](spark, sf_dir)
    rows = out.orderBy("sensor", "start_datetime").collect()
    assert any(r["interpolated"] == 1 for r in rows)
    by_sensor: dict[str, list] = {}
    for r in rows:
        by_sensor.setdefault(r["sensor"], []).append(r)
    for sensor, seq in by_sensor.items():
        idx_non_null = [i for i, r in enumerate(seq)
                        if r["volume_raw"] is not None]
        for i, r in enumerate(seq):
            if r["volume_raw"] is not None:
                assert r["volume_filled"] == float(r["volume_raw"])
                assert r["interpolated"] == 0
            elif not idx_non_null or i < idx_non_null[0] or i > idx_non_null[-1]:
                # leading/trailing gap: no bracket, stays null
                assert r["volume_filled"] is None
                assert r["interpolated"] == 0
        # bracket bound check (done row-wise to keep neighbor pairing exact)
        for i, r in enumerate(seq):
            if r["interpolated"] == 1:
                prev = next((seq[j]["volume_raw"] for j in range(i - 1, -1, -1)
                             if seq[j]["volume_raw"] is not None), None)
                nxt = next((seq[j]["volume_raw"] for j in range(i + 1, len(seq))
                            if seq[j]["volume_raw"] is not None), None)
                assert prev is not None and nxt is not None
                lo, hi = min(prev, nxt), max(prev, nxt)
                assert lo - 1e-9 <= r["volume_filled"] <= hi + 1e-9, (
                    f"{sensor}@{r['start_datetime']}: {r['volume_filled']} "
                    f"outside [{lo},{hi}]")


def test_concurrency_bounds(spark, sf_dir):
    """Peak concurrency is at least 1 and at most the number of sessions
    touching the hour; the total of hourly session touches is >= the
    session count (a session touches every hour it spans)."""
    conc = QUERIES["events_concurrency"](spark, sf_dir).collect()
    assert len(conc) > 0
    for r in conc:
        assert 1 <= r["peak_concurrency"] <= r["n_sessions"], r
    n_sessions = QUERIES["events_sessionize"](spark, sf_dir).count()
    assert sum(r["n_sessions"] for r in conc) >= n_sessions


def test_mad_threshold_is_sharp(spark, sf_dir):
    """Every flagged event actually clears the 3.5-robust-z fence (by the
    reported med/mad), and z's sign matches the deviation direction."""
    rows = QUERIES["events_mad_anomaly"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r["value"] - r["med"]) > 3.5 * 1.4826 * r["mad"] - 1e-6
        assert (r["robust_z"] > 0) == (r["value"] > r["med"])
        assert abs(r["robust_z"]) > 3.5 - 1e-6


def test_kl_drift_nonnegative(spark, sf_dir):
    """Gibbs' inequality: KL(p||q) >= 0, zero only if the source matches
    the corpus blend exactly."""
    rows = QUERIES["corpus_kl_drift"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["kl_bits"] >= -1e-9, r
        assert r["n_types"] <= r["n_tokens"]


def test_cluster_density_consistent(spark, sf_dir):
    """Triangle/wedge accounting: 3*triangles <= wedges (each triangle
    closes exactly 3 wedges), transitivity in [0,1], and edge/node counts
    match the shared pair stream."""
    row = QUERIES["dedup_cluster_density"](spark, sf_dir).collect()[0]
    assert row["n_edges"] > 0
    assert 3 * row["n_triangles"] <= row["n_wedges"]
    if row["transitivity"] is not None:
        assert 0.0 <= row["transitivity"] <= 1.0
    from traffic_data_pipeline_spark.plans.extensions import doc_lsh_pairs

    pairs = doc_lsh_pairs(spark, sf_dir)
    assert pairs.count() == row["n_edges"]


def test_small_qty_threshold_rational(spark, sf_dir):
    """The Q17-shape filter keeps a line item iff 2*q*n < sum(q) for its
    part — recheck a sample of survivors against per-part sums computed
    independently."""
    from traffic_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    agg = {r["l_partkey"]: (r["s"], r["n"]) for r in
           li.groupBy("l_partkey")
           .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
           .collect()}
    out = QUERIES["brand_small_qty_revenue"](spark, sf_dir).collect()
    assert sum(r["n_small"] for r in out) > 0
    # survivors' brand totals are consistent with a direct recount
    direct = (
        li.join(F.broadcast(
            li.groupBy("l_partkey").agg(
                F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))),
            "l_partkey")
        .filter(F.col("l_quantity") * F.col("n") * 2 < F.col("s"))
        .count()
    )
    assert direct == sum(r["n_small"] for r in out)

def test_basket_pairs_lift_recount(spark, sf_dir):
    """Top basket pairs: recount n_orders_both for the returned pairs
    directly from the fact and recheck the lift arithmetic."""
    from traffic_data_pipeline_spark.sources.tables import load_table

    out = QUERIES["basket_part_pairs"](spark, sf_dir).collect()
    assert len(out) == 10
    assert [r["rk"] for r in out] == list(range(1, 11))
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    orders = {r["l_orderkey"]: set() for r in items.collect()}
    for r in items.collect():
        orders[r["l_orderkey"]].add(r["l_partkey"])
    t = len(orders)
    for r in out[:3]:
        both = sum(1 for parts in orders.values()
                   if r["part_a"] in parts and r["part_b"] in parts)
        n_a = sum(1 for parts in orders.values() if r["part_a"] in parts)
        n_b = sum(1 for parts in orders.values() if r["part_b"] in parts)
        assert both == r["n_orders_both"]
        assert abs(r["lift"] - round(both * t / (n_a * n_b), 6)) < 1e-9


def test_chi2_keywords_overrepresented(spark, sf_dir):
    """Every reported keyword is actually OVER-represented in its source
    (P(t|s) > P(t)) and the per-source rank sequence is dense."""
    rows = QUERIES["source_keywords_chi2"](spark, sf_dir).collect()
    assert len(rows) > 0
    from traffic_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    n_s = {r["source"]: r["c"] for r in
           docs.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
        assert r["df_in_source"] * n > r["df_total"] * n_s[r["source"]], r
        assert r["chi2"] > 0
    for src, rs in by_src.items():
        assert [x["rk"] for x in sorted(rs, key=lambda x: x["rk"])] == \
            list(range(1, len(rs) + 1))


def test_label_centroid_similarity_bounds(spark, sf_dir):
    """Cosine bounds and pair completeness: every value in [-1, 1], one
    row per unordered label pair, and n_a/n_b match the label sizes."""
    rows = QUERIES["label_centroid_similarity"](spark, sf_dir).collect()
    from traffic_data_pipeline_spark.sources.tables import load_table

    labels = {r["label"]: r["c"] for r in
              load_table(spark, sf_dir, "embeddings")
              .groupBy("label").agg(F.count(F.lit(1)).alias("c")).collect()}
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert -1.0 - 1e-9 <= r["centroid_cosine"] <= 1.0 + 1e-9
        assert r["label_a"] < r["label_b"]
        assert r["n_a"] == labels[r["label_a"]]
        assert r["n_b"] == labels[r["label_b"]]


def test_cusum_argmax_bruteforce(spark, sf_dir):
    """Recompute the CUSUM split for a few sensors driver-side and check
    the query found the same argmax (and the earliest-ts tie-break)."""
    from traffic_data_pipeline_spark.sources.tables import load_table

    out = {r["sensor"]: r for r in
           QUERIES["sensor_cusum_shift"](spark, sf_dir).collect()}
    assert len(out) > 0
    ev = load_table(spark, sf_dir, "events")
    base = (ev.groupBy(F.col("user_id").cast("string").alias("sensor"), "ts")
            .agg(F.max(F.when(F.col("event_type") == "error", F.lit(None))
                       .otherwise((F.floor("value") % 25).cast("int")))
                 .alias("v"))
            .filter(F.col("v").isNotNull()))
    for sensor in list(out)[:3]:
        seq = [r["v"] for r in base.filter(F.col("sensor") == sensor)
               .orderBy("ts").collect()]
        n, sn = len(seq), sum(seq)
        best, best_k, sk = -1, None, 0
        for k, v in enumerate(seq[:-1], start=1):
            sk += v
            stat = abs(n * sk - k * sn)
            if stat > best:
                best, best_k = stat, k
        r = out[sensor]
        assert r["cusum_stat"] == best
        assert r["split_k"] == best_k
        assert r["n_obs"] == n


def test_label_prop_communities_sane(spark, sf_dir):
    """Community labels are node names, sizes sum to the node count, and
    rerunning yields the identical assignment (determinism)."""
    rows1 = {r["node"]: r for r in
             QUERIES["events_label_prop"](spark, sf_dir).collect()}
    nodes = set(rows1)
    for r in rows1.values():
        assert r["community"] in nodes
    from collections import Counter

    sizes = Counter(r["community"] for r in rows1.values())
    for r in rows1.values():
        assert r["community_size"] == sizes[r["community"]]
    from traffic_data_pipeline_spark.functions.execution import release

    release()
    rows2 = {r["node"]: r["community"] for r in
             QUERIES["events_label_prop"](spark, sf_dir).collect()}
    assert rows2 == {k: v["community"] for k, v in rows1.items()}


def test_ab_ttest_against_scipy_free_formula(spark, sf_dir):
    """Recompute Welch's t and df driver-side from the raw values and
    compare (no scipy in the container — the closed formulas suffice)."""
    from traffic_data_pipeline_spark.sources.tables import load_table
    import math

    r = QUERIES["events_ab_ttest"](spark, sf_dir).collect()[0]
    vals = [(x["user_id"] % 2, x["value"]) for x in
            load_table(spark, sf_dir, "events").select("user_id", "value").collect()]
    for grp, n_col, m_col in ((0, "n_a", "mean_a"), (1, "n_b", "mean_b")):
        xs = [round(v, 6) for g, v in vals if g == grp]
        assert r[n_col] == len(xs)
        assert abs(r[m_col] - sum(xs) / len(xs)) < 1e-3
    a = [v for g, v in vals if g == 0]
    b = [v for g, v in vals if g == 1]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    se = var(a) / len(a) + var(b) / len(b)
    t = (sum(a) / len(a) - sum(b) / len(b)) / math.sqrt(se)
    assert abs(r["t_stat"] - t) < 1e-3
    df = se * se / ((var(a) / len(a)) ** 2 / (len(a) - 1)
                    + (var(b) / len(b)) ** 2 / (len(b) - 1))
    assert abs(r["welch_df"] - df) < max(1e-3 * df, 1e-3)


def test_seasonality_index_averages_to_one(spark, sf_dir):
    """Index identity: index_m == rev_m * n_months / total for every
    month (so a flat revenue distribution scores exactly 1.0), and all
    twelve months are present."""
    rows = QUERIES["orders_seasonality"](spark, sf_dir).collect()
    assert len(rows) == 12
    total = sum(r["month_revenue"] for r in rows)
    n = len(rows)
    for r in rows:
        assert abs(r["seasonal_index"]
                   - r["month_revenue"] * n / total) < 1e-4
        assert r["seasonal_index"] > 0


def test_wau_hll_accuracy_pinned(spark, sf_dir):
    """Since the round-5 oracle conversion the HLL query emits the exact
    window count plus the in-plan <=5% witness; assert the exact values
    equal the exact twin's over the identical window-day set and every
    witness holds (the estimate's 5% envelope, lgConfigK=12)."""
    exact = {r["window_day"]: r["wau"] for r in
             QUERIES["events_rolling_wau"](spark, sf_dir).collect()}
    got = {r["window_day"]: r for r in
           QUERIES["events_rolling_wau_hll"](spark, sf_dir).collect()}
    assert set(got) == set(exact)
    for day, w in exact.items():
        assert got[day]["wau"] == w, (day, got[day]["wau"], w)
        assert got[day]["hll_ok"], day


def test_ab_ttest_degenerate_cohort_parity(spark, tmp_path_factory):
    """A constant metric (both cohorts' variance exactly 0) and a
    one-event cohort (n - 1 = 0) send t_stat / welch_df / var through
    zero divisors — DuckDB IEEE division emits nan/inf there while
    Spark emits NULL. The NULLIF twins must make both engines emit
    NULL; the gate re-runs on planted feeds for both cases."""
    import os

    import duckdb as _duck

    from tests.oracle import assert_matches_oracle
    from traffic_data_pipeline_spark.plans.queries import ORACLES
    from traffic_data_pipeline_spark.sources.tables import TABLES

    feeds = {
        # constant metric, both cohorts populated
        "const": """SELECT * FROM (VALUES
            (1, TIMESTAMP '2024-02-01 00:00:00', 10, 'click', 3.0, NULL),
            (2, TIMESTAMP '2024-02-01 00:01:00', 11, 'click', 3.0, NULL),
            (3, TIMESTAMP '2024-02-01 00:02:00', 12, 'click', 3.0, NULL),
            (4, TIMESTAMP '2024-02-01 00:03:00', 13, 'click', 3.0, NULL))
            v(event_id, ts, user_id, event_type, value, props)""",
        # cohort B (odd user_id) has exactly one event
        "n1": """SELECT * FROM (VALUES
            (1, TIMESTAMP '2024-02-01 00:00:00', 10, 'click', 1.0, NULL),
            (2, TIMESTAMP '2024-02-01 00:01:00', 12, 'click', 2.0, NULL),
            (3, TIMESTAMP '2024-02-01 00:02:00', 14, 'click', 4.0, NULL),
            (4, TIMESTAMP '2024-02-01 00:03:00', 11, 'click', 5.0, NULL))
            v(event_id, ts, user_id, event_type, value, props)""",
    }
    for tag, sql in feeds.items():
        out = tmp_path_factory.mktemp(f"ttest_{tag}")
        con = _duck.connect()
        con.execute(
            f"COPY ({sql}) TO '{out}/events.parquet' (FORMAT PARQUET)")
        con.close()
        for t in TABLES:
            dst = out / f"{t}.parquet"
            if not dst.exists():
                os.symlink(f"/root/testdata/sf0.01/{t}.parquet", dst)
        assert_matches_oracle(
            QUERIES["events_ab_ttest"](spark, str(out)),
            ORACLES["events_ab_ttest"], str(out))
        row = QUERIES["events_ab_ttest"](spark, str(out)).collect()[0]
        assert row.t_stat is None and row.welch_df is None, (tag, row)
