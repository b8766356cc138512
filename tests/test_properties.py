"""Property-based tests (hypothesis) for the SCD-2 transition rules and
the imputation cascade — randomized inputs, invariant assertions.

Example counts are kept small: each example runs real Spark jobs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from traffic_data_pipeline_spark.operators.aggregate import aggregate_detector
from traffic_data_pipeline_spark.operators.impute import impute
from traffic_data_pipeline_spark.operators.scd2 import initial_state, scd2_apply

UPD = dt.date(2024, 6, 1)
ATTRS = ["LANE", "CAT", "DETECTOR_ABANDONED"]

detector_ids = st.lists(st.integers(0, 14), min_size=1, max_size=8,
                        unique=True)
attr_vals = st.tuples(st.integers(1, 3), st.sampled_from(["a", "b"]),
                      st.sampled_from(["f", "t"]))

snapshot_strategy = st.dictionaries(
    st.integers(0, 14), attr_vals, min_size=1, max_size=10)


def _snap_df(spark, snap: dict):
    rows = [(f"d{i}", lane, cat, ab) for i, (lane, cat, ab) in snap.items()]
    return spark.createDataFrame(
        rows, "DETECTOR_NAME string, LANE int, CAT string, "
              "DETECTOR_ABANDONED string")


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(old=snapshot_strategy, new=snapshot_strategy)
def test_scd2_invariants(spark, old, new):
    state, log = scd2_apply(
        initial_state(_snap_df(spark, old)), _snap_df(spark, new), UPD, ATTRS)
    rows = state.collect()
    by_name = {}
    for r in rows:
        by_name.setdefault(r.DETECTOR_NAME, []).append(r)

    # every detector ever seen appears; no detector vanishes
    assert set(by_name) == {f"d{i}" for i in set(old) | set(new)}

    open_rows = [r for r in rows
                 if r.END_DATE == dt.date(2100, 1, 1) and not r.DEACTIVATE]
    # at most one open row per detector
    names = [r.DETECTOR_NAME for r in open_rows]
    assert len(names) == len(set(names))

    # removed-and-previously-active detectors are closed out today
    for i in set(old) - set(new):
        r = by_name[f"d{i}"][0]
        assert r.DEACTIVATE and r.END_DATE == UPD

    # changelog cell rows reproduce the exact survivor diff
    cells = {(r.DETECTOR_NAME, r.Change): (r.Old_Value, r.New_Value)
             for r in log.collect()
             if r.Change not in ("NEW_DETECTOR", "REMOVE_DETECTOR")}
    for i in set(old) & set(new):
        o, n = old[i], new[i]
        for attr, ov, nv in zip(ATTRS, o, n):
            key = (f"d{i}", attr)
            if str(ov) != str(nv):
                assert cells[key] == (str(ov), str(nv))
            else:
                assert key not in cells


reading = st.tuples(
    st.integers(0, 400),                       # minutes offset (15-min grid)
    st.one_of(st.none(), st.integers(0, 20)),  # volume
    st.one_of(st.none(), st.integers(0, 1800)),  # occupancy
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(series=st.lists(reading, min_size=1, max_size=40))
def test_impute_cascade_invariants(spark, series):
    base = dt.datetime(2024, 3, 1)
    rows = [("s1", base + dt.timedelta(minutes=30 * m), v, o)
            for m, v, o in series]
    df = spark.createDataFrame(
        rows, "sensor string, start_datetime timestamp, volume int, occupancy int")
    agg = aggregate_detector(df)
    out = impute(agg).collect()
    for r in out:
        # fully-observed intervals: imputed == raw (scaling is identity)
        if r.volume_pct_null == 0.0:
            assert r.volume_sum_impute == r.volume_sum
        # imputed value present whenever any observation existed
        if r.volume_pct_null < 100.0:
            assert r.volume_sum_impute is not None
        if r.occupancy_pct_null == 0.0:
            assert r.occupancy_sum_impute == r.occupancy_sum


# --- prefix-filtered Jaccard ≡ naive full self-join (recall-lossless) ----
#
# The AllPairs prefix filter (functions/dedup.ngram_jaccard_pairs, used for
# thresholds >= PREFIX_CUTOFF) must return EXACTLY the pairs of the naive
# formulation — the prefix theorem holds for any consistent shingle order,
# including the md5 order the implementation uses. Randomized documents
# with heavy shared boilerplate exercise the pruning edge cases.

doc_texts = st.lists(
    st.tuples(
        st.sampled_from(["the quick brown fox ", "lorem ipsum dolor sit ",
                         "pack my box with five "]),
        st.text(alphabet="abcd ", min_size=0, max_size=30),
    ),
    min_size=2, max_size=8,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
# 0.55 and 0.6 sit on ceil(t*n) float boundaries (0.55*100 ->
# 55.000000000000007): the prefix-length epsilon guard is what keeps these
# recall-lossless — they regressed silently before it existed
@given(texts=doc_texts, threshold=st.sampled_from([0.5, 0.55, 0.6, 0.7, 0.9]))
def test_prefix_jaccard_matches_naive(spark, texts, threshold):
    from traffic_data_pipeline_spark.functions.dedup import (
        _ngram_jaccard_naive, ngram_jaccard_pairs, shingle_sets)

    docs = spark.createDataFrame(
        [(f"d{i}", boiler + tail) for i, (boiler, tail) in enumerate(texts)],
        "doc_id string, text string")
    sh = shingle_sets(docs)
    groups = docs.select("doc_id", F.lit("g").alias("grp"))

    assert threshold >= 0.5  # the prefix path, not the naive dispatch
    fast = {(r.doc_a, r.doc_b, r.n_inter, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(sh, groups,
                                         min_jaccard=threshold).collect()}
    naive = {(r.doc_a, r.doc_b, r.n_inter, round(r.jaccard, 9))
             for r in _ngram_jaccard_naive(sh, groups, "doc_id",
                                           threshold).collect()}
    assert fast == naive


# ---------------------------------------------------------------------------
# Sweep-line concurrency vs brute force
# ---------------------------------------------------------------------------

event_sets = st.lists(
    st.tuples(st.integers(0, 4),                       # user
              st.integers(0, 300)),                    # minute offset
    min_size=1, max_size=18)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@example(evs=[(0, 0), (0, 30)])  # round-3 counterexample: exactly-gap MERGES
@given(evs=event_sets)
def test_concurrency_matches_bruteforce(spark, evs):
    """Randomized sessions: the per-hour sweep-line peak must equal a
    brute-force evaluation of 'sessions active at instant t' over all
    candidate instants (session starts + hour starts), with [start, end)
    semantics (a session ending exactly when another starts does not
    overlap it). The session brute force is the shared spec in
    tests/session_spec.py — strict-gap split, matching Spark's
    session_window merge rule (exactly-30-min gaps extend the session)."""
    from tests.session_spec import expected_sessions
    from traffic_data_pipeline_spark.plans.analysis_ops import (
        session_concurrency,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [(u, base + dt.timedelta(minutes=m)) for u, m in evs]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["hour"]: (r["n_sessions"], r["peak_concurrency"])
           for r in session_concurrency(ev).collect()}

    sessions = [(s, e) for _, s, e, _ in expected_sessions(rows)]

    hours = {}
    for s, e in sessions:
        h = s.replace(minute=0, second=0, microsecond=0)
        while h < e:
            hours.setdefault(h, []).append((s, e))
            h += dt.timedelta(hours=1)
    expect = {}
    for h, sess in hours.items():
        instants = {h} | {s for s, _ in sess if h <= s < h + dt.timedelta(hours=1)}
        peak = max(sum(1 for s, e in sess if s <= t < e) for t in instants)
        expect[h] = (len(sess), peak)
    assert got == expect


# ---------------------------------------------------------------------------
# Linear interpolation vs brute force
# ---------------------------------------------------------------------------

series = st.lists(st.one_of(st.none(), st.integers(0, 24)),
                  min_size=2, max_size=12)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=series)
def test_interpolation_matches_bruteforce(spark, vals):
    """Randomized gappy series: every filled value equals the directly
    computed line between its bracketing observations; edges stay null."""
    from traffic_data_pipeline_spark.plans.analysis_ops import (
        linear_interpolate,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    # irregular spacing so the time weighting actually matters
    times = [base + dt.timedelta(minutes=3 * i + (i % 3)) for i in range(len(vals))]
    rows = [("s1", t, v) for t, v in zip(times, vals)]
    df = spark.createDataFrame(
        rows, "sensor string, start_datetime timestamp, volume int")
    got = {r["start_datetime"]: r for r in linear_interpolate(df).collect()}

    non_null = [i for i, v in enumerate(vals) if v is not None]
    for i, (t, v) in enumerate(zip(times, vals)):
        r = got[t]
        if v is not None:
            assert r["volume_filled"] == float(v)
        elif not non_null or i < non_null[0] or i > non_null[-1]:
            assert r["volume_filled"] is None
        else:
            lo = max(j for j in non_null if j < i)
            hi = min(j for j in non_null if j > i)
            frac = ((times[i] - times[lo]).total_seconds()
                    / (times[hi] - times[lo]).total_seconds())
            want = vals[lo] + (vals[hi] - vals[lo]) * frac
            assert abs(r["volume_filled"] - round(want, 6)) < 1e-6
