"""Accuracy pins for the approx-percentile twins: the exact formulations
(corridor_p85_speed, lineitem_quantiles) keep the DuckDB oracle; these
tests check that the scale-safe sketch formulations answer within the
Greenwald-Khanna rank-error bound of the exact answers, so the form a
100 TB deployment would actually run is itself verified — not just named
in a comment."""

from __future__ import annotations

from traffic_data_pipeline_spark.plans.queries import QUERIES

REL_TOL = 0.01  # GK rank error n/accuracy=1e-4 -> value error far under 1%


def test_corridor_p85_approx_tracks_exact(spark, sf_dir_oracle):
    exact = {r.corridor_route: r for r in
             QUERIES["corridor_p85_speed"](spark, sf_dir_oracle).collect()}
    approx = {r.corridor_route: r for r in
              QUERIES["corridor_p85_speed_approx"](spark, sf_dir_oracle)
              .collect()}
    assert set(exact) == set(approx)
    for k, e in exact.items():
        a = approx[k]
        assert a.n_speeds == e.n_speeds, k
        assert abs(a.p85_speed - e.p85_speed) <= REL_TOL * abs(e.p85_speed), (
            k, a.p85_speed, e.p85_speed)


def test_lineitem_quantiles_approx_tracks_exact(spark, sf_dir_oracle):
    exact = {r.l_returnflag: r for r in
             QUERIES["lineitem_quantiles"](spark, sf_dir_oracle).collect()}
    approx = {r.l_returnflag: r for r in
              QUERIES["lineitem_quantiles_approx"](spark, sf_dir_oracle)
              .collect()}
    assert set(exact) == set(approx)
    for k, e in exact.items():
        a = approx[k]
        assert a.n == e.n, k
        for q in ("p25", "p50", "p75", "p95"):
            av, ev = getattr(a, q), getattr(e, q)
            assert abs(av - ev) <= REL_TOL * abs(ev), (k, q, av, ev)


def test_equidepth_hist_approx_tracks_exact(spark, sf_dir_oracle):
    """GK rank error at accuracy 1e4 is n/1e4 ranks per cut point; each
    bucket has two cuts, so counts may drift by <= 2n/1e4 (plus slack
    for value ties at the boundary)."""
    exact = {r.bucket: r.n for r in
             QUERIES["price_equidepth_hist"](spark, sf_dir_oracle).collect()}
    approx = {r.bucket: r.n for r in
              QUERIES["price_equidepth_hist_approx"](spark, sf_dir_oracle)
              .collect()}
    n = sum(exact.values())
    assert sum(approx.values()) == n          # recount never loses rows
    tol = max(4, 4 * n // 10000)
    for b in range(8):
        assert abs(exact.get(b, 0) - approx.get(b, 0)) <= tol, (
            b, exact.get(b), approx.get(b))
