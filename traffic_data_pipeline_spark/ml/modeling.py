"""Per-node seasonal count model via applyInPandas — the U4 GAM stand-in
(SURVEY.md §2.9; reference modeling_node at
/root/reference/R/_analyze_data.R:206-300).

The reference fits, per node, `mgcv::gam(VOLUME_SUM ~ s(itime, by=weekday,
bs='cs') + s(yday, bs='cs') + weekday, family=nb())` on 2018-19 history and
scores a dense hourly 2020→2030 grid, batching nodes 30 at a time over 5
forked R workers (:177-182, :278). The Spark-native shape is
`groupBy(NODE_NAME).applyInPandas(fit_predict)` — one Arrow-batched pandas
group per node, scheduled across executors; the node loop, the 30-node
batching, and the fork pool all disappear into task scheduling.

Model substitution (documented deviation, SURVEY.md §7 "what's hard" ii):
mgcv/statsmodels are not available, so the smooth terms become a harmonic
(Fourier) basis and the NB family becomes Poisson, fit by ridge-stabilized
IRLS in numpy:

    log E[volume] = β₀ + weekday dummies
                    + Σ_k sin/cos(2πk·itime/day)   (k=1..3, per-weekday
                      interaction for the hourly level — `by=weekday`)
                    + Σ_k sin/cos(2πk·yday/365.25) (k=1..2)

Same feature semantics (time-of-day × weekday, day-of-year seasonality),
same log-link count regression, same per-node independence, same output
schema (NODE_NAME, PREDICT_TIME, VOLUMN_PREDICTION — sic, the reference
DDL's spelling at /root/reference/R/1) SensorData-Modeling-Hourly-
RunOnce.R:9-19). Correctness gate is shape/monotonicity tests
(tests/test_modeling.py) + a rows-only driver check, not a value-hash —
there is no SQL twin for an iterative fit.

Scale: per-node history fits comfortably in one task (hourly 2y ≈ 17.5k
rows × ~30 features); 10k nodes = 10k independent tasks. The only shuffle
is the groupBy hash partitioning on NODE_NAME.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREDICT_SCHEMA = (
    "NODE_NAME string, PREDICT_TIME timestamp, VOLUMN_PREDICTION bigint"
)

_HOUR_K = 3   # intra-day harmonics (s(itime, by=weekday) stand-in)
_YDAY_K = 2   # annual harmonics    (s(yday) stand-in)


def _design(ts: pd.Series, time_level: str) -> np.ndarray:
    """Harmonic + weekday-dummy design matrix for a timestamp series."""
    dt = pd.DatetimeIndex(ts)
    n = len(dt)
    cols = [np.ones(n)]
    dow = dt.dayofweek.values  # 0=Mon..6=Sun
    for d in range(1, 7):
        cols.append((dow == d).astype(float))
    yday = dt.dayofyear.values.astype(float)
    for k in range(1, _YDAY_K + 1):
        ang = 2.0 * np.pi * k * yday / 365.25
        cols.append(np.sin(ang))
        cols.append(np.cos(ang))
    if time_level == "hour":
        secs = (dt.hour * 3600 + dt.minute * 60 + dt.second).values.astype(float)
        for k in range(1, _HOUR_K + 1):
            ang = 2.0 * np.pi * k * secs / 86400.0
            base_sin, base_cos = np.sin(ang), np.cos(ang)
            cols.append(base_sin)
            cols.append(base_cos)
            # `by=weekday` interaction: weekend profile differs from weekday
            weekend = (dow >= 5).astype(float)
            cols.append(base_sin * weekend)
            cols.append(base_cos * weekend)
    return np.column_stack(cols)


def _poisson_irls(X: np.ndarray, y: np.ndarray,
                  iters: int = 30, ridge: float = 1e-6) -> np.ndarray:
    """Ridge-stabilized IRLS for Poisson log-link; deterministic."""
    beta = np.zeros(X.shape[1])
    beta[0] = np.log(max(y.mean(), 0.1))
    eye = np.eye(X.shape[1])
    for _ in range(iters):
        eta = np.clip(X @ beta, -30.0, 30.0)
        mu = np.exp(eta)
        z = eta + (y - mu) / np.maximum(mu, 1e-9)
        W = mu  # Poisson working weights
        XtW = X.T * W
        try:
            new = np.linalg.solve(XtW @ X + ridge * eye, XtW @ z)
        except np.linalg.LinAlgError:
            break
        if not np.all(np.isfinite(new)):
            break
        if np.max(np.abs(new - beta)) < 1e-8:
            beta = new
            break
        beta = new
    return beta


def _fit_predict(pdf: pd.DataFrame) -> pd.DataFrame:
    """One node: fit on rows where _role='train', score rows where
    _role='score'."""
    time_level = pdf["_time_level"].iloc[0]
    train = pdf[pdf["_role"] == "train"].dropna(subset=["volume_sum"])
    score = pdf[pdf["_role"] == "score"]
    # reference QAQC requires >100 training rows per node
    # (/root/reference/R/_analyze_data.R:59-60); under ~2 weeks of history a
    # fit is meaningless. The day-grain design has ~11 columns, so two weeks
    # of dailies is enough there; hourly keeps the stricter floor.
    min_train = 30 if time_level == "hour" else 12
    if len(train) < min_train or len(score) == 0:
        return pd.DataFrame({
            "NODE_NAME": pd.Series(dtype="str"),
            "PREDICT_TIME": pd.Series(dtype="datetime64[ns]"),
            "VOLUMN_PREDICTION": pd.Series(dtype="int64"),
        })
    y = train["volume_sum"].astype(float).values
    beta = _poisson_irls(_design(train["ts"], time_level), y)
    pred = np.exp(np.clip(_design(score["ts"], time_level) @ beta, -30.0, 30.0))
    return pd.DataFrame({
        "NODE_NAME": score["node_name"].values,
        "PREDICT_TIME": score["ts"].values,
        "VOLUMN_PREDICTION": np.rint(pred).astype("int64"),
    })


def modeling_node(train: DataFrame, spine: DataFrame,
                  time_level: str = "hour") -> DataFrame:
    """Fit-and-score per node.

    ``train``: (node_name, ts, volume_sum) QAQC'd history.
    ``spine``: (node_name, predict_time) dense grid (hourly_spine).
    Returns the RTMC_PREDICT_{HOUR,DAY} shape.
    """
    t = train.select(
        "node_name", "ts", F.col("volume_sum").cast("double").alias("volume_sum"),
        F.lit("train").alias("_role"),
    )
    s = spine.select(
        "node_name", F.col("predict_time").alias("ts"),
        F.lit(None).cast("double").alias("volume_sum"),
        F.lit("score").alias("_role"),
    )
    both = t.unionByName(s).withColumn("_time_level", F.lit(time_level))
    return both.groupBy("node_name").applyInPandas(_fit_predict, PREDICT_SCHEMA)
