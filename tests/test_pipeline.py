"""DARIMA pipeline tests on Spark (SURVEY.md §5.2 items 2-4)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_darima_spark.darima.arima_math import normal_ppf
from python_darima_spark.darima.fit import fit_window_to_coef_rows
from python_darima_spark.darima.pipeline import (
    DarimaConfig,
    combine_coefs,
    darima,
    evaluate,
    fit_windows,
    forecast,
)
from python_darima_spark.operators.timeseries import resample_regular, split_series

T0 = dt.datetime(2024, 1, 1)


def _series_pdf(y, series_id="s1", start=T0, step_hours=1):
    return pd.DataFrame(
        {
            "series_id": series_id,
            "ts": [start + dt.timedelta(hours=i * step_hours) for i in range(len(y))],
            "y": np.asarray(y, dtype=float),
        }
    )


def _ar1(n, phi=0.6, mu=20.0, seed=0):
    rng = np.random.default_rng(seed)
    y = np.zeros(n + 50)
    for t in range(1, n + 50):
        y[t] = phi * y[t - 1] + rng.normal()
    return y[50:] + mu


@pytest.fixture(scope="module")
def cfg():
    return DarimaConfig(num_windows=2, period=1, tol=30, max_p=3, max_q=0, max_P=0)


def test_split_series_range_contiguous(spark):
    pdf = _series_pdf(np.arange(100.0))
    out = (
        split_series(spark.createDataFrame(pdf), 4)
        .orderBy("ts")
        .select("window_id")
        .toPandas()["window_id"]
        .to_numpy()
    )
    # contiguous non-decreasing blocks covering 0..3
    assert (np.diff(out) >= 0).all()
    assert set(out) == {0, 1, 2, 3}
    counts = np.bincount(out)
    assert counts.min() >= 20  # roughly balanced on a regular grid


def test_split_series_ntile_exact(spark):
    pdf = _series_pdf(np.arange(100.0))
    out = split_series(spark.createDataFrame(pdf), 4, strategy="ntile")
    counts = out.groupBy("window_id").count().orderBy("window_id").toPandas()
    assert counts["count"].tolist() == [25, 25, 25, 25]


def test_resample_fills_gaps(spark):
    pdf = _series_pdf([1.0, 2.0, 3.0])
    pdf = pdf.drop(index=1)  # hole at hour 1
    out = resample_regular(spark.createDataFrame(pdf)).orderBy("ts").toPandas()
    assert len(out) == 3
    assert out["y"].tolist() == [1.0, 0.0, 3.0]
    ff = (
        resample_regular(spark.createDataFrame(pdf), fill="ffill")
        .orderBy("ts")
        .toPandas()
    )
    assert ff["y"].tolist() == [1.0, 1.0, 3.0]


def test_resample_interpolates_gaps(spark):
    # holes at hours 1-2 between observations 1.0 (h0) and 4.0 (h3):
    # linear interpolation gives 2.0, 3.0; edge gaps extend nearest value
    pdf = _series_pdf([1.0, 9.9, 9.9, 4.0, 5.0])
    pdf = pdf.drop(index=[1, 2])
    out = (
        resample_regular(spark.createDataFrame(pdf), fill="interp")
        .orderBy("ts")
        .toPandas()
    )
    assert out["y"].tolist() == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_interpolate_edges_extend_nearest(spark):
    # nulls BEFORE the first and AFTER the last observation take the
    # nearest observed value (ffill/bfill at the boundaries); interior
    # nulls interpolate on actual time distance (uneven 2h gap)
    from python_darima_spark.operators.timeseries import interpolate_linear

    pdf = pd.DataFrame(
        {
            "series_id": "s1",
            "ts": [T0 + dt.timedelta(hours=h) for h in range(6)],
            "y": [None, 2.0, None, None, 8.0, None],
        }
    )
    out = (
        interpolate_linear(spark.createDataFrame(pdf))
        .orderBy("ts")
        .toPandas()
    )
    assert out["y"].tolist() == [2.0, 2.0, 4.0, 6.0, 8.0, 8.0]


def test_resample_aggregates_within_bucket(spark):
    pdf = pd.DataFrame(
        {
            "series_id": "s1",
            "ts": [T0, T0 + dt.timedelta(minutes=30), T0 + dt.timedelta(hours=2)],
            "y": [1.0, 2.0, 5.0],
        }
    )
    out = resample_regular(spark.createDataFrame(pdf)).orderBy("ts").toPandas()
    assert out["y"].tolist() == [3.0, 0.0, 5.0]


def test_k1_combine_equals_single_fit(spark, cfg):
    """Property: one window → combined vector == direct local fit."""
    y = _ar1(300)
    sdf = spark.createDataFrame(_series_pdf(y))
    one = DarimaConfig(num_windows=1, period=1, tol=30, max_p=3, max_q=0, max_P=0)
    combined = (
        combine_coefs(fit_windows(sdf, one), one).toPandas().set_index("coef")["value"]
    )
    local = dict(
        fit_window_to_coef_rows(y, m=1, tol=30, method="mean", max_p=3, max_q=0, max_P=0)
    )
    for k, v in local.items():
        assert combined[k] == pytest.approx(v, rel=1e-9), k


def test_mean_combine_is_average(spark, cfg):
    y = _ar1(400)
    sdf = spark.createDataFrame(_series_pdf(y))
    rows = fit_windows(sdf, cfg).toPandas()
    combined = combine_coefs(spark.createDataFrame(rows), cfg).toPandas()
    manual = (
        rows[rows.coef != "n_obs"].groupby("coef")["value"].mean()
    )
    got = combined.set_index("coef")["value"]
    for k in manual.index:
        assert got[k] == pytest.approx(manual[k], rel=1e-9)


def test_dlsa_combine_weighting(spark):
    """DLSA: θ = Σ(w_k θ_k)/Σw_k, σ² = T_total/Σw_k (paper semantics)."""
    cfg = DarimaConfig(num_windows=2, period=1, tol=5, method="dlsa", max_p=2, max_q=0, max_P=0)
    rows = pd.DataFrame(
        {
            "series_id": ["s1"] * 8,
            "window_id": [0, 0, 0, 0, 1, 1, 1, 1],
            # window 0: theta=[2.0], w=10 (rows pre-scaled: 20), T=100
            # window 1: theta=[4.0], w=30 (rows pre-scaled: 120), T=200
            "coef": ["ar1", "sigma2", "n_obs", "beta0"] * 2,
            "value": [20.0, 10.0, 100.0, 0.0, 120.0, 30.0, 200.0, 0.0],
        }
    )
    out = (
        combine_coefs(spark.createDataFrame(rows), cfg)
        .toPandas()
        .set_index("coef")["value"]
    )
    assert out["ar1"] == pytest.approx((20 + 120) / (10 + 30))  # 3.5
    assert out["sigma2"] == pytest.approx((100 + 200) / (10 + 30))  # 7.5
    assert "n_obs" not in out.index


def test_forecast_recursion_matches_numpy(spark):
    """h-step recursion on a hand-specified AR(2)+trend model."""
    cfg = DarimaConfig(tol=5, period=1)
    beta0, beta1, pi = 1.0, 0.1, np.array([0.5, 0.2, 0.0, 0.0, 0.0])
    sigma2 = 2.0
    y = np.array([1.0, 2.0, 1.5, 2.5, 2.0, 3.0])
    coef_pdf = pd.DataFrame(
        {
            "series_id": "s1",
            "coef": ["beta0", "beta1", "ar1", "ar2", "sigma2"],
            "value": [beta0, beta1, 0.5, 0.2, sigma2],
        }
    )
    h = 4
    fc = (
        forecast(
            spark.createDataFrame(_series_pdf(y)),
            spark.createDataFrame(coef_pdf),
            h,
            cfg,
        )
        .orderBy("step")
        .toPandas()
    )
    # driver-side replication
    ext = np.concatenate([y, np.zeros(h)])
    T = y.size
    for i in range(h):
        t = T + i + 1
        ext[T + i] = beta0 + beta1 * t + pi[0] * ext[t - 2] + pi[1] * ext[t - 3]
    np.testing.assert_allclose(fc["mean"].to_numpy(), ext[T:], rtol=1e-12)
    # psi: [1, .5, .45, .325]; se_h = sqrt(sigma2*cumsum(psi^2))
    psi = np.array([1.0, 0.5, 0.5 * 0.5 + 0.2, 0.5 * 0.45 + 0.2 * 0.5])
    np.testing.assert_allclose(
        fc["se"].to_numpy(), np.sqrt(sigma2 * np.cumsum(psi**2)), rtol=1e-12
    )
    z95 = normal_ppf(0.975)
    np.testing.assert_allclose(
        fc["hi_95"].to_numpy(), fc["mean"].to_numpy() + z95 * fc["se"].to_numpy(), rtol=1e-12
    )
    # hourly future timestamps continue the grid
    assert fc["ts"].iloc[0] == T0 + dt.timedelta(hours=6)


def test_evaluate_golden_values(spark):
    """Hand-computed MASE/sMAPE/MSIS on a 2-point example (§5.2 golden)."""
    cfg = DarimaConfig(period=1, levels=(80, 95))
    train = _series_pdf([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])  # scale = mean|diff| = 1
    test = _series_pdf([6.0, 6.0], start=T0 + dt.timedelta(hours=6))
    fc = pd.DataFrame(
        {
            "series_id": "s1",
            "step": [1, 2],
            "ts": test["ts"],
            "mean": [5.0, 7.0],
            "se": [1.0, 1.0],
            "lo_80": [4.0, 6.5],
            "hi_80": [6.5, 8.0],
            "lo_95": [3.0, 5.0],
            "hi_95": [7.0, 9.0],
        }
    )
    ev = (
        evaluate(
            spark.createDataFrame(fc),
            spark.createDataFrame(test),
            spark.createDataFrame(train),
            cfg,
        )
        .orderBy("ts")
        .toPandas()
    )
    np.testing.assert_allclose(ev["mase"], [1.0, 1.0])
    np.testing.assert_allclose(ev["smape"], [2 / 11, 2 / 13])
    # msis_80: alpha=.2 → width + 10*(lo-y if y<lo) + 10*(y-hi if y>hi), /scale
    np.testing.assert_allclose(ev["msis_80"], [2.5, 1.5 + 10 * 0.5])
    np.testing.assert_allclose(ev["msis_95"], [4.0, 4.0])


def test_evaluate_scale_join_not_pinned_broadcast(spark):
    """The per-series scale join must NOT carry a user-forced broadcast
    hint: at millions of series a pinned broadcast OOMs the driver. The
    strategy is left to AQE, which broadcasts only when the aggregate's
    runtime size fits (small here), shuffle-joins otherwise."""
    cfg = DarimaConfig(period=1, levels=(80,))
    train = _series_pdf([1.0, 2.0, 3.0, 4.0])
    test = _series_pdf([4.0], start=T0 + dt.timedelta(hours=4))
    fc = pd.DataFrame(
        {
            "series_id": "s1", "step": [1], "ts": test["ts"],
            "mean": [4.0], "se": [1.0], "lo_80": [3.0], "hi_80": [5.0],
        }
    )
    ev = evaluate(
        spark.createDataFrame(fc),
        spark.createDataFrame(test),
        spark.createDataFrame(train),
        cfg,
    )
    analyzed = ev._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in analyzed and "ResolvedHint" not in analyzed
    physical = ev._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in physical


def test_full_pipeline_two_series(spark):
    """End-to-end: 2 series, fit+combine+forecast+evaluate; sane metrics."""
    cfg = DarimaConfig(num_windows=2, period=1, tol=20, max_p=3, max_q=0, max_P=0)
    train = pd.concat(
        [
            _series_pdf(_ar1(400, phi=0.5, mu=10.0, seed=1), "a"),
            _series_pdf(_ar1(400, phi=0.7, mu=-5.0, seed=2), "b"),
        ]
    )
    test = pd.concat(
        [
            _series_pdf(_ar1(20, phi=0.5, mu=10.0, seed=3), "a", start=T0 + dt.timedelta(hours=400)),
            _series_pdf(_ar1(20, phi=0.7, mu=-5.0, seed=4), "b", start=T0 + dt.timedelta(hours=400)),
        ]
    )
    res = darima(
        spark.createDataFrame(train), cfg, test_df=spark.createDataFrame(test)
    )
    coefs = res.coefs.toPandas()
    assert set(coefs["series_id"]) == {"a", "b"}
    assert len(coefs) == 2 * 23  # beta0, beta1, ar1..20, sigma2
    fc = res.forecasts.toPandas()
    assert len(fc) == 40
    # forecasts should hover near each series' level
    a_mean = fc[fc.series_id == "a"]["mean"].mean()
    b_mean = fc[fc.series_id == "b"]["mean"].mean()
    assert abs(a_mean - 10) < 2 and abs(b_mean + 5) < 2
    scores = res.scores.toPandas()
    assert 0 < scores["mase"].iloc[0] < 3
    assert 0 < scores["msis_95"].iloc[0] < 50
