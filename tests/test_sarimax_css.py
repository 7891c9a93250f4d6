"""Property gates for the numpy CSS SARIMAX(2,1,2)(1,1,1,5) backend.

The reference's exact model family (arima_forecast.py:50-58) running
in this statsmodels-less container — see forecast/sarimax_css.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from yahoofinancedatalake_spark.forecast.grouped import (
    _fallback_forecast,
    make_group_forecaster,
)
from yahoofinancedatalake_spark.forecast.sarimax_css import (
    _ar_weights,
    _css_filter,
    _difference,
    _ma_weights,
    css_sarimax_forecast,
    fit_css,
)

TRUE = dict(p1=0.5, p2=-0.3, t1=0.4, t2=0.2, sp=0.5, sq=-0.4)


def _simulate(n: int, seed: int, sigma: float = 1.0) -> np.ndarray:
    """Draw from the TRUE SARIMA(2,1,2)(1,1,1,5) process (burn-in,
    double integration back to levels)."""
    rng = np.random.default_rng(seed)
    ar = _ar_weights(TRUE["p1"], TRUE["p2"], TRUE["sp"])
    ma = _ma_weights(TRUE["t1"], TRUE["t2"], TRUE["sq"])
    total = 200 + n
    eps = rng.normal(0, sigma, total)
    w = np.zeros(total)
    for t in range(total):
        v = eps[t]
        for k in (1, 2, 5, 6, 7):
            if t >= k:
                v += ar[k] * w[t - k] + ma[k] * eps[t - k]
        w[t] = v
    z = np.zeros(total)
    for t in range(total):
        v = w[t]
        if t >= 1:
            v += z[t - 1]
        if t >= 5:
            v += z[t - 5]
        if t >= 6:
            v -= z[t - 6]
        z[t] = v
    return 100.0 + z[200:]


def test_deterministic_seasonal_trend_propagates_exactly():
    """trend + period-5 pattern is annihilated by (1-B)(1-B^5): the
    forecast must continue both EXACTLY (the seasonal path the
    OLS/AR(1) fallback cannot express)."""
    n = 60
    t = np.arange(n)
    pattern = np.array([3.0, -1.0, 0.5, -2.0, -0.5])
    y = 10 + 0.5 * t + pattern[t % 5]
    preds, halves = css_sarimax_forecast(y, 15)
    tf = n + np.arange(15)
    true = 10 + 0.5 * tf + pattern[tf % 5]
    assert float(np.max(np.abs(preds - true))) < 1e-8
    assert float(np.max(halves)) < 1e-6  # zero residual → zero CI
    # the fallback provably CANNOT do this (no seasonal term)
    fp, _ = _fallback_forecast(y, 15)
    assert float(np.max(np.abs(fp - true))) > 0.5


def test_fit_is_deterministic():
    y = _simulate(120, seed=3)
    a = css_sarimax_forecast(y, 10)
    b = css_sarimax_forecast(y, 10)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_css_objective_beats_true_parameters():
    """The optimizer must reach at least the true parameters' CSS —
    otherwise it isn't optimizing."""
    y = _simulate(252, seed=42)
    fit = fit_css(y)
    w = _difference(y)
    ar = _ar_weights(TRUE["p1"], TRUE["p2"], TRUE["sp"])
    ma = _ma_weights(TRUE["t1"], TRUE["t2"], TRUE["sq"])
    eps_true = _css_filter(w, ar, ma)
    sse_true = float(eps_true @ eps_true)
    sse_fit = float(fit["eps"] @ fit["eps"])
    assert sse_fit <= sse_true * 1.01


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_sigma_recovered_on_true_process(seed):
    y = _simulate(252, seed=seed)
    fit = fit_css(y)
    assert 0.8 <= fit["sigma"] <= 1.2  # true innovation sd = 1.0


def test_exog_beta_recovered_and_effect_sign():
    """beta ~ 2 on y = SARIMA + 2x, and a larger future exog must
    shift the forecast up by beta * delta."""
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, 252)
    y = _simulate(252, seed=5, sigma=0.5) + 2.0 * x
    fit = fit_css(y, x)
    assert 1.7 <= fit["beta"] <= 2.3
    hi = css_sarimax_forecast(y, 5, x, np.full(5, 1.0))[0]
    lo = css_sarimax_forecast(y, 5, x, np.full(5, -1.0))[0]
    shift = hi - lo  # = beta * 2.0 exactly (exog enters linearly)
    assert np.all(shift > 0)
    assert np.allclose(shift, 2.0 * fit["beta"], atol=1e-6)


def test_ci_orders_and_widens():
    y = _simulate(252, seed=9)
    preds, halves = css_sarimax_forecast(y, 30)
    assert np.all(halves >= 0)
    assert np.all(np.diff(halves) >= -1e-9)  # monotone widening
    assert halves[0] > 0


def test_short_series_falls_back_to_closed_form():
    y = _simulate(20, seed=2)  # below _MIN_OBS
    a = css_sarimax_forecast(y, 5)
    b = _fallback_forecast(y, 5)
    assert np.allclose(a[0], b[0]) and np.allclose(a[1], b[1])


def test_group_forecaster_contract_on_seasonal_backend():
    """90 actual + <=30 forecast rows, CI ordering, exog carried —
    the reference output contract through the sarimax_css backend."""
    import pandas as pd

    n = 252
    days = pd.date_range("2023-01-02", periods=n, freq="B")
    y = _simulate(n, seed=21)
    pdf = pd.DataFrame({"symbol": "AAPL", "date": days, "close": y})
    fn = make_group_forecaster(
        "symbol", "date", "close",
        horizon=30, train_window=252, history=90,
        backend="sarimax_css",
    )
    out = fn(pdf)
    actual = out[out["kind"] == "actual"]
    fc = out[out["kind"] == "forecast"]
    assert len(actual) == 90
    assert 0 < len(fc) <= 30
    assert (fc["confidence_lower"] <= fc["predicted"] + 1e-9).all()
    assert (fc["predicted"] <= fc["confidence_upper"] + 1e-9).all()
    # actual rows: lower = upper = value (visual-continuity contract)
    assert (actual["confidence_lower"] == actual["predicted"]).all()
    assert np.isfinite(fc["predicted"].to_numpy()).all()


def test_ci_coverage_calibrated_on_true_process():
    """Pooled 95% CI coverage over independent realizations of the
    true SARIMA process must be near nominal (a calibration gate, not
    a single-realization spot check: 12 seeds x 10-step horizons =
    120 correlated-but-pooled indicator draws; a broken psi-weight
    recursion lands far below 0.8)."""
    hits = total = 0
    for seed in range(12):
        y_all = _simulate(262, seed=100 + seed)
        y, hold = y_all[:252], y_all[252:]
        preds, halves = css_sarimax_forecast(y, 10)
        hits += int(
            np.sum((hold >= preds - halves) & (hold <= preds + halves))
        )
        total += 10
    assert hits / total >= 0.8, f"pooled coverage {hits/total:.2f}"


def test_fit_survives_explosive_series():
    """A geometric series (doubly-integrated explosion) drives the
    CSS filter toward overflow for large |theta| candidates; the fit
    must still return finite parameters and a finite forecast (the
    nan->inf guard in the objective keeps the simplex ordered)."""
    y = 1.5 ** np.arange(60)  # overflows filters for bad params fast
    fit = fit_css(y)
    assert all(np.isfinite(v) for v in fit["params"])
    preds, halves = css_sarimax_forecast(y, 5)
    assert np.all(np.isfinite(preds)) and np.all(np.isfinite(halves))
