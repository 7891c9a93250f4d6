"""Conditional-sum-of-squares SARIMAX(2,1,2)(1,1,1,5) in pure numpy.

The reference's flagship model is ``SARIMAX(order=(2,1,2),
seasonal_order=(1,1,1,5), exog=sentiment)`` fit per symbol
(reference: scripts/prediction/arima_forecast.py:50-66). statsmodels
is not installable in this container, so the exact hyperparameter
family would otherwise only ever run as the closed-form OLS/AR(1)
substitute. This module is a dependency-free implementation of the
same model family:

- **Differencing** ``(1-B)(1-B^5)`` applied to the regression error
  ``z_t = y_t - beta * x_t`` (regression with SARIMA errors — the
  same structure statsmodels' state-space exog takes).
- **CSS objective**: residuals from the recursive ARMA filter with
  zero pre-sample values (Box-Jenkins conditional likelihood, the
  ``method='css'`` estimator statsmodels exposes; equal to the exact
  MLE up to O(1/n) edge effects).
- **beta concentrated out**: the residual filter is linear, so
  ``eps(beta) = filter(w_y) - beta * filter(w_x)`` and the optimal
  beta per candidate ARMA parameter vector is a 1-d least-squares
  ratio — the optimizer only searches the 6 ARMA parameters.
- **Nelder-Mead** simplex (numpy-only) over (phi1, phi2, theta1,
  theta2, Phi1, Theta1), soft-penalized outside [-2, 2];
  stationarity/invertibility NOT enforced, matching the reference's
  ``enforce_stationarity=False, enforce_invertibility=False``.
- **Forecast**: ARMA recursion on the differenced scale, double
  integration back to levels, plus ``beta * x_future``.
- **95% CI** from the psi-weight (MA-infinity) expansion of the full
  integrated model: ``var_h = sigma^2 * sum_{j<h} psi_j^2``.

Like every model here the fit is deterministic: fixed starting
simplex, fixed iteration budget, no RNG.
"""

from __future__ import annotations

import numpy as np

#: The reference's hyperparameters (arima_forecast.py:50-58).
ORDER = (2, 1, 2)
SEASONAL_ORDER = (1, 1, 1, 5)

_Z95 = 1.959963984540054
_SEASON = SEASONAL_ORDER[3]
_MAXLAG = 2 + _SEASON  # widest combined AR/MA lag (p + s = q + s = 7)
# differencing consumes 1 + s points; require a few spans of data
_MIN_OBS = 4 * (_SEASON + 1) + _MAXLAG


def _ar_weights(p1: float, p2: float, sp: float) -> np.ndarray:
    """Lag weights of (1 - p1*B - p2*B^2)(1 - sp*B^s): w_t regresses
    on lags [1, 2, s, s+1, s+2] with weights
    [p1, p2, sp, -p1*sp, -p2*sp]."""
    w = np.zeros(_MAXLAG + 1)
    w[1], w[2], w[_SEASON] = p1, p2, sp
    w[_SEASON + 1], w[_SEASON + 2] = -p1 * sp, -p2 * sp
    return w


def _ma_weights(t1: float, t2: float, sq: float) -> np.ndarray:
    """Lag weights of (1 + t1*B + t2*B^2)(1 + sq*B^s)."""
    w = np.zeros(_MAXLAG + 1)
    w[1], w[2], w[_SEASON] = t1, t2, sq
    w[_SEASON + 1], w[_SEASON + 2] = t1 * sq, t2 * sq
    return w


def _difference(z: np.ndarray) -> np.ndarray:
    """(1-B)(1-B^s) z — drops the first s+1 points."""
    d1 = z[1:] - z[:-1]
    return d1[_SEASON:] - d1[:-_SEASON]


_AR_LAGS = (1, 2, _SEASON, _SEASON + 1, _SEASON + 2)


def _css_filter(w: np.ndarray, ar: np.ndarray, ma: np.ndarray) -> np.ndarray:
    """eps_t = w_t - sum ar_k w_{t-k} - sum ma_k eps_{t-k}; zero
    pre-sample (the 'conditional' in CSS). Linear in ``w``.

    The AR part is a fixed convolution of the KNOWN series — fully
    vectorized; only the 5-term MA recursion (serial dependence on
    eps) runs as a Python loop, so one filter pass over a 252-point
    train window costs ~1ms instead of ~10ms naive — the Nelder-Mead
    fit calls this hundreds of times per group."""
    n = len(w)
    aw = w.copy()
    for k in _AR_LAGS:
        if ar[k] != 0.0 and n > k:
            aw[k:] -= ar[k] * w[:-k]
    m1, m2, m5, m6, m7 = (
        ma[1], ma[2], ma[_SEASON], ma[_SEASON + 1], ma[_SEASON + 2]
    )
    if m1 == m2 == m5 == m6 == m7 == 0.0:
        return aw
    eps = [0.0] * n
    awl = aw.tolist()
    for t in range(n):
        v = awl[t]
        if t >= 1:
            v -= m1 * eps[t - 1]
        if t >= 2:
            v -= m2 * eps[t - 2]
        if t >= _SEASON:
            v -= m5 * eps[t - _SEASON]
        if t >= _SEASON + 1:
            v -= m6 * eps[t - _SEASON - 1]
        if t >= _SEASON + 2:
            v -= m7 * eps[t - _SEASON - 2]
        eps[t] = v
    return np.asarray(eps)


def _objective(
    params: np.ndarray, wy: np.ndarray, wx: np.ndarray | None
) -> tuple[float, float]:
    """CSS sum of squares with beta concentrated out; returns
    (sse, beta)."""
    p1, p2, t1, t2, sp, sq = params
    penalty = float(np.sum(np.maximum(np.abs(params) - 2.0, 0.0)))
    ar, ma = _ar_weights(p1, p2, sp), _ma_weights(t1, t2, sq)
    ey = _css_filter(wy, ar, ma)
    if wx is None:
        return float(ey @ ey) * (1.0 + penalty) + 1e9 * penalty, 0.0
    ex = _css_filter(wx, ar, ma)
    exx = float(ex @ ex)
    beta = float(ex @ ey) / exx if exx > 1e-12 else 0.0
    r = ey - beta * ex
    return float(r @ r) * (1.0 + penalty) + 1e9 * penalty, beta


def _nelder_mead(fn, x0: np.ndarray, step: float = 0.2,
                 max_iter: int = 400, tol: float = 1e-9) -> np.ndarray:
    """Deterministic Nelder-Mead (standard 1/2/0.5/0.5 coefficients)."""
    n = len(x0)
    simplex = [x0.copy()]
    for i in range(n):
        v = x0.copy()
        v[i] += step
        simplex.append(v)
    vals = [fn(v) for v in simplex]
    for _ in range(max_iter):
        order = np.argsort(vals)
        simplex = [simplex[i] for i in order]
        vals = [vals[i] for i in order]
        if abs(vals[-1] - vals[0]) <= tol * (abs(vals[0]) + tol):
            break
        centroid = np.mean(simplex[:-1], axis=0)
        worst = simplex[-1]
        refl = centroid + (centroid - worst)
        f_refl = fn(refl)
        if f_refl < vals[0]:
            expd = centroid + 2.0 * (centroid - worst)
            f_expd = fn(expd)
            simplex[-1], vals[-1] = (
                (expd, f_expd) if f_expd < f_refl else (refl, f_refl)
            )
        elif f_refl < vals[-2]:
            simplex[-1], vals[-1] = refl, f_refl
        else:
            contr = centroid + 0.5 * (worst - centroid)
            f_contr = fn(contr)
            if f_contr < vals[-1]:
                simplex[-1], vals[-1] = contr, f_contr
            else:  # shrink toward best
                for i in range(1, n + 1):
                    simplex[i] = simplex[0] + 0.5 * (simplex[i] - simplex[0])
                    vals[i] = fn(simplex[i])
    return simplex[int(np.argmin(vals))]


def _psi_weights(ar: np.ndarray, ma: np.ndarray, horizon: int) -> np.ndarray:
    """MA(inf) weights of the INTEGRATED model C(B) z = b(B) eps,
    where C(B) = (1 - sum ar_k B^k)(1-B)(1-B^s)."""
    # expand C(B) = 1 - sum c_k B^k: polynomial multiply
    a_poly = np.zeros(_MAXLAG + 1)
    a_poly[0] = 1.0
    a_poly[1:] = -ar[1:]
    d_poly = np.zeros(_SEASON + 2)
    d_poly[0], d_poly[1] = 1.0, -1.0
    d_poly[_SEASON] += -1.0
    d_poly[_SEASON + 1] += 1.0
    c_full = np.convolve(a_poly, d_poly)  # C(B) coefficients, c_full[0]=1
    c = -c_full[1:]  # C(B) = 1 - sum c_k B^k
    psi = np.zeros(horizon)
    if horizon == 0:
        return psi
    psi[0] = 1.0  # psi_0
    for j in range(1, horizon):
        v = ma[j] if j <= _MAXLAG else 0.0
        for k in range(1, min(j, len(c)) + 1):
            v += c[k - 1] * psi[j - k]
        psi[j] = v
    return psi


def fit_css(
    y: np.ndarray, exog: np.ndarray | None = None
) -> dict:
    """Fit SARIMAX(2,1,2)(1,1,1,5)[+exog] by CSS. Returns the fitted
    parameter dict (phi, theta, seasonal, beta, sigma, plus the
    in-sample differenced series and residuals the forecaster needs).
    """
    y = np.asarray(y, dtype=np.float64)
    x = None if exog is None else np.asarray(exog, dtype=np.float64)
    wy = _difference(y)
    wx = None if x is None else _difference(x)

    def f(params: np.ndarray) -> float:
        s = _objective(params, wy, wx)[0]
        # an explosive MA recursion (|theta| near 2 is inside the
        # soft bounds but amplifies eps geometrically over 250 steps)
        # can overflow to inf/nan; map to +inf so the simplex ordering
        # and the final argmin stay well-defined (nan would otherwise
        # poison np.argmin via a shrink-step assignment)
        return s if np.isfinite(s) else float("inf")

    best = _nelder_mead(f, np.zeros(6))
    _, beta = _objective(best, wy, wx)
    p1, p2, t1, t2, sp, sq = (float(v) for v in best)
    ar, ma = _ar_weights(p1, p2, sp), _ma_weights(t1, t2, sq)
    w = wy if wx is None else wy - beta * wx
    eps = _css_filter(w, ar, ma)
    dof = max(len(eps) - 7, 1)
    sigma = float(np.sqrt(eps @ eps / dof))
    return {
        "ar": ar, "ma": ma, "beta": beta, "sigma": sigma,
        "w": w, "eps": eps,
        "params": (p1, p2, t1, t2, sp, sq),
    }


def css_sarimax_forecast(
    y: np.ndarray,
    horizon: int,
    exog: np.ndarray | None = None,
    exog_future: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Drop-in backend for
    :func:`yahoofinancedatalake_spark.forecast.grouped.make_group_forecaster`:
    (point forecasts, 95% CI half-widths), each of length ``horizon``.

    Series shorter than ``_MIN_OBS`` fall back to the closed-form
    OLS/AR(1) model (same guard philosophy as the reference's
    min-observation skip, arima_forecast.py:39-41 — a seasonal model
    on four seasons of data is noise).
    """
    from yahoofinancedatalake_spark.forecast.grouped import (  # noqa: PLC0415
        _fallback_forecast,
    )

    y = np.asarray(y, dtype=np.float64)
    if len(y) < _MIN_OBS:
        return _fallback_forecast(y, horizon, exog, exog_future)
    fit = fit_css(y, exog)
    ar, ma, beta = fit["ar"], fit["ma"], fit["beta"]
    w, eps = fit["w"], fit["eps"]

    # ARMA recursion on the differenced scale: future eps = 0
    nw = len(w)
    w_ext = np.concatenate([w, np.zeros(horizon)])
    e_ext = np.concatenate([eps, np.zeros(horizon)])
    for h in range(horizon):
        t = nw + h
        v = 0.0
        for k in range(1, _MAXLAG + 1):
            if t - k >= 0:
                v += ar[k] * w_ext[t - k] + ma[k] * e_ext[t - k]
        w_ext[t] = v

    # integrate (1-B)(1-B^s) back to levels on z = y - beta*x
    z = y if exog is None else y - beta * np.asarray(exog, dtype=np.float64)
    nz = len(z)
    z_ext = np.concatenate([z, np.zeros(horizon)])
    for h in range(horizon):
        t = nz + h
        z_ext[t] = (
            w_ext[nw + h]
            + z_ext[t - 1]
            + z_ext[t - _SEASON]
            - z_ext[t - _SEASON - 1]
        )
    preds = z_ext[nz:]
    if exog is not None and exog_future is not None:
        preds = preds + beta * np.asarray(exog_future, dtype=np.float64)

    psi = _psi_weights(ar, ma, horizon)
    var = np.cumsum(psi * psi)
    halves = _Z95 * fit["sigma"] * np.sqrt(var)
    # a wildly non-stationary fit (enforce_stationarity=False) can
    # explode; keep the output finite so downstream contracts hold
    preds = np.nan_to_num(preds, nan=0.0, posinf=1e12, neginf=-1e12)
    halves = np.nan_to_num(halves, nan=0.0, posinf=1e12, neginf=0.0)
    return preds, halves
