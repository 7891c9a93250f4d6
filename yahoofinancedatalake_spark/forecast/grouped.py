"""Grouped time-series forecasting as a table function (SURVEY.md §2.9 X2).

The reference fits one SARIMAX model per symbol in a sequential Python
loop (reference: scripts/prediction/arima_forecast.py:32-108,135-144 —
order (2,1,2), seasonal (1,1,1,5), 252-day train window, 30-step
horizon, 95% CI, exogenous daily sentiment). The Spark-first
re-expression is ``groupBy(key).applyInPandas`` — every group trains
in parallel across executors, Arrow moves the data, and the output is
a normal DataFrame (union of ``actual`` history rows and ``forecast``
rows with confidence bounds, arima_forecast.py:76-99).

Model backend:

- ``statsmodels`` SARIMAX with the reference's exact hyperparameters
  when the library is importable.
- Otherwise a deterministic numpy fallback — OLS linear trend plus
  AR(1) on the residuals, with a widening normal CI from the residual
  stddev. Same output contract (shape, column names, CI ordering);
  documented substitute, NOT a SARIMAX clone. This container has no
  statsmodels, so tests exercise the fallback.

Scale posture: one shuffle on the group key; each task holds only its
group's series (~hundreds of rows), so 10⁶ groups × small series
parallelizes flat. Skew = one slow model, not one slow partition,
because AQE splits oversized shuffle partitions.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from statsmodels.tsa.statespace.sarimax import SARIMAX  # type: ignore

    _HAS_STATSMODELS = True
except Exception:  # pragma: no cover
    _HAS_STATSMODELS = False

#: Output contract of :func:`forecast_by_group` (arima_forecast.py:86-99
#: shape: actual rows carry the observed value; forecast rows carry the
#: prediction and a 95% confidence interval).
FORECAST_SCHEMA = (
    "group_key string, day date, predicted double, "
    "confidence_lower double, confidence_upper double, kind string"
)

_Z95 = 1.959963984540054  # 97.5th normal quantile


def _fallback_forecast(y: np.ndarray, horizon: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic trend + AR(1) forecast with widening 95% CI.

    Returns (point_forecasts, half_widths), each of length ``horizon``.
    Pure numpy linear algebra — bit-stable across runs and partitions.
    """
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    # OLS trend: y ~ a + b*t
    b, a = np.polyfit(t, y, 1)
    resid = y - (a + b * t)
    # AR(1) on residuals (lag-1 regression through the origin)
    denom = float(np.dot(resid[:-1], resid[:-1]))
    phi = float(np.dot(resid[1:], resid[:-1]) / denom) if denom > 0 else 0.0
    phi = max(min(phi, 0.99), -0.99)
    sigma = float(np.std(resid, ddof=1)) if n > 2 else 0.0

    last_r = float(resid[-1])
    preds = np.empty(horizon, dtype=np.float64)
    halves = np.empty(horizon, dtype=np.float64)
    var_acc = 0.0
    r = last_r
    for h in range(1, horizon + 1):
        r *= phi
        preds[h - 1] = a + b * (n - 1 + h) + r
        # forecast variance of AR(1): sigma^2 * sum_{j<h} phi^(2j)
        var_acc += phi ** (2 * (h - 1))
        halves[h - 1] = _Z95 * sigma * math.sqrt(var_acc)
    return preds, halves


def _sarimax_forecast(
    y: np.ndarray, horizon: int
) -> tuple[np.ndarray, np.ndarray]:  # pragma: no cover - needs statsmodels
    """Reference-parity SARIMAX(2,1,2)x(1,1,1,5) (arima_forecast.py:50-58)."""
    model = SARIMAX(
        y,
        order=(2, 1, 2),
        seasonal_order=(1, 1, 1, 5),
        enforce_stationarity=False,
        enforce_invertibility=False,
    )
    fit = model.fit(disp=False, maxiter=200)
    res = fit.get_forecast(steps=horizon)
    ci = res.conf_int(alpha=0.05)
    ci = np.asarray(ci)
    mean = np.asarray(res.predicted_mean)
    return mean, mean - ci[:, 0]


def make_group_forecaster(
    key_col: str,
    time_col: str,
    value_col: str,
    horizon: int = 30,
    train_window: int = 252,
    history: int = 90,
    min_points: int = 10,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Build the per-group pandas function for ``applyInPandas``.

    Mirrors the reference's per-symbol flow (arima_forecast.py:32-108):
    sort by date, train on the last ``train_window`` points, emit the
    last ``history`` observed rows as ``kind='actual'`` plus
    ``horizon`` daily ``kind='forecast'`` rows with 95% CI; groups
    with fewer than ``min_points`` observations are skipped
    (arima_forecast.py:39-41).
    """
    backend = _sarimax_forecast if _HAS_STATSMODELS else _fallback_forecast

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "group_key": pd.Series(dtype="str"),
                "day": pd.Series(dtype="datetime64[ns]"),
                "predicted": pd.Series(dtype="float64"),
                "confidence_lower": pd.Series(dtype="float64"),
                "confidence_upper": pd.Series(dtype="float64"),
                "kind": pd.Series(dtype="str"),
            }
        )
        pdf = pdf.dropna(subset=[time_col, value_col]).sort_values(time_col)
        if len(pdf) < min_points:
            return empty
        key = str(pdf[key_col].iloc[0])
        days = pd.to_datetime(pdf[time_col])
        y = pdf[value_col].to_numpy(dtype=np.float64)[-train_window:]
        preds, halves = backend(y, horizon)

        hist = pdf.tail(history)
        actual = pd.DataFrame(
            {
                "group_key": key,
                "day": pd.to_datetime(hist[time_col]).dt.normalize(),
                "predicted": hist[value_col].astype(np.float64),
                "confidence_lower": np.nan,
                "confidence_upper": np.nan,
                "kind": "actual",
            }
        )
        future_days = pd.date_range(
            days.iloc[-1].normalize() + pd.Timedelta(days=1),
            periods=horizon,
            freq="D",
        )
        forecast = pd.DataFrame(
            {
                "group_key": key,
                "day": future_days,
                "predicted": preds,
                "confidence_lower": preds - halves,
                "confidence_upper": preds + halves,
                "kind": "forecast",
            }
        )
        return pd.concat([actual, forecast], ignore_index=True)

    return fn


def forecast_by_group(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    horizon: int = 30,
    train_window: int = 252,
    history: int = 90,
    min_points: int = 10,
) -> DataFrame:
    """Per-group forecast table function.

    ``df`` must already be one row per (key, day) — e.g. a daily
    aggregate. The plan is a single hash-partition exchange on
    ``key_col`` feeding Arrow-batched python workers; no collect, no
    driver loop (unlike arima_forecast.py:135-144).
    """
    fn = make_group_forecaster(
        key_col, time_col, value_col, horizon, train_window, history, min_points
    )
    return (
        df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(time_col),
            F.col(value_col).cast("double").alias(value_col),
        )
        .groupBy(key_col)
        .applyInPandas(fn, schema=FORECAST_SCHEMA)
    )
