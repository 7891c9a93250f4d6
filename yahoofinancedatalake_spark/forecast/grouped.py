"""Grouped time-series forecasting as a table function (SURVEY.md §2.9 X2).

The reference fits one SARIMAX model per symbol in a sequential Python
loop (reference: scripts/prediction/arima_forecast.py:32-108,135-144 —
order (2,1,2), seasonal (1,1,1,5), 252-day train window, 30-step
horizon, 95% CI, **exogenous daily news sentiment**). The Spark-first
re-expression is ``groupBy(key).applyInPandas`` — every group trains
in parallel across executors, Arrow moves the data, and the output is
a normal DataFrame (union of ``actual`` history rows and ``forecast``
rows with confidence bounds, arima_forecast.py:76-99).

Exogenous-regressor semantics (faithful to arima_forecast.py):

- the exog column is the daily sentiment **as-of-aligned** onto the
  value series dates (exact-date left join — see
  :func:`yahoofinancedatalake_spark.operators.etl.align_daily_signal`);
  missing days stay null in the input.
- for FITTING, nulls become 0.0 (neutral), mirroring
  ``sentiment.reindex(series.index).fillna(0)`` (:47).
- for the FUTURE exog, the mean of the last 30 train dates *skips*
  missing days (pandas ``.tail(30).mean()`` skips NaN, :61) and falls
  back to 0.0 when all 30 are missing (:62-63).
- output rows carry the exog: actual rows the aligned+filled value
  (:77,84), forecast rows the constant future mean (:95).

Model backends (``backend=`` on every public entry point):

- ``"auto"`` (default): ``statsmodels`` SARIMAX with the reference's
  exact hyperparameters when importable, else the closed-form
  fallback — the SQL-replayable choice the ORACLE-gated pack queries
  pin explicitly.
- ``"sarimax"``: the reference model family guaranteed — statsmodels
  when importable, else the numpy CSS implementation of the same
  (2,1,2)(1,1,1,5)+exog model (:mod:`.sarimax_css`). What
  :func:`forecast_predictions` (the reference-parity surface) uses.
- ``"sarimax_css"``: the numpy CSS SARIMAX always (what the pytest
  property gates exercise in this statsmodels-less container).
- ``"closed_form"``: deterministic numpy fallback — OLS on
  [1, t, exog] plus AR(1) on the residuals, widening normal CI from
  the residual stddev. Same output contract (shape, column names, CI
  ordering); every term is a named sum a DuckDB oracle can replay.

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

#: Output contract of :func:`forecast_by_group` (arima_forecast.py:78-97
#: shape: actual rows carry the observed value with lower=upper=value,
#: :82-83; forecast rows carry prediction + 95% CI; both carry exog).
FORECAST_SCHEMA = (
    "group_key string, day date, predicted double, "
    "confidence_lower double, confidence_upper double, "
    "exog double, kind string"
)

_Z95 = 1.959963984540054  # 97.5th normal quantile


def _fallback_forecast(
    y: np.ndarray,
    horizon: int,
    exog: np.ndarray | None = None,
    exog_future: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic OLS([1, t, exog]) + AR(1) forecast, widening 95% CI.

    Returns (point_forecasts, half_widths), each of length ``horizon``.
    Pure numpy arithmetic — bit-stable across runs and partitions.

    The fit is CLOSED-FORM centered OLS (explicit covariance-sum
    formulas, 2x2 determinant solve for the exog case) rather than a
    matrix least-squares call: every quantity is a named sum over the
    series, so the identical formulas are expressible in plain SQL —
    which is what lets the driver's DuckDB oracle replay this exact
    forecast (queries/pack.py `forecast_events`) instead of settling
    for a rows-only check. AR(1) decay and the widening CI use the
    geometric closed forms (phi**h, (1-(phi*phi)**h)/(1-phi*phi)) for
    the same reason — no sequential accumulator an aggregate can't
    express.
    """
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    tbar = float(t.mean())
    ybar = float(y.mean())
    td = t - tbar
    yd = y - ybar
    stt = float(np.sum(td * td))
    sty = float(np.sum(td * yd))
    if exog is not None:
        x = np.asarray(exog, dtype=np.float64)
        xbar = float(x.mean())
        xd = x - xbar
        sxx = float(np.sum(xd * xd))
        stx = float(np.sum(td * xd))
        sxy = float(np.sum(xd * yd))
        det = stt * sxx - stx * stx
        if det != 0.0:
            b1 = (sty * sxx - sxy * stx) / det
            b2 = (sxy * stt - sty * stx) / det
        else:  # constant exog (e.g. all-zero fill) → plain trend fit
            b1 = sty / stt if stt > 0.0 else 0.0
            b2 = 0.0
        b0 = ybar - b1 * tbar - b2 * xbar
        resid = y - (b0 + b1 * t + b2 * x)
    else:
        b1 = sty / stt if stt > 0.0 else 0.0
        b2 = 0.0
        b0 = ybar - b1 * tbar
        resid = y - (b0 + b1 * t)
    # AR(1) on residuals (lag-1 regression through the origin)
    denom = float(np.sum(resid[:-1] * resid[:-1]))
    phi = float(np.sum(resid[1:] * resid[:-1]) / denom) if denom > 0 else 0.0
    phi = max(min(phi, 0.99), -0.99)
    sigma = float(np.std(resid, ddof=1)) if n > 2 else 0.0

    r_last = float(resid[-1])
    h = np.arange(1.0, horizon + 1.0, dtype=np.float64)
    preds = b0 + b1 * (n - 1 + h) + (phi**h) * r_last
    if exog is not None and exog_future is not None:
        preds = preds + b2 * np.asarray(exog_future, dtype=np.float64)
    # forecast variance of AR(1): sigma^2 * sum_{j<h} phi^(2j), geometric
    phi2 = phi * phi
    var = h if phi2 == 1.0 else (1.0 - phi2**h) / (1.0 - phi2)
    halves = _Z95 * sigma * np.sqrt(var)
    return preds, halves


def _sarimax_forecast(
    y: np.ndarray,
    horizon: int,
    exog: np.ndarray | None = None,
    exog_future: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:  # pragma: no cover - needs statsmodels
    """Reference-parity SARIMAX(2,1,2)x(1,1,1,5) with exogenous
    sentiment (arima_forecast.py:50-66)."""
    model = SARIMAX(
        y,
        exog=exog.reshape(-1, 1) if exog is not None else None,
        order=(2, 1, 2),
        seasonal_order=(1, 1, 1, 5),
        enforce_stationarity=False,
        enforce_invertibility=False,
    )
    fit = model.fit(disp=False, maxiter=200)
    res = fit.get_forecast(
        steps=horizon,
        exog=exog_future.reshape(-1, 1) if exog_future is not None else None,
    )
    ci = np.asarray(res.conf_int(alpha=0.05))
    mean = np.asarray(res.predicted_mean)
    return mean, mean - ci[:, 0]


def _resolve_backend(backend: str):
    if backend == "auto":
        return _sarimax_forecast if _HAS_STATSMODELS else _fallback_forecast
    if backend == "sarimax":
        if _HAS_STATSMODELS:
            return _sarimax_forecast
        backend = "sarimax_css"
    if backend == "sarimax_css":
        from yahoofinancedatalake_spark.forecast.sarimax_css import (  # noqa: PLC0415
            css_sarimax_forecast,
        )

        return css_sarimax_forecast
    if backend == "closed_form":
        return _fallback_forecast
    raise ValueError(f"unknown forecast backend {backend!r}")


def make_group_forecaster(
    key_col: str,
    time_col: str,
    value_col: str,
    horizon: int = 30,
    train_window: int = 252,
    history: int = 90,
    min_points: int = 10,
    exog_col: str | None = None,
    exog_tail: int = 30,
    future_freq: str = "B",
    backend: str = "auto",
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Build the per-group pandas function for ``applyInPandas``.

    Mirrors the reference's per-symbol flow (arima_forecast.py:32-108):
    sort by date, train on the last ``train_window`` points, emit the
    last ``history`` observed rows as ``kind='actual'`` (with
    lower=upper=value, :82-83) plus ``horizon``
    business-day ``kind='forecast'`` rows (``freq='B'``, :72 —
    override ``future_freq='D'`` for calendar-daily series) with 95%
    CI; groups with fewer than ``min_points`` observations are skipped
    (arima_forecast.py:39-41).

    ``exog_col``: optional per-row exogenous regressor, possibly null
    on dates with no signal. Fitting nulls→0 (:47); the future exog is
    the null-skipping mean of the last ``exog_tail`` train dates
    (:61-63). Output column ``exog`` carries it (:84,95); all-null
    when ``exog_col`` is None.
    """
    backend_fn = _resolve_backend(backend)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "group_key": pd.Series(dtype="str"),
                "day": pd.Series(dtype="datetime64[ns]"),
                "predicted": pd.Series(dtype="float64"),
                "confidence_lower": pd.Series(dtype="float64"),
                "confidence_upper": pd.Series(dtype="float64"),
                "exog": pd.Series(dtype="float64"),
                "kind": pd.Series(dtype="str"),
            }
        )
        pdf = pdf.dropna(subset=[time_col, value_col]).sort_values(time_col)
        if len(pdf) < min_points:
            return empty
        key = str(pdf[key_col].iloc[0])
        train = pdf.tail(train_window)
        days = pd.to_datetime(train[time_col])
        y = train[value_col].to_numpy(dtype=np.float64)

        if exog_col is not None:
            exog_raw = train[exog_col].astype("float64")  # nulls → NaN
            exog_fit = exog_raw.fillna(0.0).to_numpy()
            recent = exog_raw.tail(exog_tail).mean()  # skips NaN (:61)
            recent = 0.0 if pd.isna(recent) else float(recent)
            exog_future = np.full(horizon, recent)
        else:
            exog_fit = exog_future = None
            recent = None

        preds, halves = backend_fn(y, horizon, exog_fit, exog_future)

        hist = train.tail(history)
        vals = hist[value_col].astype(np.float64)
        actual = pd.DataFrame(
            {
                "group_key": key,
                "day": pd.to_datetime(hist[time_col]).dt.normalize(),
                "predicted": vals,
                # visual-continuity contract: lower=upper=value (:82-83)
                "confidence_lower": vals,
                "confidence_upper": vals,
                "exog": (
                    hist[exog_col].astype("float64").fillna(0.0)
                    if exog_col is not None
                    else np.nan
                ),
                "kind": "actual",
            }
        )
        future_days = pd.date_range(
            days.iloc[-1].normalize() + pd.Timedelta(days=1),
            periods=horizon,
            freq=future_freq,
        )
        forecast = pd.DataFrame(
            {
                "group_key": key,
                "day": future_days,
                "predicted": preds,
                "confidence_lower": preds - halves,
                "confidence_upper": preds + halves,
                "exog": recent if exog_col is not None else np.nan,
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
    exog_col: str | None = None,
    exog_tail: int = 30,
    future_freq: str = "B",
    backend: str = "auto",
) -> DataFrame:
    """Per-group forecast table function.

    ``df`` must already be one row per (key, day) — e.g. a daily
    aggregate, optionally carrying an aligned exogenous column (see
    ``operators.etl.align_daily_signal``). The plan is a single
    hash-partition exchange on ``key_col`` feeding Arrow-batched
    python workers; no collect, no driver loop (unlike
    arima_forecast.py:135-144).

    The exchange is an explicit ``repartition(n, key)`` rather than
    the groupBy's implicit shuffle: a grouped-model stage is
    compute-bound per GROUP, not per byte, so AQE's byte-based
    partition coalescing (which would fold a few-MB shuffle into one
    partition and serialize every model fit on a single python
    worker — measured 12s vs 1.3s at sf0.1) must not shrink it.
    ``REPARTITION_BY_NUM`` shuffles are exempt from coalescing, and
    the groupBy reuses the partitioning (same key, no second
    exchange).
    """
    fn = make_group_forecaster(
        key_col,
        time_col,
        value_col,
        horizon,
        train_window,
        history,
        min_points,
        exog_col,
        exog_tail,
        future_freq,
        backend,
    )
    cols = [
        F.col(key_col).cast("string").alias(key_col),
        F.col(time_col),
        F.col(value_col).cast("double").alias(value_col),
    ]
    if exog_col is not None:
        cols.append(F.col(exog_col).cast("double").alias(exog_col))
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(*cols)
        .repartition(n, key_col)
        .groupBy(key_col)
        .applyInPandas(fn, schema=FORECAST_SCHEMA)
    )


def forecast_predictions(
    daily_values: DataFrame,
    daily_sentiment: DataFrame | None = None,
    key_col: str = "symbol",
    time_col: str = "date",
    value_col: str = "close",
    sentiment_col: str = "sentiment_score",
    horizon: int = 30,
    train_window: int = 252,
    history: int = 90,
    min_points: int = 60,
    backend: str = "sarimax",
) -> DataFrame:
    """Reference-shaped predictions table (schemas.PREDICTIONS).

    End-to-end X2+J3 parity: align daily sentiment onto the value
    series by exact date (arima_forecast.py:47), forecast per symbol
    with sentiment as the exogenous regressor, and emit the exact
    reference output contract — symbol / date / predicted_close /
    confidence_lower / confidence_upper / sentiment_score / type
    (arima_forecast.py:78-97). ``min_points`` defaults to the
    reference's 60-observation guard (:39-41).

    ``daily_sentiment``: (key, day, sentiment) one row per (key, day),
    e.g. from ``operators.etl.daily_mean_sentiment``; None → neutral
    (all-zero) sentiment, mirroring the reference's missing-news path
    (arima_forecast.py:130-132).
    """
    df = daily_values
    exog_col = None
    if daily_sentiment is not None:
        from yahoofinancedatalake_spark.operators.etl import (  # noqa: PLC0415
            align_daily_signal,
        )

        df = align_daily_signal(
            daily_values,
            daily_sentiment,
            key_col=key_col,
            time_col=time_col,
            signal_col=sentiment_col,
            neutral_fill=False,  # keep nulls: future-exog mean skips them
        )
        exog_col = sentiment_col
    out = forecast_by_group(
        df,
        key_col,
        time_col,
        value_col,
        horizon=horizon,
        train_window=train_window,
        history=history,
        min_points=min_points,
        exog_col=exog_col,
        future_freq="B",
        backend=backend,
    )
    return out.select(
        F.col("group_key").alias("symbol"),
        F.col("day").cast("timestamp").alias("date"),
        F.col("predicted").alias("predicted_close"),
        "confidence_lower",
        "confidence_upper",
        F.coalesce(F.col("exog"), F.lit(0.0)).alias("sentiment_score"),
        F.col("kind").alias("type"),
    )
