"""Property tests for the grouped forecast table function (SURVEY.md §5.4).

The model backend is iterative/numeric, so correctness is asserted as
properties (reference semantics from arima_forecast.py:76-99), not
value hashes: output shape per group, CI ordering, monotone dates,
min-data skip, and determinism across runs.
"""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.forecast import forecast_by_group
from yahoofinancedatalake_spark.forecast.grouped import _fallback_forecast

HORIZON = 5
MIN_POINTS = 10


@pytest.fixture(scope="module")
def daily(spark):
    rows = []
    rng = np.random.default_rng(42)
    base = datetime.date(2024, 1, 1)
    # group "a": 30 points, trend + noise; group "b": 20 points;
    # group "tiny": 3 points (below MIN_POINTS, must be skipped)
    for key, n, slope in (("a", 30, 0.5), ("b", 20, -0.2), ("tiny", 3, 0.0)):
        for i in range(n):
            rows.append(
                (
                    key,
                    base + datetime.timedelta(days=i),
                    100.0 + slope * i + float(rng.normal(0, 1)),
                )
            )
    return rows


@pytest.fixture(scope="module")
def forecast_df(spark, daily):
    df = spark.createDataFrame(daily, "k string, day date, v double")
    return forecast_by_group(
        df, "k", "day", "v", horizon=HORIZON, min_points=MIN_POINTS, history=90
    ).cache()


def test_output_shape_per_group(forecast_df):
    counts = {
        (r.group_key, r.kind): r.n
        for r in forecast_df.groupBy("group_key", "kind").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert counts[("a", "actual")] == 30
    assert counts[("a", "forecast")] == HORIZON
    assert counts[("b", "actual")] == 20
    assert counts[("b", "forecast")] == HORIZON
    assert not any(k[0] == "tiny" for k in counts)  # min-data skip


def test_ci_brackets_prediction(forecast_df):
    bad = forecast_df.filter(
        (F.col("kind") == "forecast")
        & (
            (F.col("confidence_lower") > F.col("predicted"))
            | (F.col("predicted") > F.col("confidence_upper"))
        )
    ).count()
    assert bad == 0


def test_forecast_days_contiguous_after_history(forecast_df):
    rows = (
        forecast_df.filter(F.col("group_key") == "a")
        .orderBy("day")
        .collect()
    )
    days = [r.day for r in rows]
    assert days == sorted(days)
    # forecast days continue daily right after the last actual day
    actual_days = [r.day for r in rows if r.kind == "actual"]
    fc_days = [r.day for r in rows if r.kind == "forecast"]
    assert fc_days[0] == actual_days[-1] + datetime.timedelta(days=1)
    assert all(
        (b - a).days == 1 for a, b in zip(fc_days, fc_days[1:])
    )


def test_actual_rows_carry_observed_values(forecast_df, daily):
    observed = {
        (k, d): v for k, d, v in daily if k != "tiny"
    }
    for r in forecast_df.filter(F.col("kind") == "actual").collect():
        assert r.predicted == pytest.approx(observed[(r.group_key, r.day)])
        assert r.confidence_lower is None or np.isnan(r.confidence_lower)


def test_deterministic_across_runs(spark, daily):
    df = spark.createDataFrame(daily, "k string, day date, v double")
    a = forecast_by_group(df, "k", "day", "v", horizon=HORIZON).collect()
    b = forecast_by_group(df, "k", "day", "v", horizon=HORIZON).collect()
    key = lambda r: (r.group_key, r.day, r.kind)  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_fallback_tracks_linear_trend():
    # pure line: forecast must continue it almost exactly, CI ~ 0
    y = 2.0 + 3.0 * np.arange(50, dtype=np.float64)
    preds, halves = _fallback_forecast(y, 4)
    expect = 2.0 + 3.0 * np.arange(50, 54, dtype=np.float64)
    np.testing.assert_allclose(preds, expect, rtol=1e-8)
    assert float(np.max(halves)) < 1e-6


def test_fallback_ci_widens():
    rng = np.random.default_rng(0)
    y = 10.0 + rng.normal(0, 2.0, 100)
    _, halves = _fallback_forecast(y, 10)
    assert all(b >= a - 1e-12 for a, b in zip(halves, halves[1:]))
    assert halves[0] > 0
