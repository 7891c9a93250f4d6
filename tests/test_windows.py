"""Window operator tests (SURVEY.md §2.5-2.6, W1-W4/O2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yahoofinancedatalake_spark.operators.windows import (
    lag_delta,
    last_row_per_group,
    top_k,
    top_k_with_other,
)


def _seq(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 2, 13.0),
        ("a", 3, 11.0),
        ("b", 1, 5.0),
        ("b", 3, 9.0),
    ]
    return spark.createDataFrame(rows, "g string, t int, v double")


def test_last_row_per_group(spark):
    out = last_row_per_group(_seq(spark), ["g"], "t")
    got = {r.g: (r.t, r.v) for r in out.collect()}
    assert got == {"a": (3, 11.0), "b": (3, 9.0)}


def test_last_row_tiebreak(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "y")], "g string, t int, id string"
    )
    out = last_row_per_group(df, ["g"], "t", tiebreak_cols=["id"])
    assert out.first().id == "y"  # desc tiebreak → deterministic


def test_lag_delta_and_pct(spark):
    out = lag_delta(_seq(spark), ["g"], "t", "v").orderBy("g", "t").collect()
    a = [r for r in out if r.g == "a"]
    assert a[0].delta is None and a[0].pct_change is None
    assert a[1].delta == 3.0
    assert abs(a[1].pct_change - 30.0) < 1e-9
    assert a[2].delta == -2.0
    b = [r for r in out if r.g == "b"]
    assert b[1].delta == 4.0  # gap in t is fine: lag is row-based


def test_top_k_deterministic(spark):
    df = spark.createDataFrame(
        [("x", 5.0), ("y", 5.0), ("z", 1.0)], "k string, m double"
    )
    out = top_k(df, "m", 2, tiebreak_cols=["k"]).collect()
    assert [(r.k, r.m) for r in out] == [("x", 5.0), ("y", 5.0)]


def test_top_k_with_other_sums_remainder(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 10.0), ("b", 15.0), ("c", 3.0), ("d", 2.0)],
        "k string, v double",
    )
    out = top_k_with_other(df, "k", F.sum("v"), "total", k=2)
    got = {r.k: r.total for r in out.collect()}
    assert got == {"a": 20.0, "b": 15.0, "Other": 5.0}
