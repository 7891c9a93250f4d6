"""As-of and binned range join tests (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yahoofinancedatalake_spark.operators.asof import (
    asof_join,
    range_join_binned,
)


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _t("2024-01-01 10:00:00")),  # before any right → null
            (2, 10, _t("2024-01-01 12:00:00")),  # exact tie → inclusive
            (3, 10, _t("2024-01-01 15:00:00")),  # latest prior = 12:00
            (4, 20, _t("2024-01-01 15:00:00")),  # other key
        ],
        "id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _t("2024-01-01 12:00:00"), 1.0),
            (10, _t("2024-01-01 14:00:00"), 2.0),
            (20, _t("2024-01-01 09:00:00"), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.id: (r.matched_ts, r.value)
        for r in asof_join(
            left, right, on=["user_id"], ts_col="ts", value_cols=["value"]
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (_t("2024-01-01 12:00:00"), 1.0)  # tie is inclusive
    assert out[3] == (_t("2024-01-01 14:00:00"), 2.0)
    assert out[4] == (_t("2024-01-01 09:00:00"), 9.0)
    # left row count preserved (left-join semantics)
    assert (
        asof_join(left, right, ["user_id"], "ts", ["value"]).count()
        == left.count()
    )


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, _t("2024-01-10 00:00:00"))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _t("2024-01-01 00:00:00"), 5.0)],
        "k long, ts timestamp, value double",
    )
    with_tol = asof_join(
        left, right, ["k"], "ts", ["value"],
        tolerance=F.expr("INTERVAL 2 DAYS"),
    ).collect()[0]
    assert with_tol.value is None  # 9 days old > 2-day tolerance
    without = asof_join(left, right, ["k"], "ts", ["value"]).collect()[0]
    assert without.value == 5.0


def test_asof_join_matches_pandas_merge_asof(spark):
    """Cross-check against the canonical single-node implementation:
    random keyed series must produce exactly pandas.merge_asof's
    backward-inclusive matches."""
    import pandas as pd
    import random

    rng = random.Random(17)
    base = _t("2024-01-01 00:00:00")
    lrows = sorted(
        (base + dt.timedelta(seconds=rng.randrange(0, 500000)), rng.randrange(4))
        for _ in range(200)
    )
    rrows = sorted(
        (base + dt.timedelta(seconds=rng.randrange(0, 500000)),
         rng.randrange(4), rng.random())
        for _ in range(80)
    )
    left = spark.createDataFrame(
        [(i, k, ts) for i, (ts, k) in enumerate(lrows)],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, ts, v) for ts, k, v in rrows], "k long, ts timestamp, v double"
    )
    got = {
        r.id: (r.matched_ts, r.v)
        for r in asof_join(left, right, ["k"], "ts", ["v"]).collect()
    }
    lp = pd.DataFrame(lrows, columns=["ts", "k"]).assign(
        id=range(len(lrows))
    ).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["ts", "k", "v"]).sort_values("ts")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in merged.iterrows():
        mts, mv = got[row["id"]]
        if pd.isna(row["v"]):
            assert mv is None
        else:
            assert mv == row["v"]


def test_range_join_binned_matches_exact_predicate(spark):
    """Binned equi-join + verify ≡ the direct non-equi predicate,
    including intervals spanning multiple buckets."""
    import random

    rng = random.Random(5)
    base = _t("2024-01-01 00:00:00")
    points = spark.createDataFrame(
        [
            (i, i % 7, base + dt.timedelta(minutes=rng.randrange(0, 10000)))
            for i in range(300)
        ],
        "pid long, k long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (
                j,
                j % 7,
                base + dt.timedelta(minutes=rng.randrange(0, 8000)),
                dt.timedelta(minutes=rng.randrange(30, 4000)),
            )
            for j in range(40)
        ],
        "iid long, k long, start timestamp, dur interval day to second",
    ).select("iid", "k", "start", (F.col("start") + F.col("dur")).alias("end"))
    got = {
        (r.pid, r.iid)
        for r in range_join_binned(
            points, intervals, "ts", "start", "end",
            bucket_seconds=3600, on=["k"],
        ).collect()
    }
    expect = {
        (r.pid, r.iid)
        for r in points.join(
            intervals,
            (points.k == intervals.k)
            & (points.ts >= intervals.start)
            & (points.ts < intervals.end),
        ).collect()
    }
    assert got == expect
    assert expect  # non-degenerate fixture


def test_asof_join_ignores_null_ts_right_rows(spark):
    """A right row with a null timestamp must never 'match' — it would
    otherwise sort nulls-first with a non-null payload struct and
    attach to every left row before the first real right row."""
    left = spark.createDataFrame(
        [(1, 10, _t("2024-01-01 10:00:00"))], "id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, None, 666.0), (10, _t("2024-01-01 12:00:00"), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    row = asof_join(left, right, ["user_id"], "ts", ["value"]).collect()[0]
    assert row.matched_ts is None and row.value is None


def test_asof_join_forward_and_nearest_match_pandas(spark):
    """Cross-check the forward and nearest directions against
    pandas.merge_asof on random keyed series (same harness as the
    backward cross-check)."""
    import random

    import pandas as pd

    rng = random.Random(23)
    base = _t("2024-01-01 00:00:00")
    lrows = sorted(
        (base + dt.timedelta(seconds=rng.randrange(0, 500000)),
         rng.randrange(4))
        for _ in range(200)
    )
    rrows = sorted(
        (base + dt.timedelta(seconds=rng.randrange(0, 500000)),
         rng.randrange(4), rng.random())
        for _ in range(80)
    )
    left = spark.createDataFrame(
        [(i, k, ts) for i, (ts, k) in enumerate(lrows)],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, ts, v) for ts, k, v in rrows],
        "k long, ts timestamp, v double",
    )
    lp = (
        pd.DataFrame(lrows, columns=["ts", "k"])
        .assign(id=range(len(lrows)))
        .sort_values("ts")
    )
    rp = pd.DataFrame(rrows, columns=["ts", "k", "v"]).sort_values("ts")
    for direction in ("forward", "nearest"):
        got = {
            r.id: r.v
            for r in asof_join(
                left, right, ["k"], "ts", ["v"], direction=direction
            ).collect()
        }
        merged = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction
        )
        for _, row in merged.iterrows():
            if pd.isna(row["v"]):
                assert got[row["id"]] is None, (direction, row["id"])
            else:
                assert got[row["id"]] == row["v"], (direction, row["id"])


def test_asof_join_nearest_tolerance_cuts_both_sides(spark):
    left = spark.createDataFrame(
        [(1, _t("2024-01-10 00:00:00"))], "id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(_t("2024-01-01 00:00:00"), 1.0),
         (_t("2024-01-25 00:00:00"), 2.0)],
        "ts timestamp, v double",
    )
    import pyspark.sql.functions as F

    # nearest without tolerance: backward row is 9 days away, forward
    # 15 → backward wins
    got = asof_join(
        left, right, [], "ts", ["v"], direction="nearest"
    ).collect()[0]
    assert got.v == 1.0
    # 7-day tolerance nulls BOTH candidates
    got = asof_join(
        left, right, [], "ts", ["v"], direction="nearest",
        tolerance=F.expr("INTERVAL 7 DAYS"),
    ).collect()[0]
    assert got.v is None


def test_asof_join_nearest_on_date_columns(spark):
    """direction='nearest' must work on DateType ts columns (a raw
    date→double cast is an analysis error in Spark; distances hop
    through timestamp)."""
    left = spark.createDataFrame(
        [(1, dt.date(2024, 1, 10)), (2, dt.date(2024, 1, 20))],
        "id long, ts date",
    )
    right = spark.createDataFrame(
        [
            (dt.date(2024, 1, 8), 1.0),    # 2 days before left#1
            (dt.date(2024, 1, 17), 2.0),   # 3 days before left#2
            (dt.date(2024, 1, 21), 3.0),   # 1 day after left#2
        ],
        "ts date, v double",
    )
    out = {
        r.id: r.v
        for r in asof_join(
            left, right, [], "ts", ["v"], direction="nearest"
        ).collect()
    }
    assert out == {1: 1.0, 2: 3.0}
