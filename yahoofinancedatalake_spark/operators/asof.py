"""Point-in-time (as-of) and interval (range) joins.

Spark has no native ASOF JOIN (time-series engines like DuckDB/kdb do;
pandas has ``merge_asof``). The naive Spark formulations are
scale-killers: a theta-join ``ON key = key AND r.ts <= l.ts`` plans as
a broadcast-nested-loop or cartesian per key, and "max ts per pair
then re-join" shuffles the pair blowup. The formulations here shuffle
each input ONCE:

- :func:`asof_join` — union both streams, one running ``last(...,
  ignorenulls)`` window per key: latest right row at-or-before every
  left row. Cost = one hash exchange + one per-key sort, the same
  plan pandas' merge_asof runs per group, distributed.
- :func:`range_join_binned` — interval join via time-bucket binning:
  intervals explode into the fixed-width buckets they overlap, points
  join their bucket (equi-join on (key?, bucket)), then the exact
  range predicate filters. Turns the non-equi join Catalyst can't
  hash into an equi-join + cheap verify — linear in points +
  interval-bucket fragments.

The reference's only as-of-like operation is the exact-date sentiment
align (arima_forecast.py:47 — see ``operators.etl.align_daily_signal``);
these are the general time-series forms a 100 TB events lake needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    matched_ts_col: str = "matched_ts",
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the as-of matching right row within
    the same ``on`` key. ``direction`` selects the pandas
    ``merge_asof`` family member (all inclusive at equal ts;
    unmatched left rows keep nulls — left-join semantics):

    - ``"backward"`` (default): latest right with ``rts <= lts`` —
      DuckDB ``ASOF JOIN`` / kdb ``aj`` semantics.
    - ``"forward"``: earliest right with ``rts >= lts`` (the
      next-event attribution shape).
    - ``"nearest"``: whichever of the two is closer in time; exact
      ties resolve backward, matching pandas.

    ``tolerance``: optional max distance as an interval Column (e.g.
    ``F.expr("INTERVAL 7 DAYS")``) — farther matches are nulled out,
    like ``merge_asof(tolerance=...)``; applies on both sides of
    ``nearest``.

    Plan: tag + union both inputs, one running
    ``last/first(right_payload, ignorenulls)`` window per key over
    the time-sorted union. Right rows order toward the left row at
    equal ts so matches are inclusive. ``backward``/``forward`` cost
    one exchange + one sort; ``nearest`` shares the exchange but its
    two frames need OPPOSITE tie orders at equal ts, so the plan
    sorts the union twice (same partitioning, local re-sort only —
    still no pair blowup, no nested-loop join).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    rstruct = F.struct(
        F.col(ts_col).alias("__rts"), *[F.col(c) for c in value_cols]
    )
    # A null-ts right row would sort nulls-first yet carry a non-null
    # payload struct, "matching" every left row that precedes the first
    # real right row — drop them: a row with no timestamp can never be
    # the latest-at-or-before anything.
    right = right.filter(F.col(ts_col).isNotNull())
    r = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
    )
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        lstruct.alias("__l"),
    )
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    unioned = l.unionByName(r)
    # backward: right (side 0) sorts BEFORE left at equal ts under
    # (ts, side) asc → inclusive in the trailing frame. forward: the
    # trailing sort keeps right before left, so the LEADING frame must
    # start one row early to re-include an equal-ts right row — order
    # (ts, side desc) instead: left first, right after, frame
    # [current, +inf) sees it.
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    cols = {}
    if direction in ("backward", "nearest"):
        cols["__mb"] = F.last("__r", ignorenulls=True).over(w_back)
    if direction in ("forward", "nearest"):
        cols["__mf"] = F.first("__r", ignorenulls=True).over(w_fwd)
    filled = unioned.withColumns(cols).filter(F.col("__side") == 1)

    def in_tol(m: Column) -> Column:
        if tolerance is None:
            return m
        dist_ok = (m["__rts"] >= F.col("__ts") - tolerance) & (
            m["__rts"] <= F.col("__ts") + tolerance
        )
        return F.when(dist_ok, m)

    if direction == "backward":
        match = in_tol(F.col("__mb"))
    elif direction == "forward":
        match = in_tol(F.col("__mf"))
    else:
        mb, mf = in_tol(F.col("__mb")), in_tol(F.col("__mf"))

        # nearest: closer wins; exact tie → backward (pandas rule).
        # DateType can't cast straight to double (analysis error) —
        # hop through timestamp (midnight), a no-op for timestamps.
        def secs(c: Column) -> Column:
            if isinstance(
                unioned.schema["__ts"].dataType, T.DateType
            ):
                c = c.cast("timestamp")
            return c.cast("double")

        back_dist = secs(F.col("__ts")) - secs(mb["__rts"])
        fwd_dist = secs(mf["__rts"]) - secs(F.col("__ts"))
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(fwd_dist < back_dist, mf)
            .otherwise(mb)
        )
    return filled.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        match["__rts"].alias(matched_ts_col),
        *[match[c].alias(c) for c in value_cols],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    interval_start: str,
    interval_end: str,
    bucket_seconds: int = 86400,
    on: list[str] | None = None,
) -> DataFrame:
    """Join points to the intervals containing them
    (``start <= ts < end``), optionally also keyed on ``on``.

    Intervals explode into every fixed-width epoch bucket they overlap
    (integer ``floor(epoch / bucket_seconds)`` — granularity-agnostic);
    points map to their single bucket; the join is an **equi-join** on
    (bucket [+ keys]) followed by the exact range filter. Candidate
    volume is linear in points + interval-fragments — no
    BroadcastNestedLoopJoin, which is what Catalyst falls back to for
    a bare non-equi condition. Pick ``bucket_seconds`` near the median
    interval length: shorter → more fragments, longer → more
    false-candidate points per bucket.
    """
    on = on or []
    w = F.lit(bucket_seconds).cast("long")
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(interval_start)) / w),
                F.floor(F.unix_timestamp(F.col(interval_end)) / w),
            )
        ),
    )
    pts = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / w)
    )
    joined = pts.join(ivals, [*on, "__bucket"]).filter(
        (F.col(point_ts) >= F.col(interval_start))
        & (F.col(point_ts) < F.col(interval_end))
    )
    return joined.drop("__bucket")
