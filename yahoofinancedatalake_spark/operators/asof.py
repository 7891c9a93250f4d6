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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    matched_ts_col: str = "matched_ts",
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key (backward
    as-of, inclusive — pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics). Unmatched left rows keep nulls (left-join semantics).

    ``tolerance``: optional max age as an interval Column (e.g.
    ``F.expr("INTERVAL 7 DAYS")``) — older matches are nulled out,
    like ``merge_asof(tolerance=...)``.

    Plan: tag + union both inputs, one window
    ``last(right_payload, ignorenulls)`` ordered by (ts, side) per
    key — right rows sort before left rows at equal ts, which makes
    the match inclusive. One exchange on ``on``; no pair blowup, no
    nested-loop join.
    """
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
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    match = F.col("__m")
    if tolerance is not None:
        match = F.when(
            F.col("__m.__rts") >= F.col("__ts") - tolerance, F.col("__m")
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
