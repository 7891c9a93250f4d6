"""Windowed analytic operators.

These re-express the reference's Kibana Lens query semantics
(kibana/kibana_saved_objects.ndjson, kibana/export (1).ndjson) as
Spark window functions — SURVEY.md §2.5 (W1-W4) and §2.6 (O2):

- ``last_value`` per group ordered by time (Lens "Last value of X"),
- lag differences / time-shifted percent return (Lens ``differences``
  and ``shift='1d'`` formulas),
- top-k groups by a metric with an optional ES-style "Other" bucket
  (Lens terms aggregation with ``otherBucket: true``).

Scale notes: every operator here shuffles exactly once on the group
key (the window partition). ``last_row_per_group`` uses ``row_number``
+ filter, which Spark executes as a partial top-1 per map partition
before the shuffle when AQE/codegen kick in; no full sort of the data
is needed. Tie-breaking is always made deterministic with an explicit
unique key — ES breaks ties by internal doc order, which is not
reproducible; we document the divergence (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def last_row_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Latest full row per group, ordered by ``order_col`` desc.

    Kibana W1 ("Last value of close with sortField: date",
    kibana_saved_objects.ndjson:6,9). ``tiebreak_cols`` make the
    choice deterministic when ``order_col`` ties.
    """
    ordering = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lag_delta(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    delta_name: str = "delta",
    pct_name: str | None = "pct_change",
) -> DataFrame:
    """Day-over-day differences and percent return (Kibana W2/W3).

    Lens formula: ``(differences(last_value(close)) /
    last_value(close, shift='1d')) * 100`` (export (1).ndjson:4) —
    i.e. ``(v - lag(v)) / lag(v) * 100`` over the per-group
    time-ordered window.
    """
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    prev = F.lag(value_col, 1).over(w)
    out = df.withColumn(delta_name, F.col(value_col) - prev)
    if pct_name:
        out = out.withColumn(
            pct_name,
            F.when(prev != 0, (F.col(value_col) - prev) / prev * 100.0),
        )
    return out


def top_k(
    df: DataFrame,
    metric: str | Column,
    k: int,
    tiebreak_cols: Sequence[str] = (),
    ascending: bool = False,
) -> DataFrame:
    """Global top-k rows by a metric (Kibana W4/O2 terms ranking).

    ``orderBy(metric desc).limit(k)`` — Spark runs this as
    TakeOrderedAndProject: each partition keeps its local top-k, the
    driver merges k×partitions rows. No full shuffle/sort even at
    100 TB.
    """
    metric_col = F.col(metric) if isinstance(metric, str) else metric
    ordering = [metric_col.asc() if ascending else metric_col.desc()]
    ordering += [F.col(c).asc() for c in tiebreak_cols]
    return df.orderBy(*ordering).limit(k)


def top_k_with_other(
    df: DataFrame,
    group_col: str,
    metric_agg: Column,
    metric_name: str,
    k: int,
    other_label: str = "Other",
) -> DataFrame:
    """ES-style terms aggregation with ``otherBucket: true``.

    Kibana treemap/donut panels (kibana_saved_objects.ndjson:7-9) keep
    the top-k groups by a metric and merge the remainder into a single
    "Other" bucket. Expressed as: aggregate → rank (deterministic
    tiebreak on the group value) → relabel ranks > k → re-aggregate.

    Two shuffles total (group-by, then the k+1-row re-aggregation is
    trivially small); the rank step runs on the *aggregated* table
    (one row per group), never the raw data.
    """
    agged = df.groupBy(group_col).agg(metric_agg.alias(metric_name))
    w = Window.orderBy(F.col(metric_name).desc(), F.col(group_col).asc())
    return (
        agged.withColumn("__rank", F.row_number().over(w))
        .withColumn(
            group_col,
            F.when(F.col("__rank") <= k, F.col(group_col)).otherwise(
                F.lit(other_label)
            ),
        )
        .groupBy(group_col)
        .agg(F.sum(metric_name).alias(metric_name))
    )


def rolling_mean(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    n_rows: int = 30,
    out_col: str = "rolling_mean",
    deterministic_round: int | None = None,
) -> DataFrame:
    """A3: trailing mean over the last ``n_rows`` rows per group.

    The reference computes "average recent sentiment (last 30 days)"
    as a scalar inside its per-symbol loop (arima_forecast.py:61-63);
    the relational form is an ``avg`` over a rows-frame window —
    ``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW`` — which yields the
    trailing mean *for every row*, one shuffle on the group key.

    ``deterministic_round``: when set, compute ``dround(sum, d) /
    count`` instead of ``avg`` so the result is bit-identical across
    engines (floating avg/sliding-sum accumulation order differs
    between Spark and DuckDB; the rounded numerator pins it). Use for
    oracle-checked queries; plain ``avg`` otherwise.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(-(n_rows - 1), Window.currentRow)
    )
    if deterministic_round is None:
        expr = F.avg(value_col).over(w)
    else:
        from yahoofinancedatalake_spark.functions.scalars import (  # noqa: PLC0415
            dround,
        )

        expr = dround(F.sum(value_col).over(w), deterministic_round) / F.count(
            value_col
        ).over(w)
    return df.withColumn(out_col, expr)
