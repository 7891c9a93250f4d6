"""Extended time-series / relational operators (split from pack.py, r7 — pure refactor).

Registers 8 queries (registration order is the
import order in pack.py):
- ``asof_purchase_value``
- ``range_join_events``
- ``user_sessions``
- ``pivot_event_counts``
- ``unpivot_measures``
- ``rollup_order_totals``
- ``percentiles_price``
- ``anti_join_inactive``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.catalog import fan_out, load_table
from yahoofinancedatalake_spark.functions.scalars import dround, sentiment_label, sql_dround
from yahoofinancedatalake_spark.queries._registry import (
    _register,
)


# ---------------------------------------------------------------------------
# Extended time-series / relational operators (beyond the reference's set)
# ---------------------------------------------------------------------------


@_register(
    "asof_purchase_value",
    """
    SELECT a.event_id, a.user_id, a.ts,
           b.ts AS matched_ts, b.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND b.ts <= a.ts
    """,
    doc="Point-in-time (as-of) join: every click gets the user's most "
    "recent prior purchase value. Spark lacks ASOF JOIN; the plan is "
    "the union + running last(ignorenulls) window form — ONE hash "
    "exchange on the key, no per-key nested loop (operators/asof.py). "
    "Oracle: DuckDB's native ASOF LEFT JOIN.",
)
def q_asof_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks, purchases, on=["user_id"], ts_col="ts", value_cols=["value"]
    ).withColumnRenamed("value", "purchase_value")


@_register(
    "range_join_events",
    """
    SELECT p.event_id, p.user_id, p.ts,
           s.ts AS signup_ts, s.event_id AS signup_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') p
    JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id
     AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 3 DAY
    """,
    doc="Interval (range) join: clicks landing inside each signup's "
    "3-day activation window, per user. Spark plans a bare non-equi "
    "condition as BroadcastNestedLoopJoin; operators/asof.py bins "
    "intervals into fixed epoch buckets so the join is an equi-join "
    "on (user, bucket) + exact range verify — linear, shuffle on the "
    "bucket key. Oracle: DuckDB evaluates the range predicate "
    "directly (its IEJoin handles non-equi natively).",
)
def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.asof import range_join_binned

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id"),
            F.col("ts").alias("signup_ts"),
            F.col("event_id").alias("signup_event_id"),
        )
        .withColumn("window_end", F.col("signup_ts") + F.expr("INTERVAL 3 DAYS"))
    )
    return range_join_binned(
        clicks,
        signups,
        point_ts="ts",
        interval_start="signup_ts",
        interval_end="window_end",
        bucket_seconds=3 * 86400,
        on=["user_id"],
    ).select("event_id", "user_id", "ts", "signup_ts", "signup_event_id")


@_register(
    "user_sessions",
    f"""
    WITH l AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, sum(new_s) OVER (
        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM l
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           {sql_dround("sum(value)", 2)} AS session_value
    FROM s GROUP BY user_id, sid
    """,
    doc="Sessionization: per-user sessions with a 30-minute inactivity "
    "gap via Spark's native session_window aggregation (merging "
    "event-time windows — the same operator the streaming path uses "
    "with state). Oracle: the classic gaps-and-islands SQL (lag + "
    "running sum of session starts).",
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            dround(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@_register(
    "pivot_event_counts",
    f"""
    SELECT date_trunc('day', ts) AS day,
           {", ".join(
               f"count(*) FILTER (event_type = '{t}') AS {t}"
               for t in _EVENT_TYPES
           )}
    FROM events GROUP BY 1
    """,
    doc="Pivot: daily event counts spread into one column per event "
    "type (Kibana 'breakdown by' table as columns). Spark "
    "groupBy().pivot() with explicit values — no extra pass to "
    "discover the pivot domain, map-side partial aggregation intact. "
    "Oracle: conditional FILTER aggregates.",
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


_UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount"]


@_register(
    "unpivot_measures",
    "\nUNION ALL\n".join(
        f"""
    SELECT l_orderkey, l_linenumber,
           '{m}' AS measure, {m}::DOUBLE AS value
    FROM lineitem WHERE l_orderkey < 100
    """
        for m in _UNPIVOT_MEASURES
    ),
    doc="Unpivot (melt): wide measure columns reshaped to long "
    "(measure, value) rows — the inverse of pivot and the standard "
    "reshape before per-measure normalization in a training-data "
    "pipeline. Spark native `unpivot` (Generate, no join, no "
    "shuffle); oracle is the equivalent UNION ALL.",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    li = li.select(
        "l_orderkey",
        "l_linenumber",
        *[F.col(m).cast("double").alias(m) for m in _UNPIVOT_MEASURES],
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"], _UNPIVOT_MEASURES, "measure", "value"
    )


@_register(
    "rollup_order_totals",
    f"""
    SELECT c.c_mktsegment, o.o_orderpriority,
           count(*) AS n_orders,
           {sql_dround("sum(o.o_totalprice)", 2)} AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY ROLLUP (c.c_mktsegment, o.o_orderpriority)
    """,
    doc="Multi-level aggregation: ROLLUP over (segment, priority) — "
    "subtotals per segment and a grand total in one pass (partial "
    "aggregation covers all grouping sets; null marks the rolled-up "
    "level on both engines).",
)
def q_rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    )
    return joined.rollup("c_mktsegment", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dround(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@_register(
    "percentiles_price",
    f"""
    SELECT l_returnflag,
           {sql_dround("quantile_cont(l_extendedprice, 0.5)", 4)} AS p50,
           {sql_dround("quantile_cont(l_extendedprice, 0.95)", 4)} AS p95,
           {sql_dround("quantile_cont(l_extendedprice, 0.99)", 4)} AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (Kibana percentile "
    "panel analog): Spark `percentile` and DuckDB `quantile_cont` "
    "share the (n-1)*q linear-interpolation definition. The "
    "approx-sketch twin for 100 TB is `approx_percentile` (same call "
    "shape, rank error eps) — exact here so the oracle can check "
    "values.",
)
def q_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(*[F.lit(x) for x in (0.5, 0.95, 0.99)]))
    return li.groupBy("l_returnflag").agg(
        dround(F.element_at(pct, 1), 4).alias("p50"),
        dround(F.element_at(pct, 2), 4).alias("p95"),
        dround(F.element_at(pct, 3), 4).alias("p99"),
    )


@_register(
    "anti_join_inactive",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Anti join: customers with no urgent-priority orders "
    "(left_anti — the NOT EXISTS plan; the filter on the probe side "
    "pushes to its scan; broadcast the build side when small, else "
    "shuffle-hash on the key).",
)
def q_anti_join_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


