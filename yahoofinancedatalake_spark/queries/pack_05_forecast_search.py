"""Grouped forecasting, ranked full-text search, ANN recall gates (split from pack.py, r7 — pure refactor).

Registers 6 queries (registration order is the
import order in pack.py):
- ``forecast_events``
- ``forecast_with_exog``
- ``sarimax_seasonal_forecast``
- ``text_search_rank``
- ``ann_recall``
- ``ivf_recall``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.catalog import fan_out, load_table
from yahoofinancedatalake_spark.functions.scalars import dround, sentiment_label, sql_dround
from yahoofinancedatalake_spark.queries._registry import (
    _register,
)
from yahoofinancedatalake_spark.queries.pack_02_text import (
    _sql_wordlist,
)


# ---------------------------------------------------------------------------
# X2 — grouped time-series forecast (arima_forecast.py:32-108 re-expressed
# as groupBy().applyInPandas; deterministic numpy backend in-container)
# ---------------------------------------------------------------------------


#: 97.5th normal quantile, printed at full double precision so the
#: oracle SQL uses the bit-identical constant as forecast/grouped.py.
_Z95_SQL = "1.959963984540054"


@_register(
    "forecast_events",
    f"""
    WITH daily AS (
      SELECT user_id::VARCHAR AS group_key,
             date_trunc('day', ts) AS day,
             avg(value) AS v
      FROM events
      GROUP BY 1, 2
    ), full_series AS (
      SELECT group_key, day, v,
             count(*) OVER (PARTITION BY group_key) AS n_full,
             row_number() OVER (PARTITION BY group_key ORDER BY day DESC)
               AS rn_desc
      FROM daily
    ), train AS (
      SELECT group_key, day, v,
             row_number() OVER (PARTITION BY group_key ORDER BY day) - 1 AS t,
             count(*) OVER (PARTITION BY group_key) AS n
      FROM full_series
      WHERE n_full >= 10 AND rn_desc <= 252
    ), means AS (
      SELECT group_key, max(n) AS n, avg(t::DOUBLE) AS tbar, avg(v) AS ybar
      FROM train GROUP BY group_key
    ), beta AS (
      SELECT tr.group_key, max(m.tbar) AS tbar, max(m.ybar) AS ybar,
             sum((tr.t - m.tbar) * (tr.v - m.ybar))
               / sum((tr.t - m.tbar) * (tr.t - m.tbar)) AS b1
      FROM train tr JOIN means m USING (group_key)
      GROUP BY tr.group_key
    ), beta2 AS (
      SELECT group_key, b1, ybar - b1 * tbar AS b0 FROM beta
    ), resid AS (
      SELECT tr.group_key, tr.t, tr.day, tr.v, tr.n,
             tr.v - (b.b0 + b.b1 * tr.t) AS r
      FROM train tr JOIN beta2 b USING (group_key)
    ), lagged AS (
      SELECT group_key, r,
             lag(r) OVER (PARTITION BY group_key ORDER BY t) AS rp
      FROM resid
    ), arstats AS (
      SELECT group_key, sum(r * rp) AS num, sum(rp * rp) AS den
      FROM lagged WHERE rp IS NOT NULL GROUP BY group_key
    ), sig AS (
      SELECT group_key,
             stddev_samp(r) AS sigma,
             max(n) AS n,
             max(CASE WHEN t = n - 1 THEN r END) AS r_last,
             max(day) AS last_day
      FROM resid GROUP BY group_key
    ), grp AS (
      SELECT b.group_key, s.n, b.b0, b.b1,
             CASE WHEN a.den > 0
                  THEN least(greatest(a.num / a.den, -0.99), 0.99)
                  ELSE 0.0 END AS phi,
             s.sigma, s.r_last, s.last_day
      FROM beta2 b
      JOIN arstats a USING (group_key)
      JOIN sig s USING (group_key)
    ), fut AS (
      SELECT g.group_key,
             (g.last_day::DATE + h.h::INT) AS day,
             g.b0 + g.b1 * (g.n - 1 + h.h) + pow(g.phi, h.h) * g.r_last
               AS pred,
             {_Z95_SQL} * g.sigma * sqrt(
               CASE WHEN g.phi * g.phi = 1.0 THEN h.h::DOUBLE
                    ELSE (1.0 - pow(g.phi * g.phi, h.h))
                         / (1.0 - g.phi * g.phi) END) AS half
      FROM grp g CROSS JOIN (SELECT unnest(range(1, 8)) AS h) h
    )
    SELECT group_key, day::DATE AS day,
           {sql_dround("v", 4)} AS predicted,
           {sql_dround("v", 4)} AS confidence_lower,
           {sql_dround("v", 4)} AS confidence_upper,
           NULL::DOUBLE AS exog,
           'actual' AS kind
    FROM full_series WHERE n_full >= 10 AND rn_desc <= 90
    UNION ALL
    SELECT group_key, day,
           {sql_dround("pred", 4)} AS predicted,
           {sql_dround("pred - half", 4)} AS confidence_lower,
           {sql_dround("pred + half", 4)} AS confidence_upper,
           NULL::DOUBLE AS exog,
           'forecast' AS kind
    FROM fut
    """,
    doc="X2: per-group forecast table function. Daily mean value per "
    "user → groupBy(user).applyInPandas(trend+AR(1) forecaster) → "
    "history rows + 7 forecast rows with 95% CI. Parallel across "
    "groups (the reference loops symbols on the driver, "
    "arima_forecast.py:135-144). ORACLE-CHECKED, not rows-only: the "
    "fallback forecaster is closed-form centered OLS + AR(1) with "
    "geometric decay/variance (forecast/grouped.py:_fallback_forecast)"
    ", so the DuckDB oracle replays the IDENTICAL formulas — "
    "covariance sums, lag-1 residual regression, phi clamp, "
    "stddev_samp CI — as plain SQL windows/aggregates; outputs are "
    "dround(4)-stabilized on both sides (sum-order fp noise is "
    "~1e-12 relative, far inside the bin). Property tests in "
    "tests/test_forecast.py.",
)
def q_forecast_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.forecast import forecast_by_group

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("user_id"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.avg("value").alias("v"))
    out = forecast_by_group(
        daily, "user_id", "day", "v", horizon=7, min_points=10,
        future_freq="D",  # synthetic events are calendar-daily
        backend="closed_form",  # pinned: the oracle replays THIS model
    )
    return out.select(
        "group_key",
        "day",
        dround(F.col("predicted"), 4).alias("predicted"),
        dround(F.col("confidence_lower"), 4).alias("confidence_lower"),
        dround(F.col("confidence_upper"), 4).alias("confidence_upper"),
        "exog",
        "kind",
    )


@_register(
    "forecast_with_exog",
    f"""
    WITH values_d AS (
      SELECT user_id::VARCHAR AS group_key,
             date_trunc('day', ts) AS day, avg(value) AS v
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), signal_d AS (
      SELECT user_id::VARCHAR AS group_key,
             date_trunc('day', ts) AS day, avg(value) AS sig
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ), aligned AS (
      SELECT v.group_key, v.day, v.v, s.sig
      FROM values_d v LEFT JOIN signal_d s USING (group_key, day)
    ), full_series AS (
      SELECT group_key, day, v, sig,
             count(*) OVER (PARTITION BY group_key) AS n_full,
             row_number() OVER (PARTITION BY group_key ORDER BY day DESC)
               AS rn_desc
      FROM aligned
    ), train AS (
      SELECT group_key, day, v, sig, coalesce(sig, 0.0) AS x,
             row_number() OVER (PARTITION BY group_key ORDER BY day) - 1 AS t,
             row_number() OVER (PARTITION BY group_key ORDER BY day DESC)
               AS rn_t,
             count(*) OVER (PARTITION BY group_key) AS n
      FROM full_series
      WHERE n_full >= 10 AND rn_desc <= 252
    ), means AS (
      SELECT group_key, max(n) AS n, avg(t::DOUBLE) AS tbar,
             avg(v) AS ybar, avg(x) AS xbar
      FROM train GROUP BY group_key
    ), sums AS (
      SELECT tr.group_key,
             max(m.tbar) AS tbar, max(m.ybar) AS ybar, max(m.xbar) AS xbar,
             sum((tr.t - m.tbar) * (tr.t - m.tbar)) AS stt,
             sum((tr.t - m.tbar) * (tr.v - m.ybar)) AS sty,
             sum((tr.x - m.xbar) * (tr.x - m.xbar)) AS sxx,
             sum((tr.t - m.tbar) * (tr.x - m.xbar)) AS stx,
             sum((tr.x - m.xbar) * (tr.v - m.ybar)) AS sxy
      FROM train tr JOIN means m USING (group_key)
      GROUP BY tr.group_key
    ), beta AS (
      SELECT group_key, tbar, ybar, xbar,
             CASE WHEN stt * sxx - stx * stx <> 0.0
                  THEN (sty * sxx - sxy * stx) / (stt * sxx - stx * stx)
                  WHEN stt > 0.0 THEN sty / stt ELSE 0.0 END AS b1,
             CASE WHEN stt * sxx - stx * stx <> 0.0
                  THEN (sxy * stt - sty * stx) / (stt * sxx - stx * stx)
                  ELSE 0.0 END AS b2
      FROM sums
    ), beta2 AS (
      SELECT group_key, b1, b2, ybar - b1 * tbar - b2 * xbar AS b0 FROM beta
    ), recent_c AS (
      SELECT group_key, coalesce(avg(sig), 0.0) AS recent
      FROM train WHERE rn_t <= 30 GROUP BY group_key
    ), resid AS (
      SELECT tr.group_key, tr.t, tr.day, tr.n,
             tr.v - (b.b0 + b.b1 * tr.t + b.b2 * tr.x) AS r
      FROM train tr JOIN beta2 b USING (group_key)
    ), lagged AS (
      SELECT group_key, r,
             lag(r) OVER (PARTITION BY group_key ORDER BY t) AS rp
      FROM resid
    ), arstats AS (
      SELECT group_key, sum(r * rp) AS num, sum(rp * rp) AS den
      FROM lagged WHERE rp IS NOT NULL GROUP BY group_key
    ), sig_s AS (
      SELECT group_key,
             stddev_samp(r) AS sigma,
             max(n) AS n,
             max(CASE WHEN t = n - 1 THEN r END) AS r_last,
             max(day) AS last_day
      FROM resid GROUP BY group_key
    ), grp AS (
      SELECT b.group_key, s.n, b.b0, b.b1, b.b2, rc.recent,
             CASE WHEN a.den > 0
                  THEN least(greatest(a.num / a.den, -0.99), 0.99)
                  ELSE 0.0 END AS phi,
             s.sigma, s.r_last, s.last_day
      FROM beta2 b
      JOIN arstats a USING (group_key)
      JOIN sig_s s USING (group_key)
      JOIN recent_c rc USING (group_key)
    ), fut AS (
      SELECT g.group_key,
             (g.last_day::DATE + h.h::INT) AS day,
             g.b0 + g.b1 * (g.n - 1 + h.h) + pow(g.phi, h.h) * g.r_last
               + g.b2 * g.recent AS pred,
             g.recent,
             {_Z95_SQL} * g.sigma * sqrt(
               CASE WHEN g.phi * g.phi = 1.0 THEN h.h::DOUBLE
                    ELSE (1.0 - pow(g.phi * g.phi, h.h))
                         / (1.0 - g.phi * g.phi) END) AS half
      FROM grp g CROSS JOIN (SELECT unnest(range(1, 8)) AS h) h
    )
    SELECT group_key, day::DATE AS day,
           {sql_dround("v", 4)} AS predicted,
           {sql_dround("v", 4)} AS confidence_lower,
           {sql_dround("v", 4)} AS confidence_upper,
           floor((coalesce(sig, 0.0)) * 10000 + 0.5 + 1e-6) / 10000.0 AS exog,
           'actual' AS kind
    FROM full_series WHERE n_full >= 10 AND rn_desc <= 90
    UNION ALL
    SELECT group_key, day,
           {sql_dround("pred", 4)} AS predicted,
           {sql_dround("pred - half", 4)} AS confidence_lower,
           {sql_dround("pred + half", 4)} AS confidence_upper,
           floor((recent) * 10000 + 0.5 + 1e-6) / 10000.0 AS exog,
           'forecast' AS kind
    FROM fut
    """,
    doc="X2+J3: forecast with an exogenous daily regressor. The "
    "'view'-event daily mean is the value series; the sparser "
    "'click'-event daily mean is the exog signal, exact-date aligned "
    "with neutral fill (arima_forecast.py:47) and trailing-30 "
    "null-skipping mean as the future exog (:61-63). Exercises "
    "align_daily_signal (J3) + the exog path of forecast_by_group. "
    "ORACLE-CHECKED like forecast_events: the closed-form two-"
    "regressor fit (2x2 determinant solve on centered covariance "
    "sums) is replayed in SQL, including the null-skipping trailing-"
    "30 future-exog mean and the exog output contract (fit-filled 0 "
    "on actual rows, `recent` on forecast rows). Property tests in "
    "tests/test_forecast.py.",
)
def q_forecast_with_exog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.forecast import forecast_by_group
    from yahoofinancedatalake_spark.operators.etl import align_daily_signal

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "view")
        .groupBy(F.col("user_id"), F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.avg("value").alias("v"))
    )
    signal = (
        events.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id"), F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.avg("value").alias("sig"))
    )
    aligned = align_daily_signal(
        daily, signal, "user_id", "day", "sig", neutral_fill=False
    )
    out = forecast_by_group(
        aligned, "user_id", "day", "v", horizon=7, min_points=10,
        exog_col="sig", future_freq="D",
        backend="closed_form",  # pinned: the oracle replays THIS model
    )
    return out.select(
        "group_key",
        "day",
        dround(F.col("predicted"), 4).alias("predicted"),
        dround(F.col("confidence_lower"), 4).alias("confidence_lower"),
        dround(F.col("confidence_upper"), 4).alias("confidence_upper"),
        dround(F.col("exog"), 4).alias("exog"),
        "kind",
    )


@_register(
    "sarimax_seasonal_forecast",
    # rows-only: the CSS-SARIMAX fit (Nelder-Mead over the 6 ARMA
    # parameters) is an iterative optimizer no SQL oracle can replay;
    # the gate booleans in the output are the contract instead, and
    # tests/test_sarimax_css.py property-gates the model itself.
    None,
    doc="The reference's exact model family — SARIMAX(2,1,2)(1,1,1,5) "
    "(arima_forecast.py:50-58) — fit per event_type by the numpy CSS "
    "backend (forecast/sarimax_css.py) through the same "
    "applyInPandas table function as every other forecast. Output is "
    "one self-gating row per group: actual/forecast row counts, CI "
    "ordering (lower <= predicted <= upper on every forecast row), "
    "and finiteness — computed Spark-side from the forecast table "
    "(monotone CI widening is asserted in the pytest property gates, "
    "where row order is unambiguous). One exchange on the group key; "
    "each task fits only its own ~720-point series (fit measured "
    "~0.2s), so 10^6 symbols parallelize flat at 100 TB.",
)
def q_sarimax_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.forecast import forecast_by_group

    events = load_table(spark, sf_dir, "events")
    # hourly buckets: the test events span only 30 calendar days at
    # every SF, and a 30-point series is below the seasonal model's
    # minimum-observation guard (which would silently exercise the
    # closed-form fallback instead) — ~720 hourly points per type
    # puts every group firmly on the CSS-SARIMAX path
    hourly = events.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("day")
    ).agg(F.avg("value").alias("v"))
    out = forecast_by_group(
        hourly, "event_type", "day", "v", horizon=10, min_points=10,
        future_freq="h", backend="sarimax_css",
    )
    fc = out.filter(F.col("kind") == "forecast")
    gates = fc.groupBy("group_key").agg(
        F.count(F.lit(1)).alias("n_forecast"),
        F.min(
            (F.col("confidence_lower") <= F.col("predicted"))
            & (F.col("predicted") <= F.col("confidence_upper"))
        ).alias("ci_ok"),
        F.min(
            ~F.isnan("predicted") & F.col("predicted").isNotNull()
        ).alias("finite_ok"),
    )
    n_actual = (
        out.filter(F.col("kind") == "actual")
        .groupBy("group_key")
        .agg(F.count(F.lit(1)).alias("n_actual"))
    )
    return (
        gates.join(n_actual, "group_key")
        .select(
            "group_key", "n_actual", "n_forecast",
            "ci_ok", "finite_ok",
        )
        .orderBy("group_key")
    )


# ---------------------------------------------------------------------------
# Extensions — ranked full-text search (the rest of P12)
# ---------------------------------------------------------------------------

#: The fixed "saved search" terms (the engine twin of the reference's
#: Kibana saved searches over analyzed ES text fields,
#: kibana_saved_objects.ndjson:5,10).
_SEARCH_TERMS = ["spark", "merge", "vector"]


@_register(
    "text_search_rank",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(
               regexp_split_to_array(lower(trim(text)), '[^a-z0-9'']+'),
               x -> x <> '') AS tokens
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(tokens) AS term FROM toks
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM ex
      WHERE term IN ({_sql_wordlist(_SEARCH_TERMS)})
      GROUP BY doc_id, term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), idf AS (
      SELECT term,
             CAST(floor(
               (ln((n_docs + 1) / (count(DISTINCT doc_id) + 1)) + 1)
               * 1000000 + 0.5) AS BIGINT) AS idf_fix
      FROM tf, n
      GROUP BY term, n_docs
    ), scores AS (
      SELECT tf.doc_id,
             count(*) AS n_terms,
             sum(tf.tf * idf.idf_fix)::DOUBLE / 1000000.0 AS score
      FROM tf JOIN idf USING (term)
      GROUP BY tf.doc_id
    )
    SELECT doc_id, n_terms, score
    FROM scores
    ORDER BY score DESC, doc_id ASC
    LIMIT 20
    """,
    doc="P12 (ranked): tokenized multi-term text search with tf·idf "
    "relevance scoring and deterministic top-20 — the engine twin of "
    "the reference's analyzed ES text fields + saved searches "
    "(to_elasticsearch.py:122-129, kibana_saved_objects.ndjson:5,10), "
    "where users RANK news by match quality rather than filter. "
    "Shape: token explode → filter to query terms (pushed below the "
    "shuffle) → (doc, term) tf hash-agg → idf from a term-count "
    "aggregate (3 rows, broadcast) → per-doc score sum → top-k. "
    "Cross-engine determinism: idf is smoothed ln((N+1)/(df+1))+1 "
    "fixed-pointed at 1e-6 (floor(x·1e6+0.5) as BIGINT), so the "
    "per-doc score is an exact INTEGER sum — summation order can "
    "never flip a bit; ties broken by doc_id. At 100 TB the only "
    "wide exchange is the (doc_id, term) aggregate over rows already "
    "filtered to query terms; idf stays dimension-sized.",
    parts=8,
)
def q_text_search_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = fan_out(docs)  # single-row-group file → parallelize tokenize
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), "[^a-z0-9']+"),
        lambda t: t != "",
    )
    ex = docs.select("doc_id", F.explode(toks).alias("term")).filter(
        F.col("term").isin(_SEARCH_TERMS)
    )
    tf = ex.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # idf needs (n_docs, df_term) — both computed in ONE single-row
    # aggregate over docs (map-side partials, no countDistinct
    # shuffle, no 1-row scalar join: Catalyst folds a literal-key
    # join into a BroadcastNestedLoopJoin), then exploded to one
    # (term, idf_fix) row per search term.
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(F.array_contains(toks, t).cast("long")).alias(f"__df_{i}")
            for i, t in enumerate(_SEARCH_TERMS)
        ],
    )
    idf = stats.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"),
                        F.floor(
                            (
                                F.log(
                                    (F.col("n_docs") + 1)
                                    / (F.col(f"__df_{i}") + 1)
                                )
                                + 1
                            )
                            * 1000000
                            + 0.5
                        )
                        .cast("long")
                        .alias("idf_fix"),
                    )
                    for i, t in enumerate(_SEARCH_TERMS)
                ]
            )
        ).alias("s")
    ).select("s.term", "s.idf_fix")
    scores = (
        tf.join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            (
                F.sum(F.col("tf") * F.col("idf_fix")).cast("double")
                / F.lit(1000000.0)
            ).alias("score"),
        )
    )
    return scores.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(20)


# ---------------------------------------------------------------------------
# Extensions — ANN recall as a CORRECTNESS gate (not just a bench metric)
# ---------------------------------------------------------------------------


def _recall_gate(
    truth: DataFrame, approx: DataFrame, metric: str, threshold: float
) -> DataFrame:
    """One-row (metric, passed) frame: recall of ``approx`` against
    ``truth`` on (query_id, neighbor_id) membership ≥ ``threshold``.
    Shape: mark each truth pair found/missing with ONE left join, then
    ONE aggregate computes both counts — no driver-side math and no
    1-row crossJoin (which would plan as BroadcastNestedLoopJoin and
    trip the scale-killer plan gate)."""
    t = truth.select("query_id", "neighbor_id")
    a = approx.select(
        "query_id", "neighbor_id", F.lit(1).alias("__hit")
    ).dropDuplicates(["query_id", "neighbor_id"])
    return (
        t.join(a, ["query_id", "neighbor_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.count("__hit").alias("n_hits"),
        )
        .select(
            F.lit(metric).alias("metric"),
            (
                F.col("n_hits").cast("double")
                >= F.lit(threshold) * F.col("n_truth")
            ).alias("passed"),
        )
    )


def _ann_queries(spark: SparkSession, sf_dir: str, n_queries: int = 20):
    emb = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(emb)
    # 20 queries × k=5 = 100 (query, neighbor) pairs — enough that the
    # recall gate is statistically meaningful, not one-miss-brittle
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return emb, queries


@_register(
    "ann_recall",
    "SELECT 'lsh_recall_at_5' AS metric, TRUE AS passed",
    doc="ANN quality as a correctness gate: recall@5 of the sign-LSH "
    "index (ann_topk's exact configuration) against brute-force "
    "cosine ground truth must be ≥ 0.99 — an approximation "
    "regression now fails the driver's hash check instead of only "
    "moving a bench number. Computed fully distributed (semi-join "
    "membership + counts). The 0.99 bar is calibrated for the "
    "sf0.01+ corpora the gates run at (1.00 measured at sf0.01 and "
    "sf0.1); on the 200-vector sf0.001 smoke corpus the 12-band "
    "tables are too sparse to clear it and the gate correctly "
    "reports the config unfit — run ANN gates at sf0.01 or larger.",
    parts=8,
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.similarity import (
        brute_force_cosine_topk,
        lsh_cosine_topk,
    )

    emb, queries = _ann_queries(spark, sf_dir)
    truth = brute_force_cosine_topk(
        queries, emb, k=5, id_col="vec_id", vec_col="embedding", round_to=4
    )
    approx = lsh_cosine_topk(
        queries, emb, k=5, dim=64, n_planes=24, n_bands=12, seed=7
    )
    return _recall_gate(truth, approx, "lsh_recall_at_5", 0.99)


@_register(
    "ivf_recall",
    "SELECT 'ivf_recall_at_5' AS metric, TRUE AS passed",
    doc="ANN quality gate for the IVF index (ivf_topk's exact "
    "configuration, incl. the 2-way corpus replication): recall@5 vs "
    "brute-force cosine ≥ 0.95 over 20 queries (looser than LSH — "
    "probing is a recall/coverage knob, and the synthetic embeddings "
    "cluster weakly).",
    parts=8,
)
def q_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.similarity import (
        brute_force_cosine_topk,
        ivf_cosine_topk,
    )

    emb, queries = _ann_queries(spark, sf_dir)
    truth = brute_force_cosine_topk(
        queries, emb, k=5, id_col="vec_id", vec_col="embedding", round_to=4
    )
    approx = ivf_cosine_topk(
        queries, emb, k=5, n_centroids=8, n_probe=5, n_assign=2, seed=11,
        cache_key=sf_dir,
    )
    return _recall_gate(truth, approx, "ivf_recall_at_5", 0.95)


