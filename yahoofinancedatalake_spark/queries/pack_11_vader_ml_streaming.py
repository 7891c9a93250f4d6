"""VADER engine query, centroid classifier, TPC-H completions, streaming rung 9, k-means (split from pack.py, r7 — pure refactor).

Registers 18 queries (registration order is the
import order in pack.py):
- ``vader_sentiment``
- ``centroid_classifier``
- ``nation_trade_volume``
- ``product_profit_yearly``
- ``returned_item_customers``
- ``promo_revenue_monthly``
- ``excess_rod_suppliers``
- ``stream_sliding_distinct_batch_eq``
- ``revenue_delta_q6``
- ``cheapest_supplier_per_part``
- ``late_lines_by_flag``
- ``kmeans_lloyd_gate``
- ``semantic_dedup``
- ``mmr_rerank``
- ``weighted_sample_es``
- ``label_align_filter``
- ``pagerank_bipartite``
- ``rolling_median_15``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.catalog import fan_out, load_table
from yahoofinancedatalake_spark.functions.scalars import dround, sentiment_label, sql_dround
from yahoofinancedatalake_spark.queries._registry import (
    _await_stream,
    _const_key,
    _register,
    _scoped_shuffle,
)


# ---------------------------------------------------------------------------
# X1 (completed r5) — VADER-faithful sentiment rule engine
# ---------------------------------------------------------------------------


def _vader_sql_case(col: str, d: dict[str, float]) -> str:
    """``CASE <col> WHEN 'w' THEN v ... ELSE NULL END`` from a dict."""
    whens = " ".join(
        f"WHEN '{k}' THEN {float(v)!r}" for k, v in d.items()
    )
    return f"CASE {col} {whens} ELSE NULL END"


def _vader_sql_neg(col: str) -> str:
    from yahoofinancedatalake_spark.functions.vader import NEGATORS  # noqa: PLC0415

    words = ", ".join(f"'{w}'" for w in sorted(NEGATORS))
    return f"({col} IN ({words}) OR {col} LIKE '%n''t')"


def _vader_oracle_sql() -> str:
    from yahoofinancedatalake_spark.functions import vader as V  # noqa: PLC0415

    isupper = "(s <> '' AND s = upper(s) AND s <> lower(s))"
    lexw = _vader_sql_case("w", V.VADER_LEXICON)
    lex1 = _vader_sql_case("pw1", V.VADER_LEXICON)
    lex2 = _vader_sql_case("pw2", V.VADER_LEXICON)
    lex3 = _vader_sql_case("pw3", V.VADER_LEXICON)
    b1 = _vader_sql_case("pw1", V.BOOSTERS)
    b2 = _vader_sql_case("pw2", V.BOOSTERS)
    b3 = _vader_sql_case("pw3", V.BOOSTERS)
    n1, n2, n3 = (_vader_sql_neg(c) for c in ("pw1", "pw2", "pw3"))

    def s_j(j: int, damp: float) -> str:
        return f"""CASE WHEN a{j} AND b{j} IS NOT NULL THEN
            ((CASE WHEN v0 < 0 THEN -b{j} ELSE b{j} END)
             + CASE WHEN pc{j} AND capdiff
                    THEN (CASE WHEN v0 > 0 THEN {V.C_INCR} ELSE {-V.C_INCR} END)
                    ELSE 0.0 END) * {damp}
          ELSE 0.0 END"""

    qm_n = "(length(text) - length(replace(text, '?', '')))"
    # the same pre-tokenization idiom merge the engine applies
    # (functions/vader.py IDIOM_MERGES), generated from the same
    # tuples: case-preserving capture-group re-emit, global flag
    tok_src = "text"
    for seq in V.IDIOM_MERGES:
        repl = "-".join(f"\\{i}" for i in range(1, len(seq) + 1))
        tok_src = (
            f"regexp_replace({tok_src}, '{V.idiom_pattern(seq)}', "
            f"'{repl}', 'g')"
        )
    return f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN 'never so good but ' ELSE '' END
             || replace(replace(coalesce(text, ''), 'slow', 'not slow'),
                        'fast', 'very FAST')
             || CASE WHEN doc_id % 11 = 0 THEN ' only kind of good' ELSE '' END
             || CASE WHEN doc_id % 13 = 0 THEN ' it is THE BOMB' ELSE '' END
             || CASE WHEN doc_id % 17 = 0 THEN ' yeah right' ELSE '' END
             || repeat('!', CAST(doc_id % 5 AS INT)) AS text
      FROM documents
    ), raw AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim({tok_src}), '\\s+'),
                         x -> x <> '') AS toks
      FROM base
    ), tok AS (
      SELECT doc_id,
             generate_subscripts(toks, 1) AS i,
             regexp_replace(unnest(toks),
                '^[^A-Za-z0-9'']+|[^A-Za-z0-9'']+$', '', 'g') AS s
      FROM raw
    ), feat AS (
      SELECT doc_id, i, lower(s) AS w, {isupper} AS c,
             lag(lower(s), 1) OVER win AS pw1,
             lag(lower(s), 2) OVER win AS pw2,
             lag(lower(s), 3) OVER win AS pw3,
             coalesce(lag({isupper}, 1) OVER win, false) AS pc1,
             coalesce(lag({isupper}, 2) OVER win, false) AS pc2,
             coalesce(lag({isupper}, 3) OVER win, false) AS pc3,
             count(*) OVER (PARTITION BY doc_id) AS n_tok,
             sum(CASE WHEN {isupper} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id) AS n_caps,
             min(CASE WHEN lower(s) = 'but' THEN i END)
               OVER (PARTITION BY doc_id) AS but_i
      FROM tok
      WINDOW win AS (PARTITION BY doc_id ORDER BY i)
    ), lv AS (
      SELECT doc_id, i, c, pw1, pw2, pw3, pc1, pc2, pc3, but_i,
             (n_caps > 0 AND n_caps < n_tok) AS capdiff,
             coalesce({lexw}, 0.0) AS v0,
             ({lex1}) IS NULL AS nolex1,
             ({lex2}) IS NULL AS nolex2,
             ({lex3}) IS NULL AS nolex3,
             {b1} AS b1, {b2} AS b2, {b3} AS b3
      FROM feat
    ), step AS (
      SELECT doc_id, i, but_i, v0, pw1, pw2, pw3,
             v0 + CASE WHEN c AND capdiff
                       THEN CASE WHEN v0 > 0 THEN {V.C_INCR}
                                 WHEN v0 < 0 THEN {-V.C_INCR}
                                 ELSE 0.0 END
                       ELSE 0.0 END AS v1,
             {s_j(1, V.DAMP[0])} AS s1,
             {s_j(2, V.DAMP[1])} AS s2,
             {s_j(3, V.DAMP[2])} AS s3,
             CASE WHEN a1 AND {n1} THEN {V.N_SCALAR} ELSE 1.0 END AS m1,
             CASE WHEN a2 AND pw2 = 'never' AND pw1 IN ('so', 'this')
                    THEN {V.NEVER_SO}
                  WHEN a2 AND pw2 = 'without' AND pw1 = 'doubt' THEN 1.0
                  WHEN a2 AND {n2} THEN {V.N_SCALAR}
                  ELSE 1.0 END AS m2,
             CASE WHEN a3 AND pw3 = 'never'
                       AND (pw2 IN ('so', 'this') OR pw1 IN ('so', 'this'))
                    THEN {V.NEVER_SO}
                  WHEN a3 AND pw3 = 'without'
                       AND (pw2 = 'doubt' OR pw1 = 'doubt') THEN 1.0
                  WHEN a3 AND {n3} THEN {V.N_SCALAR}
                  ELSE 1.0 END AS m3,
             CASE WHEN v0 <> 0 AND pw1 = 'least'
                       AND (pw2 IS NULL OR pw2 NOT IN ('at', 'very'))
                    THEN {V.N_SCALAR} ELSE 1.0 END AS lm,
             CASE WHEN but_i IS NOT NULL AND i < but_i THEN {V.BUT_BEFORE}
                  WHEN but_i IS NOT NULL AND i > but_i THEN {V.BUT_AFTER}
                  ELSE 1.0 END AS bm
      FROM (
        SELECT *,
               (v0 <> 0 AND pw1 IS NOT NULL AND nolex1) AS a1,
               (v0 <> 0 AND pw2 IS NOT NULL AND nolex2) AS a2,
               (v0 <> 0 AND pw3 IS NOT NULL AND nolex3) AS a3
        FROM lv
      )
    ), agg AS (
      SELECT doc_id,
             sum((((v1 + s1) * m1 + s2) * m2 + s3) * m3 * lm * bm) AS ssum
      FROM step GROUP BY doc_id
    ), fin AS (
      SELECT b.doc_id,
             coalesce(a.ssum, 0.0) AS s,
             least(length(b.text) - length(replace(b.text, '!', '')),
                   {V.EP_CAP}) * {V.EP_UNIT}
             + CASE WHEN {qm_n.replace('text', 'b.text')} > 3 THEN {V.QM_CAP}
                    WHEN {qm_n.replace('text', 'b.text')} > 1
                      THEN {qm_n.replace('text', 'b.text')} * {V.QM_UNIT}
                    ELSE 0.0 END AS pe
      FROM base b LEFT JOIN agg a USING (doc_id)
    )
    SELECT doc_id, compound,
           CASE WHEN compound >= 0.05 THEN 'positive'
                WHEN compound <= -0.05 THEN 'negative'
                ELSE 'neutral' END AS sentiment_label
    FROM (
      SELECT doc_id,
             {sql_dround(
                 "greatest(-1.0, least(1.0, s2 / sqrt(s2 * s2 + "
                 + str(V.ALPHA) + ")))", 4)} AS compound
      FROM (
        SELECT doc_id,
               CASE WHEN s > 0 THEN s + pe
                    WHEN s < 0 THEN s - pe
                    ELSE s END AS s2
        FROM fin
      )
    )
    """


@_register(
    "vader_sentiment",
    _vader_oracle_sql(),
    doc="X1 completed (r4 VERDICT 'What's missing' #3): the VADER "
    "sentiment rule engine — booster/dampener window with distance "
    "damping, negation (incl. n't contractions, 'never so/this' and "
    "'without doubt' specials), 'least' check, ALL-CAPS emphasis under "
    "cap-mix, but-clause reweighting, !/? amplification, alpha=15 "
    "normalization (Hutto & Gilbert 2014; finnhub_news.py:27-51) — as "
    "pure codegen'd array expressions, replayed token-for-token by a "
    "DuckDB window-lag oracle generated from the same constant dicts. "
    "The synthetic corpus is deterministically annotated from doc_id "
    "arithmetic (injected negation, booster+caps, '!' runs, leading "
    "but-clause) so every rule path is data-exercised in both engines. "
    "Scale: one narrow projection, no shuffle before the final hash — "
    "the per-token fold is a sequential array aggregate inside "
    "whole-stage codegen.",
    parts=8,
)
def q_vader_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.functions.vader import (  # noqa: PLC0415
        with_vader_compound,
    )

    docs = load_table(spark, sf_dir, "documents")
    docs = fan_out(docs)
    aug = F.concat(
        F.when(F.col("doc_id") % 7 == 0, F.lit("never so good but "))
        .otherwise(F.lit("")),
        F.replace(
            F.replace(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit("slow"),
                F.lit("not slow"),
            ),
            F.lit("fast"),
            F.lit("very FAST"),
        ),
        # idiom-rule exercise (r6): a dampener idiom, a caps'd
        # sentiment idiom, and a negative idiom — merged by the
        # engine's pre-tokenization pass and by the oracle's
        # generated regexp_replace chain identically
        F.when(F.col("doc_id") % 11 == 0, F.lit(" only kind of good"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" it is THE BOMB"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 17 == 0, F.lit(" yeah right"))
        .otherwise(F.lit("")),
        F.repeat(F.lit("!"), (F.col("doc_id") % 5).cast("int")),
    )
    scored = with_vader_compound(
        docs.withColumn("_aug", aug),
        "_aug",
        compound_col="compound",
        label_col="sentiment_label",
    )
    return scored.select("doc_id", "compound", "sentiment_label")


# ---------------------------------------------------------------------------
# Extension (r5) — nearest-centroid classifier: supervised train+predict
# fully under the value-hash oracle gate
# ---------------------------------------------------------------------------


@_register(
    "centroid_classifier",
    f"""
    WITH tr AS (
      SELECT label, pos, {sql_dround("embedding[pos]::DOUBLE", 4)} AS x
      FROM (
        SELECT label, embedding,
               unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings WHERE vec_id % 5 <> 0
      )
    ), cent AS (
      SELECT label, pos, {sql_dround("sum(x)", 2)} / count(*) AS c
      FROM tr GROUP BY label, pos
    ), cnorm AS (
      SELECT label, sum({sql_dround("c * c", 6)}) AS nc
      FROM cent GROUP BY label
    ), te AS (
      SELECT vec_id, actual, pos, {sql_dround("embedding[pos]::DOUBLE", 4)} AS x
      FROM (
        SELECT vec_id, label AS actual, embedding,
               unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings WHERE vec_id % 5 = 0
      )
    ), tnorm AS (
      SELECT vec_id, sum({sql_dround("x * x", 6)}) AS nt
      FROM te GROUP BY vec_id
    ), dots AS (
      SELECT te.vec_id, te.actual, cent.label AS plabel,
             sum({sql_dround("te.x * cent.c", 6)}) AS dot
      FROM te JOIN cent USING (pos)
      GROUP BY te.vec_id, te.actual, cent.label
    ), sims AS (
      SELECT d.vec_id, d.actual, d.plabel,
             {sql_dround("d.dot / sqrt(t.nt * n.nc)", 4)} AS score
      FROM dots d
      JOIN tnorm t USING (vec_id)
      JOIN cnorm n ON n.label = d.plabel
    )
    SELECT vec_id, actual AS label, plabel AS pred_label, score
    FROM sims
    QUALIFY row_number() OVER (
      PARTITION BY vec_id ORDER BY score DESC, plabel ASC) = 1
    """,
    doc="Supervised nearest-centroid (Rocchio) classifier with the "
    "ENTIRE train+predict pipeline under the value-hash oracle: "
    "deterministic 80/20 split on vec_id, per-label mean embedding "
    "as the fitted model, cosine argmax with (score DESC, label ASC) "
    "tie-break. Exactly SQL-replayable where an iteratively-fitted "
    "model is not — the engine's supervised-classification twin of "
    "label_centroids' monitoring surface. The synthetic corpus's "
    "labels are uncorrelated with embedding geometry (holdout = the "
    "0.1 random floor, same as 1-NN), so this gate pins mechanics "
    "value-exactly; learnability is proven in pytest on planted "
    "separable clusters. Scale: training shuffles (label x dim) map-"
    "partial sums; the 10x64 model broadcasts via a constant-key "
    "BroadcastHashJoin and inference is a codegen'd sequential array "
    "fold per row — no exchange in the scoring pass at 100 TB.",
    parts=8,
)
def q_centroid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.similarity import (  # noqa: PLC0415
        nearest_centroid_classify,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(emb)
    train = emb.filter(F.col("vec_id") % 5 != 0)
    test = emb.filter(F.col("vec_id") % 5 == 0)
    return nearest_centroid_classify(train, test)


# ---------------------------------------------------------------------------
# TPC-H shape completions (r5): Q7 / Q9 / Q10 / Q14 / Q20 forms
# ---------------------------------------------------------------------------


@_register(
    "nation_trade_volume",
    f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           {sql_dround("sum(l.l_extendedprice * (1 - l.l_discount))", 4)}
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping): cross-nation trade flows — "
    "supplier nation x customer nation x ship-year revenue over a "
    "two-year window, excluding domestic flows. 100 TB plan: the two "
    "nation aliases, supplier and customer broadcast; lineitem⋈orders "
    "is the only shuffle; the pushed l_shipdate range prunes the fact "
    "scan; output domain nations² x 2 years aggregates map-side.",
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        dround(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


@_register(
    "product_profit_yearly",
    f"""
    SELECT n.n_name AS nation,
           year(l.l_shipdate) AS l_year,
           {sql_dround(
               "sum(l.l_extendedprice * (1 - l.l_discount)"
               " - 0.6 * p.p_retailprice * l.l_quantity)", 4)}
             AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%rod%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-type profit): per supplier-nation, "
    "per ship-year margin on a part-name family — revenue minus a "
    "0.6 x retail-price x quantity cost proxy (the synthetic schema "
    "has no partsupp table, same adaptation as important_parts/Q11). "
    "part/supplier/nation broadcast; the name filter prunes part "
    "BEFORE the broadcast so only matching partkeys reach the probe.",
)
def q_product_profit_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%rod%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("l_shipdate").alias("l_year"))
        .agg(dround(F.sum(amount), 4).alias("profit"))
    )


@_register(
    "returned_item_customers",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           {sql_dround("sum(l.l_extendedprice * (1 - l.l_discount))", 4)}
             AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): the 20 customers "
    "who returned the most revenue in one quarter. Revenue per "
    "customer aggregates map-side after the lineitem⋈orders shuffle "
    "(returnflag + quarter filters pushed to the scans); top-20 is a "
    "TakeOrderedAndProject with the custkey tie-break, never a "
    "global sort.",
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "nation")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@_register(
    "promo_revenue_monthly",
    f"""
    SELECT date_trunc('month', l.l_shipdate) AS ship_month,
           {sql_dround(
               "100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN "
               "l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) "
               "/ sum(l.l_extendedprice * (1 - l.l_discount))", 4)}
             AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    doc="TPC-H Q14 shape (promotion effect): the PROMO-type share of "
    "revenue per ship-month across one year — the conditional-"
    "aggregate-over-total ratio form. One broadcast (part) + one "
    "map-side-combined aggregation over 12 output rows; both sums "
    "ride the same shuffled bytes.",
)
def q_promo_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            dround(100.0 * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_share_pct"
            )
        )
    )


@_register(
    "excess_rod_suppliers",
    f"""
    WITH per_supp AS (
      SELECT s.s_suppkey, s.s_name,
             {sql_dround("sum(l.l_quantity)", 4)} AS rod_qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE p.p_name LIKE '%rod%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ), thresh AS (
      SELECT {sql_dround("avg(rod_qty)", 4)} AS avg_qty FROM per_supp
    )
    SELECT ps.s_suppkey, ps.s_name, ps.rod_qty, t.avg_qty
    FROM per_supp ps, thresh t
    WHERE ps.rod_qty > t.avg_qty
    """,
    doc="TPC-H Q20 shape (excess-inventory suppliers), adapted to the "
    "partsupp-less synthetic schema: suppliers whose shipped quantity "
    "of a part-name family in one year exceeds the cross-supplier "
    "average — the aggregate-vs-aggregate-of-aggregates HAVING form. "
    "Both sides of the comparison are dround-fixed so the knife-edge "
    "supplier-equal-to-average case cannot flip across engines. The "
    "1-row threshold folds back via the data-derived constant-key "
    "BroadcastHashJoin (a bare crossJoin would plan BNLJ).",
    parts=8,
)
def q_excess_rod_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%rod%")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per_supp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(dround(F.sum("l_quantity"), 4).alias("rod_qty"))
    )
    thresh = per_supp.agg(
        dround(F.avg("rod_qty"), 4).alias("avg_qty")
    ).withColumn("__k", _const_key(F.col("avg_qty")))
    return (
        per_supp.withColumn("__k", _const_key(F.col("s_suppkey")))
        .join(F.broadcast(thresh), "__k")
        .filter(F.col("rod_qty") > F.col("avg_qty"))
        .select("s_suppkey", "s_name", "rod_qty", "avg_qty")
    )


# ---------------------------------------------------------------------------
# Streaming rung 9 (r5): sliding-window distinct users
# ---------------------------------------------------------------------------


@_register(
    "stream_sliding_distinct_batch_eq",
    """
    WITH tri AS (
      SELECT DISTINCT event_type, user_id,
             date_trunc('day', ts) AS day
      FROM events
    ), contrib AS (
      SELECT DISTINCT event_type, user_id,
             day - k.k * INTERVAL 1 DAY AS window_start
      FROM tri, (SELECT unnest(generate_series(0, 6)) AS k) k
    )
    SELECT event_type, window_start, count(DISTINCT user_id) AS n_users
    FROM contrib
    GROUP BY 1, 2
    """,
    doc="Streaming rung 9 under the ORACLE gate: trailing-7-day "
    "distinct active users per type per sliding window position — "
    "the sliding COUNT DISTINCT streaming aggregation cannot express "
    "(count(DISTINCT) is unsupported on streams, DISTINCT is not "
    "frame-mergeable). The streaming plan makes the window expansion "
    "STATELESS (each triple explodes to its <= 7 window starts) so "
    "the distinct becomes one dropDuplicates at (type, user, "
    "window_start) granularity followed by a plain window count — "
    "expand-then-dedup, because dedup-at-day-then-count counts a "
    "user once per active day (measured wrong on the first "
    "prototype). Re-landed parquet, availableNow replay, complete "
    "mode to a memory sink, hash-compared against the batch "
    "generate_series oracle. Sibling of the exact batch twin "
    "sliding_distinct_users_7d (which also prunes phantom window "
    "ends) and the mergeable-sketch answer hll_partial_rollup.",
    parts=8,
)
def q_stream_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile  # noqa: PLC0415
    import uuid  # noqa: PLC0415

    from yahoofinancedatalake_spark.streaming.ops import (  # noqa: PLC0415
        stream_sliding_distinct,
    )

    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    work = tempfile.mkdtemp(prefix="stream_slide_eq_")
    src = f"{work}/events"
    batch.repartition(4).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    name = f"s_slide_eq_{uuid.uuid4().hex[:8]}"
    with _scoped_shuffle(spark, 8):
        q = (
            stream_sliding_distinct(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", f"{work}/ck")
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q)
    return spark.table(name)


@_register(
    "revenue_delta_q6",
    f"""
    SELECT {sql_dround(
        "sum(l_extendedprice * l_discount)", 4)} AS revenue_delta,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): the pure scan-and-"
    "aggregate — three pushed predicates (year range, discount band, "
    "quantity cap), no join, one global sum. The plan IS the "
    "benchmark: every filter must reach the parquet scan "
    "(PushedFilters), the aggregation is a two-phase partial, and "
    "the exchange carries exactly one row per task.",
    parts=8,
)
def q_revenue_delta_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@_register(
    "cheapest_supplier_per_part",
    f"""
    WITH offers AS (
      SELECT l.l_partkey, l.l_suppkey,
             {sql_dround("min(l.l_extendedprice / l.l_quantity)", 4)}
               AS unit_price
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND l.l_quantity > 0
      GROUP BY 1, 2
    )
    SELECT p.p_partkey, p.p_name, o.l_suppkey AS s_suppkey, o.unit_price
    FROM offers o
    JOIN part p ON o.l_partkey = p.p_partkey
    WHERE p.p_size >= 30
    QUALIFY row_number() OVER (
      PARTITION BY o.l_partkey
      ORDER BY o.unit_price ASC, o.l_suppkey ASC) = 1
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier): for each large part, "
    "the ASIA-region supplier offering the lowest observed unit "
    "price — the correlated-min subquery form, executed as an argmin "
    "window over per-(part, supplier) offers (the schema has no "
    "partsupp; lineitem unit prices stand in, same adaptation as "
    "Q9/Q11/Q16/Q20). Region/nation/supplier/part broadcast; the "
    "one shuffle is the (part, supplier) offer aggregation, and the "
    "argmin rides the same partitioning with a deterministic "
    "suppkey tie-break.",
    parts=8,
)
def q_cheapest_supplier_per_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nat = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 0
    ).select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") >= 30
    ).select("p_partkey", "p_name")
    offers = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            dround(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4
            ).alias("unit_price")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_price").asc(), F.col("l_suppkey").asc()
    )
    return (
        offers.join(F.broadcast(part), offers.l_partkey == part.p_partkey)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            F.col("l_suppkey").alias("s_suppkey"),
            "unit_price",
        )
    )


@_register(
    "late_lines_by_flag",
    """
    SELECT l.l_returnflag,
           count(*) FILTER (
             WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
           ) AS high_line_count,
           count(*) FILTER (
             WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           ) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape (shipping-mode line counts), adapted to the "
    "schema: l_returnflag stands in for the absent l_shipmode, and "
    "'shipped >30 days after order date' stands in for the absent "
    "commit/receipt-date lateness predicate (same adaptation family "
    "as Q2/Q9/Q11). The shape under test: a fact-fact equi-join on "
    "orderkey carrying a residual NON-equi predicate "
    "(shipdate > orderdate + 30d) — Catalyst must keep the hash "
    "join on the equi key and apply the comparison as a post-join "
    "filter, never degrade to a nested-loop — plus the pivoted "
    "conditional counts (count-FILTER, Spark count(when)), which "
    "map-side combine into 3 groups so the final exchange is 3 "
    "rows. The one-year shipdate range is pushed into the lineitem "
    "scan. At 100 TB both facts bucket by orderkey and the join is "
    "co-partitioned, identical to late_shipment_priority's layout.",
)
def q_late_lines_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    # The non-equi lateness predicate needs o_orderdate, so it rides
    # the join as a residual condition next to the equi key.
    orders_full = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders_full,
            (li.l_orderkey == orders_full.o_orderkey)
            & (
                li.l_shipdate
                > orders_full.o_orderdate + F.expr("INTERVAL 30 DAYS")
            ),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Extension (r5): distributed Lloyd k-means rounds under the oracle gate
# ---------------------------------------------------------------------------


def _kmeans_oracle_sql(k: int = 5, rounds: int = 2) -> str:
    sq = sql_dround("(c.x - t.c) * (c.x - t.c)", 6)
    parts = [
        f"""
    WITH comp AS (
      SELECT vid, pos, {sql_dround("embedding[pos]::DOUBLE", 4)} AS x
      FROM (
        SELECT vec_id AS vid, embedding,
               unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings
      )
    ), seeds AS (
      SELECT vid, rn - 1 AS cluster FROM (
        SELECT vid, row_number() OVER (ORDER BY vid ASC) AS rn
        FROM (SELECT DISTINCT vec_id AS vid FROM embeddings)
      ) WHERE rn <= {k}
    ), c0 AS (
      SELECT s.cluster, c.pos, c.x AS c, CAST(0 AS BIGINT) AS n_members
      FROM comp c JOIN seeds s USING (vid)
    )"""
    ]
    prev = "c0"
    for i in range(1, rounds + 1):
        parts.append(f""", d{i} AS (
      SELECT c.vid, t.cluster,
             {sql_dround(f"sum({sq})", 4)} AS d
      FROM comp c JOIN {prev} t USING (pos)
      GROUP BY c.vid, t.cluster
    ), a{i} AS (
      SELECT vid, cluster FROM (
        SELECT vid, cluster, row_number() OVER (
          PARTITION BY vid ORDER BY d ASC, cluster ASC) AS rn
        FROM d{i}
      ) WHERE rn = 1
    ), c{i} AS (
      SELECT a.cluster, c.pos,
             {sql_dround("sum(c.x)", 2)} / count(*) AS c,
             count(*) AS n_members
      FROM comp c JOIN a{i} a USING (vid)
      GROUP BY a.cluster, c.pos
    )""")
        prev = f"c{i}"
    parts.append(f"""
    SELECT cluster, pos, c AS centroid, n_members FROM {prev}
    """)
    return "".join(parts)


@_register(
    "kmeans_lloyd_gate",
    _kmeans_oracle_sql(),
    doc="Distributed Lloyd k-means (k=5, 2 rounds) with EVERY "
    "iteration under the value-hash oracle: deterministic seeding "
    "(the k smallest ids' vectors), assignment as a squared-L2 "
    "argmin window with a cluster tie-break, update as fixed-point "
    "group means — the iterative-algorithm pattern as pure "
    "DataFrame ops, exactly replayed by a generated chain of "
    "per-round SQL CTEs. Contrast with the FAISS-placement "
    "driver-side trainer the IVF index uses (capped sample, "
    "kmeans_centroids): THIS is the full-corpus refinement shape — "
    "per round one (vec, cluster) distance aggregation against "
    "broadcast centroids and one (cluster, pos) mean, both "
    "map-side combined, no driver collect anywhere.",
    parts=8,
)
def q_kmeans_lloyd_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.similarity import (  # noqa: PLC0415
        kmeans_lloyd_rounds,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(emb)
    return kmeans_lloyd_rounds(emb, k=5, rounds=2)


def _semantic_dedup_oracle_sql(
    k: int = 8, rounds: int = 1, tau: float = 0.45
) -> str:
    """Replay of semantic_dedup: the kmeans CTE chain up to the
    post-``rounds`` centroids, one more assignment argmin against
    them, then within-cluster exact-cosine pairs and the
    keep-smallest-id survivor rule."""
    sq = sql_dround("(c.x - t.c) * (c.x - t.c)", 6)
    parts = [f"""
    WITH comp AS (
      SELECT vid, pos, {sql_dround("embedding[pos]::DOUBLE", 4)} AS x
      FROM (
        SELECT vec_id AS vid, embedding,
               unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings
      )
    ), seeds AS (
      SELECT vid, rn - 1 AS cluster FROM (
        SELECT vid, row_number() OVER (ORDER BY vid ASC) AS rn
        FROM (SELECT DISTINCT vec_id AS vid FROM embeddings)
      ) WHERE rn <= {k}
    ), c0 AS (
      SELECT s.cluster, c.pos, c.x AS c
      FROM comp c JOIN seeds s USING (vid)
    )"""]
    prev = "c0"
    for i in range(1, rounds + 1):
        parts.append(f""", d{i} AS (
      SELECT c.vid, t.cluster,
             {sql_dround(f"sum({sq})", 4)} AS d
      FROM comp c JOIN {prev} t USING (pos)
      GROUP BY c.vid, t.cluster
    ), a{i} AS (
      SELECT vid, cluster FROM (
        SELECT vid, cluster, row_number() OVER (
          PARTITION BY vid ORDER BY d ASC, cluster ASC) AS rn
        FROM d{i}
      ) WHERE rn = 1
    ), c{i} AS (
      SELECT a.cluster, c.pos,
             {sql_dround("sum(c.x)", 2)} / count(*) AS c
      FROM comp c JOIN a{i} a USING (vid)
      GROUP BY a.cluster, c.pos
    )""")
        prev = f"c{i}"
    cos = sql_dround(
        "list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(b.v, b.v)))",
        4,
    )
    parts.append(f""", da AS (
      SELECT c.vid, t.cluster,
             {sql_dround(f"sum({sq})", 4)} AS d
      FROM comp c JOIN {prev} t USING (pos)
      GROUP BY c.vid, t.cluster
    ), aa AS (
      SELECT vid, cluster FROM (
        SELECT vid, cluster, row_number() OVER (
          PARTITION BY vid ORDER BY d ASC, cluster ASC) AS rn
        FROM da
      ) WHERE rn = 1
    ), vecs AS (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    ), prs AS (
      SELECT la.cluster, la.vid AS id_a, lb.vid AS id_b
      FROM aa la JOIN aa lb
        ON la.cluster = lb.cluster AND la.vid < lb.vid
    ), sims AS (
      SELECT p.cluster, p.id_a, p.id_b, {cos} AS cos
      FROM prs p
      JOIN vecs a ON p.id_a = a.vid
      JOIN vecs b ON p.id_b = b.vid
    ), dups AS (
      SELECT DISTINCT id_b AS vid FROM sims WHERE cos >= {tau}
    )
    SELECT aa.cluster,
           count(*) AS n_members,
           count(d.vid) AS n_dups,
           count(*) FILTER (WHERE d.vid IS NULL) AS n_survivors,
           sum(CASE WHEN d.vid IS NULL THEN aa.vid ELSE 0 END)::BIGINT
             AS survivor_id_sum
    FROM aa LEFT JOIN dups d USING (vid)
    GROUP BY aa.cluster
    ORDER BY aa.cluster
    """)
    return "".join(parts)


@_register(
    "semantic_dedup",
    _semantic_dedup_oracle_sql(),
    doc="SemDeDup-style semantic deduplication (Abbas et al. 2023): "
    "k-means clusters the embedding space (k=8, 1 Lloyd round, the "
    "oracle-replayed kmeans_lloyd_rounds), every vector is assigned "
    "to its nearest final centroid, and exact-cosine near-dup pairs "
    "(>= 0.45 on this testdata — its strongest pairs sit near 0.5) "
    "are found ONLY within clusters: learned-structure blocking in "
    "the same role as LSH bands, turning all-pairs into per-cluster "
    "blocks. Survivor rule is deterministic keep-smallest-id so the "
    "oracle replays decisions exactly. Per-cluster rollup "
    "(members/dups/survivors/survivor-id checksum) keeps the gated "
    "output small while hashing every decision. At 100 TB: k scales "
    "with the corpus (the paper runs k~11k on LAION) so cluster "
    "blocks stay bounded; the clustered table buckets by cluster id "
    "and the pair cosine is Arrow-batched on candidates only.",
    parts=8,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.similarity import (  # noqa: PLC0415
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(emb)
    return semantic_dedup(emb, k=8, rounds=1, threshold=0.45)


def _mmr_oracle_sql(
    k_candidates: int = 20,
    k_select: int = 5,
    lam: float = 0.7,
    n_queries: int = 3,
) -> str:
    """Replay of mmr_rerank: brute-force top-k_candidates retrieval,
    then the greedy rounds unrolled as CTEs (the kmeans convention)."""
    rel = sql_dround(
        "list_dot_product(q.qv, e.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(q.qv, q.qv))"
        " * sqrt(list_dot_product(e.embedding::DOUBLE[],"
        " e.embedding::DOUBLE[])))",
        4,
    )
    paircos = sql_dround(
        "list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(b.v, b.v)))",
        4,
    )
    s1_score = sql_dround(f"{lam} * rel", 4)
    parts = [f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {n_queries}
    ), vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cand AS (
      SELECT query_id, neighbor_id, rel FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id, {rel} AS rel
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id <> q.query_id
      )
      QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY rel DESC, neighbor_id ASC) <= {k_candidates}
    ), s1 AS (
      SELECT query_id, neighbor_id, 1 AS rank, {s1_score} AS score
      FROM cand
      QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY {s1_score} DESC, neighbor_id ASC) = 1
    ), sel1 AS (SELECT * FROM s1)"""]
    for r in range(2, k_select + 1):
        score = sql_dround(f"{lam} * rel - {1.0 - lam} * maxsim", 4)
        parts.append(f""", rem{r} AS (
      SELECT c.* FROM cand c
      LEFT JOIN sel{r - 1} s
        ON s.query_id = c.query_id AND s.neighbor_id = c.neighbor_id
      WHERE s.neighbor_id IS NULL
    ), m{r} AS (
      SELECT rm.query_id, rm.neighbor_id, rm.rel,
             max({paircos}) AS maxsim
      FROM rem{r} rm
      JOIN sel{r - 1} s ON s.query_id = rm.query_id
      JOIN vecs a ON a.vec_id = rm.neighbor_id
      JOIN vecs b ON b.vec_id = s.neighbor_id
      GROUP BY rm.query_id, rm.neighbor_id, rm.rel
    ), s{r} AS (
      SELECT query_id, neighbor_id, {r} AS rank, {score} AS score
      FROM m{r}
      QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY {score} DESC, neighbor_id ASC) = 1
    ), sel{r} AS (
      SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM s{r}
    )""")
    parts.append(f"""
    SELECT query_id, rank, neighbor_id AS selected_id, score
    FROM sel{k_select}
    ORDER BY query_id, rank
    """)
    return "".join(parts)


@_register(
    "mmr_rerank",
    _mmr_oracle_sql(),
    doc="Maximal Marginal Relevance diversified retrieval (Carbonell "
    "& Goldstein 1998): exact top-20 cosine retrieval for 3 query "
    "vectors, then 5 greedy rounds selecting "
    "argmax[0.7*rel - 0.3*max-sim-to-selected] — the RAG-serving "
    "diversity op, and the retrieval-side twin of semantic_dedup "
    "(keep near-dups out of one result list instead of out of the "
    "corpus). Greedy rounds unroll into SQL CTEs exactly like the "
    "Lloyd k-means rounds, so every selection decision is under the "
    "value hash. Scale: iteration state is k_select rows per query "
    "(broadcast-sized by construction); only the initial retrieval "
    "touches the corpus (skew-salted two-phase top-k); each round "
    "is JVM-expression work over <=100 pairs per query.",
    parts=8,
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.similarity import (  # noqa: PLC0415
        mmr_rerank,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(emb)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return mmr_rerank(queries, emb, k_candidates=20, k_select=5, lam=0.7)


@_register(
    "weighted_sample_es",
    f"""
    SELECT source, doc_id, n_chars, sample_rank FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY k ASC, doc_id ASC
             ) AS sample_rank
      FROM (
        SELECT source, doc_id, n_chars,
               {sql_dround(
                   "-ln(((('0x' || substr(md5(doc_id::VARCHAR"
                   " || ':' || source), 1, 8))::UBIGINT) + 0.5)"
                   " / 4294967296.0) / n_chars::DOUBLE", 6)} AS k
        FROM documents
        WHERE n_chars > 0
      )
    )
    WHERE sample_rank <= 5
    ORDER BY source, sample_rank
    """,
    doc="Training-data op: deterministic weighted sampling without "
    "replacement per stratum — the Efraimidis-Spirakis A-ES "
    "one-pass reservoir (keep the m smallest ``-ln(u)/w`` keys; "
    "here w = n_chars, so longer documents are proportionally more "
    "likely to be kept, the standard size/quality-weighted "
    "subsampling step in corpus mixing). The uniform u is derived "
    "from md5(doc_id:source) (first 8 hex chars -> integer / 2^32, "
    "the pack's content-hash idiom), so re-runs, retries, and both "
    "engines draw the IDENTICAL sample — seeded-rand() sampling "
    "cannot give that cross-engine determinism guarantee. At 100 TB "
    "the key is a scan expression and the per-stratum top-m is a "
    "bounded window (never a global sort): exactly a groupwise "
    "top-k, the same shape as top_flop's TakeOrderedAndProject "
    "family.",
)
def q_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("source"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    k = dround(-F.log(u) / F.col("n_chars").cast("double"), 6)
    w = Window.partitionBy("source").orderBy(
        F.col("k").asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("source", "doc_id", "n_chars", k.alias("k"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 5)
        .select("source", "doc_id", "n_chars", "sample_rank")
        .orderBy("source", "sample_rank")
    )


@_register(
    "label_align_filter",
    f"""
    WITH comp AS (
      SELECT vec_id AS vid, label, pos,
             {sql_dround("embedding[pos]::DOUBLE", 4)} AS x
      FROM (
        SELECT vec_id, label, embedding,
               unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings
      )
    ), cent AS (
      SELECT label, pos, {sql_dround("sum(x)", 2)} / count(*) AS c
      FROM comp GROUP BY label, pos
    ), cn AS (
      SELECT label, sum({sql_dround("c * c", 6)}) AS n2c
      FROM cent GROUP BY label
    ), v AS (
      SELECT comp.vid, comp.label,
             sum({sql_dround("comp.x * cent.c", 6)}) AS dot,
             sum({sql_dround("comp.x * comp.x", 6)}) AS n2v
      FROM comp
      JOIN cent ON comp.label = cent.label AND comp.pos = cent.pos
      GROUP BY comp.vid, comp.label
    ), scored AS (
      SELECT v.label,
             {sql_dround("v.dot / sqrt(v.n2v * cn.n2c)", 4)} AS cos
      FROM v JOIN cn USING (label)
    )
    SELECT label,
           count(*) AS n,
           count(*) FILTER (WHERE cos < 0.0) AS n_misaligned,
           {sql_dround(sql_dround("sum(cos)", 4) + " / count(*)", 4)}
             AS mean_cos
    FROM scored
    GROUP BY label
    ORDER BY label
    """,
    doc="Training-data op: label-alignment filtering, the CLIP-score "
    "filter analog for labeled embeddings — every vector's cosine "
    "to ITS OWN label's centroid; vectors below threshold (0.0 "
    "here: ~10% of this testdata, whose labels are intentionally "
    "noisy) are the mislabeled/noisy-pair candidates a multimodal "
    "pipeline drops before training. Composes the label_centroids "
    "aggregation with a component-space cosine (products "
    "dround(6)-fixed before their sums, the fixed-point rule), so "
    "the whole filter is two map-side-combined aggregations plus a "
    "broadcast of the label x dim centroid table — no corpus "
    "shuffle beyond the (label,pos) partial-sum exchange. Per-label "
    "rollup (n / n_misaligned / mean alignment) is the "
    "drift-monitorable gate output.",
    parts=8,
)
def q_label_align_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(emb)
    comp = emb.select(
        F.col("vec_id").alias("vid"),
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos0", "x0"
        ),
    ).select(
        "vid",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        dround(F.col("x0"), 4).alias("x"),
    )
    cent = comp.groupBy("label", "pos").agg(
        (dround(F.sum("x"), 2) / F.count(F.lit(1))).alias("c")
    )
    cn = cent.groupBy("label").agg(
        F.sum(dround(F.col("c") * F.col("c"), 6)).alias("n2c")
    )
    v = (
        comp.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vid", "label")
        .agg(
            F.sum(dround(F.col("x") * F.col("c"), 6)).alias("dot"),
            F.sum(dround(F.col("x") * F.col("x"), 6)).alias("n2v"),
        )
    )
    scored = v.join(F.broadcast(cn), "label").select(
        "label",
        dround(
            F.col("dot") / F.sqrt(F.col("n2v") * F.col("n2c")), 4
        ).alias("cos"),
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("cos") < 0.0, 1)).alias("n_misaligned"),
            (dround(F.sum(dround(F.col("cos"), 4)), 4) / F.count(F.lit(1)))
            .alias("mean_cos_raw"),
        )
        .select(
            "label",
            "n",
            "n_misaligned",
            dround(F.col("mean_cos_raw"), 4).alias("mean_cos"),
        )
        .orderBy("label")
    )


def _pagerank_oracle_sql(rounds: int = 2) -> str:
    """Replay of pagerank_bipartite: per-round contribution sums as
    chained CTEs (the kmeans/MMR unrolling convention)."""
    r0 = sql_dround("1.0 / n", 8)
    contrib = sql_dround("r.rank / r.deg", 8)
    parts = [f"""
    WITH pairs AS (
      SELECT DISTINCT 'u:' || user_id::VARCHAR AS u,
                      'e:' || event_type AS e
      FROM events
    ), edges AS (
      SELECT u AS src, e AS dst FROM pairs
      UNION ALL
      SELECT e AS src, u AS dst FROM pairs
    ), deg AS (
      SELECT src AS node, count(*) AS deg FROM edges GROUP BY src
    ), tot AS (
      SELECT count(*) AS n FROM deg
    ), r0 AS (
      SELECT node, deg, n, {r0} AS rank FROM deg CROSS JOIN tot
    )"""]
    prev = "r0"
    for i in range(1, rounds + 1):
        newrank = sql_dround("0.15 / d.n + 0.85 * coalesce(c.s, 0)", 8)
        parts.append(f""", c{i} AS (
      SELECT e.dst AS node, sum({contrib}) AS s
      FROM {prev} r JOIN edges e ON e.src = r.node
      GROUP BY e.dst
    ), r{i} AS (
      SELECT d.node, d.deg, d.n, {newrank} AS rank
      FROM {prev} d LEFT JOIN c{i} c USING (node)
    )""")
        prev = f"r{i}"
    parts.append(f"""
    SELECT node, rank FROM (
      SELECT node, rank FROM {prev} WHERE node LIKE 'e:%'
      UNION ALL
      SELECT node, rank FROM (
        SELECT node, rank FROM {prev} WHERE node LIKE 'u:%'
        ORDER BY rank DESC, node ASC LIMIT 10
      )
    )
    ORDER BY rank DESC, node ASC
    """)
    return "".join(parts)


@_register(
    "pagerank_bipartite",
    _pagerank_oracle_sql(),
    doc="Graph analytics: 2 power-iteration PageRank rounds (d=0.85) "
    "over the user <-> event-type bipartite interaction graph "
    "(distinct (user, type) pairs, edges in both directions so no "
    "dangling nodes), every round under the value hash via the "
    "kmeans/MMR CTE-unrolling convention — the third iterative "
    "family next to Lloyd refinement and connected components. "
    "Plan per round: ranks join edges on the source key (at 100 TB "
    "both sides bucket by node id, co-partitioned), contributions "
    "map-side combine into the destination sum, the 1-row node "
    "count folds in via the data-derived constant-key "
    "BroadcastHashJoin — never a driver collect of the rank vector. "
    "Output: all event-type hubs plus the top-10 user nodes "
    "(deterministic rank/node tie-break).",
    parts=8,
)
def q_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    pairs = ev.distinct().select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("e:"), F.col("event_type")).alias("e"),
    )
    edges = pairs.select(
        F.col("u").alias("src"), F.col("e").alias("dst")
    ).unionByName(
        pairs.select(F.col("e").alias("src"), F.col("u").alias("dst"))
    ).persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    tot = deg.agg(F.count(F.lit(1)).alias("n")).withColumn(
        "__k", _const_key(F.col("n"))
    )
    nodes = (
        deg.withColumnRenamed("src", "node")
        .withColumn("__k", _const_key(F.col("node")))
        .join(F.broadcast(tot), "__k")
        .drop("__k")
    )
    ranks = nodes.select(
        "node", "deg", "n", dround(F.lit(1.0) / F.col("n"), 8).alias("rank")
    )
    for _ in range(2):
        contrib = ranks.join(
            edges, ranks.node == edges.src
        ).select(
            F.col("dst").alias("dnode"),
            dround(F.col("rank") / F.col("deg"), 8).alias("c"),
        )
        summed = contrib.groupBy("dnode").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, nodes.node == summed.dnode, "left")
            .select(
                "node",
                "deg",
                "n",
                dround(
                    F.lit(0.15) / F.col("n")
                    + F.lit(0.85)
                    * F.coalesce(F.col("s"), F.lit(0.0)),
                    8,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    hubs = ranks.filter(F.col("node").startswith("e:")).select(
        "node", "rank"
    )
    top_users = (
        ranks.filter(F.col("node").startswith("u:"))
        .select("node", "rank")
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(10)
    )
    return hubs.unionByName(top_users).orderBy(
        F.col("rank").desc(), F.col("node").asc()
    )


@_register(
    "rolling_median_15",
    f"""
    WITH med AS (
      SELECT user_id,
             quantile_cont(value::DOUBLE, 0.5) OVER (
               PARTITION BY user_id
               ORDER BY ts NULLS LAST, event_id NULLS LAST
               ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS m
      FROM events
    )
    SELECT user_id,
           {sql_dround(sql_dround("sum(" + sql_dround("m", 4) + ")", 2)
                       + " / count(*)", 4)} AS mean_med,
           {sql_dround("max(m)", 4)} AS max_med,
           count(*) AS n
    FROM med
    GROUP BY user_id
    """,
    doc="Trailing 15-row exact rolling MEDIAN per user — the order-"
    "statistic window the rolling mean/corr family cannot express "
    "(median is not algebraic: no partial-aggregate trick exists, "
    "the frame must be re-ranked per row, which is why engines ship "
    "it as a dedicated windowed ordered-set aggregate). Spark's "
    "exact interpolated percentile() and DuckDB's quantile_cont "
    "agree bit-for-bit on the same frame; every one of the ~N "
    "windowed medians is pinned through a per-user fixed-point "
    "summary (medians dround(4)-fixed before the sum — the "
    "fixed-point-before-sum rule). Frame order is (ts, event_id) — "
    "ts alone ties. Scale: one user-key exchange, then the window "
    "sorts partition-locally; state is the 15-row frame.",
    parts=8,
)
def q_rolling_median_15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("value").cast("double").alias("v")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
        )
        .rowsBetween(-14, 0)
    )
    med = ev.select(
        "user_id",
        F.percentile(F.col("v"), F.lit(0.5)).over(w).alias("m"),
    )
    return med.groupBy("user_id").agg(
        dround(
            dround(F.sum(dround(F.col("m"), 4)), 2) / F.count(F.lit(1)), 4
        ).alias("mean_med"),
        dround(F.max("m"), 4).alias("max_med"),
        F.count(F.lit(1)).alias("n"),
    )


