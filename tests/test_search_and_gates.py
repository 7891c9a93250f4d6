"""Tests for the round-3 additions: ranked full-text search, the ANN
recall correctness gates, the HLL bounds oracle, and IVF multi-assign.

The engine twins of the reference's analyzed ES text fields + saved
searches (scripts/indexing/to_elasticsearch.py:122-129,
kibana/kibana_saved_objects.ndjson:5,10) — ranked retrieval, not just
containment filtering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from yahoofinancedatalake_spark.queries.pack import QUERIES, _SEARCH_TERMS


def test_text_search_rank_orders_and_bounds(spark):
    rows = QUERIES["text_search_rank"].spark(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # n_terms counts DISTINCT matched query terms per doc
    assert all(1 <= r.n_terms <= len(_SEARCH_TERMS) for r in rows)


def test_text_search_rank_scores_match_manual_tfidf(spark):
    """Recompute the winning doc's score from raw tf/df counts."""
    import math

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    toks_col = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), "[^a-z0-9']+"),
        lambda t: t != "",
    )
    toks = docs.select("doc_id", toks_col.alias("toks")).cache()
    n_docs = toks.count()
    idf_fix = {}
    for t in _SEARCH_TERMS:
        df = toks.filter(F.array_contains("toks", t)).count()
        idf_fix[t] = math.floor(
            (math.log((n_docs + 1) / (df + 1)) + 1) * 1_000_000 + 0.5
        )
    top = QUERIES["text_search_rank"].spark(spark, SF_SMALL).collect()[0]
    tf = {
        r.term: r.tf
        for r in toks.filter(F.col("doc_id") == top.doc_id)
        .select(F.explode("toks").alias("term"))
        .filter(F.col("term").isin(_SEARCH_TERMS))
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
        .collect()
    }
    expected = sum(tf[t] * idf_fix[t] for t in tf) / 1_000_000.0
    assert abs(top.score - expected) < 1e-9
    assert top.n_terms == len(tf)
    toks.unpersist()


def test_ann_and_ivf_recall_gates_pass(spark):
    # sf0.01 — the scale the driver's correctness gate runs at. (At
    # sf0.001 the corpus is so small that true top-5 neighbors sit at
    # much lower cosine, where LSH collision probability drops — the
    # 0.99/0.95 thresholds are calibrated for the gate scale.)
    for name in ("ann_recall", "ivf_recall", "pq_recall"):
        rows = QUERIES[name].spark(spark, "/root/testdata/sf0.01").collect()
        assert len(rows) == 1
        assert rows[0].passed is True, name


def test_approx_distinct_within_hll_bounds(spark):
    rows = QUERIES["approx_distinct_per_day"].spark(spark, SF_SMALL).collect()
    assert rows and all(r.within_bounds for r in rows)


def test_ivf_multi_assign_candidates_superset(spark):
    """With identical centroids (same seed/sample), posting each corpus
    vector under its 2 nearest clusters can only ADD candidate pairs
    vs n_assign=1 — so recall vs brute force is monotone in n_assign."""
    from yahoofinancedatalake_spark.operators.similarity import (
        brute_force_cosine_topk,
        ivf_cosine_topk,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_cosine_topk(
            queries, emb, k=5, id_col="vec_id", vec_col="embedding"
        ).collect()
    }

    def recall(n_assign: int) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_cosine_topk(
                queries,
                emb,
                k=5,
                n_centroids=8,
                n_probe=2,
                n_assign=n_assign,
                seed=11,
            ).collect()
        }
        return len(truth & got) / len(truth)

    assert recall(2) >= recall(1)


def test_stream_daily_avg_gate_matches_batch(spark):
    stream_rows = {
        tuple(r)
        for r in QUERIES["stream_daily_avg_batch_eq"]
        .spark(spark, SF_SMALL)
        .collect()
    }
    from yahoofinancedatalake_spark.catalog import load_table
    from yahoofinancedatalake_spark.functions.scalars import dround

    ev = load_table(spark, SF_SMALL, "events")
    batch_rows = {
        tuple(r)
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
        )
        .agg(
            (dround(F.sum("value"), 2) / F.count(F.lit(1))).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert stream_rows == batch_rows
