"""Dedup ladder tests: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.operators.dedup import (
    exact_dedup,
    hamming64,
    minhash_lsh_pairs,
    ngram_jaccard,
    shingles,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the afternoon sun and everything is calm"
)
NEAR = BASE.replace("afternoon", "evening")  # one-word change → near-dup
FAR = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines today"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, "  THE  quick brown fox jumps over the lazy dog "
                           "while the cat watches from a warm windowsill in "
                           "the afternoon sun and everything is calm"),
            (3, NEAR), (4, FAR)]
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_dedup_normalizes_case_and_whitespace(docs):
    kept = exact_dedup(docs, "text", "id")
    ids = sorted(r.id for r in kept.collect())
    assert ids == [1, 3, 4]  # 2 is a case/whitespace dup of 1


def test_shingles_small_and_empty(spark):
    df = spark.createDataFrame([("a b",), ("",)], "t string")
    out = df.select(shingles(F.col("t"), 3).alias("s")).collect()
    assert out[0].s == ["a b"]  # shorter than n → whole text
    assert out[1].s == []


def test_minhash_lsh_finds_near_dup_not_far(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "text", "id", n_hashes=32,
                                   n_bands=16).collect()
    }
    assert (1, 3) in pairs or (1, 2) in pairs  # near-dups collide
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_simhash_hamming_orders_similarity(spark):
    df = spark.createDataFrame(
        [(1, BASE), (3, NEAR), (4, FAR)], "id long, text string"
    )
    fp = df.select("id", simhash64(F.col("text")).alias("h"))
    a = fp.alias("a")
    b = fp.alias("b")
    d = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            hamming64(F.col("a.h"), F.col("b.h")).alias("ham"),
        )
        .collect()
    )
    dist = {(r.ia, r.ib): r.ham for r in d}
    assert dist[(1, 3)] < dist[(1, 4)]
    assert dist[(1, 3)] < dist[(3, 4)]


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = spark.createDataFrame([(1, 3), (1, 4)], "id_a long, id_b long")
    out = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard(pairs, docs, "id", "text").collect()}
    assert out[(1, 3)] > 0.7  # one-word change in a 23-word doc
    assert out[(1, 4)] == 0.0
