"""Triangle census + prefix-filter Jaccard unit gates."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from yahoofinancedatalake_spark.operators.dedup import (
    ngram_jaccard,
    prefix_filter_jaccard_pairs,
    shingles,
)
from yahoofinancedatalake_spark.operators.graph import triangle_stats


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long"
    )


def test_triangle_k4(spark):
    """K4: 4 triangles, 6 edges, C(3,2)*4=12 wedges, clustering 1."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = triangle_stats(_edges(spark, k4)).collect()[0]
    assert row.n_nodes == 4
    assert row.n_edges == 6
    assert row.n_wedges == 12
    assert row.n_triangles == 4
    assert row.global_clustering == 1.0


def test_triangle_star_and_cycle_have_none(spark):
    """A star (hub wedge-heavy) and a 5-cycle are triangle-free —
    the star also exercises the skew case the orientation exists
    for: its hub must not become the apex of any wedge pair that
    gets enumerated as closed."""
    star = [(0, i) for i in range(1, 8)]
    row = triangle_stats(_edges(spark, star)).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 21  # C(7,2) at the hub
    assert row.global_clustering == 0.0
    cycle = [(i, i + 1) for i in range(4)] + [(0, 4)]
    row = triangle_stats(_edges(spark, cycle)).collect()[0]
    assert row.n_triangles == 0


def test_triangle_two_sharing_an_edge(spark):
    """Diamond (two triangles glued on an edge) counts exactly 2 —
    each triangle once, regardless of which endpoint orients apex."""
    diamond = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    row = triangle_stats(_edges(spark, diamond)).collect()[0]
    assert row.n_triangles == 2


def _brute_force_pairs(spark, docs, t):
    ids = docs.select(F.col("doc_id").alias("id_a"))
    pairs = ids.join(
        docs.select(F.col("doc_id").alias("id_b")),
        F.col("id_a") < F.col("id_b"),
    )
    return {
        (r.id_a, r.id_b)
        for r in ngram_jaccard(pairs, docs, "doc_id", "text", 3)
        .filter(F.col("jaccard") >= t)
        .collect()
    }


def test_prefix_filter_is_lossless(spark):
    """Candidates ⊇ all true pairs at the threshold (the WWW'07
    losslessness theorem), including near-identical, disjoint, and
    shared-rare-token docs."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " today"),                      # near-dup of 1
        (3, base.replace("quick", "slow")),        # mid similarity
        (4, "completely different content about spark shuffles"),
        (5, "completely different content about spark shuffles"),  # dup of 4
        (6, "unrelated text sharing zero shingles with anything"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.6
    cand = {
        (r.id_a, r.id_b)
        for r in prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", threshold=t
        ).collect()
    }
    truth = _brute_force_pairs(spark, docs, t)
    assert truth, "fixture must plant at least one qualifying pair"
    assert truth <= cand
    # and verification yields exactly the truth
    cand_df = spark.createDataFrame(
        [(a, b) for a, b in sorted(cand)], "id_a long, id_b long"
    )
    verified = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard(cand_df, docs, "doc_id", "text", 3)
        .filter(F.col("jaccard") >= t)
        .collect()
    }
    assert verified == truth


def test_ppjoin_filters_lossless_on_skewed_lengths(spark):
    """The r6 PPJoin length+positional filters must stay lossless on
    adversarial shapes: doc lengths spanning the length-filter
    boundary (ratios just above and below t) and heavy shared-token
    overlap where the positional bound is tight. Randomized (seeded)
    docs from a tiny vocabulary maximize collisions."""
    import random

    rng = random.Random(43)
    vocab = [f"w{i}" for i in range(18)]
    rows = []
    for i in range(60):
        n = rng.choice([7, 9, 12, 15, 24])  # skewed lengths
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plus planted near-dups at both length extremes
    rows.append((100, rows[0][1] + " w0"))
    rows.append((101, rows[59][1]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.5, 0.8):
        truth = _brute_force_pairs(spark, docs, t)
        cand = {
            (r.id_a, r.id_b)
            for r in prefix_filter_jaccard_pairs(
                docs, "text", "doc_id", threshold=t
            ).collect()
        }
        assert truth <= cand, (t, truth - cand)
    assert truth  # the planted dup qualifies even at 0.8


def test_prefix_length_integer_exact(spark):
    """IEEE ceil(0.8*5)=5 would shorten the prefix to 1 token and can
    drop pairs; the integer-ratio arithmetic must keep L = m -
    ceil(t*m) + 1 = 2 for m=5, t=0.8 — verified end-to-end with two
    5-shingle docs that qualify exactly at the threshold."""
    # 7 tokens -> 5 trigram shingles each; overlap 4 of 6 distinct
    a = "w1 w2 w3 w4 w5 w6 w7"
    b = "w1 w2 w3 w4 w5 w6 w8"
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    sh = docs.select(F.size(shingles(F.col("text"), 3)).alias("m")).collect()
    assert [r.m for r in sh] == [5, 5]
    jac = _brute_force_pairs(spark, docs, 0.0)
    assert jac == {(1, 2)}
    j = (
        ngram_jaccard(
            spark.createDataFrame([(1, 2)], "id_a long, id_b long"),
            docs,
            "doc_id",
            "text",
            3,
        )
        .collect()[0]
        .jaccard
    )
    # choose the threshold exactly at the pair's jaccard (j == 2/3;
    # str(j) truncates BELOW the rational value, so the pair
    # qualifies): a lossy prefix would miss it, a lossless one must
    # emit it. round(j, 10) would round UP above 2/3 and the pair
    # would legitimately not qualify — the r6 PPJoin positional
    # filter is tight enough to notice, the original prefix filter
    # only emitted it by slack.
    cand = prefix_filter_jaccard_pairs(
        docs, "text", "doc_id", threshold=j
    ).collect()
    assert {(r.id_a, r.id_b) for r in cand} == {(1, 2)}
