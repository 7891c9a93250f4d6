"""Edge-case tests for the training-data prep queries (chunking,
decontamination, packing) — the oracle gate proves engine parity on the
synthetic corpus; these pin the operator semantics on constructed
inputs where the edges are visible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yahoofinancedatalake_spark.queries.pack import (
    _CHUNK_S,
    _CHUNK_W,
    _CONTAM_N,
    _PACK_BUDGET,
)


def _chunk(spark, docs_rows):
    """Run the doc_chunking transform on constructed docs."""
    from yahoofinancedatalake_spark.queries.pack import _word_toks

    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    base = (
        docs.select("doc_id", _word_toks().alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= 1)
    )
    ex = base.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(_CHUNK_S))
        ).alias("st"),
    )
    return ex.select(
        "doc_id",
        (F.col("st") / _CHUNK_S).cast("long").alias("chunk_id"),
        F.least(F.lit(_CHUNK_W), F.col("n") - F.col("st"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("toks"), F.col("st") + 1, F.lit(_CHUNK_W)), " "
        ).alias("chunk_text"),
    ).collect()


def test_chunking_short_doc_single_chunk(spark):
    # doc shorter than one window → exactly one (short) chunk
    out = _chunk(spark, [(1, "alpha beta gamma")])
    assert len(out) == 1
    assert out[0].chunk_id == 0
    assert out[0].n_chunk_tokens == 3
    assert out[0].chunk_text == "alpha beta gamma"


def test_chunking_overlap_and_tail(spark):
    # W tokens + 1 → two chunks; second starts at the stride and holds
    # the overlapping tail
    n = _CHUNK_W + 1
    text = " ".join(f"t{i}" for i in range(n))
    out = sorted(_chunk(spark, [(1, text)]), key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in out] == [0, 1]
    assert out[0].n_chunk_tokens == _CHUNK_W
    assert out[1].n_chunk_tokens == n - _CHUNK_S
    assert out[0].chunk_text.split(" ")[0] == "t0"
    assert out[1].chunk_text.split(" ")[0] == f"t{_CHUNK_S}"
    # the overlap region appears in both chunks
    assert f"t{_CHUNK_S}" in out[0].chunk_text.split(" ")


def test_chunking_exact_multiple_no_empty_chunk(spark):
    # n exactly 2 strides → starts at 0, S, 2S; 2S < n so the last
    # chunk is non-empty (sequence stops at n-1, never emits start=n)
    n = 2 * _CHUNK_S
    text = " ".join(f"t{i}" for i in range(n))
    out = _chunk(spark, [(1, text)])
    assert all(r.n_chunk_tokens >= 1 for r in out)
    assert len(out) == 2  # starts 0 and S (start=2S == n is excluded)


def test_packing_bins_fill_in_order(spark):
    # 5 docs × 200 tokens, one source: cumulative-before = 0,200,...,800
    # → bins floor(x/512) = 0,0,0,1,1
    rows = [(i, "s", " ".join(["w"] * 200)) for i in range(5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    from pyspark.sql import Window

    n_tok = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    )
    t = docs.select("doc_id", "source", n_tok.alias("n_tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        t.withColumn("cum", F.sum("n_tok").over(w))
        .withColumn(
            "bin",
            F.floor(
                (F.col("cum") - F.col("n_tok")) / F.lit(_PACK_BUDGET)
            ).cast("bigint"),
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bin")
        .collect()
    )
    assert [(r.bin, r.n_docs) for r in out] == [(0, 3), (1, 2)]


def test_contamination_detects_planted_overlap(spark):
    # doc 37 (eval: 37 % 37 == 0) shares an n-gram with doc 1 (train);
    # doc 2 shares nothing
    shared = " ".join(f"g{i}" for i in range(_CONTAM_N))
    rows = [
        (37, f"eval doc containing {shared} verbatim"),
        # different word right before the planted gram, so the ONLY
        # shared n-gram is the planted one itself
        (1, f"train doc that includes {shared} here"),
        (2, "completely different words everywhere always"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from yahoofinancedatalake_spark.queries.pack import _word_toks

    base = (
        docs.select("doc_id", _word_toks().alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= _CONTAM_N)
    )
    grams = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - _CONTAM_N),
                lambda i: F.array_join(
                    F.slice(F.col("toks"), i + 1, F.lit(_CONTAM_N)), " "
                ),
            )
        ).alias("gram"),
    ).select("doc_id", F.md5("gram").alias("g"))
    ev = grams.filter(F.col("doc_id") % 37 == 0).select("g").distinct()
    tr = grams.filter(F.col("doc_id") % 37 != 0)
    out = (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
        .collect()
    )
    assert {r.doc_id for r in out} == {1}
    assert out[0].n_shared == 1


def test_weighted_sample_es_favors_heavy_docs_and_is_deterministic(
    spark, tmp_path
):
    """The A-ES reservoir's defining property: P(keep) scales with
    weight. Two weight classes in one stratum (w=2000 vs w=20, 50
    docs each, keep 5): the heavy class must win nearly every slot.
    And two runs over the same files must select identical rows (the
    md5-derived uniform, not a seeded rand)."""
    from yahoofinancedatalake_spark.queries.pack import QUERIES

    rows = [
        (i, "x" * 10, "en", "s0", 2000 if i < 50 else 20)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars int"
    )
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    a = QUERIES["weighted_sample_es"].spark(spark, sf).collect()
    b = QUERIES["weighted_sample_es"].spark(spark, sf).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 5
    heavy = sum(1 for r in a if r["n_chars"] == 2000)
    # E[heavy slots] ~ 5 * (100000/101000); even one light doc
    # sneaking in is unlikely but tolerated — zero heavy would mean
    # the weight is ignored or inverted
    assert heavy >= 4


def test_label_align_filter_flags_planted_misaligned_vector(
    spark, tmp_path
):
    """Planted contract: label 0 holds five near-identical vectors
    plus ONE inverted vector (negative direction -> cosine to the
    label centroid below 0); exactly that one must be counted
    misaligned, and a clean label flags nothing."""
    from yahoofinancedatalake_spark.queries.pack import QUERIES

    rows = [(i, [1.0, 0.1 * i, 0.0, 0.0], 0) for i in range(5)]
    rows.append((5, [-1.0, -0.2, 0.0, 0.0], 0))  # inverted
    rows += [(10 + i, [0.0, 0.0, 1.0, 0.05 * i], 1) for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    out = {
        r["label"]: r
        for r in QUERIES["label_align_filter"].spark(spark, sf).collect()
    }
    assert out[0]["n"] == 6 and out[0]["n_misaligned"] == 1
    assert out[1]["n"] == 4 and out[1]["n_misaligned"] == 0
    assert out[1]["mean_cos"] > 0.9


def test_pagerank_bipartite_ranks_popular_hub_higher(spark, tmp_path):
    """Hand graph: users 1-3 all touch type A, only user 3 touches
    type B -> after two rounds A's rank must exceed B's, and total
    rank mass stays ~1 (bidirectional edges leave no dangling
    nodes; the rounding loses at most ~1e-7 per node)."""
    import datetime as dt

    from yahoofinancedatalake_spark.queries.pack import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0, uid, et, 1.0, None)
        for i, (uid, et) in enumerate(
            [(1, "A"), (2, "A"), (3, "A"), (3, "B"), (1, "A")]
        )
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = QUERIES["pagerank_bipartite"].spark(spark, sf).collect()
    ranks = {r["node"]: r["rank"] for r in out}
    assert ranks["e:A"] > ranks["e:B"]
    # 5 nodes total (3 users + 2 types), all in the output
    assert len(out) == 5
    assert abs(sum(ranks.values()) - 1.0) < 1e-5
