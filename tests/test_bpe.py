"""BPE trainer + distributed encoder (functions/bpe.py).

The trainer must reproduce the textbook merge sequence on a
hand-checkable corpus; the distributed encoder must agree with the
pure-python ``encode_word`` on every word; and the pipeline must be
deterministic across runs (lexicographic tie-break).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yahoofinancedatalake_spark.functions.bpe import (
    EOW,
    bpe_encode_udf,
    corpus_word_freqs,
    encode_word,
    train_bpe,
)


def test_train_bpe_textbook_sequence():
    # Sennrich-style toy corpus: 'low'x5, 'lower'x2, 'newest'x6,
    # 'widest'x3. Most frequent pair is (e, s) from *est (9), then
    # (es, t) (9), then (est, EOW) (9), then (l, o) (7)...
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(freqs, n_merges=4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")
    # encoding follows the merge list
    assert encode_word("newest", merges) == ["n", "e", "w", "est" + EOW]
    assert encode_word("low", merges) == ["lo", "w", EOW]


def test_train_bpe_stops_when_nothing_repeats():
    merges = train_bpe([("ab", 1), ("cd", 1)], n_merges=50)
    assert merges == []  # every pair occurs once — no merge earns it


def test_encoder_roundtrip_property():
    freqs = [("banana", 4), ("bandana", 2), ("ananas", 3)]
    merges = train_bpe(freqs, n_merges=10)
    for w in ["banana", "bandana", "ananas", "unseen", "ba"]:
        pieces = encode_word(w, merges)
        assert "".join(pieces).replace(EOW, "") == w
        assert 1 <= len(pieces) <= len(w) + 1


def test_distributed_encoder_matches_reference(spark):
    rows = [(i, t) for i, t in enumerate(
        ["the quick brown fox", "the slow brown dog",
         "quick quick fox", ""]
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), "[^a-z0-9']+"),
        lambda t: t != "",
    )
    base = df.select("doc_id", toks.alias("toks"))
    freqs = corpus_word_freqs(base, F.col("toks"))
    merges = train_bpe(freqs, n_merges=20)
    got = {
        r.doc_id: r.pieces
        for r in base.withColumn(
            "pieces", bpe_encode_udf(merges)(F.col("toks"))
        ).collect()
    }
    for r in base.collect():
        want = []
        for w in r.toks:
            want.extend(encode_word(w, merges))
        assert got[r.doc_id] == want, r.doc_id


def test_training_is_deterministic():
    freqs = [("aabb", 2), ("bbaa", 2), ("abab", 2)]
    assert train_bpe(freqs, 8) == train_bpe(list(reversed(freqs)), 8)
