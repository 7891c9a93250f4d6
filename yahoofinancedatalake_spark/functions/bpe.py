"""Byte-pair encoding: a real trainer + distributed encoder.

The pack's ``token_count`` counts GPT-2-STYLE pre-tokens (the regex
split step); this module implements the actual BPE stage that runs on
top of pre-tokens in every modern tokenizer (GPT-2/RoBERTa lineage —
Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"):

- :func:`train_bpe` — the classic merge loop, run DRIVER-SIDE on the
  corpus's word-frequency table. That placement is the honest scale
  design, same argument as IVF k-means training: the input is
  VOCABULARY-sized (distinct words + counts — millions of rows at
  100 TB, collectible or samplable), never corpus-sized, and the
  output (an ordered merge list) is a tiny broadcastable artifact.
  Production tokenizers (GPT-2's 50k merges) are trained exactly
  once on exactly this shape.
- :func:`bpe_encode_udf` — Arrow-batched distributed encoder: merges
  are closure-captured (broadcast with the task), each word encodes
  by applying merges in training order, and a per-executor word→
  tokens memo makes the amortized cost per repeated word ~zero
  (natural-language word frequency is Zipfian, so the memo hit rate
  approaches 1).

Determinism: ties in pair frequency break lexicographically, so the
merge list — and therefore every encoding — is a pure function of
the word-frequency table.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: End-of-word sentinel (kept off the character alphabet).
EOW = "▁"


def train_bpe(
    word_freqs: "list[tuple[str, int]]", n_merges: int
) -> "list[tuple[str, str]]":
    """Learn an ordered BPE merge list from (word, count) pairs.

    Classic algorithm: words start as character sequences with an
    end-of-word sentinel; each round merges the globally most
    frequent adjacent symbol pair (count-weighted), ties broken
    lexicographically for bit-determinism. Stops early when no pair
    repeats. Pure python on the vocabulary — the driver-side cost is
    O(n_merges · vocab · avg_word_len), independent of corpus size.
    """
    words: dict[tuple, int] = {}
    for w, c in word_freqs:
        if w:
            words[tuple(w) + (EOW,)] = words.get(tuple(w) + (EOW,), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        if best_n < 2:
            break  # nothing repeats — further merges are noise
        best = min(p for p, c in pairs.items() if c == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple, int] = {}
        for sym, c in words.items():
            acc = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    acc.append(merged)
                    i += 2
                else:
                    acc.append(sym[i])
                    i += 1
            nt = tuple(acc)
            out[nt] = out.get(nt, 0) + c
        words = out
    return merges


def encode_word(word: str, merges: "list[tuple[str, str]]") -> "list[str]":
    """Encode one word by replaying merges in training order (the
    reference implementation the vectorized UDF memoizes)."""
    sym = list(word) + [EOW]
    for a, b in merges:
        i = 0
        out = []
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def corpus_word_freqs(
    docs: DataFrame, toks_col: Column, cap: int = 1_000_000
) -> "list[tuple[str, int]]":
    """The trainer's input: (word, count) over the corpus — a
    vocabulary-sized aggregate, size-capped by frequency rank (the
    same bounded-collect discipline as IVF training: rare tail words
    beyond the cap contribute no repeated pairs worth merging)."""
    rows = (
        docs.select(F.explode(toks_col).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(cap)
        .collect()
    )
    return [(r.w, r.c) for r in rows]


def bpe_encode_udf(merges: "list[tuple[str, str]]"):
    """``array<string> -> array<string>`` pandas UDF: token array in,
    flat BPE-piece array out. Per-executor word memo; merges ride the
    closure (tiny, like IVF centroids)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    memo: dict = {}

    def enc(batch):
        out = []
        for toks in batch:
            if toks is None:
                out.append(None)
                continue
            pieces = []
            for w in toks:
                hit = memo.get(w)
                if hit is None:
                    hit = encode_word(w, merges)
                    memo[w] = hit
                pieces.extend(hit)
            out.append(pieces)
        return pd.Series(out)

    enc.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    return pandas_udf(enc, "array<string>")
