"""Deduplication operators (beyond-parity extension, SURVEY.md §7.8).

The reference dedups news articles by exact id with a Python set at
ingestion (finnhub_news.py:185-188). A 100 TB training-data pipeline
needs the full ladder, all expressed as shuffle-lean DataFrame plans:

- :func:`exact_dedup` — hash-groupBy on a normalized fingerprint.
- :func:`minhash_lsh_pairs` — shingle → minhash → band → bucket-join
  candidate pairs (near-duplicate detection, one shuffle on the
  band-bucket key instead of an O(n²) crossJoin).
- :func:`simhash` — 64-bit weighted sign fingerprint; near-dups have
  small Hamming distance.
- :func:`ngram_jaccard` — exact Jaccard on shingle sets for a
  candidate pair table (the verify step after LSH).

Shingling and hashing stay JVM-side (xxhash64, explode, groupBy);
the per-document signature folds (32-way min / 64-bit vote) run as
Arrow-batched numpy ``pandas_udf``s — Spark's higher-order-function
lambdas evaluate interpreted (no whole-stage codegen), which measured
~100x slower than the numpy kernel on the same data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime permutation family for minhash: h_i(x) = (a_i*x + b_i) mod p.
# p = 2^31 - 1 keeps a_i * h + b_i < 2^62 — no long overflow under ANSI mode.
_MERSENNE = (1 << 31) - 1


def normalized_text(col: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical dedup form."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per normalized-content fingerprint.

    Plan: project fingerprint → hash-aggregate min(id). One shuffle on
    the fingerprint; with AQE the reduce side sizes itself. This is
    the exact-dedup plan that survives 100 TB (the fingerprint is 16
    bytes, not the document).
    """
    fp = F.md5(normalized_text(F.col(text_col)))
    keep = (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) from raw text."""
    toks = F.filter(
        F.split(normalized_text(col), " "), lambda t: t != ""
    )
    count = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(count - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.when(count >= n, F.array_distinct(grams)).otherwise(
        F.when(count > 0, F.array(F.concat_ws(" ", toks))).otherwise(
            F.array().cast("array<string>")
        )
    )


def _minhash_coeffs(n_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random  # noqa: PLC0415

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(n_hashes)
    ]


def shingle_hashes(col: Column, shingle_n: int = 3) -> Column:
    """``array<long>`` of xxhash64 over the word shingles — the
    JVM-side half of both signature computations."""
    return F.transform(shingles(col, shingle_n), lambda s: F.xxhash64(s))


def minhash_signature(shingle_col: Column, n_hashes: int = 32, seed: int = 42) -> Column:
    """Minhash signature: per permutation i, min over shingles of
    ``(a_i * xxhash64(s) + b_i) mod p``.

    Split JVM/numpy: xxhash64 of each shingle is computed JVM-side
    (codegen), then the 32-way min fold runs in an Arrow-batched
    ``pandas_udf`` — ``((a*h + b) % p).min(axis=1)`` is microseconds
    per document in numpy, vs ~19 ms/doc for the interpreted
    higher-order-function fold this replaces (measured at sf0.1).
    Bit-identical to :func:`minhash_signature_expr` (same coefficient
    stream, same modular arithmetic — a*h < 2^62 so no int64
    overflow); a pytest asserts the equivalence.
    """
    hashes = F.transform(shingle_col, lambda s: F.xxhash64(s))
    return minhash_signature_from_hashes(hashes, n_hashes, seed)


def minhash_signature_from_hashes(
    hash_col: Column, n_hashes: int = 32, seed: int = 42
) -> Column:
    """Vectorized minhash fold over a precomputed ``array<long>`` of
    shingle hashes (see :func:`minhash_signature`)."""
    import numpy as np  # noqa: PLC0415

    coeffs = _minhash_coeffs(n_hashes, seed)
    a = np.array([c[0] for c in coeffs], dtype=np.int64)[:, None]
    b = np.array([c[1] for c in coeffs], dtype=np.int64)[:, None]
    p = _MERSENNE
    empty_sig = np.full(n_hashes, p, dtype=np.int64)

    @F.pandas_udf("array<bigint>")
    def _sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            if h is None or len(h) == 0:
                out.append(empty_sig.copy())
                continue
            # numpy int64 % positive follows floor-mod → matches F.pmod
            hm = np.asarray(h, dtype=np.int64) % p
            out.append(((a * hm[None, :] + b) % p).min(axis=1))
        return pd.Series(out)

    return _sig(hash_col)


def minhash_signature_expr(
    shingle_col: Column, n_hashes: int = 32, seed: int = 42
) -> Column:
    """Pure-JVM expression twin of :func:`minhash_signature` (single
    ``aggregate`` fold, ``zip_with`` against literal coefficient
    arrays). Kept as the cross-check oracle for the vectorized path —
    HOF lambdas evaluate interpreted, so this form is ~100x slower
    and must not sit on the hot path.
    """
    coeffs = _minhash_coeffs(n_hashes, seed)
    a_lit = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    b_lit = F.array(*[F.lit(b).cast("long") for _, b in coeffs])
    p = F.lit(_MERSENNE).cast("long")
    init = F.array_repeat(p, n_hashes)  # p > any residue → identity for min
    base = F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), p))
    return F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a_lit, b_lit, lambda a, b: (h * a + b) % p),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    signature → split into bands → explode (band_id, band_hash) →
    self-join on the bucket key → distinct (a, b) pairs with a < b.
    The only heavy exchange is the bucket-key shuffle; band width
    (n_hashes / n_bands) sets the similarity threshold
    ~ (1/n_bands)^(band_size⁻¹).

    Empty/whitespace-only documents are dropped before banding: they
    all share the empty signature, so every band would bucket them
    together and generate O(m²) candidate pairs that the Jaccard
    verify then discards — a quadratic blowup for zero output.
    """
    rows_per_band = n_hashes // n_bands
    hashed = df.select(
        F.col(id_col),
        shingle_hashes(F.col(text_col), shingle_n).alias("__h"),
    ).filter(F.size("__h") > 0)
    sig = minhash_signature_from_hashes(F.col("__h"), n_hashes, seed)
    banded = hashed.select(F.col(id_col), sig.alias("__sig")).select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.slice(
                                    "__sig", b * rows_per_band + 1, rows_per_band
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # group-by-bucket pair generation (not a self-join): the signature
    # is computed ONCE, and the only exchanges are the bucket-key
    # shuffle + the pair dedup — a self-join would re-evaluate the
    # whole scan→shingle→signature subtree on both sides.
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


_BIT_MASKS = [  # bit i mask as a signed 64-bit long (bit 63 = min long)
    (1 << i) if i < 63 else -(1 << 63) for i in range(64)
]


def simhash64(col: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles.

    For each bit position, sum +1/-1 votes from each shingle's
    xxhash64 bit, take the sign. Near-duplicate texts differ in few
    bits (compare with :func:`hamming64`).

    Split JVM/numpy like :func:`minhash_signature`: xxhash64 per
    shingle JVM-side, then the 64-bit vote/sign fold in an
    Arrow-batched numpy ``pandas_udf`` (the interpreted HOF fold it
    replaces was ~11 ms/doc at sf0.1). Bit-identical to
    :func:`simhash64_expr`; a pytest asserts the equivalence.
    """
    return simhash64_from_hashes(shingle_hashes(col, shingle_n))


def simhash64_from_hashes(hash_col: Column) -> Column:
    """Vectorized SimHash fold over a precomputed ``array<long>`` of
    shingle hashes (see :func:`simhash64`). Empty input → 0."""
    import numpy as np  # noqa: PLC0415

    shifts = np.arange(64, dtype=np.uint64)

    @F.pandas_udf("bigint")
    def _fp(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, h in enumerate(hashes):
            if h is None or len(h) == 0:
                continue
            hu = np.asarray(h, dtype=np.int64).view(np.uint64)
            ones = ((hu[:, None] >> shifts[None, :]) & np.uint64(1)).sum(
                axis=0
            )
            # vote = ones - zeros > 0  ⇔  2*ones > n
            fp_bits = (2 * ones > len(hu)).astype(np.uint64)
            val = np.bitwise_or.reduce(fp_bits << shifts)
            out[i] = np.asarray([val], dtype=np.uint64).view(np.int64)[0]
        return pd.Series(out)

    return _fp(hash_col)


def simhash64_expr(col: Column, shingle_n: int = 2) -> Column:
    """Pure-JVM expression twin of :func:`simhash64` (single
    ``aggregate`` vote fold). Kept as the cross-check oracle for the
    vectorized path — interpreted HOF eval, not for the hot path.
    """
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    hashes = F.transform(shingles(col, shingle_n), lambda s: F.xxhash64(s))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks,
                lambda m: F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
            ),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(b),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    shingle_n: int = 2,
) -> DataFrame:
    """Near-duplicate pairs by SimHash + pigeonhole chunk blocking.

    The 64-bit fingerprint splits into ``max_hamming + 1`` chunks: a
    pair with Hamming distance ≤ max_hamming has fewer differing bits
    than chunks, so (pigeonhole) it must agree exactly on at least one
    chunk — the candidate join is an equi-join on (chunk_id,
    chunk_value), linear, no crossJoin, with **exact recall at the
    stated radius**. Candidates are verified with the exact
    ``bit_count(xor)`` distance. Returns (id_a, id_b, hamming),
    id_a < id_b.

    Cost/recall trade-off: more chunks → narrower chunk values → more
    bucket collisions. At max_hamming=3 the chunks are 16 bits (2^16
    buckets each — sparse); beyond ~7 the chunks drop under 8 bits
    and candidate volume grows sharply. Callers wanting a large
    radius should verify-and-filter from a smaller guaranteed radius
    instead.

    Empty/whitespace-only documents (fingerprint 0 by construction)
    are dropped first — they would all pairwise collide and be
    reported as distance-0 "near-dups" of each other.
    """
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    # chunk i covers bits [offsets[i], offsets[i+1]) — widths differ by
    # at most 1 so the pigeonhole guarantee holds for every chunk
    bounds = [round(i * 64 / n_chunks) for i in range(n_chunks + 1)]
    fp = df.select(
        F.col(id_col),
        shingle_hashes(F.col(text_col), shingle_n).alias("__h"),
    ).filter(F.size("__h") > 0).select(
        F.col(id_col), simhash64_from_hashes(F.col("__h")).alias("__fp")
    )
    def _chunk_val(i: int) -> Column:
        # top chunk needs no mask (unsigned shift zero-fills), and for
        # n_chunks=1 the 64-bit mask wouldn't fit a long literal anyway
        shifted = F.shiftrightunsigned("__fp", bounds[i])
        if bounds[i + 1] == 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))

    chunks = F.array(
        *[
            F.struct(F.lit(i).alias("chunk"), _chunk_val(i).alias("val"))
            for i in range(n_chunks)
        ]
    )
    banded = fp.withColumn("__c", F.explode(chunks)).select(
        id_col,
        "__fp",
        F.col("__c.chunk").alias("chunk"),
        F.col("__c.val").alias("val"),
    )
    # group-by-bucket pair generation (not a self-join, see
    # minhash_lsh_pairs): fingerprints ride along in the bucket member
    # structs so the Hamming verify is inline — no re-join back to the
    # fingerprint table, signature UDF evaluated exactly once.
    buckets = (
        banded.groupBy("chunk", "val")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("id"), "__fp"))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    ms = F.col("members")
    pair_structs = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + 2, F.size(ms)),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    hamming64(x["__fp"], y["__fp"]).alias("hamming"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count(xor))."""
    return F.bit_count(a.bitwiseXOR(b))


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    ``pairs``: (id_a, id_b) — e.g. from :func:`minhash_lsh_pairs`.
    Joins the shingle arrays in (two hash joins on the id), then
    ``|∩| / |∪|`` via array built-ins. Jaccard runs only on
    candidates — never all pairs.
    """
    sh = docs.select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            # raw IEEE quotient of two small ints — bit-identical on any
            # engine, no rounding needed (and round() is engine-divergent)
            (inter.cast("double") / F.greatest(union, F.lit(1))).alias("jaccard"),
        )
    )
