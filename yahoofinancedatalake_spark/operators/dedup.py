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

Everything is built-in expressions (xxhash64, explode, groupBy) —
no Python UDFs anywhere in the path.
"""

from __future__ import annotations

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


def minhash_signature(shingle_col: Column, n_hashes: int = 32, seed: int = 42) -> Column:
    """Minhash signature: per permutation i, min over shingles of
    ``(a_i * xxhash64(s) + b_i) mod p``.

    Single ``aggregate`` fold over the shingle array: the accumulator
    is the running 32-wide min vector and each step is a ``zip_with``
    against the literal coefficient arrays. One pass, one small
    expression tree — the naive per-permutation formulation duplicates
    the (large) shingle expression n_hashes times, which blows the
    plan past the codegen size limit and falls back to interpreted
    eval (~50x slower, measured).
    """
    import random  # noqa: PLC0415

    rng = random.Random(seed)
    coeffs = [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(n_hashes)
    ]
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
    """
    rows_per_band = n_hashes // n_bands
    sig = minhash_signature(shingles(F.col(text_col), shingle_n), n_hashes, seed)
    banded = df.select(F.col(id_col), sig.alias("__sig")).select(
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
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
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

    Single ``aggregate`` fold: the accumulator is the 64-wide vote
    vector, each step ``zip_with``s against a literal mask array, and
    the final sign/OR reduction runs once. (The per-bit formulation
    repeats the shingle expression 64 times — past the codegen limit,
    interpreted eval, ~50x slower, measured.)
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

    The 64-bit fingerprint splits into 4 16-bit chunks; any pair with
    Hamming distance ≤ 3 must agree on at least one chunk (pigeonhole),
    so the candidate join is an equi-join on (chunk_id, chunk_value) —
    linear, no crossJoin. Candidates are verified with the exact
    ``bit_count(xor)`` distance. Returns (id_a, id_b, hamming),
    id_a < id_b. Recall is exact for distance ≤ 3; partial above.
    """
    fp = df.select(
        F.col(id_col), simhash64(F.col(text_col), shingle_n).alias("__fp")
    )
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned("__fp", 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for i in range(4)
        ]
    )
    banded = fp.withColumn("__c", F.explode(chunks)).select(
        id_col,
        "__fp",
        F.col("__c.chunk").alias("chunk"),
        F.col("__c.val").alias("val"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            hamming64(F.col("l.__fp"), F.col("r.__fp")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
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
