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
    ``(a_i * xxhash64(s) + b_i) mod p``. Pure expressions — the whole
    signature computes inside codegen from one pass over the array."""
    import random  # noqa: PLC0415

    rng = random.Random(seed)
    coeffs = [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(n_hashes)
    ]
    base = F.transform(
        shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE))
    )
    mins = [
        F.array_min(
            F.transform(base, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE))
        )
        for a, b in coeffs
    ]
    return F.array(*mins)


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
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("__sig", b * rows_per_band + i + 1)
                                    for i in range(rows_per_band)
                                ],
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


def simhash64(col: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles.

    For each bit position, sum +1/-1 votes from each shingle's
    xxhash64 bit, take the sign. Near-duplicate texts differ in few
    bits (compare with :func:`hamming64`). Pure expressions.
    """
    grams = shingles(col, shingle_n)
    hashes = F.transform(grams, lambda s: F.xxhash64(s))
    one = F.lit(1).cast("long")
    bits = [
        F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(
                    h.bitwiseAND(F.shiftleft(one, i)) != 0, 1
                ).otherwise(-1),
            )
            > 0,
            F.shiftleft(one, i),  # bit 63 wraps to the sign bit — OR-safe
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


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
            F.round(
                inter.cast("double") / F.greatest(union, F.lit(1)), 4
            ).alias("jaccard"),
        )
    )
