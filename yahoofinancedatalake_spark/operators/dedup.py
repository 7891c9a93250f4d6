"""Deduplication operators (beyond-parity extension, SURVEY.md §7.8).

The reference dedups news articles by exact id with a Python set at
ingestion (finnhub_news.py:185-188). A 100 TB training-data pipeline
needs the full ladder, all expressed as shuffle-lean DataFrame plans:

- :func:`exact_dedup` — hash-groupBy on a normalized fingerprint.
- :func:`minhash_lsh_pairs` — shingle → minhash → band → bucket-join
  candidate pairs (near-duplicate detection, one shuffle on the
  band-bucket key instead of an O(n²) crossJoin).
- :func:`simhash_near_dup_pairs` — 64-bit fingerprint + pigeonhole /
  1-bit-multi-probe blocking; near-dups have small Hamming distance.
- :func:`ngram_jaccard` / :func:`hashed_ngram_jaccard` — exact
  Jaccard on shingle sets for a candidate pair table (the verify step
  after LSH).

Hot-path design: per-shingle work never runs as Spark higher-order-
function lambdas (those evaluate interpreted, no whole-stage codegen
— measured ~100x slower than the numpy kernel on the same data) and
never builds shingle *strings* at all. Each signature is one
Arrow-batched ``pandas_udf`` over the normalized text: C-speed
whitespace split, one vectorized siphash pass over the flattened
token array (``pandas.util.hash_array`` with its fixed default key —
process-independent), then rotate/xor window combining + fmix64
finalization in numpy. Everything downstream (banding, bucket joins,
verify) is JVM codegen over compact ``bigint`` arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.session import stage_boundary

# Mersenne prime permutation family for minhash: h_i(x) = (a_i*x + b_i) mod p.
# p = 2^31 - 1 keeps a_i * x + b_i < 2^62 — exact in uint64 arithmetic.
_MERSENNE = (1 << 31) - 1

#: Per-position bit rotations for the n-gram window combine (n <= 5).
_ROT = (21, 43, 7, 53, 31)
_U64 = np.uint64
_FMIX1 = _U64(0xFF51AFD7ED558CCD)
_FMIX2 = _U64(0xC4CEB9FE1A85EC53)


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
    """Word n-gram shingle array (distinct) from raw text, as strings.

    Interpreted-HOF construction — used only where the *string* form
    is semantically required (the DuckDB-checkable Jaccard kernel,
    :func:`ngram_jaccard`); the dedup hot paths use the hashed twin
    :func:`gram_hashes` instead.
    """
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


# ---------------------------------------------------------------------------
# Vectorized gram hashing (shared by minhash + simhash + hashed verify)
# ---------------------------------------------------------------------------


def _rotl64(x: np.ndarray, k: int) -> np.ndarray:
    k = _U64(k)
    return (x << k) | (x >> (_U64(64) - k))


def _fmix64(x: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer — breaks the GF(2)-linearity of the
    rotate/xor combine so every output bit mixes every input bit
    (simhash votes read the bits directly)."""
    x = x.copy()
    x ^= x >> _U64(33)
    x *= _FMIX1
    x ^= x >> _U64(33)
    x *= _FMIX2
    x ^= x >> _U64(33)
    return x


def _gram_hash_arrays(texts: pd.Series, n: int) -> list:
    """Per text: np.unique'd uint64 hashes of its word ``n``-grams
    (whole-text gram when 0 < n_tokens < n — mirroring
    :func:`shingles`), or None for empty/whitespace-only/null text.

    One C-speed split + ONE vectorized siphash over the flattened
    token array for the whole Arrow batch; the window combine is
    ``xor`` of per-position bit-rotations + fmix64 — numpy-
    vectorized, position-sensitive ("a b" ≠ "b a").
    """
    if n > len(_ROT):
        raise ValueError(f"shingle_n must be <= {len(_ROT)}, got {n}")
    tok = texts.str.split()
    lens = np.array(
        [len(t) if isinstance(t, list) else 0 for t in tok], dtype=np.int64
    )
    if lens.sum() == 0:
        return [None] * len(texts)
    flat = np.array(
        [w for t in tok if isinstance(t, list) for w in t], dtype=object
    )
    h = pd.util.hash_array(flat)  # uint64, fixed key → deterministic
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    out = []
    for i, length in enumerate(lens):
        if length == 0:
            out.append(None)
            continue
        hs = h[offs[i]: offs[i + 1]]
        if length >= n:
            g = np.zeros(length - n + 1, dtype=_U64)
            for j in range(n):
                g ^= _rotl64(hs[j: length - n + 1 + j], _ROT[j])
        else:  # short doc → single whole-text gram
            acc = _U64(0)
            for j in range(length):
                acc ^= _rotl64(hs[j: j + 1], _ROT[j])[0]
            g = np.array([acc], dtype=_U64)
        out.append(np.unique(_fmix64(g)))
    return out


def gram_hashes(col: Column, shingle_n: int = 3) -> Column:
    """``array<bigint>`` of distinct hashed word n-grams of ``col``
    (null for empty text) — the hashed twin of :func:`shingles`.
    Shingle equality ⇔ hash equality modulo ~2⁻⁶⁴ collisions, so set
    algebra (Jaccard) over these arrays equals the string form."""

    def _f(texts):
        return pd.Series(
            [
                None if g is None else g.view(np.int64)
                for g in _gram_hash_arrays(texts, shingle_n)
            ]
        )

    _f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_f, "array<bigint>")(normalized_text(col))


def _minhash_coeffs(n_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random  # noqa: PLC0415

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(n_hashes)
    ]


def minhash_signature(
    col: Column, n_hashes: int = 32, seed: int = 42, shingle_n: int = 3
) -> Column:
    """Minhash signature of the text's gram-hash set: per permutation
    i, ``min over grams of (a_i * (g mod p) + b_i) mod p``. Null for
    empty text (callers filter before banding). One Arrow-batched
    numpy kernel — ``((a*g + b) % p).min(axis=1)`` is microseconds
    per document; matches :func:`ref_minhash` bit-for-bit (pytest).
    """
    coeffs = _minhash_coeffs(n_hashes, seed)
    a = np.array([c[0] for c in coeffs], dtype=_U64)[:, None]
    b = np.array([c[1] for c in coeffs], dtype=_U64)[:, None]
    p = _U64(_MERSENNE)

    def _sig(texts):
        out = []
        for g in _gram_hash_arrays(texts, shingle_n):
            if g is None:
                out.append(None)
                continue
            gm = g % p
            out.append(
                ((a * gm[None, :] + b) % p).min(axis=1).astype(np.int64)
            )
        return pd.Series(out)

    _sig.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_sig, "array<bigint>")(normalized_text(col))


def simhash64(col: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over the text's distinct word shingles: per bit,
    majority vote of the gram-hash bits; near-duplicate texts differ
    in few bits (compare with :func:`hamming64`). Null for empty text.
    Same one-UDF vectorized pipeline as :func:`minhash_signature`;
    matches :func:`ref_simhash` bit-for-bit (pytest)."""
    shifts = np.arange(64, dtype=_U64)

    def _fp(texts):
        out = []
        for g in _gram_hash_arrays(texts, shingle_n):
            if g is None:
                out.append(None)
                continue
            ones = ((g[:, None] >> shifts[None, :]) & _U64(1)).sum(axis=0)
            bits = (2 * ones > len(g)).astype(_U64)
            val = np.bitwise_or.reduce(bits << shifts)
            out.append(int(np.array([val], dtype=_U64).view(np.int64)[0]))
        return pd.Series(out, dtype="object")

    _fp.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_fp, "bigint")(normalized_text(col))


# ---------------------------------------------------------------------------
# Pure-python reference twins (test cross-checks for the numpy kernels)
# ---------------------------------------------------------------------------


def ref_gram_hashes(text: str, n: int) -> set[int]:
    """Plain-python twin of :func:`_gram_hash_arrays` for one text."""
    mask = (1 << 64) - 1

    def rotl(x: int, k: int) -> int:
        return ((x << k) | (x >> (64 - k))) & mask

    def fmix(x: int) -> int:
        x ^= x >> 33
        x = (x * int(_FMIX1)) & mask
        x ^= x >> 33
        x = (x * int(_FMIX2)) & mask
        x ^= x >> 33
        return x

    toks = " ".join(text.lower().strip().split()).split()
    if not toks:
        return set()
    th = [int(v) for v in pd.util.hash_array(np.array(toks, dtype=object))]
    if len(toks) >= n:
        windows = [th[i: i + n] for i in range(len(toks) - n + 1)]
    else:
        windows = [th]
    out = set()
    for w in windows:
        acc = 0
        for j, hv in enumerate(w):
            acc ^= rotl(hv, _ROT[j])
        out.add(fmix(acc))
    return out


def ref_minhash(text: str, n_hashes: int = 32, seed: int = 42,
                shingle_n: int = 3) -> list[int] | None:
    grams = ref_gram_hashes(text, shingle_n)
    if not grams:
        return None
    p = _MERSENNE
    return [
        min((a * (g % p) + b) % p for g in grams)
        for a, b in _minhash_coeffs(n_hashes, seed)
    ]


def ref_simhash(text: str, shingle_n: int = 2) -> int | None:
    grams = ref_gram_hashes(text, shingle_n)
    if not grams:
        return None
    val = 0
    for bit in range(64):
        ones = sum((g >> bit) & 1 for g in grams)
        if 2 * ones > len(grams):
            val |= 1 << bit
    return val - (1 << 64) if val >= (1 << 63) else val


# ---------------------------------------------------------------------------
# MinHash-LSH banding
# ---------------------------------------------------------------------------


def minhash_band_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """The persistable LSH index: one (id, band, bucket) row per band
    per doc. Land this table (bucketed by ``bucket``) and incremental
    dedup never re-shingles history — see
    :func:`incremental_minhash_pairs`. Null signatures (empty docs)
    are dropped here, once, for every consumer."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signature(F.col(text_col), n_hashes, seed, shingle_n)
    signed = df.select(F.col(id_col), sig.alias("__sig")).filter(
        F.col("__sig").isNotNull()
    )
    return signed.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.slice(
                                    "__sig",
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(
        id_col,
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def capped_bucket_members(
    banded: DataFrame,
    id_col: str,
    max_bucket_size: int,
) -> DataFrame:
    """(band, bucket) → bounded sorted member array + overflow count.

    A boilerplate-heavy corpus (license headers, templated pages)
    produces mega-buckets; an uncapped ``collect_list`` materializes
    the whole bucket in one aggregation buffer and the in-bucket pair
    explosion is O(m²) — a single-task OOM at 100 TB. Members are
    ranked by ``md5(id)`` (deterministic, content-independent) and
    only the first ``max_bucket_size`` survive into the pair
    generator; ``n_dropped`` reports the overflow per bucket so
    callers can log coverage loss. The rank window and the group-by
    share the (band, bucket) hash partitioning, so the cap costs a
    per-partition sort but no extra exchange; the window streams with
    a spillable sort instead of buffering the bucket like
    ``collect_list`` does.
    """
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("band", "bucket").orderBy(
            F.md5(F.col(id_col).cast("string")), id_col
        )
    )
    return (
        banded.withColumn("__rk", rk)
        .groupBy("band", "bucket")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__rk") <= max_bucket_size, F.col(id_col)
                    )
                )
            ).alias("ids"),
            F.greatest(
                F.count(F.lit(1)) - max_bucket_size, F.lit(0)
            ).alias("n_dropped"),
        )
        .filter(F.size("ids") > 1)
    )


def _bucket_id_pairs(buckets: DataFrame) -> DataFrame:
    """Explode each bucket's sorted ``ids`` array into unique
    unordered (id_a, id_b) candidate pairs (index-based i<j, so each
    pair is emitted once per bucket; cross-bucket repeats are the
    caller's ``dropDuplicates``). Shared by the batch and incremental
    MinHash operators — the simhash path keeps its own variant
    because its members carry probe flags and a hamming payload."""
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
    return buckets.select(F.explode(pair_structs).alias("p")).select(
        "p.id_a", "p.id_b"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int = 512,
    log_drops: bool = False,
    bands: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    signature → split into bands → explode (band_id, band_hash) →
    group by the bucket key → emit member pairs. The only heavy
    exchange is the bucket-key shuffle; band width
    (n_hashes / n_bands) sets the similarity threshold
    ~ (1/n_bands)^(band_size⁻¹).

    Empty/whitespace-only documents (null signature) are dropped
    before banding: they would all share one bucket and generate
    O(m²) candidate pairs that the Jaccard verify then discards.
    Buckets are additionally bounded at ``max_bucket_size`` members
    (deterministic md5 order — see :func:`capped_bucket_members`) so
    one boilerplate mega-bucket can't blow a task; with
    ``log_drops=True`` the bucket table is persisted, the overflow
    total counted from it and logged, and the subsequent pair
    consumption reuses the persisted buckets instead of re-running
    the scan→signature→shuffle pipeline a second time.

    ``bands`` (optional, r13) supplies a precomputed
    :func:`minhash_band_table` frame for ``df`` (``n_hashes`` /
    ``n_bands`` / ``shingle_n`` / ``seed`` are then ignored) — the
    prep pipeline computes the band table once, shares it here AND
    lands it as the incremental index, instead of paying the
    signature pass twice (the winnow ``fingerprints=`` convention).
    """
    banded = (
        bands
        if bands is not None
        else minhash_band_table(
            df, text_col, id_col, n_hashes, n_bands, shingle_n, seed
        )
    )
    # group-by-bucket pair generation (not a self-join): the signature
    # is computed ONCE, and the only exchanges are the bucket-key
    # shuffle + the pair dedup — a self-join would re-evaluate the
    # whole scan→signature subtree on both sides.
    buckets = capped_bucket_members(banded, id_col, max_bucket_size)
    if log_drops:
        import logging

        # persist so the eager drop-count job and the lazy pair
        # consumption share one signature computation (the bucket
        # table is small: <= n_buckets capped member arrays)
        buckets = buckets.persist()
        dropped = (
            buckets.agg(F.sum("n_dropped").alias("d")).collect()[0]["d"]
        )
        if dropped:
            logging.getLogger(__name__).warning(
                "minhash_lsh_pairs: %d bucket members beyond "
                "max_bucket_size=%d dropped from pair generation",
                dropped,
                max_bucket_size,
            )
    return _bucket_id_pairs(buckets).dropDuplicates(["id_a", "id_b"])


def incremental_minhash_pairs(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int = 512,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidate pairs for an INCREMENT against a persisted
    LSH index — the daily-ingest shape: only the new batch is
    shingled/hashed; history participates through its landed
    (id, band, bucket) rows (:func:`minhash_band_table`), never its
    text.

    Emits every candidate pair with at least one NEW endpoint, from
    buckets touched by the batch. The bucket-size cap is applied over
    the UNION membership (history ∪ batch) with the same md5 rank the
    batch operator uses — capping the two sides independently would
    admit pairs a full recompute drops, breaking the equivalence
    below. At 100 TB this turns daily dedup from O(corpus) re-hash
    into O(batch) hash + one (band, bucket) semi-join against the
    landed index plus a rank window over only the touched buckets
    (with the index table bucketed by ``bucket`` at write time the
    join is exchange-free on the history side); the caller appends
    the new batch's band rows to the index afterward.
    Pair set == what a full :func:`minhash_lsh_pairs` over
    (history ∪ batch) emits, minus old×old pairs (already known) —
    asserted in tests, including above the cap.

    ``new_bands`` (optional, r13) supplies the batch's precomputed
    :func:`minhash_band_table` frame (hash/band parameters are then
    ignored). The band rows feed TWO consumers here (the touched-
    bucket set and the union membership), and the caller appends the
    same rows to the landed index afterward — pass a persisted frame
    and the batch pays ONE signature pass instead of three.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if new_bands is None:
        new_bands = minhash_band_table(
            new_docs, text_col, id_col, n_hashes, n_bands, shingle_n, seed
        )
    # only history rows in buckets the batch touches participate
    touched = new_bands.select("band", "bucket").distinct()
    old_in_touched = index.join(touched, ["band", "bucket"]).select(
        F.col(id_col).alias("id"), "band", "bucket", F.lit(False).alias("new")
    )
    union_rows = (
        new_bands.select(
            F.col(id_col).alias("id"),
            "band",
            "bucket",
            F.lit(True).alias("new"),
        )
        .unionByName(old_in_touched)
        # A re-ingested id (replayed batch: present in BOTH the landed
        # index and new_docs) would otherwise contribute TWO rows per
        # (id, band, bucket): the i<j generator then emits a
        # degenerate (id, id) self-pair and the duplicate consumes a
        # max_bucket_size rank slot, diverging from the
        # full-recompute membership this function promises. Collapse
        # to one row, keeping new=true so its pairs still surface.
        .groupBy("id", "band", "bucket")
        .agg(F.max("new").alias("new"))
    )
    # the SAME deterministic cap as capped_bucket_members, ranked over
    # the union membership
    rk = F.row_number().over(
        Window.partitionBy("band", "bucket").orderBy(
            F.md5(F.col("id").cast("string")), F.col("id")
        )
    )
    buckets = (
        union_rows.withColumn("__rk", rk)
        .filter(F.col("__rk") <= max_bucket_size)
        .groupBy("band", "bucket")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("id"), F.col("new")))
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
                    F.least(x["id"], y["id"]).alias("id_a"),
                    F.greatest(x["id"], y["id"]).alias("id_b"),
                    (x["new"] | y["new"]).alias("any_new"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .filter(F.col("p.any_new"))
        .select("p.id_a", "p.id_b")
        # belt-and-suspenders vs the degenerate self-pair class the
        # groupBy above prevents structurally
        .filter(F.col("id_a") != F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# SimHash near-dup with pigeonhole / multi-probe blocking
# ---------------------------------------------------------------------------


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    shingle_n: int = 2,
) -> DataFrame:
    """Near-duplicate pairs by SimHash with **exact recall at the
    stated radius**, blocking chosen by the radius:

    - ``max_hamming <= 4`` — pigeonhole chunks: the fingerprint splits
      into ``max_hamming + 1`` chunks (≥ 12 bits each); a pair within
      the radius must agree exactly on some chunk → equi-join on
      (chunk, value).
    - ``max_hamming >= 5`` — 1-bit multi-probe (HmSearch-style):
      ``ceil((max_hamming+1) / 2)`` wide chunks; within the radius
      some chunk differs by ≤ 1 bit (if every chunk differed by ≥ 2
      the total would exceed the radius), so each doc posts its exact
      chunk value plus all 1-bit flips, and candidates pair exact ×
      (exact ∪ probe). Wide chunks keep buckets sparse where narrow
      pigeonhole chunks (64/(h+1) bits) collapse into huge buckets —
      measured at sf0.1/h=9: 1.9M candidate pairs with 6-bit chunks
      vs ~0.2M with 13-bit chunks + probes, for 254 true pairs.

    Candidates are verified inline with the exact ``bit_count(xor)``
    distance (fingerprints ride in the bucket member structs — no
    re-join, signature UDF evaluated exactly once). Returns
    (id_a, id_b, hamming), id_a < id_b. The only exchanges are the
    bucket-key shuffle and the pair dedup — linear, no crossJoin.

    Empty/whitespace-only documents (null fingerprint) are dropped
    first — they would all pairwise collide and be reported as
    distance-0 "near-dups" of each other.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    multi_probe = max_hamming >= 5
    n_chunks = (max_hamming + 2) // 2 if multi_probe else max_hamming + 1
    # chunk i covers bits [offsets[i], offsets[i+1]) — widths differ by
    # at most 1 so the recall guarantee holds for every chunk
    bounds = [round(i * 64 / n_chunks) for i in range(n_chunks + 1)]
    fp = df.select(
        F.col(id_col), simhash64(F.col(text_col), shingle_n).alias("__fp")
    ).filter(F.col("__fp").isNotNull())

    def _chunk_val(i: int) -> Column:
        # top chunk needs no mask (unsigned shift zero-fills)
        shifted = F.shiftrightunsigned("__fp", bounds[i])
        if bounds[i + 1] == 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))

    def _member(i: int, val: Column, exact: bool) -> Column:
        return F.struct(
            F.lit(i).alias("chunk"),
            val.alias("val"),
            F.lit(exact).alias("ex"),
        )

    posts = []
    for i in range(n_chunks):
        v = _chunk_val(i)
        posts.append(_member(i, v, True))
        if multi_probe:
            posts.extend(
                _member(i, v.bitwiseXOR(F.lit(1 << j)), False)
                for j in range(bounds[i + 1] - bounds[i])
            )
    banded = fp.withColumn("__c", F.explode(F.array(*posts))).select(
        id_col,
        "__fp",
        F.col("__c.chunk").alias("chunk"),
        F.col("__c.val").alias("val"),
        F.col("__c.ex").alias("ex"),
    )
    buckets = (
        banded.groupBy("chunk", "val")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), "__fp", "ex")
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    ms = F.col("members")
    # exact members pair with every other member; exact-exact pairs
    # only once (id order) — probe-probe pairs carry no guarantee and
    # are skipped
    pair_structs = F.flatten(
        F.transform(
            ms,
            lambda x: F.transform(
                F.filter(
                    ms,
                    lambda y: x["ex"]
                    & (y["id"] != x["id"])
                    & (~y["ex"] | (x["id"] < y["id"])),
                ),
                lambda y: F.struct(
                    F.least(x["id"], y["id"]).alias("id_a"),
                    F.greatest(x["id"], y["id"]).alias("id_b"),
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


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the near-dup pair graph → dedup
    clusters: ``(node, component)`` with component = min node id in
    the cluster. This is the step that turns pairwise LSH output into
    a keep-list (keep ``node == component``, drop the rest) when
    near-duplication is transitive A~B~C.

    Min-label propagation: each round every node takes the min label
    over itself and its neighbors (one join + one groupBy-min per
    round, all distributed); converges in O(graph diameter) rounds —
    near-dup clusters are shallow, and ``max_iter`` guards
    pathological chains. The driver loop only *counts* changed labels
    per round (single long per round, no data to the driver); each
    round's labels are ``localCheckpoint``-ed, which both caches the
    partitions AND truncates lineage — with plain ``persist`` the
    logical plan still nests every prior round, so Catalyst
    analysis/printing cost grows superlinearly with iterations
    (measured: the audited plan string held ~1900 nested Exchange
    nodes before the switch, 3 after). The same scheme at 100 TB is
    the standard alternating large/small-star contraction shape.
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .persist()
    )
    n_edges = edges.count()
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    labels.count()
    held = labels  # the frame whose materialized blocks each round releases
    # Size the iterative stage by the graph, not the session default:
    # each round is 3 shuffles of the label/edge tables, and scheduling
    # 32+ tasks per stage over a few hundred edges costs more than the
    # work. ~1M edges per partition; the session default caps it.
    spark = pairs.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(2, min(int(old_parts), n_edges // 1_000_000 + 2))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.b == labels.node)
                .groupBy("a")
                .agg(F.min("comp").alias("ncomp"))
            )
            # the changed flag rides the checkpointed frame (r13):
            # labels only ever DECREASE, so "some neighbor label is
            # strictly lower" == "this round changed the label" — the
            # convergence count is then one scan of the checkpoint,
            # not the extra node-keyed self-join per round it used to
            # be (one join + shuffle saved per round, across every
            # CC consumer in the pack)
            new_labels = (
                labels.join(
                    neighbor_min, labels.node == neighbor_min.a, "left"
                )
                .select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce("ncomp", F.col("comp"))
                    ).alias("comp"),
                    (
                        F.coalesce("ncomp", F.col("comp")) < F.col("comp")
                    ).alias("__chg"),
                )
                .transform(stage_boundary)  # materialize + truncate lineage
            )
            changed = new_labels.filter(F.col("__chg")).count()
            # release the PREVIOUS round's materialized blocks (the
            # derived `labels` view of round >= 2 is not itself the
            # holder — `held` is)
            held.unpersist()
            held = new_labels
            labels = new_labels.drop("__chg")
            if changed == 0:
                break
        return labels.select(
            F.col("node"), F.col("comp").alias("component")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        edges.unpersist()


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count(xor))."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# Jaccard verify kernels
# ---------------------------------------------------------------------------


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs, over
    *string* shingles (the ANSI-SQL-checkable form — the DuckDB
    oracle mirrors it with list algebra).

    ``pairs``: (id_a, id_b) — e.g. from :func:`minhash_lsh_pairs`.
    Joins the shingle arrays in (two hash joins on the id), then
    ``|∩| / |∪|`` via array built-ins. Jaccard runs only on
    candidates — never all pairs.
    """
    sh = docs.select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    return _jaccard_join(pairs, sh, id_col)


def hashed_ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs over *hashed* shingles
    (:func:`gram_hashes`) — the hot-path twin of :func:`ngram_jaccard`.
    Set equality ⇔ hash-set equality modulo ~2⁻⁶⁴ collisions, so the
    value is the string-shingle Jaccard (the sf0.01 correctness gate
    checks it against DuckDB's string-based ground truth); the
    intersect/union run on compact bigint arrays instead of rebuilding
    every shingle string per side.
    """
    empty = F.array().cast("array<bigint>")
    sh = docs.select(
        F.col(id_col),
        F.coalesce(gram_hashes(F.col(text_col), shingle_n), empty).alias("sh"),
    )
    return _jaccard_join(pairs, sh, id_col)


def _jaccard_join(pairs: DataFrame, sh: DataFrame, id_col: str) -> DataFrame:
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


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction — the O(log n)-round algorithm for graphs whose
    diameter makes min-label propagation (:func:`connected_components`,
    O(diameter) rounds) impractical: a 1000-link chain converges in
    ~10 alternations here vs 999 propagation rounds.

    The star operations (Kiveris et al., "Connected Components in
    MapReduce and Beyond"):

    - large-star: per node u with neighborhood Γ(u), connect every
      neighbor LARGER than u to m = min(Γ(u) ∪ {u});
    - small-star: connect u and every neighbor ≤ u to that same m.

    Both are one groupBy + one explode; each alternation at least
    halves the height of every tree, and the fixpoint is a forest of
    stars whose centers are the component minima. Convergence is
    detected from a per-round (count, hash-sum) signature of the
    canonical edge set — two longs to the driver per round, no edge
    data. Output matches :func:`connected_components`:
    (node, component = min node id in the component).
    """
    edges = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .transform(stage_boundary)
    )

    def signature(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: int64 hash sums overflow under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    def star(e: DataFrame, large: bool) -> DataFrame:
        # undirected neighborhood, grouped once per node
        nbrs = (
            e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
            .unionByName(
                e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
            )
            .groupBy("node")
            .agg(F.collect_set("nbr").alias("ns"))
            .withColumn(
                "m",
                F.least(F.col("node"), F.array_min("ns")),
            )
        )
        if large:
            targets = F.filter(F.col("ns"), lambda x: x > F.col("node"))
        else:
            targets = F.array_union(
                F.filter(F.col("ns"), lambda x: x <= F.col("node")),
                F.array(F.col("node")),
            )
        out = (
            nbrs.select(
                F.col("m"), F.explode(targets).alias("t")
            )
            .filter(F.col("t") != F.col("m"))
            .select(
                F.least("m", "t").alias("u"),
                F.greatest("m", "t").alias("v"),
            )
            .dropDuplicates(["u", "v"])
        )
        return out.transform(stage_boundary)

    sig = signature(edges)
    for _ in range(max_iter):
        edges = star(edges, large=True)
        edges = star(edges, large=False)
        new_sig = signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    # fixpoint: stars centered at component minima → label = min
    # neighbor (or self for centers, which appear only as u)
    labels = (
        edges.select(F.col("v").alias("node"), F.col("u").alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    centers = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .join(labels.select("node"), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    return labels.unionByName(centers)


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    shingle_n: int = 3,
    cache: bool = True,
) -> DataFrame:
    """Exact all-pairs Jaccard >= ``threshold`` via PREFIX FILTERING
    (Chaudhuri/Ganti/Kaushik ICDE'06; Bayardo/Ma/Srikant "Scaling Up
    All Pairs Similarity Search", WWW'07) — the deterministic,
    loss-free alternative to MinHash banding in the dedup ladder:
    no hash-family miss probability, every qualifying pair found.

    Tokens (word-``shingle_n``-gram shingles) get a global total
    order by ascending document frequency (rarest first, token text
    tie-break). A document with m shingles keeps only its first
    ``L = m - ceil(t·m) + 1`` tokens in that order as its *prefix*.
    Theorem: J(a,b) >= t implies |a∩b| >= ceil(t·max(ma, mb)), so if
    the earliest shared token (in the global order) sat outside
    either document's prefix, the suffix could hold at most
    ``ceil(t·m) - 1`` shared tokens — contradiction. Hence every
    qualifying pair shares a token in BOTH prefixes, and a
    prefix-on-prefix equi-join generates a candidate superset;
    :func:`ngram_jaccard` then verifies exactly. Rare-first ordering
    makes prefixes touch the *least* frequent tokens, keeping posting
    lists (and the join fan-out) minimal.

    ``ceil(t·m)`` is computed in INTEGER arithmetic from
    ``Fraction(str(threshold))`` — an IEEE ``ceil(0.8 * 5)`` is 5,
    not 4, and a one-too-short prefix silently loses pairs.

    Scale: no crossJoin anywhere — the joins key on token, the
    per-doc prefix window is bounded by the doc's own shingle count,
    and candidate volume concentrates on rare tokens (df-ascending
    prefixes). At 100 TB add the standard length filter (a doc pairs
    only with lengths within [t·m, m/t]) by banding on
    ``floor(log(m)/log(1/t))`` — omitted here because the testdata's
    doc lengths are homogeneous.

    ``cache=True`` (default) ``persist()``\\ s two intermediates (the
    hashed-shingle table and the prefix table — each is consumed by
    2-3 downstream branches; uncached they re-execute per branch) and
    their lifetime is CALLER-OWNED: the result is lazy, so this
    function cannot unpersist them. Call
    ``spark.catalog.clearCache()`` (or unpersist via
    ``spark.sparkContext._jsc.getPersistentRDDs``) after consuming
    the result if you invoke this in a loop over parameters;
    otherwise executor storage accumulates one cached copy per call.
    Pass ``cache=False`` to trade recomputation for zero retained
    storage.
    """
    from fractions import Fraction  # noqa: PLC0415

    from pyspark.sql import Window  # noqa: PLC0415

    frac = Fraction(str(threshold))
    if frac.denominator > 1_000_000:
        # floor to a <=10^6 denominator: a LOWER bound on t, so the
        # prefix gets (at most) longer and the filters (at most)
        # looser — lossless by monotonicity — while every integer
        # product below stays far from bigint overflow (a 16-digit
        # float denominator times a doc length would not, and the
        # previous double-division form of ceil(t*m) mis-rounded
        # exactly at integer quotients: review-caught at a threshold
        # equal to a pair's rational jaccard).
        import math  # noqa: PLC0415

        frac = Fraction(math.floor(frac * 1_000_000), 1_000_000)
    tn, td = frac.numerator, frac.denominator
    # Tokens are represented by their xxhash64 from the explode on:
    # every shuffle-heavy stage (df aggregation, df lookup, window
    # sort, the prefix self-join) moves an 8-byte key instead of a
    # ~25-byte shingle string (3.4s -> 2.7s measured at sf0.1, and
    # proportionally more shuffle bytes saved at scale). Losslessness
    # survives hash collisions UNCONDITIONALLY because the theorem
    # re-runs on the hash universe: the order key (df, g) is a
    # function of the hash alone, so sort ties only occur between
    # rows of the SAME hash (interchangeable for the hash-equi-join);
    # with m the per-doc ROW count, if the smallest shared hash class
    # g* had no row in a doc's prefix, the suffix (size ceil(t*m)-1)
    # would contain all >= |shared tokens| >= ceil(t*m) shared rows —
    # contradiction. So g* lands in BOTH prefixes and the hash join
    # emits the pair; colliding non-shared tokens merely add spurious
    # candidates, which the exact string-level ngram_jaccard verify
    # removes. The emitted candidate (pid, hash) SET is deterministic
    # (it depends only on the sorted hash multiset, not tie order).
    # persist() the hashed-shingle table: it feeds sz, dfreq, AND the
    # prefix build, and the prefix table feeds BOTH self-join sides —
    # without the cache the explode executes ~6x per query, several
    # branches CONCURRENTLY (event-log-measured: three simultaneous
    # 32-task explode stages whose combined allocation burst drove
    # 0.9-5.8s of task-attributed GC per stage and made this
    # 2.6-3.3s-warm query read 8-21s in roughly half of full-pack
    # runs). One cached copy = one scan, flat allocation, stable
    # wall-clock — and at 100 TB the shingle table is the thing a
    # PPJoin implementation materializes anyway.
    sh = (
        docs.select(
            F.col(id_col).alias("pid"),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("gs"),
        )
        .select("pid", F.xxhash64("gs").alias("g"))
    )
    if cache:
        # Cache lifetime is CALLER-OWNED: the frame is returned lazily
        # so this function cannot unpersist; the pack's runners call
        # spark.catalog.clearCache() between queries, and a library
        # caller looping over parameters should do the same (or pass
        # cache=False and accept the recomputation).
        sh = sh.persist()
    sz = sh.groupBy("pid").agg(F.count(F.lit(1)).alias("m"))
    dfreq = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("pid").orderBy(
        F.col("df").asc(), F.col("g").asc()
    )
    # rn <= m - ceil(tn*m/td) + 1, in pure-multiply integer form
    # (ceil(p/q) <= u  <=>  p <= u*q): no division anywhere, so no
    # double rounding at integer quotients. rn == 1 keeps at least
    # one token per doc (the original greatest(..., 1)).
    pref = (
        sh.join(dfreq, "g")
        .join(sz, "pid")
        .withColumn("rn", F.row_number().over(wdoc))
        .filter(
            (F.col("rn") == 1)
            | (
                F.lit(tn) * F.col("m")
                <= (F.col("m") - F.col("rn") + 1) * F.lit(td)
            )
        )
        .select("pid", "g", "m", "rn")
    )
    if cache:
        pref = pref.persist()  # referenced by both self-join sides
    a = pref.select(
        F.col("pid").alias("id_a"),
        "g",
        F.col("m").alias("ma"),
        F.col("rn").alias("pa"),
    )
    b = pref.select(
        F.col("pid").alias("id_b"),
        "g",
        F.col("m").alias("mb"),
        F.col("rn").alias("pb"),
    )
    # PPJoin candidate reduction (Xiao/Wang/Lin/Yu WWW'08), both
    # filters LOSSLESS and integer-exact:
    # - length filter: J >= t forces t*max(ma,mb) <= min(ma,mb),
    #   i.e. tn*ma <= td*mb AND tn*mb <= td*ma;
    # - positional filter: at a shared token seen at (1-based,
    #   full-order) positions pa/pb, the overlap can be at most
    #   1 + min(ma-pa, mb-pb), and J >= t requires overlap
    #   alpha = ceil(t/(1+t) * (ma+mb)). A qualifying pair's FIRST
    #   shared token satisfies the bound, so filtering per match and
    #   de-duplicating keeps every qualifying pair. Measured at
    #   sf0.1 (5k docs): 118,649 raw prefix candidates -> the filters
    #   cut both the verify volume and the join output a qualifying
    #   superset of the 256 true pairs actually needs.
    # ubound >= alpha = ceil(tn*(ma+mb)/(tn+td)), multiply form:
    # ubound*(tn+td) >= tn*(ma+mb)
    ubound = F.lit(1) + F.least(
        F.col("ma") - F.col("pa"), F.col("mb") - F.col("pb")
    )
    return (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.lit(tn) * F.col("ma") <= F.lit(td) * F.col("mb"))
            & (F.lit(tn) * F.col("mb") <= F.lit(td) * F.col("ma"))
        )
        .filter(
            ubound * F.lit(tn + td)
            >= F.lit(tn) * (F.col("ma") + F.col("mb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
# the MOSS local fingerprinting algorithm). Completes the fingerprint
# family: `exact_dedup` hashes the WHOLE normalized doc; winnowing
# selects a guaranteed-density subset of character k-gram hashes such
# that any shared substring of length >= k + w - 1 between two docs
# yields at least one shared fingerprint (the paper's correctness
# property), at expected density 2/(w+1). The reference dedups only by
# exact id (finnhub_news.py:185-188); this is the beyond-parity
# substring-level member of the ladder.
# ---------------------------------------------------------------------------


def _winnow_md5_arrays(texts: pd.Series, k: int, w: int) -> list:
    """Per (already normalized) text: the winnowed md5 fingerprint hex
    set as a list, FIRST-OCCURRENCE ordered — the Arrow-batched twin
    of the interpreted-HOF extraction it replaced (r12, guide §4.2),
    verified row-identical at every SF:

    - k-grams slice by CODE POINT, exactly Spark ``substring``
      semantics (ASCII fast path slices the UTF-8 bytes directly —
      identical boundaries — and multibyte text falls back to str
      slicing, which Python and UTF8String both count in code points);
    - md5 runs in C (hashlib) per gram — the JVM HOF form paid
      per-gram string+hex allocations that measured 1.9× over linear
      at the 100× sweep;
    - the window minimum is a monotonic-deque sliding min — O(m) with
      ~2 C-speed string comparisons per gram (digests are pure ASCII
      hex, so Python's string order == the JVM's UTF8 string order);
    - distinct keeps first occurrence (``array_distinct`` semantics)
      via ``dict.fromkeys``.

    Docs shorter than ``k`` chars hash the whole text; ≤ ``w`` grams
    collapse to the single global min; null text → ``[null]`` (what
    the HOF chain produced: md5(null) under a null length guard).
    """
    import hashlib  # noqa: PLC0415
    from collections import deque  # noqa: PLC0415

    md5 = hashlib.md5
    out = []
    for s in texts:
        if s is None:
            out.append([None])
            continue
        n = len(s)
        if n >= k:
            if s.isascii():
                b = s.encode("utf-8")
                mv = memoryview(b)
                hs = [
                    md5(mv[i : i + k]).hexdigest()
                    for i in range(n - k + 1)
                ]
            else:
                hs = [
                    md5(s[i : i + k].encode("utf-8")).hexdigest()
                    for i in range(n - k + 1)
                ]
        else:
            hs = [md5(s.encode("utf-8")).hexdigest()]
        if len(hs) > w:
            mins = []
            dq: deque = deque()  # indices; values strictly increasing
            for i, h in enumerate(hs):
                while dq and hs[dq[-1]] >= h:
                    dq.pop()
                dq.append(i)
                if dq[0] <= i - w:
                    dq.popleft()
                if i >= w - 1:
                    mins.append(hs[dq[0]])
            out.append(list(dict.fromkeys(mins)))
        else:
            out.append([min(hs)])
    return out


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    w: int = 8,
    *,
    pre_normalized: bool = False,
) -> DataFrame:
    """Per-doc winnowed fingerprint sets: (id_col, fps array<string>).

    Semantics (position-free variant): normalize text (lowercase +
    whitespace collapse), hash every character k-gram with md5, slide
    a window of ``w`` consecutive k-gram hashes, keep each window's
    MINIMUM hash, distinct per doc. Docs shorter than ``k`` chars get
    the single fingerprint md5(norm); docs with fewer than ``w``
    k-grams get one fingerprint (the global min). Emitting the hash
    VALUE rather than (hash, position) makes the output independent of
    the paper's rightmost-tie rule — a repeated k-gram inside one
    window selects the same value either way — so the operator is
    exactly reproducible on any engine with md5 (the DuckDB oracle
    recomputes it verbatim).

    Plan shape — deliberately the OPPOSITE tradeoff from the minhash
    signature kernel above: extraction is a per-row narrow map (an
    Arrow-batched kernel, :func:`_winnow_md5_arrays`), ZERO exchanges
    and no row explosion, where the explode+window-min alternative
    would shuffle a corpus-times-chars row table (one row per
    character position) just to run a size-w window — at 100 TB that
    exchange, not CPU, is the bottleneck. Normalization stays a JVM
    projection (the cross-engine regex semantics live in ONE place,
    :func:`normalized_text`); the per-gram work runs in the Python
    kernel (r12, guide §4.2 — it replaced an interpreted
    transform/slice/array_min HOF chain whose per-gram string+hex
    allocations ran 1.9× over linear at the 100× sweep; hashlib md5
    is C, the window minimum is a monotonic-deque sliding min,
    and outputs are verified row-identical to the HOF form at every
    SF). md5 (not xxhash64) is the hash because the fingerprints
    themselves are the output contract and md5 is the only hash both
    engines define identically; :func:`winnow_fingerprints_fast` is
    the same selection with the ~3× cheaper numpy polynomial kernel
    for deployments that never cross-check engines.
    """
    if w < 1 or k < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")

    def _f(texts):
        return pd.Series(_winnow_md5_arrays(texts, k, w))

    _f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_f, "array<string>")
    # ``pre_normalized=True`` (r13): ``text_col`` already holds
    # :func:`normalized_text` output (the accuracy gate shares ONE
    # normalization pass between both hash families) — skip the
    # second, identical regex projection. normalized_text is
    # idempotent, so this is a pure cost knob, never a semantic one.
    src = (
        F.col(text_col)
        if pre_normalized
        else normalized_text(F.col(text_col))
    )
    return df.select(F.col(id_col), udf(src).alias("fps"))


def winnow_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    w: int = 8,
    df_cap: int = 64,
    overlap_threshold: float = 0.5,
    cache: bool = True,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs from a winnowed inverted index (the MOSS match
    step): docs sharing >= ``overlap_threshold`` of the smaller doc's
    fingerprints (overlap coefficient — the paper reports matches as
    fraction-of-document covered, which the containment form mirrors;
    plain Jaccard would under-score a small doc embedded in a large
    one).

    Output: (id_a, id_b, shared bigint, overlap double) with
    id_a < id_b, overlap dround(4)-rounded.

    Scale posture: the inverted index has ~2/(w+1) entries per char
    (winnowing's density guarantee), and pair generation joins the
    index with itself ON the fingerprint — cost is sum over
    fingerprints of df², NOT corpus². Fingerprints with document
    frequency > ``df_cap`` are dropped from pair generation (df=1
    too: they pair with nothing): a fingerprint shared by thousands
    of docs is boilerplate (the same rationale as the LSH bucket cap
    above and a DF-cap in the set-similarity literature), and unlike
    the LSH cap this one is DETERMINISTIC — membership depends only
    on (fp, df), never on partitioning — so the full operator is
    exactly oracle-checkable. The `shared` counts use the SAME capped
    index, so a capped fingerprint consistently contributes to
    neither candidates nor scores. Denominators use the UNCAPPED
    per-doc fingerprint counts (a doc's identity does not shrink
    because its boilerplate got capped).

    ``cache=True`` (default) ``persist()``\\ s the per-doc fingerprint
    table — it feeds the exploded index (hence df-counts, both join
    sides) AND both size lookups; uncached, the md5-per-k-gram
    extraction re-executes per branch, and WORSE: with the extraction
    inlined into each consumer plan the optimizer can collapse the
    window-min transform onto the un-materialized k-gram-hash array,
    re-evaluating the whole per-doc hash array PER WINDOW — measured
    396.7 s uncached vs 7.2 s cached for the identical 25-pair answer
    on the 500-doc sf0.01 corpus (r11; jstack shows workers inside
    the per-gram expression evaluators). ``cache=False`` is therefore
    a fixture-scale testing mode only; at corpus scale use the
    default, or land the fingerprint table to parquet first and pass
    it via ``fingerprints`` (what tools/scale_sweep.py's sharded
    runner does). Same caller-owned lifetime contract as
    :func:`prefix_filter_jaccard_pairs`: the result is lazy so this
    function cannot unpersist — call ``spark.catalog.clearCache()``
    after consuming the result when looping over parameters.

    ``fingerprints`` (optional) supplies a precomputed
    ``(id_col, fps)`` frame — any member of the winnow hash family
    (e.g. :func:`winnow_fingerprints_fast`, or an already-landed
    fingerprint table); ``k``/``w`` are then ignored. The matcher is
    family-agnostic: it only does set algebra on ``fps``.
    """
    from yahoofinancedatalake_spark.functions.scalars import (  # noqa: PLC0415
        dround,
    )

    fps = (
        fingerprints
        if fingerprints is not None
        else winnow_fingerprints(df, text_col, id_col, k=k, w=w)
    )
    if cache:
        fps = fps.persist()
    idx = fps.select(
        F.col(id_col), F.explode("fps").alias("fp")
    )
    sizes = fps.select(F.col(id_col), F.size("fps").alias("n_fp"))
    dfreq = idx.groupBy("fp").agg(F.count("*").alias("df"))
    # Every join below is hinted SHUFFLE_HASH: at corpus scale BOTH
    # sides of each one (the exploded index, the df-filtered
    # fingerprint list, the per-doc sizes) grow with the corpus, so no
    # side is ever broadcast-safe — and without the hint the static
    # planner, seeing only the cached plan's optimistic size estimate,
    # picked the 100x-replicated index as a broadcast build side and
    # overflowed spark.driver.maxResultSize (caught by the scale
    # sweep). Shuffle-hash beats sort-merge here because neither input
    # arrives sorted on fp and the aggregates downstream don't reuse a
    # sort order.
    kept = (
        idx.join(
            dfreq.filter(
                (F.col("df") >= 2) & (F.col("df") <= df_cap)
            ).hint("shuffle_hash"),
            "fp",
        )
        .select(id_col, "fp")
    )
    a = kept.select(
        F.col(id_col).alias("id_a"), F.col("fp")
    )
    b = kept.select(
        F.col(id_col).alias("id_b"), F.col("fp")
    )
    pairs = (
        a.join(b.hint("shuffle_hash"), "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_fp").alias("n_a")
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_fp").alias("n_b")
    )
    ov = F.col("shared").cast("double") / F.least("n_a", "n_b")
    return (
        pairs.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .filter(ov >= overlap_threshold)
        .select(
            "id_a",
            "id_b",
            "shared",
            dround(ov, 4).alias("overlap"),
        )
    )


def ref_winnow_fingerprints(text: str, k: int = 16, w: int = 8) -> set[str]:
    """Pure-Python reference for :func:`winnow_fingerprints` (same
    role as :func:`ref_minhash` — the property-test ground truth).

    The normalization mirrors :func:`normalized_text` EXACTLY, not
    Python's defaults: Spark ``trim`` strips only 0x20 spaces (never
    tabs/newlines — UTF8String.trim) and Java regex ``\\s`` is the
    ASCII class ``[ \\t\\n\\x0B\\f\\r]`` (no Unicode whitespace), so
    ``str.strip()`` + Python ``\\s`` would disagree on tab/newline- or
    Unicode-whitespace-edged text and yield different k-grams.
    """
    import hashlib  # noqa: PLC0415
    import re  # noqa: PLC0415

    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.strip(" ").lower())
    if len(norm) < k:
        grams = [norm]
    else:
        grams = [norm[i: i + k] for i in range(len(norm) - k + 1)]
    hs = [hashlib.md5(g.encode("utf-8")).hexdigest() for g in grams]
    m = len(hs)
    return {min(hs[j: j + w]) for j in range(max(m - w + 1, 1))}


def _winnow_fast_arrays(
    texts: pd.Series, k: int, w: int
) -> list:
    """Per text: np.unique'd uint64 winnowed fingerprints over BYTE
    k-grams of the (already normalized) text — the numpy twin of the
    md5 extraction, one vectorized pass per Arrow batch.

    Hash family: fixed-coefficient polynomial over the k bytes
    (FNV-prime powers, uint64 wraparound) + fmix64 finalization — the
    same construction as the minhash gram kernel above: k vectorized
    multiply-adds over the whole byte array, no per-gram Python. The
    corpus is ASCII so byte k-grams == the md5 family's char k-grams;
    a multibyte corpus shifts gram boundaries, which changes WHICH
    near-dups score how — acceptable for the production path, and the
    accuracy gate (winnow_fast_accuracy) is what pins the two
    families to the same answer on real data.
    """
    B = _U64(1099511628211)  # FNV-1a prime
    # powers mod 2^64 via Python int pow, then cast: numpy scalar **
    # is not guaranteed to stay in wrapping uint64 on every platform
    powers = [
        _U64(pow(1099511628211, k - 1 - j, 1 << 64)) for j in range(k)
    ]
    out = []
    for s in texts:
        if s is None:
            out.append(None)
            continue
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        n = len(b)
        if n == 0:
            out.append(np.array([0], dtype=np.int64))
            continue
        c = b.astype(_U64)
        if n >= k:
            m = n - k + 1
            g = np.zeros(m, dtype=_U64)
            for j in range(k):
                g += c[j: m + j] * powers[j]
        else:  # short doc → one whole-text gram
            acc = _U64(0)
            for j in range(n):
                acc = acc * B + c[j]
            g = np.array([acc], dtype=_U64)
        g = _fmix64(g)
        if len(g) > w:
            from numpy.lib.stride_tricks import (  # noqa: PLC0415
                sliding_window_view,
            )

            mins = sliding_window_view(g, w).min(axis=1)
        else:
            mins = np.array([g.min()], dtype=_U64)
        out.append(np.unique(mins).view(np.int64))
    return out


def winnow_fingerprints_fast(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    w: int = 8,
    *,
    pre_normalized: bool = False,
) -> DataFrame:
    """Production-path winnowing: (id_col, fps array<bigint>).

    Same selection semantics as :func:`winnow_fingerprints`
    (normalize → k-gram hash → window-min → distinct) with the hash
    family swapped from md5 (cross-engine-portable, the oracle
    contract) to the numpy polynomial kernel — measured 2.3× faster
    warm at sf0.1 (0.58 s vs 1.35 s for the full extraction), with
    the gap growing under scale's GC pressure (the md5 HOF form ran
    1.9× over linear at the 100× sweep — per-gram string+hex
    allocations; this kernel allocates two numpy arrays per doc).
    Different hash values ⇒ different (but
    equally valid) winnowed SELECTIONS, so outputs are a hash FAMILY,
    not comparable value-for-value with the md5 form; the
    ``winnow_fast_accuracy`` gate pins the two families to the same
    near-dup answer.
    """
    if w < 1 or k < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")

    def _f(texts):
        return pd.Series(_winnow_fast_arrays(texts, k, w))

    _f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_f, "array<bigint>")
    # pre_normalized: see winnow_fingerprints — share one
    # normalization pass when the caller already applied it
    src = (
        F.col(text_col)
        if pre_normalized
        else normalized_text(F.col(text_col))
    )
    return df.select(F.col(id_col), udf(src).alias("fps"))


def hybrid_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 16,
    w: int = 8,
    df_cap: int = 64,
    overlap_threshold: float = 0.6,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int = 512,
    cache: bool = True,
    fingerprints: DataFrame | None = None,
    bands: DataFrame | None = None,
) -> DataFrame:
    """Hybrid near-dup matcher: MinHash-LSH *proposes* candidate
    pairs, winnowed-fingerprint overlap *decides* — the composition
    the r10 scale sweeps recommended (SURVEY §8): the pure winnow
    matcher's pair generation grows as Σ C(df,2) over the inverted
    index (736 M candidates measured at 30×, ~8 B extrapolated at
    100×), while LSH banding's bucket-capped candidate volume grew
    only to 24.5 M at 100× — so at corpus scale the LSH stage bounds
    the pair universe and the winnow stage scores ONLY those pairs.

    Output schema and accept rule are exactly
    :func:`winnow_near_dup_pairs`'s: ``(id_a, id_b, shared bigint,
    overlap double)`` with ``id_a < id_b``, ``shared`` counted over
    the df-capped fingerprint index (a fingerprint with document
    frequency outside ``[2, df_cap]`` contributes to neither
    candidates nor scores), denominators from the UNCAPPED per-doc
    fingerprint counts, ``overlap = shared / min(n_a, n_b)`` kept at
    ``>= overlap_threshold``.

    Determinism: both stages are deterministic — the LSH bucket cap
    ranks members by ``md5(id)`` (partitioning-independent, see
    :func:`capped_bucket_members`) and the winnow df-cap depends only
    on (fp, df) — so the pair set is exactly replayable. On a corpus
    whose near-dups are true high-similarity pairs (the planted
    sf0.01/sf0.1 duplication), LSH recall over winnow-accepted pairs
    is 1 (miss prob ~1e-9 per planted pair at 8 bands × 4 hashes), so
    the output EQUALS the pure winnow matcher's and the DuckDB oracle
    is the same O(n²)-free winnow ground truth — the ``hybrid_near_dup``
    query hash-gates that equality end to end. A pair LSH misses is,
    by construction, low-Jaccard (below the ~0.72 banding knee), i.e.
    outside the near-dup contract both matchers target — with ONE
    documented exception (ADVICE r11): docs whose normalized text is
    EMPTY (``""``/whitespace-only) produce a null MinHash signature
    and are dropped before banding, so a winnow-accepted pair of two
    such docs (overlap 1.0 over their shared empty fingerprint set)
    is never proposed here. Those pairs are exact duplicates of the
    empty string, i.e. exact-dedup's job, and :func:`prep`'s
    ``exact_stage`` runs upstream of every near-dup backend, so the
    composed pipeline never sees the gap; standalone callers on a
    corpus where empty docs survive should run :func:`exact_dedup`
    first (the same precondition the LSH backend has always had).

    Plan shape: the LSH stage is the bucket-key shuffle +
    capped-bucket pair explode (never a self-join — see
    :func:`minhash_lsh_pairs`); the verify stage attaches each doc's
    df-capped fingerprint ARRAY (int64-rehashed — see below) to the
    candidate pairs with two id-keyed joins and intersects per pair
    (``array_intersect``) — the :func:`hashed_ngram_jaccard` shape,
    measured at the 100× sweep where the first-cut alternative (join
    candidates with the EXPLODED index on ``id_a`` then ``(id_b,
    fp)``) died ENOSPC: that intermediate is |candidates| × per-doc
    density ≈ 5 B rows at 100×, i.e. the very Σ df² spill the hybrid
    exists to avoid; the array form moves |candidates| rows carrying
    two ~2 KB arrays. Fingerprints are rehashed ``xxhash64(md5_hex)``
    for the verify arrays only (8 bytes vs the 32-byte hex string —
    4× less candidate-join traffic); both sides of every intersection
    use the same rehash, so ``shared`` equals the md5-string count
    modulo ~2⁻⁶⁴ collisions (the same documented tolerance as
    ``hashed_ngram_jaccard``; the md5 VALUES remain the oracle
    contract of :func:`winnow_fingerprints` itself). Every verify
    join is hinted shuffle_hash for the same reason as the pure
    winnow matcher: both sides scale with the corpus, and cached-plan
    size estimates once picked a 100×-replicated build side for
    broadcast.

    ``fingerprints`` optionally supplies a precomputed ``(id_col,
    fps)`` frame from any winnow family member (``k``/``w`` are then
    ignored); ``cache=True`` persists the fingerprint table across
    its four consumers (index explode → dfreq, the kept-array build,
    sizes) — caller releases via ``spark.catalog.clearCache()``.
    ``bands`` (optional, r13) forwards a precomputed band table to
    the LSH proposal stage — see :func:`minhash_lsh_pairs`.
    """
    from yahoofinancedatalake_spark.functions.scalars import (  # noqa: PLC0415
        dround,
    )

    # Materialize the candidate pairs (r12): the verify stage below
    # now consumes them twice — the touched-id set that bounds the
    # array build, and the pair joins themselves — and the table is
    # the LSH stage's bounded output (candidate-sized by design), so
    # the checkpoint is cheap at any corpus size.
    cand = minhash_lsh_pairs(
        df,
        text_col,
        id_col,
        n_hashes=n_hashes,
        n_bands=n_bands,
        shingle_n=shingle_n,
        seed=seed,
        max_bucket_size=max_bucket_size,
        bands=bands,
    ).transform(stage_boundary)
    touched = cand.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).dropDuplicates([id_col])
    fps = (
        fingerprints
        if fingerprints is not None
        else winnow_fingerprints(df, text_col, id_col, k=k, w=w)
    )
    if cache:
        fps = fps.persist()
    idx = fps.select(F.col(id_col), F.explode("fps").alias("fp"))
    sizes = fps.select(F.col(id_col), F.size("fps").alias("n_fp"))
    # document frequencies stay GLOBAL (the df-cap is a corpus-wide
    # statistic — restricting it would change which fingerprints are
    # boilerplate and break the winnow-equality contract)
    dfreq = idx.groupBy("fp").agg(F.count("*").alias("df"))
    # per-doc df-capped fingerprint arrays, int64-rehashed
    # (docstring), built ONLY for candidate-touched docs (r12 — the
    # incremental_hybrid_pairs verify shape applied to the batch
    # matcher): the downstream pair joins are inner on the ids, so a
    # left-semi restriction to `touched` is result-invariant and the
    # collect_list aggregation shrinks from every doc to the pair
    # universe's endpoints
    kept_arr = (
        # broadcast (r13): `touched` is <= 2x candidate pairs — bounded
        # small by design — so the shuffle_hash hint here paid two
        # corpus-side Exchanges for a model-sized build side
        idx.join(F.broadcast(touched), id_col, "left_semi")
        .join(
            dfreq.filter(
                (F.col("df") >= 2) & (F.col("df") <= df_cap)
            ).hint("shuffle_hash"),
            "fp",
        )
        .groupBy(id_col)
        .agg(F.collect_list(F.xxhash64("fp")).alias("kfps"))
    )
    fa = kept_arr.select(F.col(id_col).alias("id_a"), F.col("kfps").alias("fa"))
    fb = kept_arr.select(F.col(id_col).alias("id_b"), F.col("kfps").alias("fb"))
    pairs = (
        cand.join(fa.hint("shuffle_hash"), "id_a")
        .join(fb.hint("shuffle_hash"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("fa", "fb"))
            .cast("bigint")
            .alias("shared"),
        )
        .filter(F.col("shared") >= 1)
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_fp").alias("n_b"))
    ov = F.col("shared").cast("double") / F.least("n_a", "n_b")
    return (
        pairs.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .filter(ov >= overlap_threshold)
        .select(
            "id_a",
            "id_b",
            "shared",
            dround(ov, 4).alias("overlap"),
        )
    )


# ---------------------------------------------------------------------------
# Paragraph-granularity dedup (Lee et al. 2022 / Dolma paragraph dedup)
# ---------------------------------------------------------------------------


def paragraph_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    para_words: int = 20,
    tokens: Column | None = None,
) -> DataFrame:
    """Sub-document dedup at PARAGRAPH granularity — the last
    published member of the dedup ladder (Lee et al. 2022,
    arXiv:2107.06499: duplicated spans are removed from *surviving*
    documents too; Dolma's paragraph-level dedup, arXiv:2402.00159
    §2.2): split each doc into paragraphs, fingerprint the normalized
    paragraph, keep only the FIRST occurrence corpus-wide
    (deterministic min ``(id, position)`` — the same survivor
    convention as :func:`exact_dedup` / the winnow matcher), and
    reassemble each doc from its surviving paragraphs.

    Semantics vs the two span-family neighbors already in the pack:
    ``span_dedup_c4`` removes EVERY occurrence of a corpus-frequent
    span (C4's boilerplate rule); ``chunk_dedup``/``exact_dedup``
    decide whole documents. This keeps exactly one copy of each
    duplicated paragraph and rewrites the rest — the rule the
    published pipelines apply between doc-level dedup and selection.

    The paragraph unit is parameterized: production corpora split on
    blank lines (``\\n{2,}``) — pass ``tokens=None`` and pre-split
    upstream, or pass a custom token Column; this corpus carries no
    newlines (TESTDATA.md), so the unit is non-overlapping
    ``para_words``-word windows over the word-token stream, exactly
    the ``span_dedup_c4`` convention. Docs with zero tokens are
    excluded (no paragraphs to decide).

    Returns ``(id_col, n_paras, n_kept, chars_removed, new_text)``
    per doc, where ``new_text`` is the kept paragraphs joined in
    original order (empty string when every paragraph lost) and
    ``chars_removed`` sums the dropped paragraphs' lengths.

    Plan/scale shape: paragraph TEXT never rides a shuffle — the
    winner election groups only ``(md5, id, pos)`` rows (~50 bytes)
    with MAP-SIDE partial min, so a boilerplate mega-paragraph
    collapses per task before its exchange (the window/row_number
    formulation the oracle uses was rejected for the engine side: no
    partial aggregation, one hot task per viral paragraph); the
    flag join back is hinted shuffle_hash (both sides corpus-sized);
    reassembly re-derives spans map-side from the doc's own tokens
    and keeps positions from the per-doc kept-array, so the only
    text movement is the final ``id``-equi-join — exchange-free when
    the corpus is bucketed by id at rest. Fully SQL-expressible →
    hash-gated end to end (the ``paragraph_dedup`` query).
    """
    toks = (
        tokens
        if tokens is not None
        else F.filter(
            F.split(normalized_text(F.col(text_col)), " "),
            lambda t: t != "",
        )
    )
    base = df.select(F.col(id_col), toks.alias("__w")).filter(
        F.size("__w") > 0
    )
    n_spans = F.ceil(F.size("__w") / F.lit(float(para_words))).cast("int")
    span_at = lambda p: F.array_join(  # noqa: E731
        F.slice("__w", p * para_words + 1, para_words), " "
    )
    spans_meta = base.select(
        id_col,
        F.posexplode(
            F.transform(F.sequence(F.lit(0), n_spans - 1), span_at)
        ).alias("pos", "__span"),
    ).select(
        id_col,
        "pos",
        F.md5("__span").alias("h"),
        F.length("__span").alias("span_len"),
    )
    win = spans_meta.groupBy("h").agg(
        F.min(
            F.struct(
                F.col(id_col).alias("w_id"), F.col("pos").alias("w_pos")
            )
        ).alias("w")
    )
    keep = (F.col(id_col) == F.col("w.w_id")) & (
        F.col("pos") == F.col("w.w_pos")
    )
    flags = spans_meta.join(win.hint("shuffle_hash"), "h").select(
        id_col, "pos", "span_len", keep.alias("keep")
    )
    per_doc = flags.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paras"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept"),
        F.sum(
            F.when(~F.col("keep"), F.col("span_len")).otherwise(0)
        ).cast("bigint").alias("chars_removed"),
        F.array_sort(
            F.collect_list(F.when(F.col("keep"), F.col("pos")))
        ).alias("__kept_pos"),
    )
    return base.join(per_doc, id_col).select(
        id_col,
        "n_paras",
        "n_kept",
        "chars_removed",
        F.array_join(
            F.transform("__kept_pos", span_at), " "
        ).alias("new_text"),
    )


def incremental_hybrid_pairs(
    new_docs: DataFrame,
    band_index: DataFrame,
    fp_index: DataFrame,
    fp_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 16,
    w: int = 8,
    df_cap: int = 64,
    overlap_threshold: float = 0.6,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int = 512,
    cache: bool = True,
    new_bands: DataFrame | None = None,
    new_fps: DataFrame | None = None,
) -> DataFrame:
    """Hybrid near-dup pairs for an INCREMENT against persisted state
    — the daily-ingest mode of :func:`hybrid_near_dup_pairs`
    (streaming rung 16, VERDICT r11 #4): only the new batch is
    shingled/minhashed/winnowed; history participates through three
    landed tables and is NEVER rescanned:

    - ``band_index``: the accumulated ``(id, band, bucket)`` rows
      (:func:`minhash_band_table` output) — candidate generation is
      :func:`incremental_minhash_pairs` (O(batch) hash + indexed
      bucket join, pairs with >= 1 new endpoint);
    - ``fp_index``: the accumulated EXPLODED ``(id, fp)`` winnow
      fingerprint rows (uncapped) — consumed ONLY via a semi-join on
      candidate-touched ids, so the verify stage reads O(touched
      docs x fps/doc) rows, not the corpus (bucketed by id at rest
      the probe is exchange-free; the locality is pinned by pytest:
      corrupting every non-touched row changes nothing);
    - ``fp_df``: the accumulated per-fingerprint document
      frequencies — consumed only for the touched docs' fingerprints
      (a semi-join on ~batch-sized distinct fps).

    Document frequencies for the df-cap are ``history + batch``
    (``fp_df`` already covers ALL of history, the batch's own counts
    are one O(batch) aggregation), so every decision this batch
    makes equals what a full :func:`hybrid_near_dup_pairs` over
    (history ∪ batch) decides — the ``stream_hybrid_dedup_batch_eq``
    gate asserts the pair sets are identical minus the already-known
    old×old pairs. Precondition: batch ids are disjoint from history
    ids (a re-ingested id would double-count its fingerprints in the
    df — land upserts before re-probing; the candidate stage handles
    replayed ids, see :func:`incremental_minhash_pairs`).

    Multi-epoch semantics (documented, not hidden): each batch is
    decided under the state SO FAR — a fingerprint whose df later
    crosses the cap does not retro-revise earlier batches' accepted
    pairs (exactly the published incremental-dedup contract; a
    periodic full recompute is the compaction that reconciles, same
    as for the LSH bucket caps). After the probe the caller appends
    the batch's band rows, fp rows, and merged df counts to state.

    ``cache=True`` persists the three internally multi-consumed
    frames (candidates, the batch fingerprint index, the touched-doc
    index) — without it the interpreted winnow HOF extraction and
    the whole candidate pipeline re-evaluate inside every join
    branch, the same measured blowup the batch matcher documents;
    caller releases via ``spark.catalog.clearCache()``.

    ``new_bands`` / ``new_fps`` (optional, r13) supply the batch's
    precomputed band table / winnow fingerprint frame (hash and
    ``k``/``w`` parameters are then ignored). The streaming caller
    appends both to state after the probe — pass persisted frames
    and the batch pays each extraction pass once instead of twice.
    """
    cand = incremental_minhash_pairs(
        new_docs,
        band_index,
        text_col,
        id_col,
        n_hashes=n_hashes,
        n_bands=n_bands,
        shingle_n=shingle_n,
        seed=seed,
        max_bucket_size=max_bucket_size,
        new_bands=new_bands,
    )
    if new_fps is None:
        new_fps = winnow_fingerprints(new_docs, text_col, id_col, k=k, w=w)
    if cache:
        # persist the ARRAY form before exploding: Generate over the
        # un-materialized interpreted-HOF extraction re-evaluates the
        # whole per-doc transform per output row (measured 90.8 s vs
        # 1.7 s on a 94-doc batch) — the batch matcher's documented
        # uncached pathology, same fix
        cand = cand.persist()
        new_fps = new_fps.persist()
    new_idx = new_fps.select(
        F.col(id_col), F.explode("fps").alias("fp")
    )
    batch_df = new_idx.groupBy("fp").agg(F.count("*").alias("bdf"))
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    rel_idx = (
        new_idx.join(ids, id_col, "left_semi")
        .unionByName(
            fp_index.select(F.col(id_col), "fp").join(
                ids, id_col, "left_semi"
            )
        )
    )
    if cache:
        rel_idx = rel_idx.persist()
    rel_fps = rel_idx.select("fp").distinct()
    df_tot = (
        rel_fps.join(fp_df.hint("shuffle_hash"), "fp", "left")
        .join(batch_df.hint("shuffle_hash"), "fp", "left")
        .select(
            "fp",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("bdf"), F.lit(0))
            ).alias("df_tot"),
        )
    )
    kept = df_tot.filter(
        (F.col("df_tot") >= 2) & (F.col("df_tot") <= df_cap)
    ).select("fp")
    kept_arr = (
        rel_idx.join(kept.hint("shuffle_hash"), "fp")
        .groupBy(id_col)
        .agg(F.collect_list(F.xxhash64("fp")).alias("kfps"))
    )
    sizes = rel_idx.groupBy(id_col).agg(F.count("*").alias("n_fp"))
    fa = kept_arr.select(
        F.col(id_col).alias("id_a"), F.col("kfps").alias("fa")
    )
    fb = kept_arr.select(
        F.col(id_col).alias("id_b"), F.col("kfps").alias("fb")
    )
    pairs = (
        cand.join(fa.hint("shuffle_hash"), "id_a")
        .join(fb.hint("shuffle_hash"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("fa", "fb"))
            .cast("bigint")
            .alias("shared"),
        )
        .filter(F.col("shared") >= 1)
    )
    from yahoofinancedatalake_spark.functions.scalars import (  # noqa: PLC0415
        dround,
    )

    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_fp").alias("n_b"))
    ov = F.col("shared").cast("double") / F.least("n_a", "n_b")
    return (
        pairs.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .filter(ov >= overlap_threshold)
        .select("id_a", "id_b", "shared", dround(ov, 4).alias("overlap"))
    )
