"""File-level data skipping for plain parquet — a minimal manifest.

Spark's parquet reader already prunes ROW GROUPS from footer stats,
but it must still OPEN every file to read its footer: at 100 TB with
~100k files, that is ~100k small reads before the first data byte —
the exact problem Delta/Iceberg solve by keeping per-file column
stats in a manifest consulted at planning time. This module is that
idea for plain parquet directories, sized to the engine's
``write_clustered`` / ``write_zordered`` layouts (clustering is what
makes per-file ranges narrow enough to skip):

- :func:`write_manifest` — after a write, collect per-file min/max
  for the requested columns from the parquet FOOTERS (driver-side
  pyarrow metadata reads: O(files) footer fetches done ONCE at write
  time, amortized over every future query) into
  ``_manifest.json`` next to the data (underscore prefix → invisible
  to Spark's file listing, same convention as ``_SUCCESS``).
- :func:`write_manifest` with ``bloom_columns`` — per-file Bloom
  filters over a column's distinct values, the skipping story for
  EQUALITY predicates on high-cardinality keys where every file's
  [min, max] spans the whole domain and range stats skip nothing
  (the gap Parquet column blooms / Delta bloom indexes fill).
- :func:`pruned_files` / :func:`read_pruned` — at query time, drop
  every file whose [min, max] cannot intersect the predicate (and,
  for ``eq=`` probes, whose bloom proves the key absent — blooms
  have no false negatives, so skipping stays exact) and hand Spark
  only the survivors. Planning cost is one tiny JSON read; the
  cluster never schedules a task for a skipped file.

Correctness contract: pruning only ever REMOVES files that cannot
contain matches (interval disjointness), so
``read_pruned(...).filter(pred)`` ≡ ``read(path).filter(pred)`` —
asserted in tests against both clustered and unclustered layouts
(an unclustered layout simply skips nothing).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_manifest.json"

#: Bumped whenever the stat serialization changes shape. v2: datetimes
#: stored as ISO-8601 with the 'T' separator (lexicographic ==
#: chronological). A v1 manifest (str(datetime), space separator)
#: compared against v2 bounds would prune files that DO contain
#: matches (' ' < 'T' makes every v1 timestamp sort below every v2
#: bound) — silent row loss. v3: per-file entries are
#: ``{"stats": {col: [lo, hi]}, "blooms": {col: {m, k, bits}}}``.
#: v4: tz-aware datetimes normalize to naive UTC before
#: serialization (a v3 manifest over a Spark-written timestamp
#: column stored '+00:00' suffixes that sort ABOVE offset-less
#: bounds for the same instant — mis-prune, so v3 must not be
#: consulted). Version-mismatched manifests therefore disable
#: skipping entirely instead of mis-pruning.
FORMAT_VERSION = 4


def write_manifest(
    path: str,
    columns: list[str],
    bloom_columns: list[str] | None = None,
    bloom_fpp: float = 0.01,
) -> dict:
    """Collect per-file min/max for ``columns`` from parquet footers
    under ``path`` (non-recursive: one directory = one table or one
    partition) and land them as ``_manifest.json``. Returns the
    manifest dict. The range stats are cheap (footer metadata only,
    no data pages).

    ``bloom_columns`` additionally builds a per-file Bloom filter
    over each listed column's distinct values — the skipping story
    for EQUALITY predicates on high-cardinality keys, where min/max
    spans nearly the whole domain in every file and range stats skip
    nothing (the same gap Parquet column bloom filters / Delta
    bloom indexes fill). Building a bloom reads the column's data
    pages for each file — here a write-time driver-side pyarrow
    scan, amortized over every future point lookup; at 100 TB the
    identical bitmaps are computed inside the writer job per output
    file (the writer already holds the values) and only the encoded
    bits land in the manifest."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    files = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        pf = pq.ParquetFile(os.path.join(path, name))
        md = pf.metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict = {}
        for col in columns:
            if col not in idx:
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx[col]).statistics
                if s is None or not s.has_min_max:
                    ok = False  # a stats-less row group poisons the file
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            if ok and lo is not None:
                plo, phi = _plain(lo), _plain(hi)
                if plo is not None and phi is not None:
                    stats[col] = [plo, phi]
        blooms: dict = {}
        for col in bloom_columns or []:
            if col not in idx:
                continue
            keys = set()
            for v in pf.read(columns=[col]).column(col).to_pylist():
                if v is None:
                    continue
                key = _bloom_key(v)
                if key is None:
                    # un-canonicalizable type (e.g. Decimal): no bloom
                    # for this column at all — skipping must never be
                    # built on a representation that can disagree with
                    # value equality
                    keys = None
                    break
                keys.add(key)
            if keys is not None:
                blooms[col] = _bloom_build(keys, bloom_fpp)
        files[name] = {"stats": stats, "blooms": blooms}
    manifest = {"format": FORMAT_VERSION, "columns": columns, "files": files}
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f)
    return manifest


def _utc_naive(v):
    """Normalize a tz-aware datetime to naive UTC. pyarrow returns
    tz-AWARE datetimes for Spark-written TIMESTAMP (instant) columns,
    whose ``isoformat()`` carries a ``+00:00`` suffix; caller-supplied
    probe bounds are usually NAIVE and serialize without it. Mixing
    the two breaks both skipping paths (review-confirmed repro): the
    range check prunes a file whose stored min EQUALS the hi bound
    (``'...T02:00:00+00:00' > '...T02:00:00'`` lexicographically),
    and a bloom probe false-negatives on a present key — both silent
    row loss. All stat/bound/bloom canonicalizers therefore convert
    tz-aware values to UTC and strip the offset; naive datetimes are
    by contract interpreted as UTC (which is what Spark's
    session-UTC configuration yields)."""
    import datetime as dt  # noqa: PLC0415

    if isinstance(v, dt.datetime) and v.tzinfo is not None:
        return v.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return v


def _bloom_key(v) -> "tuple[str, str] | None":
    """Typed canonical key for bloom hashing — the representation
    that two values share IFF an equality predicate treats them as
    equal. ``repr()`` alone is NOT that (review-confirmed repro:
    ``repr(5) != repr(5.0)`` but ``k = 5.0`` matches an int 5 under
    numeric promotion — a raw-repr bloom would false-negative and
    silently prune a matching file). Integral floats canonicalize to
    the int form; midnight naive datetimes to the date form; bools
    get their own tag (``True == 1`` is a numeric-promotion question
    callers shouldn't pay row loss for, so they are kept apart from
    ints only via the int tag sharing below being deliberate: bool
    IS an int in Python and in predicate promotion). Types with no
    reliable canonical form (Decimal, ...) return None — the caller
    then refuses to build/consult a bloom, same conservatism as the
    range path's TypeError keep."""
    import datetime as dt  # noqa: PLC0415

    if isinstance(v, bool):
        return ("i", str(int(v)))
    if isinstance(v, int):
        return ("i", str(v))
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            return ("f", repr(v))
        if v.is_integer():
            return ("i", str(int(v)))
        return ("f", repr(v))
    if isinstance(v, dt.datetime):
        v = _utc_naive(v)  # tz-aware → naive UTC, see _utc_naive
        if v.time() == dt.time(0, 0):
            return ("t", v.date().isoformat())
        return ("t", v.isoformat())
    if isinstance(v, dt.date):
        return ("t", v.isoformat())
    if isinstance(v, bytes):
        return ("s", v.decode("utf-8", "replace"))
    if isinstance(v, str):
        return ("s", v)
    return None


def _bloom_build(values: set, fpp: float) -> dict:
    """Standard Bloom sizing (m = -n ln p / ln²2, k = m/n ln 2) with
    md5 double hashing over :func:`_bloom_key` canonical keys — the
    probe side canonicalizes identically, so membership of every
    inserted value is exact (no false negatives by construction)."""
    import base64  # noqa: PLC0415
    import math  # noqa: PLC0415

    n = max(len(values), 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    bits = bytearray(m // 8)
    for v in values:
        for pos in _bloom_positions(v, m, k):
            bits[pos >> 3] |= 1 << (pos & 7)
    return {"m": m, "k": k, "bits": base64.b64encode(bytes(bits)).decode()}


def _bloom_positions(v, m: int, k: int):
    import hashlib  # noqa: PLC0415

    h = hashlib.md5(repr(v).encode("utf-8")).digest()
    h1 = int.from_bytes(h[:8], "little")
    h2 = int.from_bytes(h[8:], "little") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_contains(bloom: dict, key: "tuple[str, str]") -> bool:
    import base64  # noqa: PLC0415

    bits = base64.b64decode(bloom["bits"])
    return all(
        bits[pos >> 3] & (1 << (pos & 7))
        for pos in _bloom_positions(key, bloom["m"], bloom["k"])
    )


def _plain(v):
    """JSON-safe, order-preserving scalar — or None for types whose
    string form does not compare in value order (e.g. Decimal:
    '9' > '10' lexicographically), which must not be pruned on."""
    import datetime as dt  # noqa: PLC0415

    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    # ISO-8601 with 'T' separator: lexicographic == chronological,
    # and the same form callers get from _bound() at prune time.
    # Tz-aware values normalize to naive UTC first (_utc_naive) so the
    # stored form never carries a '+00:00' suffix that would sort
    # above an offset-less bound for the same instant.
    if isinstance(v, dt.datetime):
        return _utc_naive(v).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bool, int, float, str)):
        return v
    return None


def _bound(v):
    """Normalize a caller-supplied predicate bound the same way the
    stored stats were normalized, so comparisons are like-typed."""
    import datetime as dt  # noqa: PLC0415

    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, dt.datetime):
        return _utc_naive(v).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def pruned_files(
    path: str, col: str, lo=None, hi=None, eq=None
) -> tuple[list[str], int]:
    """Files under ``path`` that may contain matching rows, per the
    manifest: ``lo <= col <= hi`` (either bound optional) and/or
    ``col = eq`` (range stats AND the per-file Bloom filter, when one
    was written for ``col``). Files without stats/bloom for ``col``
    are always kept (skipping must be conservative). Returns
    (kept file paths, total file count)."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    stale_format = manifest.get("format") != FORMAT_VERSION
    if eq is not None:
        # an equality probe also bounds the range check
        lo = eq if lo is None else lo
        hi = eq if hi is None else hi
    eq_key = None if eq is None else _bloom_key(eq)
    lo, hi = _bound(lo), _bound(hi)
    kept = []
    total = 0
    for name, entry in manifest["files"].items():
        if not os.path.exists(os.path.join(path, name)):
            # deleted since write_manifest — scheduling it would fail
            # the read; dropping it is exact (no rows to miss)
            continue
        total += 1
        if stale_format:
            kept.append(os.path.join(path, name))
            continue
        s = entry["stats"].get(col)
        bloom = entry.get("blooms", {}).get(col)
        if s is not None:
            fmin, fmax = s
            try:
                if lo is not None and fmax < lo:
                    continue  # entire file below the range
                if hi is not None and fmin > hi:
                    continue  # entire file above the range
            except TypeError:
                # stat/bound type mismatch — never prune on an
                # uncomparable pair
                pass
        if eq_key is not None and bloom is not None:
            if not _bloom_contains(bloom, eq_key):
                continue  # definitely-absent key (no false negatives)
        kept.append(os.path.join(path, name))
    # staleness guard: files appended AFTER write_manifest have no
    # stats row — they must be READ, not silently dropped, or the
    # pruned-read ≡ full-read contract breaks. Same conservatism as
    # the stats-less case; re-run write_manifest to regain skipping.
    for name in sorted(os.listdir(path)):
        if (
            name.endswith(".parquet")
            and not name.startswith(("_", "."))
            and name not in manifest["files"]
        ):
            total += 1
            kept.append(os.path.join(path, name))
    return kept, total


def read_pruned(
    spark: SparkSession, path: str, col: str, lo=None, hi=None, eq=None
) -> DataFrame:
    """``spark.read.parquet`` over only the files that can match
    ``lo <= col <= hi`` / ``col = eq``. The predicate itself is NOT
    applied — callers keep their own ``.filter`` (row groups inside
    kept files still prune via footer stats as usual). An empty
    survivor set returns an empty frame with the table's schema."""
    files, _ = pruned_files(path, col, lo, hi, eq)
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*files)
