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
- :func:`pruned_files` / :func:`read_pruned` — at query time, drop
  every file whose [min, max] cannot intersect the predicate and
  hand Spark only the survivors. Planning cost is one tiny JSON
  read; the cluster never schedules a task for a skipped file.

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
#: bound) — silent row loss. Version-mismatched manifests therefore
#: disable skipping entirely instead of mis-pruning.
FORMAT_VERSION = 2


def write_manifest(path: str, columns: list[str]) -> dict:
    """Collect per-file min/max for ``columns`` from parquet footers
    under ``path`` (non-recursive: one directory = one table or one
    partition) and land them as ``_manifest.json``. Returns the
    manifest dict. Cheap: footer metadata only, no data pages."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    files = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
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
        files[name] = stats
    manifest = {"format": FORMAT_VERSION, "columns": columns, "files": files}
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f)
    return manifest


def _plain(v):
    """JSON-safe, order-preserving scalar — or None for types whose
    string form does not compare in value order (e.g. Decimal:
    '9' > '10' lexicographically), which must not be pruned on."""
    import datetime as dt  # noqa: PLC0415

    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    # ISO-8601 with 'T' separator: lexicographic == chronological,
    # and the same form callers get from _bound() at prune time
    if isinstance(v, dt.datetime):
        return v.isoformat()
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
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return v


def pruned_files(
    path: str, col: str, lo=None, hi=None
) -> tuple[list[str], int]:
    """Files under ``path`` that may contain rows with
    ``lo <= col <= hi`` (either bound optional), per the manifest.
    Files without stats for ``col`` are always kept (skipping must
    be conservative). Returns (kept file paths, total file count)."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    stale_format = manifest.get("format") != FORMAT_VERSION
    lo, hi = _bound(lo), _bound(hi)
    kept = []
    total = 0
    for name, stats in manifest["files"].items():
        if not os.path.exists(os.path.join(path, name)):
            # deleted since write_manifest — scheduling it would fail
            # the read; dropping it is exact (no rows to miss)
            continue
        total += 1
        s = None if stale_format else stats.get(col)
        if s is None:
            kept.append(os.path.join(path, name))
            continue
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
    spark: SparkSession, path: str, col: str, lo=None, hi=None
) -> DataFrame:
    """``spark.read.parquet`` over only the files that can match
    ``lo <= col <= hi``. The predicate itself is NOT applied — callers
    keep their own ``.filter`` (row groups inside kept files still
    prune via footer stats as usual). An empty survivor set returns
    an empty frame with the table's schema."""
    files, _ = pruned_files(path, col, lo, hi)
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*files)
