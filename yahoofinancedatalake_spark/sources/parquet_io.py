"""Parquet IO and the keyed serving sink (SURVEY.md §2.1 S2-S5, S10-S13).

The reference emulates overwrite with ``safe_rmtree`` + append
(format_to_parquet.py:26-33,78-83) and serves queries from three
Elasticsearch indices with keyed upserts (to_elasticsearch.py). Here:

- real ``mode("overwrite")`` — Spark's commit protocol handles
  atomicity; no rm-then-write window where readers see nothing;
- the ES "index with keyed ``_id`` upsert" becomes a *keyed gold
  table*: partition-overwrite upsert on a partition column (Delta
  ``MERGE INTO`` is the drop-in upgrade when delta-spark is on the
  cluster; gated behind import so this repo has no hard dependency).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """Snappy parquet sink (Spark default codec, like the reference)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def upsert_by_partition(
    spark: SparkSession, df: DataFrame, path: str, partition_col: str
) -> None:
    """Keyed upsert via dynamic partition overwrite.

    Replaces the ES bulk upsert with ``_id = f"{symbol}_{date}"``
    (to_elasticsearch.py:66-80): rows are keyed by ``partition_col``
    and only the partitions present in ``df`` are replaced —
    untouched history stays. This is the idempotent incremental write
    the reference gets from ES document ids, at file-system cost
    O(changed partitions), not O(table).
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write-time hash bucketing: the co-located-join primitive.

    ``bucketBy(n, keys) + sortBy(keys)`` persists the table
    pre-partitioned AND pre-sorted on the join/aggregation key, so two
    tables bucketed the same way join with **zero exchange and zero
    sort** — at 100 TB this converts every recurring fact⋈fact join
    from a full shuffle of both sides into a streaming zip of
    co-numbered buckets. ``tests/test_parquet_io.py`` asserts the
    exchange-free plan. Bucketed writes go through the session catalog
    (``saveAsTable``) because bucket metadata lives in the metastore;
    pass an explicit LOCATION-style ``path`` to keep data on the lake.
    """
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ~``target_file_bytes`` files. Returns the new file count.

    Streaming sinks and frequent incremental upserts accumulate small
    files; at 100 TB the scan's task count (and the NameNode/listing
    load) follows file count, so periodic compaction to ~128 MB is
    standard lake maintenance. The rewrite lands in a sibling
    directory first and swaps in via two renames. Stale temp dirs
    from a crashed prior run are deleted up front and every rename's
    boolean return is asserted (HDFS ``rename`` into an existing dir
    silently *nests* the source — the failure mode the assertions
    catch). NOTE the swap itself is two renames, not one atomic op:
    there is a sub-second window where ``path`` does not exist and a
    concurrent reader's listing fails — schedule compaction off-peak
    or behind a table lock; single-writer pipelines (this repo's
    ``Pipeline``) are unaffected.
    """
    import math  # noqa: PLC0415

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    tmp = jvm.org.apache.hadoop.fs.Path(path + "__compacting")
    old = jvm.org.apache.hadoop.fs.Path(path + "__precompact")
    for stale in (tmp, old):  # crashed prior run → rename would nest
        if fs.exists(stale):
            fs.delete(stale, True)
    total = fs.getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(
        str(tmp)
    )
    if not fs.rename(hpath, old):
        raise OSError(f"compact_parquet: rename {path} -> {old} failed")
    if not fs.rename(tmp, hpath):
        fs.rename(old, hpath)  # roll back so the live table survives
        raise OSError(f"compact_parquet: rename {tmp} -> {path} failed")
    fs.delete(old, True)
    return n


def upsert_rows(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    partition_col: str,
) -> list[str]:
    """Row-level keyed upsert — the exact ES semantics of
    ``_id = f"{symbol}_{date}"`` (reference to_elasticsearch.py:78):
    each incoming row replaces the existing row with the same
    ``key_cols`` tuple; all other rows survive untouched.

    Parquet-native MERGE at O(touched partitions) write cost:

    1. touched = distinct ``partition_col`` values in ``df`` (a
       partition value count, not a row count — bounded by the number
       of partitions a batch can span, e.g. symbols or dates);
    2. read ONLY those partitions of the existing table (the ``isin``
       filter partition-prunes the scan), anti-join on ``key_cols`` to
       keep survivors;
    3. survivors ∪ incoming land in a staging dir partitioned by
       ``partition_col``; each touched partition dir is swapped into
       the live table by delete+rename (per-partition atomic).

    Untouched partitions are never read, never rewritten — write
    amplification is O(touched partitions' files), not O(history).
    This is exactly Delta/Iceberg ``MERGE`` with copy-on-write
    granularity = partition; :func:`upsert_delta_merge` is the
    file-granularity upgrade when delta-spark is on the cluster.
    Returns the list of swapped partition directory names.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        write_parquet(df, path, partition_by=[partition_col])
        return sorted(
            s.getPath().getName()
            for s in fs.listStatus(hpath)
            if s.isDirectory()
        )

    touched = [
        r[0] for r in df.select(partition_col).distinct().collect()
    ]
    existing = spark.read.parquet(path).filter(
        F.col(partition_col).isin(touched)
    )
    survivors = existing.join(
        df.select(*key_cols).distinct(), list(key_cols), "left_anti"
    )
    merged = survivors.unionByName(df.select(*existing.columns))

    staging = path + "__upserting"
    spath = jvm.org.apache.hadoop.fs.Path(staging)
    if fs.exists(spath):  # stale staging from a crashed prior run
        fs.delete(spath, True)
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)

    # Swap the partition dirs Spark actually wrote (robust to partition
    # value escaping) — delete-then-rename per partition, asserting the
    # rename boolean like compact_parquet.
    swapped: list[str] = []
    for status in fs.listStatus(spath):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        dst = jvm.org.apache.hadoop.fs.Path(path + "/" + name)
        if fs.exists(dst):
            fs.delete(dst, True)
        if not fs.rename(status.getPath(), dst):
            raise OSError(f"upsert_rows: rename {name} -> {dst} failed")
        swapped.append(name)
    fs.delete(spath, True)
    return sorted(swapped)


def upsert_delta_merge(
    spark: SparkSession, df: DataFrame, path: str, key_cols: Sequence[str]
) -> bool:
    """Row-level keyed upsert via Delta ``MERGE INTO`` when available.

    Returns False (caller falls back to ``upsert_by_partition``) if
    delta-spark isn't installed — this container does not ship it.
    """
    try:
        from delta.tables import DeltaTable  # noqa: PLC0415
    except ImportError:
        return False
    if not DeltaTable.isDeltaTable(spark, path):
        df.write.format("delta").mode("overwrite").save(path)
        return True
    target = DeltaTable.forPath(spark, path)
    cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    (
        target.alias("t")
        .merge(df.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return True


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Data-layout sink: range-partition then sort each file by
    ``cluster_cols`` so parquet row-group min/max statistics become
    selective — the plain-parquet version of Delta/Iceberg
    ``CLUSTER BY`` (linear clustering; a Z-order curve generalizes
    this to multi-column predicates).

    Why it matters at 100 TB: a filter on the cluster column prunes
    at THREE levels — partition files (each holds a disjoint range,
    from ``repartitionByRange``), row groups inside each file
    (min/max footer stats, from ``sortWithinPartitions``), and pages.
    On unclustered data the same filter scans every file because each
    one spans the full value range. The write costs one range
    exchange (sampled boundaries) + a per-partition sort — both
    spill-safe — and is the standard once-per-table investment for
    scan-heavy workloads keyed by time/id.
    """
    out = df.repartitionByRange(
        *( [n_files] if n_files else [] ), *cluster_cols
    ).sortWithinPartitions(*cluster_cols)
    out.write.mode(mode).parquet(path)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int | None = None,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustered write: multi-column locality.

    :func:`write_clustered` gives perfect pruning on ONE column and
    none on the others; interleaving the bits of each column's
    bin id makes files cover hyper-rectangles of the combined space,
    so min/max footer stats prune on EVERY clustered column — the
    Delta ``ZORDER BY`` / Iceberg sort-order idea on plain parquet.

    Mechanics: each column is min/max-scaled into ``2^bits`` uniform
    bins (one tiny 1-row agg to fetch the ranges — metadata, like a
    table-stats pass; rank-based binning via approx quantiles is the
    upgrade for heavily skewed columns), the bin ids' bits are
    interleaved JVM-side into the Morton value, and the write range-
    partitions + locally sorts by it. The z column is dropped from
    the files.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"__mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    n_bins = (1 << bits) - 1
    bin_cols = []
    for i, c in enumerate(cols):
        mn, mx = stats[f"__mn_{i}"], stats[f"__mx_{i}"]
        span = (mx - mn) or 1.0
        bin_cols.append(
            F.least(
                F.lit(n_bins),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn))
                    / F.lit(span) * F.lit(n_bins + 1)
                ).cast("int"),
            )
        )
    # Morton interleave: output bit (b * n_cols + j) takes bit b of
    # column j's bin id — a pure JVM bitwise expression, no UDF
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, bc in enumerate(bin_cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bc.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * len(cols) + j,
                )
            )
    tagged = df.withColumn("__z", z)
    out = tagged.repartitionByRange(
        *( [n_files] if n_files else [] ), "__z"
    ).sortWithinPartitions("__z").drop("__z")
    out.write.mode(mode).parquet(path)


def read_parquet_evolving(
    spark: SparkSession, path: str
) -> DataFrame:
    """Schema-evolution read: union the schemas of every file under
    ``path`` (``mergeSchema``) so old files simply carry nulls for
    columns added later — the bronze-layer contract for additive
    drift (new REST fields, new vendor columns).

    Trade documented: mergeSchema reads every footer up front
    (expensive at 100k files — that's what a real metastore/table
    format amortizes), so the engine default stays single-schema
    reads; this is the explicit opt-in for evolving bronze dirs.
    Renames/retypes are NOT handled — those are breaking changes that
    belong in a silver migration, not a read option.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)
