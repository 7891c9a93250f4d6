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
    directory first and swaps in via rename, so readers never observe
    a half-written table (the same no-rm-window reasoning as
    ``write_parquet``'s real overwrite).
    """
    import math  # noqa: PLC0415

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    tmp = jvm.org.apache.hadoop.fs.Path(path + "__compacting")
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(
        str(tmp)
    )
    old = jvm.org.apache.hadoop.fs.Path(path + "__precompact")
    fs.rename(hpath, old)
    fs.rename(tmp, hpath)
    fs.delete(old, True)
    return n


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
