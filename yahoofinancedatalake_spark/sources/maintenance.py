"""Table maintenance telemetry: the measurement before the fix.

``compact_parquet`` (parquet_io) is the fix for small-file sprawl;
this module is the measurement that decides WHEN to run it — the
same split as key_skew_profile (measure) vs salted_join (fix). A
100 TB lake ingesting micro-batches degrades scan throughput long
before anything errors: every file under ~32 MB costs a task whose
scheduling overhead rivals its IO, and footer reads scale with file
count, not bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Files below this fraction of the target size count as "small".
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def file_report(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> DataFrame:
    """One row per data file under ``path`` (recursive):
    (file, bytes, is_small). Driver-side FileSystem listing — file
    METADATA, not data; a directory listing is O(file count) and this
    is exactly what table formats keep in their manifests."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    rows = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        base = st.getPath().getName()
        if base.startswith("_") or base.startswith("."):
            continue  # commit markers / CRCs, not data
        rows.append((name, int(st.getLen())))
    df = spark.createDataFrame(rows, "file string, bytes long")
    from pyspark.sql import functions as F  # noqa: PLC0415

    return df.withColumn(
        "is_small", F.col("bytes") < target_bytes // 4
    )


def compaction_needed(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    small_file_ratio: float = 0.5,
    min_files: int = 8,
) -> bool:
    """The compaction trigger policy: compact when the table has at
    least ``min_files`` data files and more than ``small_file_ratio``
    of them are small. Thresholded on file COUNT ratio, not byte
    ratio — small files hurt through task count and footer reads,
    which scale with how many there are, not how big they aren't."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    row = (
        file_report(spark, path, target_bytes)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_small").cast("long")).alias("n_small"),
        )
        .collect()[0]
    )
    if row.n < min_files:
        return False
    return (row.n_small / row.n) > small_file_ratio
