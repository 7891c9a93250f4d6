"""Bronze JSON sources (SURVEY.md §2.1 S1, S9).

The reference writes pretty-printed JSON *arrays* and reads them with
``multiLine=true`` (format_to_parquet.py:65) — one Spark task per
file, a hard parallelism ceiling. This engine standardizes on JSON
Lines: splittable, schema-enforced (no inference scan), and
date-partitioned by directory so partition pruning is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-enforced JSONL scan.

    ``FAILFAST`` makes the schema a real contract (reference infers
    and silently coerces). Pass ``mode="PERMISSIVE"`` plus a
    ``_corrupt_record`` field in the schema for quarantine flows.
    """
    return spark.read.schema(schema).option("mode", mode).json(path)


def write_jsonl_partitioned(
    df: DataFrame, path: str, partition_col: str = "ingest_date"
) -> None:
    """Date-partitioned bronze sink.

    Replaces the reference's per-run ``data/raw/<src>/<type>/
    YYYY-MM-DD/<type>.json`` layout (yahoo_stocks.py:68-81) with hive
    partitioning: one directory per ``ingest_date``, JSONL inside, so
    downstream reads prune partitions declaratively. Dynamic partition
    overwrite: re-ingesting a date replaces only that date's
    directory — other dates' bronze history is never touched.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .option("compression", "gzip")
        .json(path)
    )
