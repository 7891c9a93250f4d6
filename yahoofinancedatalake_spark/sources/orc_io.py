"""ORC read/write — the second columnar format next to Parquet.

The reference lake is Parquet-only (SURVEY.md §2.1 S2/S4); ORC is
extension surface for shops standardized on the Hive/ORC toolchain.
Spark's native vectorized ORC reader gives the same scan-level
contracts as Parquet — column pruning, predicate pushdown, and
partition-directory pruning — so the engine's layout guidance
(partition columns, file sizing) carries over unchanged; the
``orc_roundtrip`` query pins value-parity through a write→read
cycle against the Parquet-derived oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Overwrite-write ``df`` as ORC, optionally hive-partitioned."""
    w = df.write.mode("overwrite").format("orc")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
