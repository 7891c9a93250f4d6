"""Lake layout and table loading.

The reference hard-codes a three-layer directory convention
(config/settings.py:16-25: data/raw, data/formatted, data/usage). We
keep the medallion convention but make it a catalog object, and add a
loader for the driver's synthetic test tables.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from yahoofinancedatalake_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@dataclass(frozen=True)
class LakeCatalog:
    """Directory-per-layer medallion catalog (bronze/silver/gold)."""

    root: str
    bronze: str = field(init=False)
    silver: str = field(init=False)
    gold: str = field(init=False)

    def __post_init__(self) -> None:
        object.__setattr__(self, "bronze", str(Path(self.root) / "bronze"))
        object.__setattr__(self, "silver", str(Path(self.root) / "silver"))
        object.__setattr__(self, "gold", str(Path(self.root) / "gold"))

    def path(self, layer: str, table: str) -> str:
        return str(Path(self.root) / layer / table)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver synthetic table (parquet, schema from footer).

    The driver's parquet carries ``timestamp[us]`` with
    ``isAdjustedToUTC=false``, which Spark 4 infers as TIMESTAMP_NTZ.
    Batch plans tolerate NTZ, but event-time streaming does not
    (``withWatermark`` → EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and the
    engine's single-timestamp-truth is session-TZ=UTC TimestampType.
    So every NTZ column is cast to TimestampType on load: under a UTC
    session the wall-clock values are unchanged, and DuckDB (which has
    no NTZ/LTZ split for these files) sees identical instants. Older
    drivers wrote TIMESTAMP(NANOS), which Spark rejects outright
    (PARQUET_TYPE_ILLEGAL) — the nanos-as-long branch truncates those
    to micros, matching DuckDB's own nanos→micros truncation.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown test table {name!r}; have {TESTDATA_TABLES}")
    from pyspark.sql import functions as F  # noqa: PLC0415

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    ntz_cols = [c for c, t in df.dtypes if t.startswith("timestamp_ntz")]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition ahead of a CPU-bound narrow transform — but ONLY
    when the input is under-split.

    The driver's testdata parquet files have a single row group, so a
    scan yields ONE task and per-row compute (hashing, shingling,
    vector math) serializes on one core; a round-robin exchange is the
    right trade there. On a real 100 TB table the scan already has
    thousands of splits, and an unconditional full-payload exchange
    would be a gratuitous shuffle — so this is a no-op once the input
    has at least ``target`` partitions. Set
    ``spark.yahoofinancedatalake.fanOut=false`` to disable entirely.
    """
    spark = df.sparkSession
    if spark.conf.get("spark.yahoofinancedatalake.fanOut", "true") == "false":
        return df
    n = partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def _schema_ddl(schema) -> str:
    """StructType → column DDL (``name TYPE, ...``) for CREATE TABLE."""
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )


def bootstrap_table(
    spark: SparkSession, name: str, schema, location: str
) -> bool:
    """S13 — create-if-absent DDL bootstrap with a typed schema.

    The reference probes for the serving index and creates it with an
    explicit typed mapping when missing (to_elasticsearch.py:33-63,
    112-145: ``indices.exists`` → ``indices.create(mappings=...)``).
    The Spark-native analog is metastore DDL: ``CREATE TABLE IF NOT
    EXISTS <name>(<typed cols>) USING PARQUET LOCATION <path>`` — the
    schema is declared, not inferred, so downstream readers get the
    contract even over an empty/absent directory, and writers that
    violate it fail loudly. Idempotent like the reference's
    exists-check. Returns True when the table was newly created.
    """
    existed = spark.catalog.tableExists(name)
    loc = location.replace("'", "''")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({_schema_ddl(schema)}) "
        f"USING PARQUET LOCATION '{loc}'"
    )
    return not existed


def bootstrap_lake(spark: SparkSession, catalog: LakeCatalog) -> dict[str, bool]:
    """Bootstrap the gold/serving tables of a lake root (DDL analog of
    the reference's index bootstrap at pipeline start)."""
    from yahoofinancedatalake_spark import schemas  # noqa: PLC0415

    return {
        "enriched_gold": bootstrap_table(
            spark, "enriched_gold", schemas.ENRICHED_GOLD,
            catalog.path("gold", "enriched_gold"),
        ),
        "predictions": bootstrap_table(
            spark, "predictions", schemas.PREDICTIONS,
            catalog.path("gold", "predictions"),
        ),
    }
