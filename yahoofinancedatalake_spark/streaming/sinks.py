"""Streaming sinks: continuously-maintained serving tables.

The reference's serving layer is an Elasticsearch indexing loop — a
cron that re-pushes documents with deterministic ``_id`` keys
(scripts/indexing/to_elasticsearch.py:70-90). The streaming-native
re-expression: a ``foreachBatch`` sink that applies each micro-batch
as a row-level keyed upsert into a partitioned parquet serving table
(``sources/parquet_io.upsert_rows``), so the table always holds the
latest row per key with O(touched partitions) write amplification.

Exactly-once note: ``foreachBatch`` gives at-least-once delivery — a
batch can be re-applied after a failure/restart. Keyed upsert makes
the write IDEMPOTENT (re-upserting the same rows replaces them with
themselves), which upgrades at-least-once delivery to exactly-once
TABLE STATE — the standard parquet-level answer, and the same
contract Delta's ``txnVersion``/``MERGE`` sinks provide.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from yahoofinancedatalake_spark.sources.parquet_io import upsert_rows


def foreach_batch_upsert(
    stream_df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    partition_col: str,
    checkpoint: str,
) -> DataStreamWriter:
    """Build a ``writeStream`` that upserts each micro-batch into the
    keyed serving table at ``path``.

    Caller starts it (``.trigger(...).start()``) — trigger choice
    (continuous micro-batches vs ``availableNow`` catch-up runs) is
    deployment policy, not sink semantics. Empty micro-batches are
    skipped (no partition swap churn from idle triggers).
    """

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.isEmpty():
            upsert_rows(
                batch_df.sparkSession,
                batch_df,
                path,
                list(key_cols),
                partition_col,
            )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
