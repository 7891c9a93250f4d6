"""foreach_batch_upsert: stream → keyed parquet serving table."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)


def _land(spark, src, rows, name):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("append").parquet(f"{src}/{name}")


def _run(spark, src, serving, ck):
    from yahoofinancedatalake_spark.streaming.sinks import (
        foreach_batch_upsert,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        foreach_batch_upsert(
            stream, serving, key_cols=["symbol", "day"],
            partition_col="symbol", checkpoint=ck,
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"


def test_stream_upsert_maintains_latest_row_per_key(spark, tmp_path):
    src = str(tmp_path / "src")
    serving = str(tmp_path / "serving")
    ck = str(tmp_path / "ck")
    (tmp_path / "src").mkdir()

    _land(spark, src, [("AAPL", "2024-01-02", 100.0),
                       ("MSFT", "2024-01-02", 50.0)], "a")
    _run(spark, src, serving, ck)
    got = {
        (r.symbol, r.day): r.price
        for r in spark.read.parquet(serving).collect()
    }
    assert got == {("AAPL", "2024-01-02"): 100.0,
                   ("MSFT", "2024-01-02"): 50.0}

    # second batch: corrected AAPL price (same key → replace) + a new
    # day (new key → insert); MSFT partition untouched
    _land(spark, src, [("AAPL", "2024-01-02", 101.5),
                       ("AAPL", "2024-01-03", 103.0)], "b")
    _run(spark, src, serving, ck)
    got = {
        (r.symbol, r.day): r.price
        for r in spark.read.parquet(serving).collect()
    }
    assert got == {
        ("AAPL", "2024-01-02"): 101.5,
        ("AAPL", "2024-01-03"): 103.0,
        ("MSFT", "2024-01-02"): 50.0,
    }


def test_stream_upsert_is_idempotent_on_replay(spark, tmp_path):
    """A re-delivered micro-batch (fresh checkpoint, same files) must
    leave the serving table unchanged — the keyed-upsert property that
    turns at-least-once delivery into exactly-once table state."""
    src = str(tmp_path / "src")
    serving = str(tmp_path / "serving")
    (tmp_path / "src").mkdir()

    _land(spark, src, [("AAPL", "2024-01-02", 100.0),
                       ("MSFT", "2024-01-02", 50.0)], "a")
    _run(spark, src, serving, str(tmp_path / "ck1"))
    first = sorted(
        map(tuple, spark.read.parquet(serving).collect())
    )
    # replay the SAME data with a new checkpoint → same final state
    _run(spark, src, serving, str(tmp_path / "ck2"))
    assert sorted(
        map(tuple, spark.read.parquet(serving).collect())
    ) == first
