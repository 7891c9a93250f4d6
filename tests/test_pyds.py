"""Python DataSource API sources (§2.1 S6/S8 as real formats).

The batch source must agree row-for-row with the driver-side replay
callables it lifts; the streaming source must deliver every
pagination window exactly once across micro-batches, resume from a
checkpoint, and leave the A8 cross-window dedup expressible as
``dropDuplicates(["id"])``.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from yahoofinancedatalake_spark.sources.pyds import (
    register_python_sources,
)
from yahoofinancedatalake_spark.sources.replay import (
    ingest_news,
    replay_stock_history,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "bronze")


def test_stock_history_batch_source_matches_replay(spark):
    register_python_sources(spark)
    path = os.path.join(FIX, "stocks.jsonl")
    df = spark.read.format("stock_history").option("path", path).load()
    # one partition per symbol — the ingestion parallelism unit
    syms = [r.symbol for r in df.select("symbol").distinct().collect()]
    assert df.rdd.getNumPartitions() == len(syms)
    got = {
        (r.symbol, r.date, r.close, r.volume) for r in df.collect()
    }
    want = set()
    for s in syms:
        for rec in replay_stock_history(path, s):
            want.add((rec["symbol"], rec["date"], rec["close"],
                      rec["volume"]))
    assert got == want and got


def test_stock_history_symbols_option_prunes_partitions(spark):
    register_python_sources(spark)
    path = os.path.join(FIX, "stocks.jsonl")
    df = (
        spark.read.format("stock_history")
        .option("path", path)
        .option("symbols", "AAPL")
        .load()
    )
    assert df.rdd.getNumPartitions() == 1
    assert df.select("symbol").distinct().collect()[0].symbol == "AAPL"


def test_news_windows_stream_delivers_every_window_once(spark, tmp_path):
    register_python_sources(spark)
    path = os.path.join(FIX, "news.jsonl")
    now, months = "2024-04-01", 6
    stream = (
        spark.readStream.format("news_windows")
        .option("path", path)
        .option("now", now)
        .option("months_back", str(months))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("news_windows_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM news_windows_sink")
    # A8 as engine semantics: the driver-side seen-set dedup becomes
    # dropDuplicates on the id key
    deduped = got.dropDuplicates(["id"])
    want = ingest_news(
        path,
        sorted({r.symbol for r in got.select("symbol").collect()}),
        now,
        months,
    )
    assert deduped.count() == len(want)
    # every batch row carries its pagination window — windows advance
    n_windows = got.select("window_from").distinct().count()
    assert 1 <= n_windows <= months
    got_ids = {r.id for r in deduped.select("id").collect()}
    assert got_ids == {str(r["id"]) for r in want}


def test_news_windows_stream_resumes_from_checkpoint(spark, tmp_path):
    register_python_sources(spark)
    path = os.path.join(FIX, "news.jsonl")
    now, months = "2024-04-01", 4
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "news_out")

    def run_once():
        stream = (
            spark.readStream.format("news_windows")
            .option("path", path)
            .option("now", now)
            .option("months_back", str(months))
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    first = spark.read.parquet(out).count()
    # a second run over the SAME checkpoint finds the pagination
    # exhausted: no window is re-delivered, the sink count is stable
    run_once()
    second = spark.read.parquet(out).count()
    assert first > 0 and second == first


def test_stock_history_filter_pushdown_prunes_partitions(spark):
    """symbol equality/IN predicates must reach pushFilters and prune
    input partitions at planning time — the REST analog of calling
    the API for one ticker instead of the universe."""
    register_python_sources(spark)
    path = os.path.join(FIX, "stocks.jsonl")
    base = spark.read.format("stock_history").option("path", path).load()
    n_all = base.rdd.getNumPartitions()
    one = base.filter(F.col("symbol") == "AAPL")
    # partition count of the filtered plan reflects the pruning
    assert one.rdd.getNumPartitions() == 1 < n_all
    assert one.count() > 0
    assert {r.symbol for r in one.select("symbol").distinct().collect()} \
        == {"AAPL"}
    two = base.filter(F.col("symbol").isin("AAPL", "GOOGL"))
    assert two.rdd.getNumPartitions() == 2
    # correctness unchanged: Spark re-applies the filter on top
    assert two.count() == base.filter(
        F.col("symbol").isin("AAPL", "GOOGL")
    ).count()


def test_stock_history_filter_pruning_all_partitions_is_empty_not_crash(
    spark,
):
    """A predicate matching no symbol prunes every partition; the read
    must return an empty frame, not crash on a None partition."""
    register_python_sources(spark)
    path = os.path.join(FIX, "stocks.jsonl")
    df = (
        spark.read.format("stock_history")
        .option("path", path)
        .load()
        .filter(F.col("symbol") == "NO_SUCH_TICKER")
    )
    assert df.count() == 0


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    """The writer leg: tasks land in _temporary/, commit renames the
    complete set into place and drops _SUCCESS, and a reader sees
    every row exactly once."""
    import json as _json

    register_python_sources(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    df = spark.range(0, 1000, 1, 4).selectExpr(
        "id", "cast(id * 2 as double) as v"
    )
    df.write.format("jsonl_sink").option("path", out).mode(
        "append"
    ).save()
    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    assert not os.path.exists(os.path.join(out, "_temporary"))
    parts = [f for f in files if f.endswith(".jsonl")]
    assert len(parts) == 4  # one file per write task
    rows = []
    for f in parts:
        with open(os.path.join(out, f)) as fh:
            rows.extend(_json.loads(line) for line in fh)
    assert {r["id"] for r in rows} == set(range(1000))
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert fh.read() == "1000"
    # round-trip through Spark's own json reader
    assert spark.read.json(out).count() == 1000


def test_jsonl_sink_nested_struct_roundtrip(spark, tmp_path):
    """Struct columns must serialize as real JSON objects (recursive
    asDict), not Row reprs."""
    register_python_sources(spark)
    out = str(tmp_path / "sink2")
    os.makedirs(out)
    df = spark.range(0, 10).selectExpr(
        "id", "named_struct('a', id, 'b', cast(id as string)) as s"
    )
    df.write.format("jsonl_sink").option("path", out).mode(
        "append"
    ).save()
    back = spark.read.json(out)
    assert dict(back.dtypes)["s"].startswith("struct")
    row = back.filter(F.col("id") == 3).collect()[0]
    assert row.s.a == 3 and row.s.b == "3"
