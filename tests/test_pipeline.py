"""End-to-end pipeline test: replay-ingest → bronze → silver → gold →
predictions → serving over a temp lake (the Airflow DAG flow,
yahoo_finance_pipeline.py:58-112, minus the scheduler)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.pipeline import Pipeline


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake"))
    pipe = Pipeline(spark, root)
    counts = pipe.run(ingest_date="2024-04-01")
    return pipe, counts


def test_bronze_is_date_partitioned_jsonl(spark, lake):
    pipe, counts = lake
    assert counts["stocks"] == 600
    assert counts["company_info"] == 9  # planted: JPM missing
    raw = spark.read.json(pipe.cat.path("bronze", "stocks"))
    assert "ingest_date" in raw.columns
    assert raw.count() == 600


def test_ingest_dedups_news_ids_across_windows(lake):
    pipe, counts = lake
    # fixture has 177 rows: 3 duplicate-id clones collapse at ingest
    # (finnhub seen-id set, A8); the 2 stale artifacts still land in
    # bronze (the silver filter is the one that drops them)
    assert counts["news"] == 174


def test_silver_types_and_filters(spark, lake):
    pipe, _ = lake
    stocks = spark.read.parquet(pipe.cat.path("silver", "stocks"))
    assert dict(stocks.dtypes)["date"] == "date"
    assert dict(stocks.dtypes)["close"] == "double"
    news = spark.read.parquet(pipe.cat.path("silver", "news"))
    assert news.filter(
        F.col("pub_date_utc") < F.lit("2020-01-01").cast("timestamp")
    ).count() == 0  # P4 range filter applied
    assert news.groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_gold_contract_and_left_join_survival(spark, lake):
    pipe, counts = lake
    gold = spark.read.parquet(pipe.cat.path("gold", "enriched_stocks"))
    assert len(gold.columns) == 16
    assert counts["enriched_stocks"] == 600
    jpm = gold.filter(F.col("symbol") == "JPM")
    assert jpm.count() == 60 and jpm.filter(F.col("name").isNull()).count() == 60


def test_predictions_reference_shape(spark, lake):
    pipe, _ = lake
    preds = spark.read.parquet(pipe.cat.path("gold", "predictions"))
    assert preds.columns == [
        "symbol", "date", "predicted_close", "confidence_lower",
        "confidence_upper", "sentiment_score", "type",
    ]
    per = {
        (r.symbol, r.type): r.n
        for r in preds.groupBy("symbol", "type").agg(F.count("*").alias("n")).collect()
    }
    # 60 observed days (< history 90 → all emitted) + 30 forecast rows
    for sym in ("AAPL", "JPM", "WMT"):
        assert per[(sym, "actual")] == 60
        assert per[(sym, "forecast")] == 30
    # forecast dates are business days; CI brackets the prediction
    fc = preds.filter(F.col("type") == "forecast")
    assert fc.filter(F.dayofweek("date").isin(1, 7)).count() == 0
    assert fc.filter(
        (F.col("confidence_lower") > F.col("predicted_close"))
        | (F.col("predicted_close") > F.col("confidence_upper"))
    ).count() == 0
    # WMT has no news → neutral exog everywhere
    wmt = preds.filter(F.col("symbol") == "WMT")
    assert wmt.filter(F.col("sentiment_score") != 0.0).count() == 0


def test_serving_upsert_is_incremental(spark, lake):
    pipe, _ = lake
    serving = pipe.cat.path("serving", "stock_analysis")
    before = spark.read.parquet(serving)
    assert before.count() == 600
    # re-serve only AAPL rows shifted: dynamic partition overwrite must
    # replace the AAPL partition and leave the other 9 intact
    from yahoofinancedatalake_spark.sources.parquet_io import upsert_by_partition

    gold = spark.read.parquet(pipe.cat.path("gold", "enriched_stocks"))
    patched = gold.filter(F.col("symbol") == "AAPL").withColumn(
        "close", F.col("close") + 1000.0
    )
    upsert_by_partition(spark, patched, serving, "symbol")
    after = spark.read.parquet(serving)
    assert after.count() == 600
    assert after.filter(F.col("close") > 900).count() == 60  # AAPL replaced
    assert after.filter(F.col("symbol") == "MSFT").count() == 60  # untouched


def test_pipeline_rerun_is_idempotent(spark, lake):
    pipe, _ = lake
    counts2 = pipe.run(ingest_date="2024-04-02")  # second daily run
    assert counts2["enriched_stocks"] == 600  # silver dedup holds
    assert counts2["predictions"] == 900  # 10 symbols × (60+30)


def test_incremental_format_reads_only_new_partition_and_matches_full(
    spark, tmp_path_factory
):
    """The judge-specified incremental-silver contract: a day-2 format
    scans ONLY the day-2 bronze partition (asserted on the scan's
    inputFiles), and the merged silver equals a full-history recompute
    row-for-row."""
    from yahoofinancedatalake_spark.schemas import STOCKS_RAW

    a = Pipeline(spark, str(tmp_path_factory.mktemp("lake_inc")))
    a.ingest("2024-04-01")
    a.format("2024-04-01")  # bootstrap: incremental on empty silver
    a.ingest("2024-04-02")
    day2 = a._bronze("stocks", STOCKS_RAW, "2024-04-02")
    files = day2.inputFiles()
    assert files and all("ingest_date=2024-04-02" in f for f in files)
    a.format("2024-04-02")  # merge, not recompute

    b = Pipeline(spark, str(tmp_path_factory.mktemp("lake_full")))
    b.ingest("2024-04-01")
    b.ingest("2024-04-02")
    b.format(None)  # full-history recompute over both bronze dates

    for table in ("stocks", "company_info", "news"):
        da = spark.read.parquet(a.cat.path("silver", table))
        db = spark.read.parquet(b.cat.path("silver", table))
        cols = sorted(da.columns)
        assert cols == sorted(db.columns)
        ra = sorted(map(tuple, da.select(*cols).collect()))
        rb = sorted(map(tuple, db.select(*cols).collect()))
        assert ra == rb


def test_observe_contract_metrics_ride_the_write_action(spark, tmp_path):
    """Stage telemetry: metrics computed on the sink write's own pass
    must equal independently-counted truth, and the contract gate
    must trip on planted violations."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from yahoofinancedatalake_spark.telemetry import (
        assert_contract,
        observe_contract,
    )

    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id"))
        .alias("key"),
    )
    observed, obs = observe_contract(df, ["key"], "t1")
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    m = dict(obs.get)
    assert m["rows"] == 100
    assert m["nulls_key"] == 10
    with _pytest.raises(ValueError, match="null key columns"):
        assert_contract(m, "stage_x")
    assert_contract({"rows": 5, "nulls_key": 0}, "ok_stage")
    with _pytest.raises(ValueError, match="0 rows"):
        assert_contract({"rows": 0}, "empty_stage")


def test_pipeline_combine_records_stage_metrics(spark, tmp_path):
    from yahoofinancedatalake_spark.pipeline import Pipeline

    p = Pipeline(spark, str(tmp_path / "lake"))
    p.run()
    m = p.stage_metrics["combine"]
    truth = spark.read.parquet(
        p.cat.path("gold", "enriched_stocks")
    ).count()
    assert m["rows"] == truth > 0
    assert m["nulls_symbol"] == 0 and m["nulls_date"] == 0
