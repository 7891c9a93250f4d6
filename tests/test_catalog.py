"""Catalog DDL bootstrap tests (S13, to_elasticsearch.py:33-63 analog)."""

from __future__ import annotations

from yahoofinancedatalake_spark.catalog import (
    LakeCatalog,
    bootstrap_lake,
    bootstrap_table,
)
from yahoofinancedatalake_spark.schemas import ENRICHED_GOLD, PREDICTIONS


def test_bootstrap_is_idempotent_and_typed(spark, tmp_path):
    cat = LakeCatalog(str(tmp_path))
    try:
        created = bootstrap_lake(spark, cat)
        assert created == {"enriched_gold": True, "predictions": True}
        # second bootstrap: exists-check short-circuits, like the
        # reference's indices.exists probe
        again = bootstrap_lake(spark, cat)
        assert again == {"enriched_gold": False, "predictions": False}
        # the declared (not inferred) schema is visible over the
        # still-empty location (Spark relaxes nullability on external
        # parquet tables, so compare names + types)
        def shape(schema):
            return [(f.name, f.dataType) for f in schema.fields]

        got = spark.table("enriched_gold")
        assert shape(got.schema) == shape(ENRICHED_GOLD)
        assert got.count() == 0
        assert shape(spark.table("predictions").schema) == shape(PREDICTIONS)
    finally:
        for t in ("enriched_gold", "predictions"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bootstrapped_table_reads_written_rows(spark, tmp_path):
    cat = LakeCatalog(str(tmp_path))
    try:
        bootstrap_table(
            spark, "predictions", PREDICTIONS, cat.path("gold", "predictions")
        )
        import datetime as dt

        empty = spark.createDataFrame([], PREDICTIONS)
        one = spark.createDataFrame(
            [("AAPL", dt.datetime(2024, 1, 2), 1.0, None, None, 0.1,
              "forecast")],
            PREDICTIONS,
        )
        one.unionByName(empty).write.mode("append").parquet(
            cat.path("gold", "predictions")
        )
        spark.catalog.refreshTable("predictions")
        assert spark.table("predictions").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS predictions")
