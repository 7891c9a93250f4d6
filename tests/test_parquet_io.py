"""Bucketed co-located joins and salted skew joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.operators.skew import salted_join
from yahoofinancedatalake_spark.sources.parquet_io import write_bucketed


@pytest.fixture()
def two_tables(spark):
    a = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    return a, b


def test_bucketed_join_has_no_exchange(spark, tmp_path, two_tables):
    """Two tables bucketed on the join key must join with ZERO
    exchange and zero sort — the co-located-join contract that turns a
    recurring fact-join from a full shuffle into a bucket zip."""
    a, b = two_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # the fixture tables are tiny, so the planner would prefer a
        # broadcast join (and skip bucketing); force the shuffle-family
        # path the bucketing exists to eliminate at scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(a.repartition(8, "k"), "bt_a", str(tmp_path / "a"),
                       ["k"], 8)
        write_bucketed(b.repartition(8, "k"), "bt_b", str(tmp_path / "b"),
                       ["k"], 8)
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert joined.count() == 2000
        got = joined.filter(F.col("k") == 7).collect()[0]
        assert (got.va, got.vb) == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("bt_a", "bt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_salted_join_equals_plain_join(spark):
    """Salting must not change join semantics — same rows as the plain
    join, salt column gone, under a heavily skewed key."""
    import random

    rng = random.Random(3)
    # 90% of fact rows hit key 0 — the hot-reducer shape
    fact = spark.createDataFrame(
        [(0 if rng.random() < 0.9 else rng.randrange(1, 50), i)
         for i in range(5000)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(50)], "k long, name string"
    )
    salted = salted_join(fact, dim, on=["k"], n_salts=8)
    plain = fact.join(dim, "k")
    assert salted.columns == plain.columns
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, 10), (99, 20)], "k long, p long")
    dim = spark.createDataFrame([(1, "a")], "k long, name string")
    out = {r.k: r.name for r in salted_join(fact, dim, ["k"], 4,
                                            how="left").collect()}
    assert out == {1: "a", 99: None}
