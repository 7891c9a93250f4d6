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


def test_salted_join_rejects_right_and_full(spark):
    """Replicating the build side n_salts× would emit every unmatched
    `other` row n_salts times under right/full — must raise, not
    silently corrupt."""
    fact = spark.createDataFrame([(1, 10)], "k long, p long")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
    for how in ("right", "full", "right_outer", "full_outer", "outer"):
        with pytest.raises(ValueError, match="not salt-safe"):
            salted_join(fact, dim, ["k"], 4, how=how)


def test_salted_join_identical_duplicate_rows_one_bucket(spark):
    """Documented limitation: byte-identical hot rows hash to ONE salt
    (the deterministic salt is a pure function of the row), so the hot
    reducer survives — and results are still correct."""
    fact = spark.createDataFrame([(0, 7)] * 500 + [(1, 8)], "k long, p long")
    dim = spark.createDataFrame([(0, "z"), (1, "o")], "k long, name string")
    salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64("k", "p"), F.lit(8)).cast("int"),
    )
    assert salted.filter(F.col("k") == 0).select("__salt").distinct().count() == 1
    out = salted_join(fact, dim, ["k"], 8)
    assert out.count() == 501  # semantics still exact


def test_salted_join_salt_cols_spreads_hot_key(spark):
    """A finer deterministic discriminator via salt_cols spreads a hot
    key whose rows differ only in that column across salt buckets."""
    fact = spark.createDataFrame(
        [(0, i) for i in range(2000)], "k long, event_id long"
    )
    dim = spark.createDataFrame([(0, "z")], "k long, name string")
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64("event_id"), F.lit(8)).cast("int")
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets == 8  # hot key split over all reducers
    out = salted_join(fact, dim, ["k"], 8, salt_cols=["event_id"])
    assert out.count() == 2000


def test_upsert_rows_replaces_exactly_the_incoming_keys(spark, tmp_path):
    """Row-level ES-``_id`` semantics (to_elasticsearch.py:78):
    re-ingesting one (symbol, date) replaces exactly that row; every
    other row — including same-symbol history — survives."""
    from yahoofinancedatalake_spark.sources.parquet_io import upsert_rows

    path = str(tmp_path / "keyed")
    base = spark.createDataFrame(
        [("AAPL", "2024-01-02", 105.0), ("AAPL", "2024-01-03", 102.0),
         ("MSFT", "2024-01-02", 375.0)],
        "symbol string, date string, close double",
    )
    upsert_rows(spark, base, path, ["symbol", "date"], "symbol")
    patch = spark.createDataFrame(
        [("AAPL", "2024-01-03", 999.0), ("AAPL", "2024-01-04", 110.0)],
        "symbol string, date string, close double",
    )
    swapped = upsert_rows(spark, patch, path, ["symbol", "date"], "symbol")
    assert swapped == ["symbol=AAPL"]
    got = {(r.symbol, r.date): r.close
           for r in spark.read.parquet(path).collect()}
    assert got == {
        ("AAPL", "2024-01-02"): 105.0,   # same-symbol history survives
        ("AAPL", "2024-01-03"): 999.0,   # replaced by key
        ("AAPL", "2024-01-04"): 110.0,   # inserted
        ("MSFT", "2024-01-02"): 375.0,   # untouched partition
    }


def test_upsert_rows_write_amplification_is_touched_partitions(spark, tmp_path):
    """Untouched partitions' files are not rewritten: O(touched
    partitions), not O(table)."""
    import os

    from yahoofinancedatalake_spark.sources.parquet_io import upsert_rows

    path = str(tmp_path / "keyed")
    base = spark.createDataFrame(
        [("AAPL", "2024-01-02", 105.0), ("MSFT", "2024-01-02", 375.0)],
        "symbol string, date string, close double",
    )
    upsert_rows(spark, base, path, ["symbol", "date"], "symbol")
    msft_dir = os.path.join(path, "symbol=MSFT")
    before = {
        f: os.path.getmtime(os.path.join(msft_dir, f))
        for f in os.listdir(msft_dir)
    }
    patch = spark.createDataFrame(
        [("AAPL", "2024-01-02", 1.0)], "symbol string, date string, close double"
    )
    upsert_rows(spark, patch, path, ["symbol", "date"], "symbol")
    after = {
        f: os.path.getmtime(os.path.join(msft_dir, f))
        for f in os.listdir(msft_dir)
    }
    assert before == after  # byte-identical file set, never rewritten


def test_write_clustered_produces_disjoint_selective_row_groups(
    spark, tmp_path
):
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from yahoofinancedatalake_spark.sources.parquet_io import (
        write_clustered,
    )

    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
    # write in shuffled order so clustering has real work to do
    ).orderBy(F.md5(F.col("k").cast("string")))
    out = str(tmp_path / "clustered")
    write_clustered(df, out, ["k"], n_files=4)

    files = sorted((tmp_path / "clustered").glob("*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        col0 = md.row_group(0).column(0)
        assert col0.path_in_schema == "k"
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    # files hold disjoint ranges (range partitioning) — a point/range
    # filter on k prunes whole files via footer stats
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # and the union covers everything
    assert ranges[0][0] == 0 and ranges[-1][1] == 9_999
    # round-trips intact
    assert spark.read.parquet(out).count() == 10_000


def test_zorder_narrows_footer_stats_on_both_columns(spark, tmp_path):
    """Linear clustering on x leaves y unpruned (every file spans the
    full y range); z-order narrows BOTH columns' per-file ranges."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from yahoofinancedatalake_spark.sources.parquet_io import (
        write_clustered,
        write_zordered,
    )

    n = 50_000
    df = spark.range(0, n).select(
        (F.xxhash64(F.col("id")) % 1000).alias("x"),
        (F.xxhash64(F.col("id") + 7) % 1000).alias("y"),
    )

    def per_file_spans(path, col_idx):
        spans = []
        for f in sorted(path.glob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append(max(maxs) - min(mins))
        return spans

    lin = tmp_path / "linear"
    write_clustered(df, str(lin), ["x"], n_files=16)
    zo = tmp_path / "zorder"
    write_zordered(df, str(zo), ["x", "y"], n_files=16)

    full = 2000  # x/y span ~[-1000, 1000)
    lin_y = per_file_spans(lin, 1)
    zo_x = per_file_spans(zo, 0)
    zo_y = per_file_spans(zo, 1)
    # linear-on-x: y is unclustered — files span ~the whole y range
    assert sum(lin_y) / len(lin_y) > 0.8 * full
    # z-order: BOTH columns' average per-file span shrinks
    assert sum(zo_x) / len(zo_x) < 0.6 * full
    assert sum(zo_y) / len(zo_y) < 0.6 * full
    # layout-only: the rows themselves round-trip intact
    assert spark.read.parquet(str(zo)).count() == n


def test_schema_evolution_merge_read(spark, tmp_path):
    from pyspark.sql import functions as F

    from yahoofinancedatalake_spark.sources.parquet_io import (
        read_parquet_evolving,
    )

    p = str(tmp_path / "bronze")
    spark.range(0, 3).select(F.col("id").alias("k")).write.mode(
        "append"
    ).parquet(p)
    # later batch gains a column
    spark.range(3, 5).select(
        F.col("id").alias("k"), F.lit("x").alias("extra")
    ).write.mode("append").parquet(p)
    df = read_parquet_evolving(spark, p)
    assert set(df.columns) == {"k", "extra"}
    rows = {r.k: r.extra for r in df.collect()}
    assert rows[0] is None and rows[4] == "x" and len(rows) == 5


def test_hive_partition_pruning_reaches_scan(spark, tmp_path):
    from pyspark.sql import functions as F

    p = str(tmp_path / "part")
    spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("ingest_date"),
    ).write.partitionBy("ingest_date").mode("overwrite").parquet(p)
    df = spark.read.parquet(p).filter(F.col("ingest_date") == "2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter must land in PartitionFilters (pruned at planning),
    # NOT as a post-scan Filter over all partitions
    assert "PartitionFilters: [" in plan
    assert "ingest_date" in plan.split("PartitionFilters:")[1].split("]")[0]
    assert df.count() == 250


def test_file_report_and_compaction_trigger(spark, tmp_path):
    from pyspark.sql import functions as F

    from yahoofinancedatalake_spark.sources.maintenance import (
        compaction_needed,
        file_report,
    )
    from yahoofinancedatalake_spark.sources.parquet_io import (
        compact_parquet,
    )

    p = str(tmp_path / "sprawl")
    # 16 tiny files — the micro-batch sprawl shape
    spark.range(0, 1600).repartition(16).write.mode(
        "overwrite"
    ).parquet(p)
    rep = file_report(spark, p, target_bytes=1024 * 1024)
    n = rep.count()
    assert n == 16
    assert rep.filter(F.col("is_small")).count() == 16
    assert compaction_needed(
        spark, p, target_bytes=1024 * 1024, min_files=8
    )
    # after compaction the trigger clears (file count below min_files)
    compact_parquet(spark, p, target_file_bytes=1024 * 1024)
    assert not compaction_needed(
        spark, p, target_bytes=1024 * 1024, min_files=8
    )
    assert spark.read.parquet(p).count() == 1600
