"""File-level manifest skipping (sources/manifest.py).

Contract: pruning only removes files that CANNOT match, so a pruned
read + filter is always row-identical to a full read + filter; on a
clustered layout it must actually skip files, on a random layout it
must keep everything (conservative, never wrong).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from yahoofinancedatalake_spark.sources.manifest import (
    pruned_files,
    read_pruned,
    write_manifest,
)
from yahoofinancedatalake_spark.sources.parquet_io import write_clustered


def _key_range_table(spark):
    return spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_clustered_layout_skips_files_and_stays_exact(spark, tmp_path):
    path = str(tmp_path / "clustered")
    write_clustered(_key_range_table(spark), path, ["k"], n_files=8)
    write_manifest(path, ["k"])
    kept, total = pruned_files(path, "k", lo=2000, hi=2500)
    assert total == 8
    assert len(kept) < total  # clustering → real skipping
    got = (
        read_pruned(spark, path, "k", lo=2000, hi=2500)
        .filter(F.col("k").between(2000, 2500))
        .count()
    )
    want = (
        spark.read.parquet(path)
        .filter(F.col("k").between(2000, 2500))
        .count()
    )
    assert got == want == 501


def test_unclustered_layout_prunes_nothing_but_stays_exact(
    spark, tmp_path
):
    path = str(tmp_path / "random")
    # hash-repartitioned → every file spans ~the full key range
    _key_range_table(spark).repartition(6, "v").write.parquet(path)
    write_manifest(path, ["k"])
    kept, total = pruned_files(path, "k", lo=100, hi=200)
    assert len(kept) == total  # conservative: nothing skippable
    got = (
        read_pruned(spark, path, "k", lo=100, hi=200)
        .filter(F.col("k").between(100, 200))
        .count()
    )
    assert got == 101


def test_open_bounds_and_empty_survivor_set(spark, tmp_path):
    path = str(tmp_path / "c2")
    write_clustered(_key_range_table(spark), path, ["k"], n_files=4)
    write_manifest(path, ["k"])
    # one-sided bound
    kept_hi, total = pruned_files(path, "k", hi=10)
    assert 1 <= len(kept_hi) < total
    # disjoint range → zero files, empty frame with intact schema
    df = read_pruned(spark, path, "k", lo=1_000_000)
    assert df.count() == 0
    assert set(df.columns) == {"k", "v"}


def test_manifest_is_invisible_to_spark_listing(spark, tmp_path):
    path = str(tmp_path / "c3")
    write_clustered(_key_range_table(spark), path, ["k"], n_files=2)
    write_manifest(path, ["k"])
    assert os.path.exists(os.path.join(path, "_manifest.json"))
    # the underscore file must not break a plain read
    assert spark.read.parquet(path).count() == 10_000


def test_files_added_after_manifest_are_still_read(spark, tmp_path):
    """Staleness guard: a file appended after write_manifest has no
    stats row and must be kept (conservative), preserving the
    pruned-read == full-read contract."""
    path = str(tmp_path / "stale")
    write_clustered(_key_range_table(spark), path, ["k"], n_files=4)
    write_manifest(path, ["k"])
    # append out-of-band data the manifest has never seen
    spark.range(100_000, 100_050).selectExpr(
        "id as k", "cast(id as double) as v"
    ).coalesce(1).write.mode("append").parquet(path)
    kept, total = pruned_files(path, "k", lo=100_000)
    got = (
        read_pruned(spark, path, "k", lo=100_000)
        .filter(F.col("k") >= 100_000)
        .count()
    )
    assert got == 50  # appended rows are found despite pruning


def test_timestamp_stats_prune_with_datetime_bounds(spark, tmp_path):
    """Timestamp column stats round-trip through the JSON manifest as
    ISO strings and still prune correctly against datetime bounds."""
    import datetime as dt

    path = str(tmp_path / "ts_tbl")
    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("ts"),
    )
    write_clustered(df, path, ["ts"], n_files=8)
    write_manifest(path, ["ts"])

    lo = dt.datetime(2024, 1, 2, 0, 0)
    hi = dt.datetime(2024, 1, 2, 6, 0)
    kept, total = pruned_files(path, "ts", lo, hi)
    assert 0 < len(kept) < total  # really skips on a clustered layout

    got = read_pruned(spark, path, "ts", lo, hi).filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    )
    want = spark.read.parquet(path).filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    )
    assert got.count() == want.count() > 0


def test_timestamp_boundary_equal_to_hi_bound_is_kept(spark, tmp_path):
    """ADVICE r5 (high): pyarrow returns TZ-AWARE datetimes for
    Spark-written TIMESTAMP columns; before the _utc_naive fix their
    stored ISO form carried '+00:00', which sorts ABOVE the
    offset-less form of the SAME instant — so a file whose stored min
    EQUALS a naive hi bound was pruned (fmin > hi lexicographically):
    silent row loss exactly at the boundary. The boundary row must
    survive pruning."""
    import datetime as dt

    path = str(tmp_path / "ts_boundary")
    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("ts"),
    )
    write_clustered(df, path, ["ts"], n_files=8)
    write_manifest(path, ["ts"])

    import json

    from yahoofinancedatalake_spark.sources.manifest import MANIFEST_NAME

    with open(os.path.join(path, MANIFEST_NAME)) as f:
        m = json.load(f)
    # stored stats must be offset-less (naive-UTC canonical form)
    all_bounds = [b for e in m["files"].values() for b in e["stats"]["ts"]]
    assert all_bounds and all("+" not in b for b in all_bounds)

    # pick an actual file-min as the hi bound → boundary equality
    file_min = sorted(all_bounds)[2]
    hi = dt.datetime.fromisoformat(file_min)
    got = read_pruned(spark, path, "ts", hi=hi).filter(F.col("ts") <= F.lit(hi))
    want = spark.read.parquet(path).filter(F.col("ts") <= F.lit(hi))
    assert got.count() == want.count() > 0

    # and the symmetric lo-boundary: file max == lo
    file_max = sorted(all_bounds)[-3]
    lo = dt.datetime.fromisoformat(file_max)
    got = read_pruned(spark, path, "ts", lo=lo).filter(F.col("ts") >= F.lit(lo))
    want = spark.read.parquet(path).filter(F.col("ts") >= F.lit(lo))
    assert got.count() == want.count() > 0


def test_bloom_on_spark_written_timestamp_column(spark, tmp_path):
    """ADVICE r5 (high), bloom path: a naive-datetime eq probe
    against a bloom built from pyarrow's TZ-AWARE values must not
    false-negative (before the fix it pruned EVERY file containing
    the key — 0 kept for a present row)."""
    import datetime as dt

    path = str(tmp_path / "bloom_ts")
    df = spark.range(0, 2_000).select(
        F.col("id").alias("k"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("ts"),
    )
    write_clustered(df, path, ["k"], n_files=4)
    write_manifest(path, ["k"], bloom_columns=["ts"])
    probe = dt.datetime(2024, 1, 1, 2, 17)  # present, non-midnight
    kept, total = pruned_files(path, "ts", eq=probe)
    assert kept  # the containing file must survive
    got = read_pruned(spark, path, "ts", eq=probe).filter(
        F.col("ts") == F.lit(probe)
    )
    want = spark.read.parquet(path).filter(F.col("ts") == F.lit(probe))
    assert got.count() == want.count() == 1

    # tz-aware probe of the same instant (e.g. +02:00 clock time)
    # canonicalizes identically — same file kept
    probe_tz = probe.replace(tzinfo=dt.timezone.utc).astimezone(
        dt.timezone(dt.timedelta(hours=2))
    )
    kept_tz, _ = pruned_files(path, "ts", eq=probe_tz)
    assert sorted(kept_tz) == sorted(kept)


def test_deleted_files_are_dropped_from_pruning(spark, tmp_path):
    path = str(tmp_path / "del_tbl")
    write_clustered(_key_range_table(spark), path, ["k"], n_files=8)
    write_manifest(path, ["k"])
    victims = [
        n for n in sorted(os.listdir(path)) if n.endswith(".parquet")
    ][:2]
    for v in victims:
        os.remove(os.path.join(path, v))
    kept, total = pruned_files(path, "k", None, None)
    assert all(os.path.exists(p) for p in kept)
    # the read must not schedule the dead files
    assert read_pruned(spark, path, "k", None, None).count() > 0


def test_version_mismatched_manifest_disables_skipping(spark, tmp_path):
    """A v1-era manifest (str(datetime) stats, space separator) must
    not be compared against v2 ISO-T bounds: ' ' < 'T' would sort
    every v1 timestamp below every v2 bound and mis-prune files that
    DO contain matches. Mismatched format -> keep everything."""
    import json

    from yahoofinancedatalake_spark.sources.manifest import MANIFEST_NAME

    path = str(tmp_path / "v1_tbl")
    write_clustered(_key_range_table(spark), path, ["k"], n_files=6)
    write_manifest(path, ["k"])
    mpath = os.path.join(path, MANIFEST_NAME)
    with open(mpath) as f:
        m = json.load(f)
    del m["format"]  # simulate a manifest written by the v1 code
    with open(mpath, "w") as f:
        json.dump(m, f)

    kept, total = pruned_files(path, "k", 10, 20)
    assert len(kept) == total  # skipping disabled, not mis-applied
    got = read_pruned(spark, path, "k", 10, 20).filter(
        (F.col("k") >= 10) & (F.col("k") <= 20)
    )
    want = spark.read.parquet(path).filter(
        (F.col("k") >= 10) & (F.col("k") <= 20)
    )
    assert got.count() == want.count() > 0


def _uuid_table(spark):
    """k clusters well; u is high-cardinality and SPREAD across files
    (every file's [min, max] covers ~the whole u domain), so range
    stats can never skip an equality probe on u — only the bloom can."""
    return spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("u"),
    )


def test_bloom_skips_equality_on_high_cardinality_key(spark, tmp_path):
    path = str(tmp_path / "bloom_tbl")
    write_clustered(_uuid_table(spark), path, ["k"], n_files=8)
    write_manifest(path, ["k", "u"], bloom_columns=["u"])

    # a present key lives in exactly one file
    probe = spark.sql("SELECT md5('4242') AS u").collect()[0]["u"]
    kept_range, total = pruned_files(path, "u", probe, probe)
    assert len(kept_range) == total  # range stats alone skip nothing
    kept, total = pruned_files(path, "u", eq=probe)
    assert 1 <= len(kept) < total  # the bloom skips

    got = read_pruned(spark, path, "u", eq=probe).filter(F.col("u") == probe)
    want = spark.read.parquet(path).filter(F.col("u") == probe)
    assert got.count() == want.count() == 1


def test_bloom_absent_key_reads_empty_and_exact(spark, tmp_path):
    path = str(tmp_path / "bloom_absent")
    write_clustered(_uuid_table(spark), path, ["k"], n_files=8)
    # bloom-only column: u carries no range stats at all
    write_manifest(path, ["k"], bloom_columns=["u"])
    probe = "not-a-real-md5-value"
    got = read_pruned(spark, path, "u", eq=probe).filter(F.col("u") == probe)
    assert got.count() == 0  # FP-kept files are harmless, never wrong


def test_bloom_false_positive_rate_is_bounded(spark, tmp_path):
    path = str(tmp_path / "bloom_fpp")
    write_clustered(_uuid_table(spark), path, ["k"], n_files=8)
    write_manifest(path, ["k", "u"], bloom_columns=["u"], bloom_fpp=0.01)
    kept_frac = []
    for i in range(100):
        kept, total = pruned_files(path, "u", eq=f"absent-{i}")
        kept_frac.append(len(kept) / total)
    # expected FP keep fraction ~ fpp = 1%; allow generous slack
    assert sum(kept_frac) / len(kept_frac) < 0.10


def test_bloom_numeric_promotion_probe_never_misprunes(spark, tmp_path):
    """Review-confirmed repro: an int column's bloom probed with the
    equal float (k = 5.0 matches k=5 under numeric promotion) must
    NOT false-negative — typed canonical keys unify integral floats
    with ints."""
    path = str(tmp_path / "bloom_promo")
    write_clustered(_key_range_table(spark), path, ["k"], n_files=8)
    write_manifest(path, ["k"], bloom_columns=["k"])
    got = read_pruned(spark, path, "k", eq=5.0).filter(F.col("k") == 5.0)
    want = spark.read.parquet(path).filter(F.col("k") == 5.0)
    assert got.count() == want.count() == 1


def test_bloom_date_column_midnight_datetime_probe(spark, tmp_path):
    """A date column probed with the equal midnight datetime must
    keep the file (both canonicalize to the date ISO form)."""
    import datetime as dt

    path = str(tmp_path / "bloom_date")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 200).cast("int")).alias("d"),
    )
    write_clustered(df, path, ["k"], n_files=4)
    write_manifest(path, ["k"], bloom_columns=["d"])
    probe = dt.datetime(2024, 3, 1)  # == date 2024-03-01 at midnight
    got = read_pruned(spark, path, "d", eq=probe).filter(
        F.col("d") == F.lit(probe)
    )
    want = spark.read.parquet(path).filter(F.col("d") == F.lit(probe))
    assert got.count() == want.count() > 0


def test_bloom_refused_for_uncanonicalizable_types(spark, tmp_path):
    """Decimal columns get NO bloom (repr is not canonical under
    value equality: Decimal('1.50') == Decimal('1.5')) — same
    conservatism as the range path's Decimal rejection."""
    import json

    from yahoofinancedatalake_spark.sources.manifest import MANIFEST_NAME

    path = str(tmp_path / "bloom_dec")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") / 4).cast("decimal(10,2)").alias("price"),
    )
    write_clustered(df, path, ["k"], n_files=2)
    write_manifest(path, ["k"], bloom_columns=["price"])
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        m = json.load(f)
    assert all("price" not in e["blooms"] for e in m["files"].values())
    # and an eq probe on it keeps everything (never mis-prunes)
    from decimal import Decimal

    kept, total = pruned_files(path, "price", eq=Decimal("1.50"))
    assert len(kept) == total
