"""Versioned snapshot tables: time travel, commit markers, vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.sources.versioned import (
    list_versions,
    read_version,
    vacuum_versions,
    write_version,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_time_travel_reads_exact_historical_state(spark, tmp_path):
    path = str(tmp_path / "dim")
    assert write_version(spark, _df(spark, [(1, "a"), (2, "b")]), path) == 0
    assert write_version(spark, _df(spark, [(1, "a2"), (3, "c")]), path) == 1
    # latest
    assert sorted(map(tuple, read_version(spark, path).collect())) == [
        (1, "a2"), (3, "c")
    ]
    # as-of v0 — the pre-update state, byte-for-byte
    assert sorted(
        map(tuple, read_version(spark, path, version=0).collect())
    ) == [(1, "a"), (2, "b")]
    assert list_versions(spark, path) == [0, 1]


def test_uncommitted_snapshot_is_invisible(spark, tmp_path):
    path = str(tmp_path / "dim")
    write_version(spark, _df(spark, [(1, "a")]), path)
    # simulate a crashed writer: files present, no commit marker
    _df(spark, [(9, "zz")]).write.parquet(f"{path}/v=000001")
    assert list_versions(spark, path) == [0]
    assert [tuple(r) for r in read_version(spark, path).collect()] == [
        (1, "a")
    ]
    # the next successful write numbers PAST the orphan dir (never
    # reuses it) and commits
    n = write_version(spark, _df(spark, [(2, "b")]), path)
    assert n == 2
    assert list_versions(spark, path) == [0, 2]


def test_vacuum_keeps_newest(spark, tmp_path):
    path = str(tmp_path / "dim")
    for i in range(5):
        write_version(spark, _df(spark, [(i, "x")]), path)
    deleted = vacuum_versions(spark, path, keep=2)
    assert deleted == [0, 1, 2]
    assert list_versions(spark, path) == [3, 4]
    with pytest.raises(ValueError):
        read_version(spark, path, version=0)
    with pytest.raises(ValueError):
        vacuum_versions(spark, path, keep=0)
