"""CSV source tests: schema contract, quarantine split, round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from yahoofinancedatalake_spark.sources.csv_source import (
    read_csv,
    read_csv_quarantine,
    write_csv,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)


@pytest.fixture()
def csv_dir(tmp_path):
    p = tmp_path / "drop"
    p.mkdir()
    (p / "a.csv").write_text(
        "id,name,price\n1,alpha,10.5\n2,beta,20.25\n3,gamma,30.0\n"
    )
    return str(p)


@pytest.fixture()
def dirty_csv_dir(tmp_path):
    p = tmp_path / "dirty"
    p.mkdir()
    (p / "a.csv").write_text(
        "id,name,price\n1,alpha,10.5\nnot-a-number,beta,20.25\n3,gamma,30.0\n"
    )
    return str(p)


def test_read_csv_enforces_schema(spark, csv_dir):
    df = read_csv(spark, csv_dir, SCHEMA)
    assert [f.dataType for f in df.schema.fields] == [
        T.LongType(), T.StringType(), T.DoubleType()
    ]
    rows = {tuple(r) for r in df.collect()}
    assert (1, "alpha", 10.5) in rows and len(rows) == 3


def test_read_csv_failfast_raises_on_malformed(spark, dirty_csv_dir):
    df = read_csv(spark, dirty_csv_dir, SCHEMA)
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_quarantine_splits_clean_and_bad(spark, dirty_csv_dir):
    clean, quarantine = read_csv_quarantine(spark, dirty_csv_dir, SCHEMA)
    crows = sorted(tuple(r) for r in clean.collect())
    assert crows == [(1, "alpha", 10.5), (3, "gamma", 30.0)]
    assert "_corrupt_record" not in clean.columns
    qrows = [r.raw_line for r in quarantine.collect()]
    assert qrows == ["not-a-number,beta,20.25"]


def test_csv_round_trip(spark, csv_dir, tmp_path):
    df = read_csv(spark, csv_dir, SCHEMA)
    out = str(tmp_path / "export")
    write_csv(df, out)
    back = read_csv(spark, out, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
