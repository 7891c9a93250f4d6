"""Gopher quality-rule tests (query ``gopher_quality_rules``).

The synthetic corpus has no newlines, bullets, ellipses, or symbols,
so the driver gate only exercises the word-level rules — these
fixtures pin the line-level rules (duplicate-line fractions, bullet /
ellipsis line fractions, symbol ratio) against BOTH a hand-computed
expectation and the registered DuckDB oracle on the same parquet.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tools.selfcheck import value_hash
from yahoofinancedatalake_spark.queries.pack import QUERIES


def _dround(x: float, s: int) -> float:
    f = 10**s
    return math.floor(x * f + 0.5 + 1e-9) / f


#: crafted docs: each violates (or exercises) a specific rule
_DOCS = [
    # 0: clean long doc — passes everything (60 stopword-rich words)
    (0, " ".join(["the quick brown fox jumps over the lazy dog and"] * 6)),
    # 1: duplicate lines (3 of 4 lines are the same) + bullets
    (1, "alpha beta gamma\nalpha beta gamma\nalpha beta gamma\n- bullet line"),
    # 2: every line ends with an ellipsis (ASCII and Unicode)
    (2, "first thought...\nsecond thought…\nthird thought..."),
    # 3: symbol-heavy (# and ... amid words)
    (3, "# # # header ... with ... many ... symbols # here"),
    # 4: no alphabetic words at all (digits and dashes)
    (4, "123 456 789 --- 000 111"),
    # 5: too short (under 50 words) but otherwise clean
    (5, "the cat and the hat have fun with that"),
    # 6: whitespace variety: tabs and blank lines must not create
    #    empty words/lines
    (6, "the\tcat  and\nthe hat\n\nwith that and be to of"),
]


@pytest.fixture(scope="module")
def gopher_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gopherdocs")
    rows = [
        (i, t, "en", f"src{i % 3}", len(t)) for i, t in _DOCS
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_gopher_spark_matches_oracle_on_line_rule_corpus(
    spark, gopher_dir
):
    q = QUERIES["gopher_quality_rules"]
    sdf = q.spark(spark, gopher_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{gopher_dir}/documents.parquet/*.parquet'"
    )
    res = con.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(ocols)
    assert value_hash(sdf.columns, srows) == value_hash(ocols, orows)


def test_gopher_line_rules_hand_computed(spark, gopher_dir):
    rows = {
        r["doc_id"]: r
        for r in QUERIES["gopher_quality_rules"]
        .spark(spark, gopher_dir)
        .collect()
    }
    # doc 1: lines = 4, "alpha beta gamma" x3 (16 chars each) — with
    # the Dolma/DataTrove beyond-first counting (ADVICE r10), the two
    # REPEATS count, the first occurrence does not: dup_n = 4 lines -
    # 2 distinct = 2, dup_chars = 61 total - 29 distinct = 32
    r = rows[1]
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == _dround(2 / 4, 4)
    assert r["dup_line_char_frac"] == _dround(32 / 61, 4)
    assert r["bullet_line_frac"] == _dround(1 / 4, 4)
    assert not r["passes_gopher"]  # dup lines + too short
    # doc 2: all 3 lines end with an ellipsis (ASCII or Unicode)
    r = rows[2]
    assert r["ellipsis_line_frac"] == 1.0
    # doc 3: 4 '#' + 3 '...' over 12 words
    r = rows[3]
    assert r["n_words"] == 12
    assert r["symbol_word_ratio"] == _dround(7 / 12, 4)
    # doc 4: zero alphabetic words
    r = rows[4]
    assert r["alpha_word_frac"] == 0.0
    assert r["stopword_hits"] == 0
    # doc 5: clean but short — fails ONLY the word-count bound
    r = rows[5]
    assert r["n_words"] == 9
    assert r["stopword_hits"] >= 2
    assert not r["passes_gopher"]
    # doc 0: passes the composite
    r = rows[0]
    assert r["n_words"] == 60
    assert r["passes_gopher"]
    # doc 6: tabs/blank lines — 3 non-empty lines, 11 words
    r = rows[6]
    assert r["n_words"] == 11
    assert r["n_lines"] == 3
