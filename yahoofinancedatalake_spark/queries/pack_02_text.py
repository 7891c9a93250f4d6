"""Sentiment scoring, text analysis, exact dedup over documents (split from pack.py, r7 — pure refactor).

Registers 6 queries (registration order is the
import order in pack.py):
- ``sentiment_docs``
- ``token_count``
- ``text_quality``
- ``lang_id``
- ``doc_fingerprint``
- ``dedup_exact``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.catalog import fan_out, load_table
from yahoofinancedatalake_spark.functions.scalars import dround, sentiment_label, sql_dround
from yahoofinancedatalake_spark.functions.sentiment import NEGATIVE_WORDS, POSITIVE_WORDS, SCALE, sentiment_score_expr
from yahoofinancedatalake_spark.queries._registry import (
    _register,
)


# ---------------------------------------------------------------------------
# Extensions — sentiment scoring (X1) expressed as codegen'd lexicon math
# ---------------------------------------------------------------------------


def _sql_wordlist(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


@_register(
    "sentiment_docs",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(
               regexp_split_to_array(lower(trim(text)), '[^a-z0-9'']+'),
               x -> x <> '') AS tokens
      FROM documents
    ), counts AS (
      SELECT doc_id,
             len(list_filter(tokens,
                 x -> x IN ({_sql_wordlist(POSITIVE_WORDS)}))) AS pos,
             len(list_filter(tokens,
                 x -> x IN ({_sql_wordlist(NEGATIVE_WORDS)}))) AS neg,
             greatest(len(tokens), 1) AS n
      FROM toks
    )
    SELECT doc_id,
           score AS sentiment_score,
           CASE WHEN score >= 0.05 THEN 'positive'
                WHEN score <= -0.05 THEN 'negative'
                ELSE 'neutral' END AS sentiment_label
    FROM (
      SELECT doc_id,
             {sql_dround(f"greatest(-1.0, least(1.0, (pos - neg)::DOUBLE / n * {SCALE}))", 4)}
               AS score
      FROM counts
    )
    """,
    doc="X1: deterministic lexicon sentiment + F10 threshold labels "
    "(finnhub_news.py:27-51) — JVM-side expression, no Python in the "
    "hot path; the pandas_udf variant is functions/sentiment.py.",
)
def q_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = fan_out(docs)  # single-row-group file → parallelize the hot compute
    score = sentiment_score_expr("text")
    return docs.select(
        "doc_id",
        score.alias("sentiment_score"),
        sentiment_label(score).alias("sentiment_label"),
    )


# ---------------------------------------------------------------------------
# Extensions — text analysis over `documents`
# ---------------------------------------------------------------------------


#: GPT-2-style BPE pre-tokenizer pattern (simplified, lowercase input):
#: contractions, then optionally-space-prefixed letter / digit /
#: punctuation runs, then residual whitespace. Pure alternation +
#: character classes — identical semantics in Java regex (Spark) and
#: RE2 (DuckDB).
_BPE_RE = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+|\\s+"


@_register(
    "token_count",
    f"""
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
               x -> x <> '')) AS n_tokens,
           len(regexp_extract_all(lower(text), '{_BPE_RE.replace("'", "''")}'))
             AS n_bpe_tokens,
           n_chars
    FROM documents
    """,
    doc="Text analysis: token counts per document — whitespace tokens "
    "plus a GPT-2-style BPE pre-tokenizer count (contractions, "
    "space-prefixed letter/digit/punctuation runs — the standard "
    "cost estimate for LLM training data budgeting). Both engines "
    "evaluate the same RE2/Java-compatible pattern.",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = fan_out(docs)  # single-row-group file → parallelize the hot compute
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.regexp_count(F.lower(F.col("text")), F.lit(_BPE_RE)).alias(
            "n_bpe_tokens"
        ),
        "n_chars",
    )


_STOPWORDS = "the a an and of to in is it for on with as at by".split()


@_register(
    "text_quality",
    f"""
    WITH toks AS (
      SELECT doc_id, n_chars,
             list_filter(
               regexp_split_to_array(lower(trim(text)), '[^a-z0-9'']+'),
               x -> x <> '') AS tokens
      FROM documents
    )
    SELECT doc_id,
           len(tokens) AS n_tokens,
           {sql_dround(f"len(list_filter(tokens, x -> x IN ({_sql_wordlist(_STOPWORDS)})))::DOUBLE / greatest(len(tokens), 1)", 4)}
             AS stopword_ratio,
           {sql_dround("n_chars::DOUBLE / greatest(len(tokens), 1)", 4)}
             AS avg_token_len,
           (len(tokens) >= 20 AND n_chars >= 100) AS passes_length_gate
    FROM toks
    """,
    doc="Text analysis: quality signals — stopword ratio, average token "
    "length, length gate (pretraining-style heuristic filter).",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = fan_out(docs)  # single-row-group file → parallelize the hot compute
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"[^a-z0-9']+"),
        lambda t: t != "",
    )
    d = docs.select("doc_id", "n_chars", toks.alias("tokens"))
    n = F.greatest(F.size("tokens"), F.lit(1))
    stop_hits = F.size(F.filter(F.col("tokens"), lambda t: t.isin(*_STOPWORDS)))
    return d.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        dround(stop_hits.cast("double") / n, 4).alias("stopword_ratio"),
        dround(F.col("n_chars").cast("double") / n, 4).alias("avg_token_len"),
        ((F.size("tokens") >= 20) & (F.col("n_chars") >= 100)).alias(
            "passes_length_gate"
        ),
    )


@_register(
    "lang_id",
    """
    SELECT doc_id,
           CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                WHEN regexp_matches(lower(text),
                     '\\b(der|die|das|und|nicht)\\b') THEN 'de'
                WHEN regexp_matches(lower(text),
                     '\\b(le|la|les|et|une)\\b') THEN 'fr'
                WHEN regexp_matches(lower(text),
                     '\\b(el|los|las|una|que)\\b') THEN 'es'
                ELSE 'en' END AS lang_guess,
           lang AS lang_label
    FROM documents
    """,
    doc="Text analysis: marker-based language ID heuristic (CJK codepoints "
    "+ stopword markers), compared against the dataset label.",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = fan_out(docs)  # single-row-group file → parallelize the hot compute
    lower = F.lower(F.col("text"))
    guess = (
        F.when(F.col("text").rlike("[一-鿿]"), F.lit("zh"))
        .when(lower.rlike(r"\b(der|die|das|und|nicht)\b"), F.lit("de"))
        .when(lower.rlike(r"\b(le|la|les|et|une)\b"), F.lit("fr"))
        .when(lower.rlike(r"\b(el|los|las|una|que)\b"), F.lit("es"))
        .otherwise(F.lit("en"))
    )
    return docs.select(
        "doc_id", guess.alias("lang_guess"), F.col("lang").alias("lang_label")
    )


@_register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
             AS fingerprint
    FROM documents
    """,
    doc="Text analysis: normalized-content fingerprint (md5 over "
    "lowercased, whitespace-collapsed text) — the exact-dedup key.",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = fan_out(docs)  # single-row-group file → parallelize the hot compute
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


# ---------------------------------------------------------------------------
# Extensions — exact deduplication over `documents`
# ---------------------------------------------------------------------------


@_register(
    "dedup_exact",
    """
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
             AS fingerprint,
           min(doc_id) AS kept_doc_id,
           count(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
    doc="Dedup (exact): hash-groupBy on the normalized fingerprint; keep "
    "min doc_id per group. One shuffle on the hash — at 100 TB this is "
    "the standard exact-dedup plan.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = fan_out(docs)  # single-row-group file → parallelize the hot compute
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        docs.select(F.md5(normalized).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


