"""Sentiment scoring (SURVEY.md §2.9 X1).

The reference scores each article with VADER's compound polarity
(finnhub_news.py:27-51) — a lexicon-plus-heuristics model. VADER is
not installed in this container, so the engine ships a small,
deterministic lexicon scorer with the same *interface contract*:
``score ∈ [-1, 1]`` rounded to 4 decimals (finnhub_news.py:49) and
the ±0.05 label thresholds (finnhub_news.py:41-46).

Two implementations of the same semantics:

- :func:`sentiment_score_expr` — pure Column expression (token
  filter + count). Stays JVM-side in whole-stage codegen; this is
  the 100 TB path and is SQL-oracle-checkable.
- :func:`sentiment_score_udf` — Arrow-batched ``pandas_udf`` with
  the identical lexicon, demonstrating the X1 integration shape so a
  real VADER (or any Python model) can be dropped in: swap the
  ``_score_batch`` body, broadcast the lexicon.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Deterministic mini-lexicon (public-domain word lists). Scoring:
# score = clip((pos_hits - neg_hits) / max(n_tokens, 1) * SCALE, -1, 1)
POSITIVE_WORDS = (
    "good great excellent strong growth profit gain rally surge beat "
    "record bullish upgrade outperform positive win success soar jump "
    "boost rise up high best happy love fast small easy"
).split()
NEGATIVE_WORDS = (
    "bad poor weak loss decline drop crash plunge miss bearish downgrade "
    "underperform negative fail lawsuit fraud risk fear fall down low "
    "worst sad hate slow big hard"
).split()
SCALE = 5.0

_POS = set(POSITIVE_WORDS)
_NEG = set(NEGATIVE_WORDS)


def _tokens(col: Column) -> Column:
    # coalesce: null text scores 0.0 (like the Python scorer), not null.
    # split keeps leading/trailing/adjacent-separator empty strings
    # (limit=-1), so filter them — otherwise punctuated text inflates
    # the token count n and deflates every score (the Python scorer
    # and the DuckDB oracle both drop empties).
    raw = F.split(F.lower(F.trim(F.coalesce(col, F.lit("")))), r"[^a-z0-9']+")
    return F.filter(raw, lambda t: t != "")


def sentiment_score_expr(text: Column | str) -> Column:
    """Lexicon sentiment as a pure (codegen'd) column expression."""
    from yahoofinancedatalake_spark.functions.scalars import dround  # noqa: PLC0415

    col = F.col(text) if isinstance(text, str) else text
    toks = _tokens(col)
    pos = F.size(F.filter(toks, lambda t: t.isin(*POSITIVE_WORDS)))
    neg = F.size(F.filter(toks, lambda t: t.isin(*NEGATIVE_WORDS)))
    n = F.greatest(F.size(toks), F.lit(1))
    raw = (pos - neg).cast("double") / n * SCALE
    return dround(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), raw)), 4)


def _score_batch(texts: pd.Series) -> pd.Series:
    """Vectorized Python scorer — same semantics as the expression."""
    import math  # noqa: PLC0415
    import re  # noqa: PLC0415

    split = re.compile(r"[^a-z0-9']+")

    def score(t: str | None) -> float:
        if t is None:
            t = ""
        toks = [w for w in split.split(t.strip().lower()) if w]
        n = max(len(toks), 1)
        raw = (
            sum(w in _POS for w in toks) - sum(w in _NEG for w in toks)
        ) / n * SCALE
        clipped = max(-1.0, min(1.0, raw))
        return math.floor(clipped * 10000.0 + 0.5) / 10000.0  # dround(x, 4)

    return texts.map(score)


@F.pandas_udf(T.DoubleType())
def sentiment_score_udf(texts: pd.Series) -> pd.Series:
    """X1 as an Arrow-batched Pandas UDF (the VADER drop-in point)."""
    return _score_batch(texts)
