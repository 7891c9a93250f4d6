"""Hypothesis property tests over the engine's deterministic kernels.

SURVEY §5 names property testing as part of the test strategy; these
pin the pure kernels (rounding, tokenization, hashing twins, the
closed-form forecaster) on generated inputs, where example-based tests
only cover hand-picked points. Spark-involving properties batch each
generated example into ONE job and cap example counts to keep the
suite fast.
"""

from __future__ import annotations

import math
import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# bounded so x * 10^4 can't overflow and ulp spacing stays < the 1e-6
# de-knife-edge band (dround's contract is money-scale values, not 1e300)
_FINITE = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_FINITE, min_size=1, max_size=50))
def test_dround_matches_python_kernel(spark, xs):
    """Spark dround == the plain-python floor form, bit-exact, on
    arbitrary finite doubles (the lattice test pins knife edges; this
    pins everywhere else)."""
    from yahoofinancedatalake_spark.functions.scalars import dround

    for scale in (2, 4):
        f = float(10**scale)
        want = {x: math.floor(x * f + 0.5 + 1e-6) / f for x in xs}
        df = spark.createDataFrame([(x,) for x in set(xs)], "x double")
        got = {
            r.x: r.r
            for r in df.select("x", dround("x", scale).alias("r")).collect()
        }
        for x in set(xs):
            assert got[x] == want[x], (scale, x)


_TOKEN_RE = re.compile(r"[^a-z0-9']+")


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", categories=("L", "N", "P", "Z")),
            max_size=80,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_word_tokenization_matches_python(spark, texts):
    """The shared lowercase word tokenization (fuzzy/chunking/
    decontamination/bigrams all build on it) == a plain-python re.split
    twin on arbitrary ASCII text."""
    from yahoofinancedatalake_spark.queries.pack import _word_toks

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.toks
        for r in df.select("doc_id", _word_toks().alias("toks")).collect()
    }
    for i, t in rows:
        want = [w for w in _TOKEN_RE.split(t.lower().strip()) if w != ""]
        assert got[i] == want, (t, got[i], want)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200))
def test_ref_hash_twins_are_deterministic(text):
    """The pure-python reference twins of the distributed hash kernels
    are total and deterministic on arbitrary unicode (they gate the
    vectorized numpy kernels in the dedup tests)."""
    from yahoofinancedatalake_spark.operators.dedup import (
        ref_gram_hashes,
        ref_minhash,
        ref_simhash,
    )

    assert ref_gram_hashes(text, 3) == ref_gram_hashes(text, 3)
    assert ref_minhash(text) == ref_minhash(text)
    assert ref_simhash(text) == ref_simhash(text)
    sig = ref_minhash(text)
    if sig is not None:
        assert len(sig) == 32
        assert all(isinstance(v, int) for v in sig)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False,
                  min_value=-1e6, max_value=1e6),
        min_size=3,
        max_size=100,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_fallback_forecast_is_finite_and_stable(ys, horizon):
    """Closed-form forecaster invariants on arbitrary series: outputs
    finite, half-widths non-negative and non-decreasing (the AR(1)
    variance term is monotone in h), and bit-identical across calls."""
    from yahoofinancedatalake_spark.forecast.grouped import _fallback_forecast

    y = np.asarray(ys, dtype=np.float64)
    preds, halves = _fallback_forecast(y, horizon)
    preds2, halves2 = _fallback_forecast(y, horizon)
    assert np.array_equal(preds, preds2) and np.array_equal(halves, halves2)
    assert np.isfinite(preds).all() and np.isfinite(halves).all()
    assert (halves >= 0).all()
    assert (np.diff(halves) >= -1e-12).all()


@settings(max_examples=100, deadline=None)
@given(
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e6, max_value=1e6),
    st.integers(min_value=3, max_value=50),
    st.integers(min_value=1, max_value=12),
)
def test_fallback_forecast_constant_series(c, n, horizon):
    """A constant series forecasts the constant with zero-width CI —
    the sharpest available exactness check on the closed forms."""
    from yahoofinancedatalake_spark.forecast.grouped import _fallback_forecast

    y = np.full(n, c, dtype=np.float64)
    preds, halves = _fallback_forecast(y, horizon)
    assert np.allclose(preds, c, rtol=1e-9, atol=1e-6)
    assert np.allclose(halves, 0.0, atol=1e-6)
