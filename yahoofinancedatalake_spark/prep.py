"""Training-data prep pipeline: documents → model-ready pack manifest.

The medallion pipeline (:mod:`yahoofinancedatalake_spark.pipeline`)
re-expresses the reference's financial DAG; this module is its
LLM-training-data sibling — the end-to-end composition of the engine's
training-data operators into one deterministic Spark job:

    documents
      → quality gate        (length/stopword heuristics, map-side)
      → exact dedup         (16-byte content fingerprint, one shuffle)
      → near-dup removal    (selectable backend — MinHash-LSH
                             candidates → hashed-Jaccard verify, or
                             the deterministic winnowed-inverted-index
                             matcher — → connected components → keep
                             the min-id doc per cluster)
      → decontamination     (drop docs sharing an n-gram with the
                             benchmark/eval set — md5 equi-join)
      → language rebalance  (temperature sampling: per-language keep
                             rate (n_min/n_l)^0.7 via the md5 gate)
      → split assignment    (deterministic md5 hash → train/val/test)
      → chunking            (overlapping token windows, map-side)
      → sequence packing    (context-bin manifest per (split, source))

Every stage is the SAME operator the oracle-gated query pack verifies
(imported from :mod:`..queries.pack` / :mod:`..operators.dedup`), so
the pipeline's correctness is inherited from the driver gate rather
than re-proven here; ``tests/test_prep.py`` asserts the composition
(counts monotone, no contaminated survivors, determinism across runs).

Scale shape: stages 1, 5, 6 are narrow map-side transforms; the wide
exchanges are exact-dedup's fingerprint agg, LSH's bucket shuffle, the
component propagation (O(cluster diameter) rounds), the contamination
hash join (eval side broadcast), and packing's per-(split, source)
window — each documented at its operator. Nothing collects to the
driver except the component-convergence counter.

Run: ``python pipeline.py prep --root /tmp/prep [--sf-dir .../sf0.01]``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.session import stage_boundary

from yahoofinancedatalake_spark.catalog import fan_out, load_table

#: Quality gate thresholds (the text_quality query's length gate).
MIN_TOKENS = 20
MIN_CHARS = 100

#: Near-dup verify threshold (the minhash_near_dup query's).
JACCARD_THRESHOLD = 0.9

#: Split fractions over the md5 hash space (the train_split_assign
#: query's 80/10/10 boundaries).
SPLIT_BOUNDS = (("train", "cd"), ("val", "e6"), ("test", None))


def _word_tokens():
    from yahoofinancedatalake_spark.queries.pack import _word_toks  # noqa: PLC0415

    return _word_toks()


def quality_gate(docs: DataFrame) -> DataFrame:
    """Stage 1 — keep docs passing the length gate (map-side)."""
    toks = _word_tokens()
    return (
        docs.withColumn("__n_tokens", F.size(toks))
        .filter(
            (F.col("__n_tokens") >= MIN_TOKENS)
            & (F.col("n_chars") >= MIN_CHARS)
        )
        .drop("__n_tokens")
    )


def exact_stage(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Stage 2 — exact dedup (min-id keeper per content fingerprint).

    Runs first because it is one cheap 16-byte-fingerprint aggregation
    and shrinks the LSH input for the near-dup stage.
    """
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        exact_dedup,
    )

    return exact_dedup(docs, "text", id_col)


def near_dup_stage(
    exact: DataFrame,
    id_col: str = "doc_id",
    backend: str = "lsh",
    bands: DataFrame | None = None,
) -> DataFrame:
    """Stage 3 — near-dup cluster removal over exact-dedup survivors:
    candidate/verified pairs from the selected matcher → connected
    components → anti-join away every node that is not its cluster's
    min id (the deterministic keeper — identical survivor policy for
    both backends).

    Backends (VERDICT r9 #4):

    - ``"lsh"`` (default): MinHash-LSH candidates → hashed-Jaccard
      verify at :data:`JACCARD_THRESHOLD`. Probabilistic candidate
      generation (the bucket cap is partitioning-dependent), so the
      composed-pipeline oracle needs the engine's own candidate pairs
      landed as a pre-filter at scale.
    - ``"winnow"``: winnowed-fingerprint inverted-index matcher
      (``operators/dedup.py:winnow_near_dup_pairs``, the gated
      ``winnow_near_dup`` query's operator at its exact parameters).
      Fully DETERMINISTIC — the df-cap depends only on (fingerprint,
      document frequency) — so this mode is exactly replayable on any
      engine and its composed gate (``prep_stage_counts_winnow``)
      needs no candidate-rewrite oracle machinery. Note the matcher
      persist()s its fingerprint table internally (cache=True): the
      caller owns the release (``spark.catalog.clearCache()`` after
      consuming, as bench/driver runs do).
    - ``"hybrid"`` (r11): MinHash-LSH candidates scored by
      winnowed-fingerprint overlap
      (``operators/dedup.py:hybrid_near_dup_pairs`` at the gated
      ``hybrid_near_dup`` query's parameters) — the winnow accept
      rule with LSH bounding the pair universe, the 100 TB scale
      path for the winnow policy (the pure matcher's Σ C(df,2)
      candidate growth measured 736 M at the 30× sweep vs LSH's
      24.5 M at 100×). Deterministic like "winnow" (both caps are
      partitioning-independent); persists its fingerprint table
      internally too (same clearCache contract).

    The LSH-vs-winnow thresholds are NOT the same policy (Jaccard
    0.9 exact-ish replicas vs overlap-coefficient 0.5 substring
    containment); the equivalence pytest plants near-dups that trip
    both.

    Precondition (shared by "lsh" and "hybrid", ADVICE r11): docs
    whose normalized text is empty/whitespace-only carry no MinHash
    signature, so LSH-proposed backends never pair two of them —
    the pure "winnow" backend would (overlap 1.0 on the empty
    fingerprint set). Irrelevant in this pipeline because
    :func:`exact_stage` runs first and collapses every empty-text
    group to its min-id keeper before any matcher sees the corpus.
    """
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        connected_components,
        hashed_ngram_jaccard,
        hybrid_near_dup_pairs,
        minhash_lsh_pairs,
        winnow_near_dup_pairs,
    )

    if backend == "lsh":
        # Materialize the candidate pairs, then verify ONLY the docs a
        # candidate touches (r12 — the run_prep_incremental verify
        # shape applied to the batch path): un-restricted, the verify
        # join computed shingle hashes for EVERY doc on both join
        # sides — two corpus-sized Python-boundary passes to score a
        # candidate set that touches a tiny fraction of docs. The
        # checkpoint is candidate-sized (the LSH stage's bounded
        # output); the semi-join restricts the shingle recompute to
        # touched docs. Inner joins on (id_a, id_b) make the
        # restriction result-invariant.
        cand = minhash_lsh_pairs(
            exact, "text", id_col, n_hashes=32, n_bands=8, shingle_n=3,
            bands=bands,
        ).transform(stage_boundary)
        cand_ids = cand.select(
            F.explode(F.array("id_a", "id_b")).alias(id_col)
        ).dropDuplicates([id_col])
        # broadcast (r13): the touched-id set is candidate-bounded, so
        # the restriction must not cost a corpus-side shuffle
        verify_docs = exact.join(F.broadcast(cand_ids), id_col, "left_semi")
        verified = hashed_ngram_jaccard(
            cand, verify_docs, id_col, "text", shingle_n=3
        ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    elif backend == "winnow":
        # defaults = the gated winnow_near_dup query's parameters
        # (k=16, w=8, df_cap=64, overlap >= 0.5); already verified
        # pairs — the matcher computes exact overlap, no second pass
        verified = winnow_near_dup_pairs(exact, "text", id_col)
    elif backend == "hybrid":
        # defaults = the gated hybrid_near_dup query's parameters
        # (LSH 32 hashes / 8 bands / 3-shingles proposing; winnow
        # k=16, w=8, df_cap=64, overlap >= 0.6 deciding)
        verified = hybrid_near_dup_pairs(exact, "text", id_col, bands=bands)
    else:
        raise ValueError(
            f"unknown near-dup backend {backend!r} (lsh|winnow|hybrid)"
        )
    comps = connected_components(verified.select("id_a", "id_b"))
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return exact.join(losers, id_col, "left_anti")


def drop_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    backend: str = "lsh",
) -> DataFrame:
    """Stages 2+3 — exact dedup, then near-dup cluster removal."""
    return near_dup_stage(exact_stage(docs, id_col), id_col, backend)


#: paragraph unit for paragraph_stage on the no-newline synthetic
#: corpus (the gated paragraph_dedup query's parameter).
PARA_WORDS = 20


def paragraph_stage(
    docs: DataFrame,
    id_col: str = "doc_id",
    para_words: int = PARA_WORDS,
) -> DataFrame:
    """Stage 3b (r12, off by default) — PARAGRAPH-granularity dedup
    (Lee et al. 2022; Dolma's paragraph dedup): after the doc-level
    matchers have decided whole documents, duplicated paragraphs
    *inside* the survivors are collapsed to their first occurrence
    corpus-wide and each doc's text is rewritten to its surviving
    paragraph stream (the gated ``paragraph_dedup`` query's operator
    at its exact parameters). Docs whose every paragraph was a later
    duplicate — and docs with no tokens at all — drop out entirely;
    ``n_chars`` is recomputed so the downstream datasheet/packing
    stages see the rewritten corpus honestly. Runs BETWEEN near-dup
    removal and decontamination, where the published pipelines put
    it."""
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        paragraph_dedup,
    )

    rewritten = paragraph_dedup(
        docs, "text", id_col,
        para_words=para_words, tokens=_word_tokens(),
    ).select(id_col, F.col("new_text").alias("text"))
    keep = [c for c in docs.columns if c not in ("text", "n_chars")]
    out = (
        docs.select(*keep)
        .join(rewritten, id_col)
        .filter(F.length("text") > 0)
    )
    if "n_chars" in docs.columns:
        out = out.withColumn(
            "n_chars",
            F.length("text").cast(dict(docs.dtypes)["n_chars"]),
        )
    return out.select(*docs.columns)


def decontaminate(
    docs: DataFrame, eval_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Stage 4 — drop docs sharing any n-gram with the eval set.

    Same kernel as the ``contamination_ngrams`` query: both sides emit
    lowercase word n-grams, only md5 hashes ride the shuffle, eval side
    broadcasts (benchmarks are small).
    """
    from yahoofinancedatalake_spark.queries.pack import _CONTAM_N  # noqa: PLC0415

    def grams(d: DataFrame) -> DataFrame:
        base = (
            d.select("doc_id", _word_tokens().alias("toks"))
            .withColumn("n", F.size("toks"))
            .filter(F.col("n") >= _CONTAM_N)
        )
        return base.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n") - _CONTAM_N),
                    lambda i: F.array_join(
                        F.slice(F.col("toks"), i + 1, F.lit(_CONTAM_N)), " "
                    ),
                )
            ).alias("gram"),
        ).select("doc_id", F.md5("gram").alias("g"))

    ev = grams(eval_docs).select("g").distinct()
    contaminated = (
        grams(docs).join(F.broadcast(ev), "g").select("doc_id").distinct()
    )
    return docs.join(contaminated, "doc_id", "left_anti")


def rebalance_languages(
    docs: DataFrame, exponent: float = 0.7, lang_col: str = "lang"
) -> DataFrame:
    """Stage 4b — temperature-based language rebalancing (the
    temperature_sampling query's rule): per-language keep rate
    ``(n_min/n_lang)^exponent``, so the rarest language keeps
    everything and the head is downsampled toward balance
    (exponent = 1 - alpha; 0.7 ≈ the multilingual alpha=0.3 recipe).
    Membership is the deterministic md5 gate with the data-derived
    rate turned into a 4-hex-digit cutoff string — identical row set
    on every run, engine, and partitioning. One count-shuffle; the
    5-row rate table broadcasts; the gate itself is map-side."""
    counts = docs.groupBy(lang_col).agg(F.count(F.lit(1)).alias("n_total"))
    w_all = Window.partitionBy()
    rates = counts.select(
        lang_col,
        F.pow(
            F.min("n_total").over(w_all).cast("double") / F.col("n_total"),
            F.lit(exponent),
        ).alias("rate"),
    ).withColumn(
        "rate_u16", F.floor(F.col("rate") * 65536).cast("bigint")
    )
    # rate ≥ 1 → cutoff 'g': every 4-hex-digit prefix sorts below it,
    # so the rarest language really keeps everything. (floor(1.0·65536)
    # = 65536 = '10000' would be TRUNCATED by lpad(4) to '1000' and
    # silently keep only 1/16 of the stratum — both engines agreed on
    # the truncation, so only the semantic test caught it.)
    cutoff = F.when(F.col("rate_u16") >= 65536, F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(F.col("rate_u16")), 4, "0"))
    )
    h = F.substring(
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                     F.col(lang_col))
        ), 1, 4,
    )
    return (
        docs.join(F.broadcast(rates), lang_col)
        .filter(h < cutoff)
        .drop("rate", "rate_u16")
    )


def assign_splits(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Stage 5 — deterministic content-free split: first hex byte of
    md5(id) against the 80/10/10 boundaries (the train_split_assign
    query's rule; free map-side expression, stable across runs and
    cluster sizes)."""
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    expr = F.when(h < SPLIT_BOUNDS[0][1], SPLIT_BOUNDS[0][0]).when(
        h < SPLIT_BOUNDS[1][1], SPLIT_BOUNDS[1][0]
    ).otherwise(SPLIT_BOUNDS[2][0])
    return docs.withColumn("split", expr)


def chunk_docs(docs: DataFrame) -> DataFrame:
    """Stage 6 — overlapping token-window chunks (the doc_chunking
    query's transform, carrying split/source through)."""
    from yahoofinancedatalake_spark.queries.pack import (  # noqa: PLC0415
        _CHUNK_S,
        _CHUNK_W,
    )

    base = (
        docs.select("doc_id", "split", "source", _word_tokens().alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= 1)
    )
    ex = base.select(
        "doc_id",
        "split",
        "source",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(_CHUNK_S))
        ).alias("st"),
    )
    return ex.select(
        "doc_id",
        "split",
        "source",
        (F.col("st") / _CHUNK_S).cast("long").alias("chunk_id"),
        F.least(F.lit(_CHUNK_W), F.col("n") - F.col("st"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("toks"), F.col("st") + 1, F.lit(_CHUNK_W)), " "
        ).alias("chunk_text"),
    )


def pack_chunks(chunks: DataFrame) -> DataFrame:
    """Stage 7 — context-bin manifest: contiguous fill per
    (split, source) in (doc_id, chunk_id) order (the sequence_packing
    query's rule over chunks instead of whole docs)."""
    from yahoofinancedatalake_spark.queries.pack import _PACK_BUDGET  # noqa: PLC0415

    w = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = chunks.withColumn("cum", F.sum("n_chunk_tokens").over(w))
    return (
        c.withColumn(
            "bin",
            F.floor(
                (F.col("cum") - F.col("n_chunk_tokens")) / F.lit(_PACK_BUDGET)
            ).cast("bigint"),
        )
        .groupBy("split", "source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


#: The three incremental-dedup state tables, in landing order.
_STATE_TABLES = ("dedup_survivors", "fingerprints", "band_index")


def _state_manifest_path(root: str) -> str:
    return f"{root}/dedup_state_manifest.json"


def _parquet_count(path: str) -> int:
    """Row count of a landed parquet table from its FOOTERS — no
    Spark job. Sums ``metadata.num_rows`` over the part files, which
    is exactly the number a ``spark.read.parquet(path).count()``
    returns (the footers are the writers' own committed row counts).
    Replaces the three count jobs each seal/verify used to launch
    (r13): a metadata read per file costs ~1 ms where each Spark
    count paid a full job's scheduling floor; at real scale this is
    the same O(files) driver metadata work a scan's planning phase
    already does."""
    import glob  # noqa: PLC0415
    import os  # noqa: PLC0415

    import pyarrow.parquet as pq  # noqa: PLC0415

    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files and not os.path.isdir(path):
        # keep the pre-r13 failure mode: a missing table raises like
        # the Spark read did, rather than sealing a silent zero
        raise FileNotFoundError(path)
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _seal_dedup_state(spark: SparkSession, root: str) -> dict[str, int]:
    """Write the state manifest LAST — the commit record for the
    three-table landing. Counts are parquet-metadata reads (footer
    row counts), so sealing is cheap at any corpus size. The seal is
    itself atomic (temp file + rename): truncating the previous
    manifest in place would leave a zero-byte file if the process
    died mid-write, turning the designed recovery error into a raw
    JSONDecodeError."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    counts = {t: _parquet_count(f"{root}/{t}") for t in _STATE_TABLES}
    path = _state_manifest_path(root)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(counts, f)
    os.replace(tmp, path)
    return counts


def verify_dedup_state(spark: SparkSession, root: str) -> dict[str, int]:
    """Check the landed state is COMPLETE before deduping a batch
    against it. The three tables land in separate writes; a crash
    between them leaves e.g. fingerprints without a band index, and
    an increment run against that silently under-dedups (near-dups
    of history docs missing from the index would all survive). The
    manifest is written last, after every table, so its presence +
    matching row counts certify the landing committed. Raises with a
    recovery hint otherwise."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    path = _state_manifest_path(root)
    if not os.path.exists(path):
        raise RuntimeError(
            f"dedup state at {root} has no manifest — a prior "
            "run_prep/run_prep_incremental did not complete its state "
            "landing; re-run run_prep to rebuild the state"
        )
    with open(path) as f:
        sealed = json.load(f)
    actual = {t: _parquet_count(f"{root}/{t}") for t in _STATE_TABLES}
    if actual != sealed:
        raise RuntimeError(
            f"dedup state at {root} is inconsistent with its manifest "
            f"(sealed={sealed}, actual={actual}) — a state write "
            "crashed mid-landing; re-run run_prep to rebuild"
        )
    return actual


def _land_dedup_state(
    spark: SparkSession,
    root: str,
    deduped: DataFrame,
    bands: DataFrame | None = None,
):
    """Persist the incremental-dedup state next to the outputs: the
    post-dedup survivor docs (text included — the near-dup verify side
    for future increments), their fingerprints, and their LSH band
    index. These three tables are what lets the NEXT batch dedup
    against history in O(batch) instead of re-shingling the corpus.
    The landing is sealed by a manifest written last
    (:func:`verify_dedup_state` checks it before any increment).

    ``bands`` (optional, r13): a precomputed
    :func:`minhash_band_table` frame covering a SUPERSET of the
    survivors (the prep runners compute it once over the exact-dedup
    survivors and share it with the near-dup matcher). The landed
    band index is then that frame semi-joined to the survivor ids —
    identical rows to recomputing, because the band table is a
    deterministic per-doc map — instead of paying the corpus
    signature pass a second time."""
    import os  # noqa: PLC0415

    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        minhash_band_table,
        normalized_text,
    )

    # Invalidate any PREVIOUS seal before the first overwrite: a
    # crash mid-relanding over an existing root must not leave an old
    # manifest whose counts can coincidentally match the mixed
    # old/new tables (same-size corpus re-prep) and certify them.
    try:
        os.remove(_state_manifest_path(root))
    except FileNotFoundError:
        pass

    deduped.write.mode("overwrite").parquet(f"{root}/dedup_survivors")
    survivors = spark.read.parquet(f"{root}/dedup_survivors")
    survivors.select(
        "doc_id", F.md5(normalized_text(F.col("text"))).alias("fingerprint")
    ).write.mode("overwrite").parquet(f"{root}/fingerprints")
    # no broadcast hint: survivor ids scale with the corpus, so the
    # semi-join strategy is left to the planner's size estimates
    band_rows = (
        bands.join(survivors.select("doc_id"), "doc_id", "left_semi")
        if bands is not None
        else minhash_band_table(
            survivors, "text", "doc_id", n_hashes=32, n_bands=8, shingle_n=3
        )
    )
    band_rows.write.mode("overwrite").parquet(f"{root}/band_index")
    _seal_dedup_state(spark, root)


def seed_prep_state(
    spark: SparkSession,
    root: str,
    docs: DataFrame,
    eval_docs: DataFrame,
    near_dup_backend: str = "lsh",
) -> dict[str, int]:
    """Seed the incremental-prep state from an initial corpus WITHOUT
    the full-run packing stages: quality gate → exact dedup → near-dup
    removal → land + seal the dedup state (the exact composition
    :func:`run_prep` uses through its state landing), plus the
    decontamination count so the audit rows line up with
    :func:`run_prep_incremental`'s. Use this when the downstream
    rebalance/split/chunk/pack stages belong to a later periodic
    rebuild — the seed-then-increment shape the gated
    ``incremental_prep_counts`` query verifies. Returns per-stage
    counts (``input``, ``quality_pass``, ``after_dedup``,
    ``after_decontam``).

    ``near_dup_backend`` selects the stage-3 matcher (see
    :func:`near_dup_stage`). The landed state contract is
    backend-independent: every state table (survivors, exact
    fingerprints, LSH band index) is derived FROM the survivor set,
    so increments — which dedup against the landed band index —
    compose with a winnow-seeded history unchanged.

    Stage boundaries are persist()ed while both their own count and
    the next stage consume them (the subplan-reuse lesson), and
    released before returning.
    """
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        minhash_band_table,
    )

    counts: dict[str, int] = {"input": docs.count()}
    persisted: list[DataFrame] = []

    def _stage(frame: DataFrame) -> DataFrame:
        persisted.append(frame.persist())
        return persisted[-1]

    try:
        gated = _stage(quality_gate(docs))
        counts["quality_pass"] = gated.count()
        # persist the exact-dedup survivors too (r12): near_dup_stage
        # consumes them THREE times (LSH candidate generation, the
        # Jaccard verify side, the final keeper anti-join), and
        # un-persisted each consumer re-runs the fingerprint shuffle
        # over the (persisted) quality survivors
        exact = _stage(exact_stage(gated))
        # compute the LSH band table ONCE over the exact survivors
        # (r13) and share it between the matcher's candidate stage
        # and the landed band index — previously the landing re-ran
        # the full corpus signature pass the matcher had just paid
        bands = (
            _stage(minhash_band_table(
                exact, "text", "doc_id",
                n_hashes=32, n_bands=8, shingle_n=3,
            ))
            if near_dup_backend in ("lsh", "hybrid")
            else None
        )
        deduped = _stage(
            near_dup_stage(exact, backend=near_dup_backend, bands=bands)
        )
        counts["after_dedup"] = deduped.count()
        counts["after_decontam"] = decontaminate(deduped, eval_docs).count()
        _land_dedup_state(spark, root, deduped, bands=bands)
    finally:
        for frame in persisted:
            frame.unpersist()
    return counts


def run_prep(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    eval_docs: DataFrame | None = None,
    docs: DataFrame | None = None,
    near_dup_backend: str = "lsh",
    paragraph_level: bool = False,
) -> dict[str, int]:
    """Run the whole prep DAG and land each stage under ``root``.

    ``paragraph_level=True`` (r12) inserts :func:`paragraph_stage`
    between near-dup removal and decontamination — sub-document
    dedup that rewrites survivors' text to their first-occurrence
    paragraph stream (Lee et al. 2022 / Dolma); off by default so
    existing composed gates keep their committed counts.

    ``eval_docs`` defaults to the corpus rows with ``doc_id % 37 = 0``
    (the contamination_ngrams query's stand-in benchmark); pass a real
    benchmark table in production. ``docs`` overrides the input frame
    (defaults to the full documents table). ``near_dup_backend``
    selects the stage-3 matcher (``"lsh"`` default | ``"winnow"`` for
    the exactly-replayable deterministic mode — see
    :func:`near_dup_stage`). Returns per-stage row counts. Alongside
    the outputs, the incremental-dedup state (survivors +
    fingerprints + LSH band index — all derived from the survivor
    set, so backend-independent) is landed so
    :func:`run_prep_incremental` can process future batches against
    this run's history.
    """
    if docs is None:
        docs = fan_out(load_table(spark, sf_dir, "documents"))
    eval_set = (
        eval_docs
        if eval_docs is not None
        else docs.filter(F.col("doc_id") % 37 == 0)
    )

    counts: dict[str, int] = {"input": docs.count()}

    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        minhash_band_table,
    )

    # Stage boundaries are persist()ed while both their own count and
    # the downstream stage consume them (r12 — the same subplan-reuse
    # convention as seed_prep_state/prep_stage_counts; un-persisted,
    # every stage count + next-stage consumption re-ran the whole
    # prefix, compounding with depth). Post-dedup stages read the
    # LANDED survivor parquet instead of the lazy dedup plan — the
    # guide's materialize-the-intermediate rule; the state landing
    # already paid that write.
    persisted: list[DataFrame] = []

    def _stage(frame: DataFrame) -> DataFrame:
        persisted.append(frame.persist())
        return persisted[-1]

    try:
        gated = _stage(quality_gate(docs))
        counts["quality_pass"] = gated.count()

        exact = _stage(exact_stage(gated))
        # one band-table pass shared by the matcher and the landed
        # index (r13) — see seed_prep_state
        bands = (
            _stage(minhash_band_table(
                exact, "text", "doc_id",
                n_hashes=32, n_bands=8, shingle_n=3,
            ))
            if near_dup_backend in ("lsh", "hybrid")
            else None
        )
        deduped = _stage(
            near_dup_stage(exact, backend=near_dup_backend, bands=bands)
        )
        counts["after_dedup"] = deduped.count()
        _land_dedup_state(spark, root, deduped, bands=bands)
    finally:
        for frame in persisted:
            frame.unpersist()

    # every downstream consumer reads the landed survivors — the
    # dedup subgraph never re-executes past this point
    deduped = spark.read.parquet(f"{root}/dedup_survivors")

    if paragraph_level:
        deduped = paragraph_stage(deduped).persist()
        counts["after_paragraph"] = deduped.count()

    clean = decontaminate(deduped, eval_set).persist()
    counts["after_decontam"] = clean.count()

    rebalanced = rebalance_languages(clean)
    counts["after_rebalance"] = rebalanced.count()

    split = assign_splits(rebalanced)
    split.write.mode("overwrite").partitionBy("split").parquet(
        f"{root}/clean_docs"
    )
    for frame in (clean, deduped):
        frame.unpersist()

    chunks = chunk_docs(spark.read.parquet(f"{root}/clean_docs"))
    chunks.write.mode("overwrite").partitionBy("split").parquet(
        f"{root}/chunks"
    )
    counts["chunks"] = spark.read.parquet(f"{root}/chunks").count()

    manifest = pack_chunks(spark.read.parquet(f"{root}/chunks"))
    manifest.write.mode("overwrite").parquet(f"{root}/pack_manifest")
    counts["bins"] = spark.read.parquet(f"{root}/pack_manifest").count()
    return counts


def run_prep_incremental(
    spark: SparkSession,
    root: str,
    new_docs: DataFrame,
    eval_docs: DataFrame,
) -> dict[str, int]:
    """Process an ingest batch against the landed prep state — the
    daily-increment shape: history participates ONLY through its
    landed tables (fingerprints for exact dedup, band index + survivor
    texts for near-dup), never through a corpus re-scan.

    Policy (matches the full run's min-id keeper, given history ids
    precede batch ids): a new doc is dropped if its exact fingerprint
    exists in history; near-dup components are computed over the
    incremental candidate pairs, and a new doc survives only if its
    component contains no history doc and it is the component's min
    id. Known incremental-dedup drift: a new doc that BRIDGES two
    history clusters cannot retro-drop history (history is immutable
    here); a full recompute would keep one fewer doc. Stages after
    dedup (decontaminate) are per-doc and land appended; the state
    tables are extended so the next batch sees this one as history.
    Rebalance/split/chunk/pack stay full-run stages — sampling rates
    are corpus-distribution-derived and belong to a periodic rebuild,
    not a per-batch decision.
    """
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        connected_components,
        exact_dedup,
        hashed_ngram_jaccard,
        incremental_minhash_pairs,
        minhash_band_table,
        normalized_text,
    )

    # refuse to dedup against a half-landed history (manifest sealed
    # last by _land_dedup_state; mismatch = a prior landing crashed)
    verify_dedup_state(spark, root)

    counts: dict[str, int] = {"batch_input": new_docs.count()}

    gated = quality_gate(new_docs)
    counts["quality_pass"] = gated.count()

    # exact dedup: within batch, then against history fingerprints
    batch_exact = exact_dedup(gated, "text", "doc_id")
    hist_fp = spark.read.parquet(f"{root}/fingerprints")
    batch_exact = (
        batch_exact.withColumn(
            "fingerprint", F.md5(normalized_text(F.col("text")))
        )
        .join(F.broadcast(hist_fp.select("fingerprint")), "fingerprint",
              "left_anti")
        .drop("fingerprint")
        # persist (r12): consumed FOUR times below (the stage count,
        # candidate generation, the verify-side union, the loser
        # anti-join) — un-persisted each re-runs the quality gate +
        # within-batch exact dedup + history anti-join; released
        # after the post-dedup localCheckpoint (its last consumer)
        .persist()
    )
    counts["after_exact"] = batch_exact.count()

    # near-dup: candidates vs history index + within batch, verify,
    # components over the (small) incremental pair set. The batch's
    # band table is computed ONCE (r13) and shared by the candidate
    # stage (which consumes it twice) and the state append below —
    # previously the batch paid the signature pass three times.
    index = spark.read.parquet(f"{root}/band_index")
    # stage_boundary (NOT persist): the band append below runs AFTER
    # the fingerprint append, and new_bands' lineage reads
    # root/fingerprints through batch_exact's history anti-join — the
    # file write invalidates any cache over that path, and the
    # recompute would see the batch's own fingerprints as history and
    # emit ZERO band rows (the read-then-append self-reference the
    # batch_deduped checkpoint below already guards against). A
    # lineage-truncating checkpoint is immune.
    new_bands = stage_boundary(minhash_band_table(
        batch_exact, "text", "doc_id", n_hashes=32, n_bands=8, shingle_n=3
    ))
    cand = incremental_minhash_pairs(
        batch_exact, index, "text", "doc_id",
        n_hashes=32, n_bands=8, shingle_n=3, new_bands=new_bands,
    ).persist()
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias("doc_id")
    ).dropDuplicates(["doc_id"])
    hist_survivors = spark.read.parquet(f"{root}/dedup_survivors")
    verify_docs = (
        hist_survivors.select("doc_id", "text")
        .unionByName(batch_exact.select("doc_id", "text"))
        .join(F.broadcast(cand_ids), "doc_id")
    )
    verified = hashed_ngram_jaccard(
        cand, verify_docs, "doc_id", "text", shingle_n=3
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    comps = connected_components(verified.select("id_a", "id_b"))
    old_ids = hist_survivors.select(
        F.col("doc_id").alias("node"), F.lit(1).alias("__old")
    )
    tainted = (
        comps.join(F.broadcast(old_ids), "node", "left")
        .groupBy("component")
        .agg(
            F.max(F.coalesce("__old", F.lit(0))).alias("has_old"),
            F.min("node").alias("min_node"),
        )
    )
    # losers: any member of an old-containing component, or a non-min
    # member of a pure-new component
    losers = (
        comps.join(F.broadcast(tainted), "component")
        .filter(
            (F.col("has_old") == 1) | (F.col("node") != F.col("min_node"))
        )
        .select(F.col("node").alias("doc_id"))
    )
    # materialize + truncate lineage BEFORE any state-table write:
    # the lazy plan reads root/dedup_survivors, and the appends below
    # extend that very table — re-executing the lineage after the
    # first append would see the batch as its own history and drop
    # everything (the classic read-then-append self-reference)
    batch_deduped = batch_exact.join(
        losers, "doc_id", "left_anti"
    ).transform(stage_boundary)
    counts["after_dedup"] = batch_deduped.count()
    # the localCheckpoint above was cand's and batch_exact's last
    # consumer — release both cached tables now, or a long-lived
    # session running daily increments accumulates orphaned caches
    # per batch
    cand.unpersist()
    batch_exact.unpersist()

    clean = decontaminate(batch_deduped, eval_docs).transform(stage_boundary)
    counts["after_decontam"] = clean.count()

    # Invalidate the old seal BEFORE the first append, mirroring
    # _land_dedup_state: the invariant is "seal present implies the
    # landing committed", and without this a crash mid-append of a
    # zero-row batch (or any append that happens to leave the sealed
    # counts intact) would leave the stale seal trivially certifying
    # a half-extended state.
    import os  # noqa: PLC0415

    try:
        os.remove(_state_manifest_path(root))
    except FileNotFoundError:
        pass

    # extend the landed state: this batch becomes history for the next
    batch_deduped.write.mode("append").parquet(f"{root}/dedup_survivors")
    batch_deduped.select(
        "doc_id", F.md5(normalized_text(F.col("text"))).alias("fingerprint")
    ).write.mode("append").parquet(f"{root}/fingerprints")
    # the deduped batch's band rows are the precomputed batch band
    # table filtered to survivors (deterministic per-doc map — same
    # rows a recompute would emit)
    new_bands.join(
        batch_deduped.select("doc_id"), "doc_id", "left_semi"
    ).write.mode("append").parquet(f"{root}/band_index")
    clean.write.mode("append").parquet(f"{root}/clean_increments")
    # re-seal: this batch's appends are now part of committed history
    _seal_dedup_state(spark, root)
    return counts
