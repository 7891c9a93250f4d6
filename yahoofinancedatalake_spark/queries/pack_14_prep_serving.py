"""Round-8 additions: the composed prep pipeline under the driver
gate, and the parameterized serving surface.

Registered queries, in registration order (= the import order in
pack.py — new queries go at the END of this module):
- ``prep_stage_counts``
- ``top_flop_for_symbol``
- ``top_flop_for_symbol_b``
- ``type_window_daily_drill``
- ``source_quality_drill`` (r9)
- ``incremental_prep_counts`` (r9)
- ``winnow_fingerprints`` (r9)
- ``winnow_near_dup`` (r9)
- ``winnow_fast_accuracy`` (r9)
- ``stream_incremental_prep_batch_eq`` (r9, streaming rung 12)
- ``prep_stage_counts_winnow`` (r10, winnow near-dup backend gate)
- ``dsir_select`` (r10, DSIR importance resampling)
- ``kneser_ney_quality`` (r10, interpolated-KN perplexity filter)
- ``stream_dsir_score_batch_eq`` (r10, streaming rung 13 — online
  selection scoring against a frozen seed-trained model)
- ``gopher_quality_rules`` (r10, Gopher rule-based quality filter)
- ``unimax_mixture`` (r10, UniMax budget-constrained mixture)
- ``dsir_ess`` (r10, DSIR effective-sample-size diagnostic)
- ``stream_late_data_drop_batch_eq`` (r10, streaming rung 14 —
  late-data watermark drop/keep/finalize semantics)
- ``selection_funnel`` (r10, the CCNet-shaped composition:
  Gopher bounds → KN-ppl terciles → DSIR top-k)
- ``hybrid_near_dup`` (r11, LSH-proposes / winnow-decides matcher)
- ``quality_classifier_select`` (r11, closed-form NB quality
  classifier over the DSIR hashed-n-gram buckets)
- ``selection_funnel_cls`` (r11, funnel variant: Gopher bounds →
  NB classifier keep → DSIR top-k)
- ``classifier_auc`` (r11, exact tie-corrected rank-sum ROC-AUC of
  the NB classifier on its held-out split)
- ``classifier_calibration`` (r11, reliability-diagram bins)
- ``stream_nb_score_batch_eq`` (r11, streaming rung 15 — online
  scoring against a frozen seed-trained NB model + prior)
- ``prep_stage_counts_hybrid`` (r11, hybrid near-dup backend gate)
- ``data_card`` (r11, per-(source, lang) corpus datasheet)
- ``classifier_pr_points`` (r11, precision/recall/F1 threshold sweep)
- ``paragraph_dedup`` (r12, keep-first sub-document dedup — Lee et
  al. 2022 / Dolma shape — with per-doc text reassembly)
- ``classifier_auc_scaled`` (r12, cumulative-histogram AUC — zero
  unpartitioned windows, hash-equal to classifier_auc)
- ``classifier_pr_curve`` (r12, histogram PR sweep — hash-equal to
  classifier_pr_points)
- ``mixture_plan`` (r12, data-card token counts → UniMax allocation
  → per-group sampling-rate table)
- ``stream_hybrid_dedup_batch_eq`` (r12, streaming rung 16 —
  incremental hybrid near-dup against persisted band/fp/df state)
- ``prep_stage_counts_paragraph`` (r12, paragraph-composed prep
  gate — run_prep(paragraph_level=True)'s stage chain)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.catalog import fan_out, load_table
from yahoofinancedatalake_spark.functions.scalars import dround, sql_dround
from yahoofinancedatalake_spark.queries._registry import _register
from yahoofinancedatalake_spark.queries.pack_07_training_prep import (
    _CHUNK_S,
    _CHUNK_W,
    _CONTAM_N,
    _PACK_BUDGET,
    _WORD_TOKS_SQL,
    _word_toks,
)
from yahoofinancedatalake_spark.prep import (
    JACCARD_THRESHOLD as _PREP_JT,
    MIN_CHARS as _PREP_MIN_CHARS,
    MIN_TOKENS as _PREP_MIN_TOKENS,
)

# ---------------------------------------------------------------------------
# The composed prep pipeline, oracle-gated end to end.
#
# Every stage below is an operator the pack already gates in isolation
# (text_quality's length gate, dedup_exact, dedup_clusters' LSH→verify
# →CC, contamination_ngrams, temperature_sampling, train_split_assign,
# doc_chunking, sequence_packing). This query gates their COMPOSITION:
# prep.py's actual stage functions run in sequence and the oracle
# recomputes the same staged row counts in one DuckDB statement — so a
# drift in any stage's semantics, or in how prep.py wires them
# together, breaks the hash.
# ---------------------------------------------------------------------------

# Shared full-recompute CTE chain through the decontaminated corpus
# (`cl`): quality gate → exact keepers → quadratic-Jaccard near-dup
# clusters (recursive-CTE connected components) → decontamination.
# Used by both the composed batch gate (prep_stage_counts, which adds
# the rebalance/chunk/pack stages on top) and the incremental gate
# (incremental_prep_counts, whose Spark side sums a seeded history run
# + run_prep_incremental and must land on these very counts).
# quality gate + exact-dedup keepers — shared by the LSH-backend
# chain below and the winnow-backend gate (prep_stage_counts_winnow)
_PREP_Q_EX_CTES = f"""
    q AS MATERIALIZED (
      SELECT * FROM documents
      WHERE len({_WORD_TOKS_SQL}) >= {_PREP_MIN_TOKENS}
        AND n_chars >= {_PREP_MIN_CHARS}
    ),
    keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM q
      GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    ),
    ex AS MATERIALIZED (SELECT q.* FROM q JOIN keepers USING (doc_id))"""


def _cc_dd_ctes(pairs_cte: str) -> str:
    """Connected components over ``pairs_cte`` (columns id_a, id_b) →
    min-id keeper survivors (`dd`) — the backend-independent survivor
    policy, split from the decontamination tail (r12) so a gate can
    interpose a stage between them."""
    return f"""
    edges AS (
      SELECT id_a AS a, id_b AS b FROM {pairs_cte}
      UNION SELECT id_b, id_a FROM {pairs_cte}
    ),
    reach AS (
      SELECT a AS node, a AS comp FROM edges
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON r.node = e.a
    ),
    cc AS MATERIALIZED (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
    dd AS MATERIALIZED (
      SELECT ex.* FROM ex
      WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> comp)
    )"""


def _decontam_ctes(src: str) -> str:
    """Decontamination (`cl`) of the ``src`` CTE's docs against the
    doc_id % 37 stand-in benchmark — n-grams recomputed from ``src``'s
    (possibly rewritten) text, the run_prep stage order's contract."""
    return f"""
    evt AS (
      SELECT {_WORD_TOKS_SQL} AS tokens
      FROM documents WHERE doc_id % 37 = 0
    ),
    evg AS MATERIALIZED (
      SELECT DISTINCT
             md5(array_to_string(tokens[i + 1 : i + {_CONTAM_N}], ' ')) AS g
      FROM (SELECT tokens,
                   unnest(generate_series(0, len(tokens) - {_CONTAM_N})) AS i
            FROM evt WHERE len(tokens) >= {_CONTAM_N})
    ),
    contam AS MATERIALIZED (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id,
               md5(array_to_string(tokens[i + 1 : i + {_CONTAM_N}], ' ')) AS g
        FROM (SELECT doc_id, tokens,
                     unnest(generate_series(0, len(tokens) - {_CONTAM_N}))
                       AS i
              FROM (SELECT doc_id, {_WORD_TOKS_SQL} AS tokens
                    FROM {src})
              WHERE len(tokens) >= {_CONTAM_N})
      ) JOIN evg USING (g)
    ),
    cl AS MATERIALIZED (
      SELECT * FROM {src}
      WHERE doc_id NOT IN (SELECT doc_id FROM contam)
    )"""


def _cc_decontam_ctes(pairs_cte: str) -> str:
    """CC survivors (`dd`) → decontamination (`cl`) — the original
    composed tail, unchanged output (pure refactor split)."""
    return _cc_dd_ctes(pairs_cte) + ",\n" + _decontam_ctes("dd")


_PREP_CTES_THROUGH_JAC = f"""
    {_PREP_Q_EX_CTES},
    wt AS MATERIALIZED (
      SELECT doc_id,
             list_filter(
               string_split(
                 regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
               t -> t <> '') AS w
      FROM ex
    ),
    sh AS MATERIALIZED (
      SELECT doc_id,
             CASE
               WHEN len(w) >= 3 THEN list_distinct(
                 [array_to_string(w[i:i+2], ' ')
                  for i in range(1, len(w) - 1)])
               WHEN len(w) > 0 THEN [array_to_string(w, ' ')]
               ELSE []
             END AS s
      FROM wt
    ),
    jac AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE
            / greatest(len(list_distinct(list_concat(a.s, b.s))), 1)
            >= {_PREP_JT}
    )"""

_PREP_CTES_THROUGH_CL = (
    _PREP_CTES_THROUGH_JAC + ",\n    " + _cc_decontam_ctes("jac")
)

_PREP_STAGES_ORACLE = f"""
    WITH RECURSIVE
    {_PREP_CTES_THROUGH_CL},
    counts AS (SELECT lang, count(*) AS n_total FROM cl GROUP BY lang),
    rates AS (
      SELECT lang,
             pow((SELECT min(n_total) FROM counts)::DOUBLE / n_total, 0.7)
               AS rate
      FROM counts
    ),
    reb AS MATERIALIZED (
      SELECT cl.* FROM cl JOIN rates r USING (lang)
      WHERE substr(md5(cl.doc_id::VARCHAR || ':' || cl.lang), 1, 4)
            < CASE WHEN floor(r.rate * 65536) >= 65536 THEN 'g'
                   ELSE lower(lpad(hex(CAST(floor(r.rate * 65536)
                                            AS BIGINT)), 4, '0'))
              END
    ),
    chk AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN hh < 'cd' THEN 'train'
                  WHEN hh < 'e6' THEN 'val'
                  ELSE 'test' END AS split,
             source,
             st // {_CHUNK_S} AS chunk_id,
             least({_CHUNK_W}, len(tokens) - st) AS n_chunk_tokens
      FROM (SELECT doc_id, source,
                   substr(md5(doc_id::VARCHAR), 1, 2) AS hh,
                   tokens,
                   unnest(generate_series(0, len(tokens) - 1, {_CHUNK_S}))
                     AS st
            FROM (SELECT doc_id, source, {_WORD_TOKS_SQL} AS tokens
                  FROM reb)
            WHERE len(tokens) >= 1)
    ),
    cum AS MATERIALIZED (
      SELECT split, source, n_chunk_tokens,
             sum(n_chunk_tokens) OVER (
               PARTITION BY split, source ORDER BY doc_id, chunk_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM chk
    ),
    bins AS MATERIALIZED (
      SELECT DISTINCT split, source,
             CAST(floor((cum - n_chunk_tokens) / {_PACK_BUDGET}.0)
                  AS BIGINT) AS bin
      FROM cum
    )
    SELECT * FROM (
      SELECT 1 AS stage_idx, 'quality_gate' AS stage,
             (SELECT count(*) FROM documents) AS rows_in,
             (SELECT count(*) FROM q) AS rows_out,
             (SELECT count(*) FROM documents) - (SELECT count(*) FROM q)
               AS dropped
      UNION ALL SELECT 2, 'exact_dedup',
             (SELECT count(*) FROM q), (SELECT count(*) FROM ex),
             (SELECT count(*) FROM q) - (SELECT count(*) FROM ex)
      UNION ALL SELECT 3, 'near_dedup',
             (SELECT count(*) FROM ex), (SELECT count(*) FROM dd),
             (SELECT count(*) FROM ex) - (SELECT count(*) FROM dd)
      UNION ALL SELECT 4, 'decontaminate',
             (SELECT count(*) FROM dd), (SELECT count(*) FROM cl),
             (SELECT count(*) FROM dd) - (SELECT count(*) FROM cl)
      UNION ALL SELECT 5, 'rebalance',
             (SELECT count(*) FROM cl), (SELECT count(*) FROM reb),
             (SELECT count(*) FROM cl) - (SELECT count(*) FROM reb)
      UNION ALL SELECT 6, 'chunk',
             (SELECT count(*) FROM reb), (SELECT count(*) FROM chk),
             CAST(NULL AS BIGINT)
      UNION ALL SELECT 7, 'pack',
             (SELECT count(*) FROM chk), (SELECT count(*) FROM bins),
             CAST(NULL AS BIGINT)
    ) ORDER BY stage_idx
    """


@_register(
    "prep_stage_counts",
    _PREP_STAGES_ORACLE,
    doc="The composed training-data prep pipeline under the driver "
    "gate (VERDICT r7 #2 — closes the gap between 'every operator is "
    "gated' and 'the composed pipeline is gated'): prep.py's actual "
    "stage functions (quality_gate → exact_stage → near_dup_stage → "
    "decontaminate → rebalance_languages → assign_splits → chunk_docs "
    "→ pack_chunks) run in sequence and the per-stage (rows_in, "
    "rows_out, dropped) audit — the manifest a real prep run reports "
    "— is value-hashed against one DuckDB statement recomputing all "
    "eight stages from first principles (recursive-CTE connected "
    "components for the near-dup stage, same as dedup_clusters). "
    "Each stage boundary is persist()ed so the expensive LSH→verify→"
    "CC subgraph executes once while feeding both its own count and "
    "every later stage (the prefix_filter_jaccard subplan-reuse "
    "lesson); per-stage counts are single-long driver scalars, the "
    "adjudicated collect shape. Scale: inherits each operator's "
    "documented posture — bucketed LSH (never all-pairs), broadcast "
    "eval grams, broadcast 5-row rate table, per-(split,source) "
    "packing windows; the oracle's quadratic shingle self-join is "
    "ground truth only. Wall-clock at sf0.1: ~9 s warm; a first run "
    "in a fresh session pays the dedup family's exact-plan codegen "
    "on top (29 s bare-cold, ~16 s after bench.py's warm-ups) — "
    "gate cost, amortized the moment any other dedup-family query "
    "has run.",
    parts=8,
)
def q_prep_stage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark import prep  # noqa: PLC0415

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    eval_set = docs.filter(F.col("doc_id") % 37 == 0)

    # try/finally: bench/driver runs catch per-query exceptions and
    # keep the session — a mid-pipeline failure must not leave up to
    # six frames pinned in executor storage for the rest of the run
    persisted: list = []

    def _stage(frame):
        persisted.append(frame.persist())
        return persisted[-1]

    try:
        n_input = docs.count()
        gated = _stage(prep.quality_gate(docs))
        n_gate = gated.count()
        exact = _stage(prep.exact_stage(gated))
        n_exact = exact.count()
        deduped = _stage(prep.near_dup_stage(exact))
        n_dedup = deduped.count()
        clean = _stage(prep.decontaminate(deduped, eval_set))
        n_clean = clean.count()
        reb = _stage(prep.rebalance_languages(clean))
        n_reb = reb.count()
        chunks = _stage(prep.chunk_docs(prep.assign_splits(reb)))
        n_chunks = chunks.count()
        n_bins = prep.pack_chunks(chunks).count()
    finally:
        for frame in persisted:
            frame.unpersist()

    stages = [
        (1, "quality_gate", n_input, n_gate),
        (2, "exact_dedup", n_gate, n_exact),
        (3, "near_dedup", n_exact, n_dedup),
        (4, "decontaminate", n_dedup, n_clean),
        (5, "rebalance", n_clean, n_reb),
        (6, "chunk", n_reb, n_chunks),
        (7, "pack", n_chunks, n_bins),
    ]
    rows = [
        (i, s, a, b, (a - b) if i <= 5 else None)
        for i, s, a, b in stages
    ]
    return spark.createDataFrame(
        rows,
        schema="stage_idx int, stage string, rows_in bigint, "
        "rows_out bigint, dropped bigint",
    ).orderBy("stage_idx")


# ---------------------------------------------------------------------------
# Parameterized serving — oracle-gated bindings of queries/serve.py
# templates (VERDICT r7 #3). Two bindings of top_flop_for_symbol prove
# the template serves any symbol; the windowed drill-down proves
# multi-parameter binding (symbol + event_type + date range).
# ---------------------------------------------------------------------------


def _symbol_drill_oracle(uid: int) -> str:
    return f"""
    WITH daily AS (
      SELECT user_id,
             date_trunc('day', ts) AS day,
             {sql_dround("sum(value)", 2)} AS daily_value
      FROM events
      WHERE user_id = {uid}
      GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT user_id, day, daily_value,
           daily_value - lag(daily_value) OVER (
             PARTITION BY user_id ORDER BY day) AS delta
    FROM daily
    ORDER BY day
    """


_SERVE_DOC = (
    "Parameterized serving (SURVEY §3.3: the Lens panels' "
    "'symbol = :s' drill-down; reference "
    "kibana/kibana_saved_objects.ndjson:6-9): the {binding} binding "
    "of the serve.bound('top_flop_for_symbol') template — one "
    "symbol's daily value + day-over-day delta series via Spark "
    "named-parameter SQL. The binding lands as a typed literal in "
    "the parsed plan, so the predicate pushes to the parquet scan "
    "(PushedFilters plan pin in tests/test_serve.py) — at 100 TB "
    "the panel reads one symbol's row groups, not the corpus. Same "
    "daily kernel as the oracle-green top_flop/daily_lag_returns "
    "family (dround(2) sums; delta is exact IEEE on bit-identical "
    "inputs)."
)


@_register(
    "top_flop_for_symbol",
    _symbol_drill_oracle(7),
    doc=_SERVE_DOC.format(binding="uid=7"),
    parts=8,
)
def q_top_flop_for_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.queries.serve import bound  # noqa: PLC0415

    return bound(spark, sf_dir, "top_flop_for_symbol", uid=7)


@_register(
    "top_flop_for_symbol_b",
    _symbol_drill_oracle(11),
    doc=_SERVE_DOC.format(binding="uid=11 (second binding — proves "
                          "the template, not a lucky literal)"),
    parts=8,
)
def q_top_flop_for_symbol_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.queries.serve import bound  # noqa: PLC0415

    return bound(spark, sf_dir, "top_flop_for_symbol", uid=11)


@_register(
    "type_window_daily_drill",
    f"""
    SELECT date_trunc('day', ts) AS day,
           count(*) AS n_events,
           {sql_dround("sum(value)", 2)} AS total_value
    FROM events
    WHERE user_id = 3
      AND event_type = 'purchase'
      AND ts >= TIMESTAMP '2024-01-05'
      AND ts < TIMESTAMP '2024-02-01'
    GROUP BY date_trunc('day', ts)
    ORDER BY day
    """,
    doc="Parameterized serving, multi-parameter binding: the "
    "serve.bound('type_window_daily') template bound at (uid=3, "
    "event_type='purchase', 2024-01-05 ≤ ts < 2024-02-01) — the "
    "panel-filter combination (symbol + event type + time range) "
    "the reference dashboards expose. All four bindings land as "
    "literals in the scan's PushedFilters; the per-day rollup uses "
    "the pack's dround(2) convention.",
    parts=8,
)
def q_type_window_daily_drill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yahoofinancedatalake_spark.queries.serve import bound  # noqa: PLC0415

    return bound(
        spark,
        sf_dir,
        "type_window_daily",
        uid=3,
        etype="purchase",
        start_day="2024-01-05",
        end_day="2024-02-01",
    )


# ---------------------------------------------------------------------------
# Round-9 additions (registration order: new queries go at the END).
# ---------------------------------------------------------------------------


@_register(
    "source_quality_drill",
    f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           {sql_dround("avg(n_chars)", 2)} AS avg_chars
    FROM documents
    WHERE source = 'src3' AND n_chars >= 150
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Parameterized serving, documents-table binding (VERDICT r8 "
    "#3 — the third serve template under the driver gate): the "
    "serve.bound('source_quality_drill') template bound at "
    "(src='src3', min_chars=150) — per-language doc count / total / "
    "average length of one ingestion source above a length floor, "
    "the news-source quality panel (reference analog: the source "
    "panels in kibana/export (1).ndjson:4). Both bindings land as "
    "typed literals in the documents parquet scan's PushedFilters "
    "(plan-pinned in tests/test_serve.py::"
    "test_documents_template_binds_and_pushes) — at 100 TB the panel "
    "reads one source's row groups, not the corpus. Proves the "
    "serving surface is not events-specific.",
    parts=8,
)
def q_source_quality_drill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.queries.serve import bound  # noqa: PLC0415

    return bound(
        spark, sf_dir, "source_quality_drill", src="src3", min_chars=150
    )


_INC_PREP_ORACLE = f"""
    WITH RECURSIVE
    {_PREP_CTES_THROUGH_CL}
    SELECT * FROM (
      SELECT 1 AS stage_idx, 'input' AS stage,
             (SELECT count(*) FROM documents) AS n_docs
      UNION ALL SELECT 2, 'quality_pass', (SELECT count(*) FROM q)
      UNION ALL SELECT 3, 'after_dedup', (SELECT count(*) FROM dd)
      UNION ALL SELECT 4, 'after_decontam', (SELECT count(*) FROM cl)
    ) ORDER BY stage_idx
    """


@_register(
    "incremental_prep_counts",
    _INC_PREP_ORACLE,
    doc="The composed INCREMENTAL prep path under the driver gate "
    "(VERDICT r8 #4 — prep_stage_counts gates the batch composition; "
    "this gates the seed-then-increment one): documents split "
    "id-ordered 80/20 (threshold = the exact 80th-percentile doc_id; "
    "new docs get new ids, so an increment's ids follow history's — "
    "the shape whose min-id keeper provably matches the full run's), "
    "prep.seed_prep_state runs quality→exact→LSH near-dup→land+seal "
    "state on the seed, prep.run_prep_incremental processes the "
    "increment against that landed state (history participates ONLY "
    "through fingerprints + band index + survivor texts — never a "
    "corpus re-scan), and the emitted audit rows are the seed+batch "
    "SUMS per stage. Oracle: one DuckDB statement recomputing the "
    "FULL pipeline over the whole corpus from first principles — the "
    "hash matches iff the incremental path has ZERO drift vs a full "
    "recompute through decontamination (the two documented drift "
    "modes — a batch doc bridging two history clusters, and a batch "
    "doc near a dropped non-keeper but not its keeper — would both "
    "break the hash; verified absent on this corpus at sf0.01 and "
    "sf0.1 by direct simulation). Eval set is fixed over the FULL "
    "corpus (doc_id % 37 = 0) for both runs, as a real benchmark "
    "list would be. Scale: seed cost is the batch pipeline's; the "
    "increment is O(batch) hash + indexed bucket join "
    "(incremental_minhash_pairs) — the 100 TB daily-ingest shape. "
    "Gate cost, not per-query cost: state lands under a tempdir and "
    "is removed after.",
    parts=8,
)
def q_incremental_prep_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from yahoofinancedatalake_spark import prep  # noqa: PLC0415

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    n_input = docs.count()
    # exact 80th-percentile id: one driver scalar off a global sort of
    # the id column (id-ordered split — see docstring)
    threshold = (
        docs.select("doc_id")
        .orderBy("doc_id")
        .offset(int(n_input * 0.8))
        .limit(1)
        .collect()[0][0]
    )
    seed = docs.filter(F.col("doc_id") < threshold)
    batch = docs.filter(F.col("doc_id") >= threshold)
    eval_set = docs.filter(F.col("doc_id") % 37 == 0)

    root = tempfile.mkdtemp(prefix="inc_prep_")
    try:
        seed_counts = prep.seed_prep_state(spark, root, seed, eval_set)
        inc_counts = prep.run_prep_incremental(spark, root, batch, eval_set)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    rows = [
        (1, "input", seed_counts["input"] + inc_counts["batch_input"]),
        (
            2,
            "quality_pass",
            seed_counts["quality_pass"] + inc_counts["quality_pass"],
        ),
        (
            3,
            "after_dedup",
            seed_counts["after_dedup"] + inc_counts["after_dedup"],
        ),
        (
            4,
            "after_decontam",
            seed_counts["after_decontam"] + inc_counts["after_decontam"],
        ),
    ]
    return spark.createDataFrame(
        rows, schema="stage_idx int, stage string, n_docs bigint"
    ).orderBy("stage_idx")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03) — the
# rolling-hash k-gram fingerprint family (MOSS). Two gates: the
# fingerprint extraction itself (exact md5 values cross-checked), and
# the inverted-index near-dup matcher built on it.
# ---------------------------------------------------------------------------

_WIN_K = 16  # k-gram length (chars, over normalized text)
_WIN_W = 8  # winnowing window (k-grams); density guarantee 2/(w+1)
_WIN_CAP = 64  # document-frequency cap for pair generation
_WIN_T = 0.5  # overlap-coefficient threshold

# Shared CTE chain: normalize -> k-gram md5 -> window-min -> distinct
# per-doc fingerprint set (`sel`) + per-doc sizes. Verbatim recompute
# of operators/dedup.py::winnow_fingerprints — md5 is the one hash
# both engines define identically, which is why it is the operator's
# hash (see the operator docstring). Parameterized on the source CTE
# so the composed prep gate can winnow the exact-dedup survivors
# (`ex`) instead of the raw corpus.
def _winnow_ctes(src: str = "documents") -> str:
    return f"""
    n AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM {src}
    ),
    g AS (
      SELECT doc_id, i, md5(substr(norm, i, {_WIN_K})) AS h
      FROM n, LATERAL (
        SELECT unnest(generate_series(
                 1, greatest(len(norm) - {_WIN_K} + 1, 1))) AS i
      )
    ),
    m AS (SELECT doc_id, max(i) AS mi FROM g GROUP BY doc_id),
    wmin AS (
      SELECT g.doc_id, g.i, m.mi,
             min(h) OVER (PARTITION BY g.doc_id ORDER BY g.i
                          ROWS BETWEEN CURRENT ROW
                          AND {_WIN_W - 1} FOLLOWING) AS fp
      FROM g JOIN m USING (doc_id)
    ),
    sel AS (
      SELECT DISTINCT doc_id, fp
      FROM wmin WHERE i <= greatest(mi - {_WIN_W} + 1, 1)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_fp FROM sel GROUP BY doc_id)
"""


_WINNOW_CTES = _winnow_ctes()


@_register(
    "winnow_fingerprints",
    f"""
    WITH {_WINNOW_CTES}
    SELECT doc_id,
           CAST(n_fp AS BIGINT) AS n_fp,
           min_fp,
           max_fp
    FROM sizes
    JOIN (SELECT doc_id, min(fp) AS min_fp, max(fp) AS max_fp
          FROM sel GROUP BY doc_id) USING (doc_id)
    ORDER BY doc_id
    """,
    doc="Training-data op: winnowed document fingerprints "
    "(Schleimer/Wilkerson/Aiken SIGMOD'03, the MOSS algorithm) — the "
    "rolling-hash k-gram member of the fingerprint family "
    "(doc_fingerprint hashes the WHOLE normalized doc; this selects "
    "a 2/(w+1)-density set of k-gram hashes such that any shared "
    "substring of length >= k+w-1 = "
    f"{_WIN_K + _WIN_W - 1} chars yields a shared fingerprint). "
    "Gate output is per-doc (count, min, max) over the fingerprint "
    "SET — the md5 VALUES themselves cross-check, not just "
    "cardinalities, so the oracle pins the exact k-gram/window-min "
    "semantics. Plan: per-row narrow HOF projection, ZERO exchanges "
    "before the final per-doc aggregate — the explode+window "
    "alternative would shuffle one row per CHARACTER of the corpus "
    "(see operators/dedup.py::winnow_fingerprints). Reference analog: "
    "none (dedups by exact id only, finnhub_news.py:185-188) — "
    "beyond-parity, the substring-level fingerprint a 100 TB "
    "crawl-dedup pipeline indexes.",
    parts=8,
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        winnow_fingerprints,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    fps = winnow_fingerprints(docs, "text", "doc_id", k=_WIN_K, w=_WIN_W)
    return (
        fps.select(
            "doc_id",
            F.size("fps").cast("bigint").alias("n_fp"),
            F.array_min("fps").alias("min_fp"),
            F.array_max("fps").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


@_register(
    "winnow_near_dup",
    f"""
    WITH {_WINNOW_CTES},
    dfreq AS (SELECT fp, count(*) AS df FROM sel GROUP BY fp),
    kept AS (
      SELECT sel.doc_id, sel.fp FROM sel
      JOIN dfreq USING (fp) WHERE df BETWEEN 2 AND {_WIN_CAP}
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, shared,
           {sql_dround(
               "CAST(shared AS DOUBLE) / least(sa.n_fp, sb.n_fp)", 4
           )} AS overlap
    FROM pairs
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(shared AS DOUBLE) / least(sa.n_fp, sb.n_fp) >= {_WIN_T}
    ORDER BY id_a, id_b
    """,
    doc="Training-data op: near-dup pairs from the winnowed inverted "
    "index (the MOSS match step) — docs sharing >= "
    f"{_WIN_T} of the smaller doc's fingerprints (overlap "
    "coefficient). UNLIKE the MinHash/SimHash members of the ladder "
    "this one is fully deterministic AND hash-oracle-gated end to "
    "end: the df-cap that bounds posting-list blowup depends only on "
    "(fp, document frequency), never on partitioning, so DuckDB "
    "recomputes the exact pair set — no rows-only fallback, no "
    "accuracy twin needed. Scale: pair-gen cost is sum(df^2) over "
    f"fingerprints with df <= {_WIN_CAP} (boilerplate fingerprints "
    "above the cap are dropped from candidates AND scores, "
    "consistently; denominators stay uncapped), index density is "
    "2/(w+1) entries per char. 258 true pairs at sf0.1 — agrees with "
    "the corpus's planted duplication the LSH family finds.",
    parts=8,
)
def q_winnow_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        winnow_near_dup_pairs,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return winnow_near_dup_pairs(
        docs,
        "text",
        "doc_id",
        k=_WIN_K,
        w=_WIN_W,
        df_cap=_WIN_CAP,
        overlap_threshold=_WIN_T,
    ).orderBy("id_a", "id_b")


@_register(
    "winnow_fast_accuracy",
    "SELECT 'winnow_fast_sandwich' AS metric, TRUE AS passed",
    doc="Winnow production-kernel accuracy as a correctness gate (the "
    "approximation-gate companion of minhash_accuracy, for the winnow "
    "family): the numpy polynomial-hash kernel "
    "(winnow_fingerprints_fast — the hot path, measured 2.3x the md5 "
    "form warm at sf0.1) must give the SAME near-dup answer as the "
    "oracle-portable md5 family, pinned by a sandwich: every md5 pair "
    "at overlap >= 0.65 must be found by the fast matcher at 0.5 "
    "(recall side), and every fast pair at 0.5 must exist as an md5 "
    "pair at >= 0.35 (precision side). The +/-0.15 margin absorbs "
    "hash-family selection variance (different hashes select "
    "different window minima, so overlap is an estimator, not a "
    "constant); docs under 150 chars are floored out FIRST — a "
    "~60-char doc has ~10 fingerprints, so ONE fingerprint moves "
    "overlap by 0.1 and no margin is family-stable (measured: the "
    "only sandwich violations at any SF were two pairs involving one "
    "62-char doc — exactly the min-data guard the forecast family "
    "already applies). A broken kernel (bad powers, wrong window) "
    "collapses recall toward 0 and fails the driver's hash check. "
    "Scale: both matchers are the bucketed winnow join; the sandwich "
    "check itself is two anti-joins on (id_a, id_b).",
    parts=8,
)
def q_winnow_fast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        normalized_text,
        winnow_fingerprints,
        winnow_fingerprints_fast,
        winnow_near_dup_pairs,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("n_chars") >= 150
    )
    # BOTH hash families extract from the same normalized text (r13,
    # VERDICT item 4): compute the scan + normalization regex ONCE,
    # checkpoint, and feed the two kernels with pre_normalized=True —
    # previously each matcher re-read the corpus and re-ran the
    # identical projection. normalized_text is idempotent, so the
    # fingerprints are bit-identical to the un-shared form.
    norm = docs.select(
        "doc_id", normalized_text(F.col("text")).alias("text")
    ).localCheckpoint()
    fast = winnow_near_dup_pairs(
        norm,
        "text",
        "doc_id",
        df_cap=_WIN_CAP,
        overlap_threshold=_WIN_T,
        fingerprints=winnow_fingerprints_fast(
            norm, "text", "doc_id", k=_WIN_K, w=_WIN_W,
            pre_normalized=True,
        ),
    ).select("id_a", "id_b").persist()
    # ONE md5 matcher run at the relaxed floor; the high-margin truth
    # set is a filter over its overlap column (matcher output is
    # monotone in threshold, so this equals a second run at 0.65)
    md5_relaxed = winnow_near_dup_pairs(
        norm, "text", "doc_id",
        df_cap=_WIN_CAP, overlap_threshold=0.35,
        fingerprints=winnow_fingerprints(
            norm, "text", "doc_id", k=_WIN_K, w=_WIN_W,
            pre_normalized=True,
        ),
    ).persist()
    truth = md5_relaxed.filter(F.col("overlap") >= 0.65).select(
        "id_a", "id_b"
    )
    relaxed = md5_relaxed.select("id_a", "id_b")
    missed = truth.join(fast, ["id_a", "id_b"], "left_anti").count()
    spurious = fast.join(
        relaxed, ["id_a", "id_b"], "left_anti"
    ).count()
    n_truth = truth.count()
    spark.catalog.clearCache()  # release the three matchers' persists
    return spark.createDataFrame(
        [(
            "winnow_fast_sandwich",
            bool(n_truth >= 1 and missed == 0 and spurious == 0),
        )],
        schema="metric string, passed boolean",
    )


# ---------------------------------------------------------------------------
# Streaming rung 12: incremental prep as a STREAM — micro-batches
# delivered by Structured Streaming's file source drive the same
# seed-then-increment machinery the batch gate verifies, under the
# same full-recompute oracle.
# ---------------------------------------------------------------------------

# The oracle is the incremental gate's full-recompute statement with
# `documents` swapped for the deterministic quarter-corpus subset the
# streaming rung runs on (see the query docstring for why a subset).
_STREAM_INC_ORACLE = (
    "WITH RECURSIVE documents4 AS "
    "(SELECT * FROM documents WHERE doc_id % 4 = 0),\n"
    + _PREP_CTES_THROUGH_CL.replace("FROM documents", "FROM documents4")
    + """
    SELECT * FROM (
      SELECT 1 AS stage_idx, 'input' AS stage,
             (SELECT count(*) FROM documents4) AS n_docs
      UNION ALL SELECT 2, 'quality_pass', (SELECT count(*) FROM q)
      UNION ALL SELECT 3, 'after_dedup', (SELECT count(*) FROM dd)
      UNION ALL SELECT 4, 'after_decontam', (SELECT count(*) FROM cl)
    ) ORDER BY stage_idx
    """
)


@_register(
    "stream_incremental_prep_batch_eq",
    _STREAM_INC_ORACLE,
    doc="Streaming rung 12 — incremental prep as a STREAM: the "
    "seed-then-increment pipeline (prep.seed_prep_state + "
    "run_prep_incremental, the machinery incremental_prep_counts "
    "gates in batch mode) driven by Structured Streaming. Two "
    "id-ordered increments land as parquet files; each is processed "
    "by a SEPARATE availableNow run of a file-source stream sharing "
    "one checkpoint, with foreachBatch calling run_prep_incremental "
    "against the landed+sealed state — so batch order is guaranteed "
    "by construction (run 2 starts after run 1 finishes and its "
    "checkpoint excludes already-processed files), not by file-mtime "
    "luck, and the checkpoint handoff IS the exactly-once claim "
    "under test: a dropped, duplicated, or reordered micro-batch "
    "shifts the summed per-stage counts and breaks the hash against "
    "the full-recompute DuckDB oracle. Runs on the deterministic "
    "quarter corpus (doc_id % 4 = 0): the full-scale numeric "
    "equivalence of the incremental path is already gated by "
    "incremental_prep_counts — this rung gates the STREAMING "
    "DELIVERY semantics, and re-scanning the full corpus here would "
    "duplicate a ~30 s gate for no new claim. Survivor-SET equality "
    "(not just counts) of the 3-way split vs full recompute was "
    "verified by direct simulation at sf0.01 (110/110) and sf0.1 "
    "(1109/1109) before registering, per the incremental-gate "
    "protocol. Gate cost, not per-query cost: state + stream "
    "checkpoint live under a tempdir and are removed after.",
    parts=8,
)
def q_stream_incremental_prep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from yahoofinancedatalake_spark import prep  # noqa: PLC0415
    from yahoofinancedatalake_spark.queries._registry import (  # noqa: PLC0415
        _await_stream,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % 4 == 0
    )
    n = docs.count()
    ids = docs.select("doc_id").orderBy("doc_id")
    p60 = ids.offset(int(n * 0.6)).limit(1).collect()[0][0]
    p80 = ids.offset(int(n * 0.8)).limit(1).collect()[0][0]
    seed = docs.filter(F.col("doc_id") < p60)
    incs = [
        docs.filter((F.col("doc_id") >= p60) & (F.col("doc_id") < p80)),
        docs.filter(F.col("doc_id") >= p80),
    ]
    eval_set = docs.filter(F.col("doc_id") % 37 == 0)

    root = tempfile.mkdtemp(prefix="stream_inc_prep_")
    indir = f"{root}/incoming"
    ckpt = f"{root}/ckpt"
    os.makedirs(indir)
    batch_counts: list[dict] = []

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_counts.append(
            prep.run_prep_incremental(spark, root, batch_df, eval_set)
        )

    try:
        seed_counts = prep.seed_prep_state(spark, root, seed, eval_set)
        for inc in incs:
            # land this increment as ONE file, then drain it in ONE
            # availableNow run; the shared checkpoint makes the next
            # run see only files landed after this point. coalesce(1)
            # guarantees the run cannot split an increment into
            # multiple micro-batches (within-increment sub-batch
            # order would reintroduce the keeper-order dependence the
            # two-run construction exists to eliminate)
            inc.coalesce(1).write.mode("append").parquet(indir)
            q = (
                spark.readStream.schema(docs.schema)
                .parquet(indir)
                .writeStream.foreachBatch(_process)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            _await_stream(q)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    def _sum(key: str, seed_key: str) -> int:
        return seed_counts[seed_key] + sum(c[key] for c in batch_counts)

    rows = [
        (1, "input", _sum("batch_input", "input")),
        (2, "quality_pass", _sum("quality_pass", "quality_pass")),
        (3, "after_dedup", _sum("after_dedup", "after_dedup")),
        (4, "after_decontam", _sum("after_decontam", "after_decontam")),
    ]
    return spark.createDataFrame(
        rows, schema="stage_idx int, stage string, n_docs bigint"
    ).orderBy("stage_idx")


# ---------------------------------------------------------------------------
# r10: the composed prep pipeline with the WINNOW near-dup backend
# (VERDICT r9 #4). Unlike the LSH chain, every stage of this mode is
# deterministic end to end — the winnow matcher's df-cap depends only
# on (fingerprint, document frequency) — so the oracle recomputes the
# full composition from first principles with NO candidate-rewrite
# machinery (the parity sweep needs no engine-landed pre-filter here,
# where the LSH gate's quadratic-Jaccard oracle does at sf0.1).
# ---------------------------------------------------------------------------


@_register(
    "prep_stage_counts_winnow",
    f"""
    WITH RECURSIVE
    {_PREP_Q_EX_CTES},
    {_winnow_ctes("ex")},
    dfreq AS (SELECT fp, count(*) AS df FROM sel GROUP BY fp),
    kept AS (
      SELECT sel.doc_id, sel.fp FROM sel
      JOIN dfreq USING (fp) WHERE df BETWEEN 2 AND {_WIN_CAP}
    ),
    wp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    wnd AS (
      SELECT id_a, id_b FROM wp
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(shared AS DOUBLE) / least(sa.n_fp, sb.n_fp)
            >= {_WIN_T}
    ),
    {_cc_decontam_ctes("wnd")}
    SELECT * FROM (
      SELECT 1 AS stage_idx, 'quality_gate' AS stage,
             (SELECT count(*) FROM documents) AS rows_in,
             (SELECT count(*) FROM q) AS rows_out,
             (SELECT count(*) FROM documents) - (SELECT count(*) FROM q)
               AS dropped
      UNION ALL SELECT 2, 'exact_dedup',
             (SELECT count(*) FROM q), (SELECT count(*) FROM ex),
             (SELECT count(*) FROM q) - (SELECT count(*) FROM ex)
      UNION ALL SELECT 3, 'near_dedup_winnow',
             (SELECT count(*) FROM ex), (SELECT count(*) FROM dd),
             (SELECT count(*) FROM ex) - (SELECT count(*) FROM dd)
      UNION ALL SELECT 4, 'decontaminate',
             (SELECT count(*) FROM dd), (SELECT count(*) FROM cl),
             (SELECT count(*) FROM dd) - (SELECT count(*) FROM cl)
    ) ORDER BY stage_idx
    """,
    doc="The composed prep pipeline with near_dup_backend='winnow' "
    "(VERDICT r9 #4): prep.py's quality_gate → exact_stage → "
    "near_dup_stage(backend='winnow') → decontaminate run in "
    "sequence and the per-stage audit is value-hashed against one "
    "DuckDB statement recomputing the same four stages — including "
    "the winnowed inverted-index matcher (k-gram md5 → window-min → "
    "df-capped posting lists → overlap-coefficient pairs) and the "
    "recursive-CTE connected components. This is the prep stack's "
    "exactly-replayable mode: every stage is deterministic (the "
    "df-cap depends only on fingerprint document frequency, never "
    "partitioning), so the oracle is a pure full recompute with no "
    "candidate-rewrite machinery, unlike the LSH gate at sweep "
    "scale. Stages 5-7 (rebalance/chunk/pack) are backend-"
    "independent code already composed under prep_stage_counts — "
    "re-running them here would double ~5s of gate cost to re-gate "
    "unchanged composition. Survivor policy (connected components → "
    "min-id keeper) is shared with the LSH backend; "
    "tests/test_prep.py pins backend equivalence on planted "
    "near-dups. Scale: inherits winnow_near_dup's posture — "
    "bucketed inverted index, sum(df²) pair cost, SHUFFLE_HASH "
    "joins; the matcher's internal fingerprint persist is released "
    "in the query's finally.",
    parts=8,
)
def q_prep_stage_counts_winnow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yahoofinancedatalake_spark import prep  # noqa: PLC0415

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    eval_set = docs.filter(F.col("doc_id") % 37 == 0)

    persisted: list = []

    def _stage(frame):
        persisted.append(frame.persist())
        return persisted[-1]

    try:
        n_input = docs.count()
        gated = _stage(prep.quality_gate(docs))
        n_gate = gated.count()
        exact = _stage(prep.exact_stage(gated))
        n_exact = exact.count()
        deduped = _stage(prep.near_dup_stage(exact, backend="winnow"))
        n_dedup = deduped.count()
        n_clean = prep.decontaminate(deduped, eval_set).count()
    finally:
        for frame in persisted:
            frame.unpersist()
        # the winnow matcher persists its fingerprint table
        # internally (cache=True, caller-owned release)
        spark.catalog.clearCache()

    stages = [
        (1, "quality_gate", n_input, n_gate),
        (2, "exact_dedup", n_gate, n_exact),
        (3, "near_dedup_winnow", n_exact, n_dedup),
        (4, "decontaminate", n_dedup, n_clean),
    ]
    rows = [(i, s, a, b, a - b) for i, s, a, b in stages]
    return spark.createDataFrame(
        rows,
        schema="stage_idx int, stage string, rows_in bigint, "
        "rows_out bigint, dropped bigint",
    ).orderBy("stage_idx")


# ---------------------------------------------------------------------------
# r10: the training-data SELECTION tier — which docs to train on, not
# just which are copies. Operators live in operators/selection.py;
# both are production-shaped (operator tier, not gates).
# ---------------------------------------------------------------------------


@_register(
    "dsir_select",
    f"""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, is_t, unnest(t) AS g FROM toks
      UNION ALL
      SELECT doc_id, is_t,
             unnest(list_transform(
               generate_series(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1])) AS g
      FROM toks WHERE len(t) >= 2
    ), b AS (
      SELECT doc_id, is_t, substr(md5(g), 1, 3) AS bucket FROM grams
    ), counts AS (
      SELECT bucket, count(*) AS rc,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc
      FROM b GROUP BY bucket
    ), tot AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM counts
    ), llr AS (
      SELECT bucket,
             {sql_dround(
                 "ln((tc + 0.5) / (tt + 2048.0))"
                 " - ln((rc + 0.5) / (rt + 2048.0))", 6)} AS llr
      FROM counts CROSS JOIN tot
    ), w AS (
      SELECT doc_id, count(*) AS n_grams,
             {sql_dround("sum(llr)", 6)} AS logw
      FROM b JOIN llr USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, n_grams, logw,
           {sql_dround(
               "logw - ln(-ln((('0x' || substr(md5(doc_id::VARCHAR),"
               " 1, 8))::BIGINT + 0.5) / 4294967296.0))", 6)} AS gkey
    FROM w
    ORDER BY gkey DESC, doc_id
    LIMIT 100
    """,
    doc="Training-data op: DSIR importance resampling (Xie et al., "
    "NeurIPS 2023) — select the 100 raw docs that look most like "
    "the target corpus (here: the 'en' slice), probabilistically. "
    "Uni+bigram features md5-hash into 4096 buckets (the paper's "
    "hashed-n-gram model at 10k buckets, same order), a smoothed "
    "target-vs-raw bucket model scores each doc with logw = sum "
    "c_b * (ln p_target(b) - ln p_raw(b)), and Gumbel top-k draws "
    "k=100 WITHOUT replacement with probability proportional to the "
    "weights — the Gumbel noise is hash-seeded from doc_id (same "
    "reproducibility contract as the md5 split/sample gates), so "
    "the sampled SET is identical across engines, retries, and "
    "partitionings. Per-bucket llr is dround(6)-pinned once in the "
    "4096-row model table. Scale: ONE corpus-sized count shuffle "
    "builds both distributions (target count is a conditional sum "
    "in the same agg), the model broadcasts back onto the gram "
    "rows, and the top-k plans as TakeOrderedAndProject — per-"
    "partition reduce, never a global sort. Beyond-reference "
    "surface: the reference pipeline has no data-selection tier.",
    parts=8,
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        dsir_logweights,
        dsir_resample,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("toks"),
    )
    w = dsir_logweights(base, "toks", "doc_id", "is_t")
    return dsir_resample(w, "doc_id", 100).orderBy(
        F.desc("gkey"), "doc_id"
    )


@_register(
    "kneser_ney_quality",
    f"""
    WITH toks AS (
      SELECT doc_id, {_WORD_TOKS_SQL} AS t FROM documents
    ), base AS (
      SELECT doc_id, t FROM toks WHERE len(t) >= 2
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(t) - 1), i -> t[i])) AS w1,
             unnest(list_transform(
               generate_series(1, len(t) - 1), i -> t[i + 1])) AS w2
      FROM base
    ), bc AS (
      SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2
    ), ctx AS (
      SELECT w1, sum(c) AS cv, count(*) AS n1v FROM bc GROUP BY 1
    ), cont AS (
      SELECT w2, count(*) AS n1w FROM bc GROUP BY 1
    ), dt AS (SELECT count(*) AS dtot FROM bc
    ), model AS (
      SELECT bc.w1, bc.w2,
             {sql_dround(
                 "ln((greatest(c - 0.75, 0)"
                 " + 0.75 * n1v * (n1w / CAST(dtot AS DOUBLE))) / cv)",
                 6)} AS lp
      FROM bc JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN dt
    ), scored AS (
      SELECT bg.doc_id, model.lp FROM bg JOIN model USING (w1, w2)
    )
    SELECT doc_id, count(*) AS n_bigrams,
           {sql_dround("sum(lp)", 6)} / count(*) AS mean_logprob,
           {sql_dround(
               "exp(-(" + sql_dround("sum(lp)", 6)
               + " / count(*)))", 4)} AS ppl
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Training-data op: Kneser-Ney perplexity filtering — the "
    "CCNet recipe (Wenzek et al. 2020) with the pretrained KenLM "
    "replaced by a bigram LM trained ON the corpus with "
    "interpolated Kneser-Ney smoothing (Kneser & Ney 1995; Chen & "
    "Goodman 1998), the smoothing family KenLM actually implements "
    "— one rung above bigram_logprob_quality's add-one: P(w|v) = "
    "(max(c(v,w)-D,0) + D*N1+(v,.)*Pcont(w))/c(v,.), Pcont from "
    "how many distinct contexts a word follows (the 'Francisco' "
    "insight). Emits per-doc mean ln P and perplexity exp(-mean) — "
    "cull the high-ppl tail. Per-bigram lp is dround(6)-pinned once "
    "in the model table. Scale: the model build (4 statistics, all "
    "from one bigram count table) is vocabulary-bounded; the corpus "
    "joins the bigram-type-keyed model exactly once, and the only "
    "corpus-sized exchanges are the bigram count agg and that join. "
    "Property tests pin sum_w P(w|v) = 1 per context and agreement "
    "with a pure-Python KN reference.",
    parts=8,
)
def q_kneser_ney_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        kneser_ney_scores,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select("doc_id", _word_toks().alias("toks"))
    return kneser_ney_scores(base, "toks", "doc_id").orderBy("doc_id")


_GRAMS_SQL = """
      SELECT doc_id, is_t, unnest(t) AS g FROM {src}
      UNION ALL
      SELECT doc_id, is_t,
             unnest(list_transform(
               generate_series(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1])) AS g
      FROM {src} WHERE len(t) >= 2"""


@_register(
    "stream_dsir_score_batch_eq",
    f"""
    WITH d AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), n AS (SELECT count(*) AS n FROM d
    ), thr AS (
      SELECT doc_id AS p60 FROM d ORDER BY doc_id
      OFFSET (SELECT CAST(floor(n * 0.6) AS BIGINT) FROM n) LIMIT 1
    ), seed AS (
      SELECT * FROM d WHERE doc_id < (SELECT p60 FROM thr)
    ), inc AS (
      SELECT * FROM d WHERE doc_id >= (SELECT p60 FROM thr)
    ), sg AS ({_GRAMS_SQL.format(src="seed")}
    ), counts AS (
      SELECT substr(md5(g), 1, 3) AS bucket, count(*) AS rc,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc
      FROM sg GROUP BY 1
    ), tot AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM counts
    ), llr AS (
      SELECT bucket,
             {sql_dround(
                 "ln((tc + 0.5) / (tt + 2048.0))"
                 " - ln((rc + 0.5) / (rt + 2048.0))", 6)} AS llr
      FROM counts CROSS JOIN tot
    ), dflt AS (
      SELECT {sql_dround(
          "ln(0.5 / (tt + 2048.0)) - ln(0.5 / (rt + 2048.0))", 6)}
          AS dflt
      FROM tot
    ), ig AS ({_GRAMS_SQL.format(src="inc")}
    ), ib AS (
      SELECT doc_id, substr(md5(g), 1, 3) AS bucket FROM ig
    )
    SELECT doc_id, count(*) AS n_grams,
           {sql_dround(
               "sum(coalesce(llr, (SELECT dflt FROM dflt)))", 6)}
           AS logw
    FROM ib LEFT JOIN llr USING (bucket)
    GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Streaming rung 13 — ONLINE data selection: the DSIR bucket "
    "model trains once on the seed corpus (first 60% by doc_id; "
    "target = the 'en' slice) and is FROZEN, then two id-ordered "
    "increments land as parquet files drained by separate "
    "availableNow runs sharing one checkpoint, with foreachBatch "
    "scoring each arriving doc against the frozen broadcast model — "
    "the production shape for selection: train offline, score the "
    "firehose online. Unseen buckets (grams the seed never hashed) "
    "fall back to the model's dflt llr — both smoothed models back "
    "off to their alpha mass — and that backoff path is exactly "
    "what this rung gates: the streamed per-doc (n_grams, logw) "
    "rows must hash-match a full DuckDB recompute of seed-model + "
    "increment-scoring. A dropped/duplicated micro-batch, a "
    "model-freshness leak (batch 2 re-training on batch 1's docs), "
    "or a broken backoff all break the hash. Scale: scoring is two "
    "broadcast joins + one per-doc agg per micro-batch; the model "
    "is ≤4096 rows and persists across batches. Gate cost: stream "
    "checkpoint and landed files live under a tempdir, removed "
    "after; the model persist is released in the finally.",
    parts=8,
)
def q_stream_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        dsir_model,
        dsir_score,
    )
    from yahoofinancedatalake_spark.queries._registry import (  # noqa: PLC0415
        _await_stream,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("toks"),
    )
    n = base.count()
    p60 = (
        base.select("doc_id")
        .orderBy("doc_id")
        .offset(int(n * 0.6))
        .limit(1)
        .collect()[0][0]
    )
    seed = base.filter(F.col("doc_id") < p60)
    # two id-ordered increments: a 50/50 split of the tail, so the
    # second availableNow run must score docs the first never saw
    incs = [
        base.filter(
            (F.col("doc_id") >= p60) & (F.col("doc_id") % 2 == 0)
        ),
        base.filter(
            (F.col("doc_id") >= p60) & (F.col("doc_id") % 2 == 1)
        ),
    ]

    root = tempfile.mkdtemp(prefix="stream_dsir_")
    indir = f"{root}/incoming"
    outdir = f"{root}/scored"
    ckpt = f"{root}/ckpt"
    os.makedirs(indir)
    model = dsir_model(seed, "toks", "is_t").persist()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # size the per-batch score table by the BATCH, not the session
        # default (r13, VERDICT item 1 / guide §2.2): AQE is off in
        # streaming plans, so the per-doc agg fanned out to the full
        # session shuffle width and appended that many near-empty
        # files per micro-batch — at 32 cores the reduce/task/file
        # overhead made this rung SLOWER than at 8. coalesce to the
        # batch's own source-file count (no-op when the batch is
        # already wider) keeps it scale-adaptive: a production-sized
        # batch arriving as N files keeps N-way reduce parallelism.
        # inputFiles() is a metadata read — no job, no .rdd plan
        # conversion.
        width = max(1, len(batch_df.inputFiles()))
        dsir_score(batch_df, "toks", "doc_id", model).coalesce(
            width
        ).write.mode("append").parquet(outdir)

    try:
        model.count()  # materialize BEFORE any increment lands
        for inc in incs:
            inc.coalesce(1).write.mode("append").parquet(indir)
            q = (
                spark.readStream.schema(base.schema)
                .parquet(indir)
                .writeStream.foreachBatch(_process)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            _await_stream(q)
        rows = spark.read.parquet(outdir).collect()
    finally:
        model.unpersist()
        shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        rows, schema="doc_id bigint, n_grams bigint, logw double"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# r10 second wave: Gopher rule-based quality filtering, UniMax
# budget-constrained mixture weights, DSIR ESS diagnostics.
# ---------------------------------------------------------------------------

#: Gopher's "contains at least two of" English-indicator words
#: (Rae et al. 2021, A1.1).
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: Cross-engine whitespace split: explicit ASCII class on BOTH sides
#: (Java \s and RE2 \s disagree on \x0b — the ADVICE r9 winnow
#: normalization lesson applied from day one here).
_WS_SPLIT = "[ \\t\\n]+"


@_register(
    "gopher_quality_rules",
    f"""
    WITH w AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(trim(text)),
                         '[ \\t\\n]+'), x -> x <> '') AS wl,
             list_filter(list_transform(string_split(text, chr(10)),
                         l -> trim(l)), l -> l <> '') AS ls
      FROM documents
    ), sig AS (
      SELECT doc_id,
        len(wl) AS n_words,
        list_aggregate(list_transform(wl, x -> len(x)), 'sum') AS wchars,
        len(text) - len(replace(text, '#', ''))
          + (len(text) - len(replace(text, '...', ''))) / 3.0
          + (len(text) - len(replace(text, '…', ''))) AS sym_n,
        len(list_filter(wl, x -> regexp_matches(x, '[a-z]'))) AS alpha_n,
        len(list_filter({_GOPHER_STOPS!r}::VARCHAR[],
                        s -> list_contains(wl, s))) AS stop_hits,
        len(ls) AS n_lines,
        len(ls) - len(list_distinct(ls)) AS dup_n,
        coalesce(list_aggregate(list_transform(ls, l -> len(l)),
                                'sum'), 0)
          - coalesce(list_aggregate(list_transform(list_distinct(ls),
                                    l -> len(l)), 'sum'), 0) AS dup_chars,
        coalesce(list_aggregate(list_transform(ls, l -> len(l)),
                                'sum'), 0) AS line_chars,
        len(list_filter(ls,
            l -> regexp_matches(l, '^[-*•]'))) AS bullet_n,
        len(list_filter(ls, l -> ends_with(l, '...')
            OR ends_with(l, '…'))) AS ell_n
      FROM w
    ), r AS (
      SELECT doc_id,
        n_words,
        {sql_dround("wchars::DOUBLE / greatest(n_words, 1)", 4)}
          AS mean_word_len,
        {sql_dround("sym_n / greatest(n_words, 1)", 4)}
          AS symbol_word_ratio,
        {sql_dround("alpha_n::DOUBLE / greatest(n_words, 1)", 4)}
          AS alpha_word_frac,
        CAST(stop_hits AS INTEGER) AS stopword_hits,
        CAST(n_lines AS INTEGER) AS n_lines,
        {sql_dround("dup_n::DOUBLE / greatest(n_lines, 1)", 4)}
          AS dup_line_frac,
        {sql_dround("dup_chars::DOUBLE / greatest(line_chars, 1)", 4)}
          AS dup_line_char_frac,
        {sql_dround("bullet_n::DOUBLE / greatest(n_lines, 1)", 4)}
          AS bullet_line_frac,
        {sql_dround("ell_n::DOUBLE / greatest(n_lines, 1)", 4)}
          AS ellipsis_line_frac
      FROM sig
    )
    SELECT *,
           (n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3 AND 10
            AND symbol_word_ratio <= 0.1
            AND bullet_line_frac <= 0.9
            AND ellipsis_line_frac <= 0.3
            AND alpha_word_frac >= 0.8
            AND stopword_hits >= 2
            AND dup_line_frac <= 0.3
            AND dup_line_char_frac <= 0.2) AS passes_gopher
    FROM r ORDER BY doc_id
    """,
    doc="Training-data op: the Gopher rule-based quality filter (Rae "
    "et al. 2021, A1.1-A1.2; the ruleset FineWeb/Dolma re-use) as ONE "
    "zero-exchange projection — word-count bounds, mean-word-length "
    "bounds, symbol-to-word ratio (#, ASCII '...' and Unicode '…' "
    "ellipses), bullet/ellipsis line fractions, alphabetic-word "
    "fraction, the two-of-eight English-indicator-word rule, and the "
    "A1.2 duplicate-line count and char fractions, plus the composite "
    "pass flag. Duplicate lines count only REPEATS beyond the first "
    "occurrence per distinct line (n_lines - n_distinct — the "
    "Dolma/DataTrove reading of A1.2; ADVICE r10), as a size diff of "
    "the line array vs its array_distinct — O(lines log lines) per "
    "doc, zero shuffles. Documented deviation from Rae et al. A1.1: "
    "the 0.1 symbol threshold applies to the COMBINED '#'+ellipsis "
    "ratio rather than per-symbol (stricter — a doc must stay under "
    "0.1 across all three symbols together). Whitespace split is an "
    "explicit ASCII class on both engines (Java \\s and RE2 \\s "
    "disagree on \\x0b). The corpus exercises the word-level rules; "
    "the line-level rules are pinned by fixture tests (synthetic docs "
    "carry no newlines/bullets). Beyond-reference surface: LLM-corpus "
    "quality filtering.",
    parts=8,
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    wl = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), _WS_SPLIT),
        lambda x: x != "",
    )
    ls = F.filter(
        # NOT the bare F.trim: transform() sees its optional second
        # parameter and passes the element INDEX as the trim charset
        F.transform(F.split(F.col("text"), "\n"), lambda l: F.trim(l)),
        lambda x: x != "",
    )
    base = docs.select("doc_id", "text", wl.alias("wl"), ls.alias("ls"))
    lsc = F.col("ls")
    chars = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, F.length), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sym_n = (
        F.length("text") - F.length(F.replace("text", F.lit("#")))
    ).cast("double") + (
        F.length("text") - F.length(F.replace("text", F.lit("...")))
    ) / F.lit(3.0) + (
        F.length("text") - F.length(F.replace("text", F.lit("…")))
    ).cast("double")
    sig = base.select(
        "doc_id",
        F.size("wl").alias("n_words"),
        chars(F.col("wl")).alias("wchars"),
        sym_n.alias("sym_n"),
        F.size(F.filter(F.col("wl"), lambda x: x.rlike("[a-z]"))).alias(
            "alpha_n"
        ),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
                lambda s: F.array_contains(F.col("wl"), s),
            )
        ).alias("stop_hits"),
        F.size("ls").alias("n_lines"),
        (F.size(lsc) - F.size(F.array_distinct(lsc))).alias("dup_n"),
        (chars(lsc) - chars(F.array_distinct(lsc))).alias("dup_chars"),
        chars(lsc).alias("line_chars"),
        F.size(
            F.filter(lsc, lambda l: l.rlike("^[-*•]"))
        ).alias("bullet_n"),
        F.size(
            F.filter(
                lsc,
                lambda l: l.endswith(F.lit("..."))
                | l.endswith(F.lit("…")),
            )
        ).alias("ell_n"),
    )
    nl = F.greatest(F.col("n_lines"), F.lit(1))
    r = sig.select(
        "doc_id",
        "n_words",
        dround(
            F.col("wchars").cast("double")
            / F.greatest(F.col("n_words"), F.lit(1)), 4
        ).alias("mean_word_len"),
        dround(
            F.col("sym_n") / F.greatest(F.col("n_words"), F.lit(1)), 4
        ).alias("symbol_word_ratio"),
        dround(
            F.col("alpha_n").cast("double")
            / F.greatest(F.col("n_words"), F.lit(1)), 4
        ).alias("alpha_word_frac"),
        F.col("stop_hits").cast("int").alias("stopword_hits"),
        F.col("n_lines").cast("int").alias("n_lines"),
        dround(F.col("dup_n").cast("double") / nl, 4).alias(
            "dup_line_frac"
        ),
        dround(
            F.col("dup_chars").cast("double")
            / F.greatest(F.col("line_chars"), F.lit(1)), 4
        ).alias("dup_line_char_frac"),
        dround(F.col("bullet_n").cast("double") / nl, 4).alias(
            "bullet_line_frac"
        ),
        dround(F.col("ell_n").cast("double") / nl, 4).alias(
            "ellipsis_line_frac"
        ),
    )
    passes = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("stopword_hits") >= 2)
        & (F.col("dup_line_frac") <= 0.3)
        & (F.col("dup_line_char_frac") <= 0.2)
    )
    return r.withColumn("passes_gopher", passes).orderBy("doc_id")


@_register(
    "unimax_mixture",
    f"""
    WITH t AS (
      SELECT lang, CAST(sum(len({_WORD_TOKS_SQL})) AS BIGINT) AS n_toks
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(sum(n_toks) AS BIGINT) AS tt, count(*) AS ng FROM t
    ), g AS (
      SELECT lang, n_toks, floor(1.6 * tt) AS budget,
             2.0 * n_toks AS cap, ng
      FROM t CROSS JOIN tot
    ), k AS (
      SELECT *,
        (budget - (sum(cap) OVER (ORDER BY cap, lang) - cap))
          / (ng - row_number() OVER (ORDER BY cap, lang) + 1) AS lvl
      FROM g
    ), lv AS (SELECT max(lvl) AS l FROM k)
    SELECT lang, n_toks,
           {sql_dround("cap", 4)} AS cap,
           {sql_dround("least(cap, l)", 4)} AS alloc,
           {sql_dround("least(cap, l) / greatest(n_toks, 1)", 6)} AS epochs
    FROM k CROSS JOIN lv ORDER BY lang
    """,
    doc="Training-data op: UniMax budget-constrained mixture weights "
    "(Chung et al., ICLR 2023) over the corpus languages — spread a "
    "training-token budget (1.6x the corpus) UNIFORMLY across "
    "languages, capping each at 2 epochs of its own data; the "
    "paper's alternative to temperature sampling that provably "
    "bounds low-resource repetition. The sequential waterfilling "
    "loop is computed in closed form over the cap-ascending order: "
    "L = max_i (B - prefix_cap_{{i-1}}) / (n-i+1), alloc = min(cap, "
    "L) — pinned against the paper's sequential reference in tests "
    "across capped/uncapped/all-capped corners. On this corpus the "
    "en slice (~43% of tokens) is the one uncapped language: the "
    "four small langs cap at 2.0 epochs and en absorbs the rest at "
    "~1.1 epochs — the exact skew UniMax exists for. Scale: ONE "
    "map-side-partial agg over the corpus; everything after runs on "
    "the n_langs-row table (the single-partition window is "
    "driver-scale by construction — UniMax's own production table "
    "is ~100 languages).",
    parts=8,
)
def q_unimax_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        unimax_allocation,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    counts = docs.groupBy("lang").agg(
        F.sum(F.size(_word_toks())).alias("n_toks")
    )
    return unimax_allocation(
        counts, "lang", budget_factor=1.6, epoch_cap=2.0
    ).orderBy("lang")


@_register(
    "dsir_ess",
    f"""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), grams AS ({_GRAMS_SQL.format(src="toks")}
    ), b AS (
      SELECT doc_id, is_t, substr(md5(g), 1, 3) AS bucket FROM grams
    ), counts AS (
      SELECT bucket, count(*) AS rc,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc
      FROM b GROUP BY bucket
    ), tot AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM counts
    ), llr AS (
      SELECT bucket,
             {sql_dround(
                 "ln((tc + 0.5) / (tt + 2048.0))"
                 " - ln((rc + 0.5) / (rt + 2048.0))", 6)} AS llr
      FROM counts CROSS JOIN tot
    ), w AS (
      SELECT doc_id, {sql_dround("sum(llr)", 6)} AS logw
      FROM b JOIN llr USING (bucket) GROUP BY doc_id
    ), mx AS (SELECT max(logw) AS max_logw FROM w
    ), s AS (
      SELECT count(*) AS n_docs, max(max_logw) AS max_logw,
             sum(exp(logw - max_logw)) AS s1,
             sum(exp(logw - max_logw) * exp(logw - max_logw)) AS s2
      FROM w CROSS JOIN mx
    )
    SELECT n_docs, max_logw,
           {sql_dround("(s1 * s1) / s2", 4)} AS ess,
           {sql_dround("(s1 * s1) / s2 / n_docs", 6)} AS ess_frac
    FROM s
    """,
    doc="Training-data op: effective-sample-size diagnostic for the "
    "DSIR importance weights (Kong 1992) — ESS = (sum w)^2 / sum "
    "w^2 computed max-shifted (scale-invariant, overflow-proof at "
    "any corpus size), with ess_frac = ESS/n: near 1 the target and "
    "raw distributions agree and resampling changes little; near "
    "1/n a handful of docs carry all the weight and the selection "
    "k should shrink. The weight model is dsir_select's exactly "
    "(same buckets, same pinned llr). Scale: two corpus-sized aggs "
    "joined through a 1-row broadcast; exp() of dround(6)-pinned "
    "inputs keeps cross-engine sum noise ~1e-14 relative, far "
    "inside the output rounding bins. Pairs with dsir_select as "
    "the diagnostic a production selection run reports next to its "
    "sample.",
    parts=8,
)
def q_dsir_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        dsir_ess,
        dsir_logweights,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("toks"),
    )
    return dsir_ess(dsir_logweights(base, "toks", "doc_id", "is_t"))


#: rung-14 split predicate, shared by the Spark gate and its oracle:
#: batch 1 = everything before Jan 29 EXCEPT odd-id rows from Jan 26
#: on; batch 2 = the complement (the last two days of new data plus
#: the held-back odd rows arriving LATE).
_LATE_B1_SQL = (
    "ts < TIMESTAMP '2024-01-29' AND NOT "
    "(event_id % 2 = 1 AND ts >= TIMESTAMP '2024-01-26')"
)


@_register(
    "stream_late_data_drop_batch_eq",
    f"""
    WITH e AS (
      SELECT event_id, ts, event_type, value,
             date_trunc('day', ts) AS day,
             date_trunc('day', ts) + INTERVAL 1 DAY AS wend
      FROM events
    ), b1 AS (
      SELECT * FROM e WHERE {_LATE_B1_SQL}
    ), wm1 AS (SELECT max(ts) - INTERVAL 36 HOUR AS w FROM b1
    ), wmf AS (SELECT max(ts) - INTERVAL 36 HOUR AS w FROM e
    ), kept AS (
      SELECT * FROM b1
      UNION ALL
      SELECT e.* FROM e CROSS JOIN wm1
      WHERE NOT ({_LATE_B1_SQL}) AND e.wend > wm1.w
    )
    SELECT day, event_type,
           {sql_dround("sum(value)", 2)} / count(*) AS avg_value,
           count(*) AS n
    FROM kept CROSS JOIN wmf
    WHERE wend <= wmf.w
    GROUP BY day, event_type
    ORDER BY day, event_type
    """,
    doc="Streaming rung 14 — LATE-DATA WATERMARK SEMANTICS under the "
    "oracle gate: the one thing watermarks exist for, pinned "
    "end-to-end. The daily×type average (stream_daily_avg, 36 h "
    "watermark) runs in APPEND mode over two availableNow runs "
    "sharing one checkpoint: run 1 lands everything before Jan 29 "
    "minus the odd-id rows from Jan 26 on; run 2 lands the "
    "complement — two days of NEW data plus the held-back odd rows "
    "arriving late. The oracle recomputes Spark's documented "
    "semantics from scratch: a late row survives iff its window end "
    "is above the watermark the first run checkpointed (max event "
    "time − 36 h — on this corpus day-26 odds arrive after their "
    "window was evicted and are DROPPED, day-27/28 odds merge into "
    "open state), and a window is emitted iff the FINAL watermark "
    "passed its end (append finalization via the no-data batch — "
    "days 29-30 stay open and never emit). A wrong late-filter "
    "bound, a watermark that fails to persist across the checkpoint "
    "handoff, a re-emitted window, or a missing no-data "
    "finalization batch all break the hash. Both watermarks are "
    "computed DYNAMICALLY from the same split on both sides, so "
    "the equality is corpus-independent. coalesce(1) per landing "
    "pins each run to one micro-batch.",
    parts=8,
)
def q_stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from yahoofinancedatalake_spark.queries._registry import (  # noqa: PLC0415
        _await_stream,
    )
    from yahoofinancedatalake_spark.streaming.ops import (  # noqa: PLC0415
        stream_daily_avg,
    )

    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    c29 = F.lit("2024-01-29").cast("timestamp")
    c26 = F.lit("2024-01-26").cast("timestamp")
    in_b1 = (F.col("ts") < c29) & ~(
        ((F.col("event_id") % 2) == 1) & (F.col("ts") >= c26)
    )
    incs = [batch.filter(in_b1), batch.filter(~in_b1)]

    root = tempfile.mkdtemp(prefix="stream_late_")
    indir = f"{root}/incoming"
    outdir = f"{root}/agg"
    ckpt = f"{root}/ckpt"
    os.makedirs(indir)
    # Size the stream's stateful-agg width by the DATA, not the
    # session default (r13, guide §2.2 — the connected_components
    # partition rule): AQE cannot coalesce streaming shuffles, so the
    # windowed agg ran one state-store instance (with its per-batch
    # commit + output file) per session shuffle partition — at 32
    # cores the per-partition overhead made the rung slower than at
    # 8. ~1M events per state partition, floor 2; a production-sized
    # stream raises it with volume. The first run's value is baked
    # into the checkpoint and reused on restart, so both availableNow
    # runs see one consistent width.
    n_events = batch.count()
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(2, min(int(old_parts), n_events // 1_000_000 + 2))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        for inc in incs:
            inc.coalesce(1).write.mode("append").parquet(indir)
            q = (
                stream_daily_avg(
                    spark.readStream.schema(batch.schema).parquet(indir),
                    watermark="36 hours",
                )
                .writeStream.format("parquet")
                .option("path", outdir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            _await_stream(q)
        rows = spark.read.parquet(outdir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        rows,
        schema="day timestamp, event_type string, avg_value double,"
        " n bigint",
    ).orderBy("day", "event_type")


@_register(
    "selection_funnel",
    f"""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), stage1 AS (
      SELECT doc_id, is_t, t FROM toks
      WHERE len(t) BETWEEN 50 AND 100000
        AND {sql_dround(
            "list_aggregate(list_transform(t, x -> len(x)), 'sum')"
            "::DOUBLE / greatest(len(t), 1)", 4)} BETWEEN 3 AND 10
        AND {sql_dround(
            "len(list_filter(t, x -> regexp_matches(x, '[a-z]')))"
            "::DOUBLE / greatest(len(t), 1)", 4)} >= 0.8
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(t) - 1), i -> t[i])) AS w1,
             unnest(list_transform(
               generate_series(1, len(t) - 1), i -> t[i + 1])) AS w2
      FROM stage1
    ), bc AS (
      SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2
    ), ctx AS (
      SELECT w1, sum(c) AS cv, count(*) AS n1v FROM bc GROUP BY 1
    ), cont AS (
      SELECT w2, count(*) AS n1w FROM bc GROUP BY 1
    ), dt AS (SELECT count(*) AS dtot FROM bc
    ), model AS (
      SELECT bc.w1, bc.w2,
             {sql_dround(
                 "ln((greatest(c - 0.75, 0)"
                 " + 0.75 * n1v * (n1w / CAST(dtot AS DOUBLE))) / cv)",
                 6)} AS lp
      FROM bc JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN dt
    ), pplt AS (
      SELECT bg.doc_id,
             {sql_dround(
                 "exp(-(" + sql_dround("sum(model.lp)", 6)
                 + " / count(*)))", 4)} AS ppl
      FROM bg JOIN model USING (w1, w2) GROUP BY bg.doc_id
    ), thr AS (
      SELECT quantile_cont(ppl, 0.3333333333333333) AS t1,
             quantile_cont(ppl, 0.6666666666666666) AS t2
      FROM pplt
    ), keep AS (
      SELECT doc_id, ppl,
             CASE WHEN ppl <= t1 THEN 1
                  WHEN ppl <= t2 THEN 2
                  ELSE 3 END AS ppl_bucket
      FROM pplt CROSS JOIN thr
    ), k2 AS (SELECT * FROM keep WHERE ppl_bucket <= 2
    ), kt AS (
      SELECT s.doc_id, s.is_t, s.t FROM stage1 s JOIN k2 USING (doc_id)
    ), grams AS ({_GRAMS_SQL.format(src="kt")}
    ), db AS (
      SELECT doc_id, is_t, substr(md5(g), 1, 3) AS bucket FROM grams
    ), counts AS (
      SELECT bucket, count(*) AS rc,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc
      FROM db GROUP BY bucket
    ), tot AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM counts
    ), llr AS (
      SELECT bucket,
             {sql_dround(
                 "ln((tc + 0.5) / (tt + 2048.0))"
                 " - ln((rc + 0.5) / (rt + 2048.0))", 6)} AS llr
      FROM counts CROSS JOIN tot
    ), w AS (
      SELECT doc_id, {sql_dround("sum(llr)", 6)} AS logw
      FROM db JOIN llr USING (bucket) GROUP BY doc_id
    )
    SELECT w.doc_id, k2.ppl, CAST(k2.ppl_bucket AS INTEGER) AS ppl_bucket,
           w.logw,
           {sql_dround(
               "logw - ln(-ln((('0x' || substr(md5(w.doc_id::VARCHAR),"
               " 1, 8))::BIGINT + 0.5) / 4294967296.0))", 6)} AS gkey
    FROM w JOIN k2 USING (doc_id)
    ORDER BY gkey DESC, doc_id
    LIMIT 50
    """,
    doc="Training-data op: the SELECTION FUNNEL — the CCNet/FineWeb "
    "production shape composing this round's selection tier end to "
    "end in one DataFrame plan: (1) Gopher word-level bounds (word "
    "count 50-100k, mean word length 3-10, alphabetic fraction "
    ">= 0.8 — the rules whose preconditions a no-markup corpus "
    "satisfies; the full line/symbol/stopword ruleset is the "
    "standalone gopher_quality_rules query) over the shared "
    "cross-engine tokenization, (2) Kneser-Ney perplexity terciles "
    "with the LM trained ON the survivors, keeping head+middle — "
    "the CCNet bucket policy; thresholds are ONE exact-percentile "
    "aggregate broadcast back onto the scores (F.percentile and "
    "quantile_cont share the (n-1)q interpolation, per "
    "percentiles_price), never a global-order window, (3) DSIR "
    "top-50 over the kept pool (target = the 'en' slice, model "
    "trained on the pool) with hash-seeded Gumbel keys. Output: "
    "(doc_id, ppl, ppl_bucket, logw, gkey). Scale: stage 1 is a "
    "zero-exchange projection filter; stage 2 adds the "
    "vocabulary-bounded KN model build + one model join + a 1-row "
    "threshold broadcast; stage 3 is dsir_select's plan on a "
    "smaller pool; the top-50 is TakeOrderedAndProject. Every "
    "stage is individually driver-gated (gopher_quality_rules, "
    "kneser_ney_quality, dsir_select) — this query gates their "
    "COMPOSITION.",
    parts=8,
)
def q_selection_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        _const_key,
        dsir_logweights,
        dsir_resample,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("t"),
    )
    nw = F.greatest(F.size("t"), F.lit(1))
    wchars = F.aggregate(
        F.transform("t", F.length), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_len = dround(wchars.cast("double") / nw, 4)
    alpha = dround(
        F.size(F.filter(F.col("t"), lambda x: x.rlike("[a-z]")))
        .cast("double") / nw, 4,
    )
    stage1 = base.filter(
        F.size("t").between(50, 100000)
        & mean_len.between(3, 10)
        & (alpha >= 0.8)
    # materialize the Gopher-survivor pool ONCE (r12): stage1 feeds
    # the KN model build, the KN scoring bigrams, AND the kept-pool
    # join — each reference otherwise re-executes the scan +
    # tokenize + HOF rule filter. CCNet materializes each funnel
    # stage to disk; localCheckpoint is the in-session form.
    ).localCheckpoint()

    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        kneser_ney_scores,
    )

    # per-doc (doc_id, ppl) is O(pool) tiny rows consumed twice (the
    # percentile aggregate + the bucket projection) — materialize so
    # the KN model+score subtree runs once (r12)
    pplt = (
        kneser_ney_scores(stage1, "t", "doc_id")
        .select("doc_id", "ppl")
        .localCheckpoint()
    )
    thr = pplt.agg(
        F.percentile(
            "ppl", F.array(F.lit(1 / 3), F.lit(2 / 3))
        ).alias("ts")
    ).select(
        F.element_at("ts", 1).alias("t1"),
        F.element_at("ts", 2).alias("t2"),
    ).withColumn("__k", _const_key(F.col("t1")))
    keep = (
        pplt.withColumn("__k", _const_key(F.col("ppl")))
        .join(F.broadcast(thr), "__k")
        .drop("__k")
        .withColumn(
            "ppl_bucket",
            F.when(F.col("ppl") <= F.col("t1"), F.lit(1))
            .when(F.col("ppl") <= F.col("t2"), F.lit(2))
            .otherwise(F.lit(3))
            .cast("int"),
        )
        .filter(F.col("ppl_bucket") <= 2)
        .select("doc_id", "ppl", "ppl_bucket")
        # Materialize the survivor table between stages: `keep` is
        # referenced by the pool join AND the final projection, and
        # each reference would otherwise inline the whole
        # stage1→KN-model→percentile subtree (measured: 430 Exchange
        # nodes / 114 BHJs in the un-checkpointed plan vs ~30 after;
        # runtime ReuseExchange hides most of it at sf0.1, but plan
        # blowup is compile cost and reuse-miss risk at 100 TB). The
        # production funnel materializes each stage anyway — CCNet
        # writes the bucket assignment to disk before selection.
        .localCheckpoint()
    )
    kt = stage1.join(keep.select("doc_id"), "doc_id")
    w = dsir_logweights(kt, "t", "doc_id", "is_t")
    sel = dsir_resample(w, "doc_id", 50)
    return (
        sel.join(keep, "doc_id")
        .select("doc_id", "ppl", "ppl_bucket", "logw", "gkey")
        .orderBy(F.desc("gkey"), "doc_id")
    )


# ---------------------------------------------------------------------------
# r11: the hybrid near-dup matcher (LSH proposes, winnow decides) and
# the model-based quality-classifier rung of the selection tier.
# ---------------------------------------------------------------------------

#: Hybrid accept threshold. 0.6, not the pure winnow matcher's 0.5:
#: the r11 measurement at sf0.1 put every LSH-missed winnow pair at
#: overlap <= 0.5 (word-3-gram Jaccard <= 0.043 — boilerplate-
#: fingerprint coincidences far below the 8-band×4-hash banding knee)
#: and every LSH-caught pair at overlap >= 0.8889, so 0.6 is the
#: operating point where "LSH proposes, winnow decides" EQUALS the
#: pure winnow policy and the matcher stays hash-exact against the
#: O(n²)-free winnow ground truth.
_HYB_T = 0.6


@_register(
    "hybrid_near_dup",
    f"""
    WITH {_WINNOW_CTES},
    dfreq AS (SELECT fp, count(*) AS df FROM sel GROUP BY fp),
    kept AS (
      SELECT sel.doc_id, sel.fp FROM sel
      JOIN dfreq USING (fp) WHERE df BETWEEN 2 AND {_WIN_CAP}
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, shared,
           {sql_dround(
               "CAST(shared AS DOUBLE) / least(sa.n_fp, sb.n_fp)", 4
           )} AS overlap
    FROM pairs
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(shared AS DOUBLE) / least(sa.n_fp, sb.n_fp) >= {_HYB_T}
    ORDER BY id_a, id_b
    """,
    doc="Training-data op: HYBRID near-dup matcher — MinHash-LSH "
    "candidates (32 hashes / 8 bands / word-3-shingles, md5-capped "
    "buckets) scored by winnowed-fingerprint overlap at the pure "
    f"matcher's exact parameters (k={_WIN_K}, w={_WIN_W}, "
    f"df_cap={_WIN_CAP}) with accept threshold {_HYB_T} — the "
    "composition the r10 scale sweeps recommended: the pure winnow "
    "matcher's pair generation grows as sum C(df,2) over the "
    "inverted index (736M candidates at the 30x sweep, ~8B at 100x) "
    "while LSH banding's capped candidate volume measured 24.5M at "
    "100x, so at corpus scale LSH bounds the pair universe and the "
    "winnow stage scores ONLY those pairs — per-doc df-capped "
    "fingerprint ARRAYS (int64-rehashed, the hashed_ngram_jaccard "
    "shape) attach to candidates via two id-keyed joins and "
    "array_intersect per pair, moving |candidates| rows, never "
    "sum df² and never |candidates| x density. Both stages are "
    "deterministic (md5-ranked bucket cap; (fp, df)-only df-cap), "
    "and at the accept threshold the LSH stage has measured recall "
    "1 over winnow-accepted pairs (see _HYB_T), so the oracle is "
    "the SAME O(n²)-free winnow ground truth as winnow_near_dup — "
    "the hash gates that the hybrid loses nothing the winnow policy "
    "accepts. Also prep.py's near_dup_backend='hybrid'. Reference "
    "analog: none (dedups by exact id, finnhub_news.py:185-188).",
    parts=8,
)
def q_hybrid_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        hybrid_near_dup_pairs,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return hybrid_near_dup_pairs(
        docs,
        "text",
        "doc_id",
        k=_WIN_K,
        w=_WIN_W,
        df_cap=_WIN_CAP,
        overlap_threshold=_HYB_T,
    ).orderBy("id_a", "id_b")


# Shared NB-classifier CTE chain: train-side gram buckets with the
# boolean label riding along -> smoothed per-class bucket counts ->
# dround(6)-pinned per-bucket weight + unseen-bucket default + doc
# class prior. Verbatim recompute of operators/selection.py::
# nb_quality_model / nb_prior (same DSIR_ALPHA=0.5 / 4096-bucket
# smoothing as the DSIR tables). Parameterized on the labeled-docs
# CTE so the standalone classifier (train split) and the funnel
# variant (Gopher survivors) share it.
def _nb_ctes(src: str) -> str:
    return f"""
    nbg AS ({_GRAMS_SQL.format(src=src)}
    ), nbb AS (
      SELECT doc_id, is_t, substr(md5(g), 1, 3) AS bucket FROM nbg
    ), nbc AS (
      SELECT bucket,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS pc,
             sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS nc
      FROM nbb GROUP BY bucket
    ), nbt AS (SELECT sum(pc) AS pt, sum(nc) AS nt FROM nbc
    ), nbm AS (
      SELECT bucket,
             {sql_dround(
                 "ln((pc + 0.5) / (pt + 2048.0))"
                 " - ln((nc + 0.5) / (nt + 2048.0))", 6)} AS wgt
      FROM nbc CROSS JOIN nbt
    ), nbd AS (
      SELECT {sql_dround(
          "ln(0.5 / (pt + 2048.0)) - ln(0.5 / (nt + 2048.0))", 6
      )} AS dflt FROM nbt
    ), nbp AS (
      SELECT {sql_dround(
          "ln(sum(CASE WHEN is_t THEN 1 ELSE 0 END) + 1.0)"
          " - ln(sum(CASE WHEN is_t THEN 0 ELSE 1 END) + 1.0)", 6
      )} AS prior FROM {src}
    )"""


@_register(
    "quality_classifier_select",
    f"""
    WITH d AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), tr AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) < 'cd'
    ), ho AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) >= 'cd'
    ), {_nb_ctes("tr")},
    hog AS ({_GRAMS_SQL.format(src="ho")}
    ), hob AS (
      SELECT doc_id, substr(md5(g), 1, 3) AS bucket FROM hog
    ), sc AS (
      SELECT doc_id, count(*) AS n_grams,
             sum(coalesce(wgt, dflt)) AS sw
      FROM hob LEFT JOIN nbm USING (bucket) CROSS JOIN nbd
      GROUP BY doc_id
    )
    SELECT doc_id, n_grams,
           {sql_dround("prior + sw", 6)} AS logodds,
           {sql_dround(
               "1.0 / (1.0 + exp(-(" + sql_dround("prior + sw", 6)
               + ")))", 6)} AS prob,
           {sql_dround("prior + sw", 6)} >= 0 AS predicted
    FROM sc CROSS JOIN nbp
    ORDER BY doc_id
    """,
    doc="Training-data op: MODEL-BASED quality classifier — the "
    "fourth member of the published selection funnels (CCNet's "
    "fastText classifier; FineWeb-edu's learned scorer) as a "
    "closed-form multinomial Naive-Bayes linear scorer over the "
    "DSIR tier's hashed uni+bigram buckets (4096, same "
    "alpha=0.5 smoothing — one feature pipeline for both model "
    "families; NB over hashed n-grams IS a trained linear text "
    "classifier, McCallum & Nigam 1998, and its fit is two smoothed "
    "count tables: no iterative solver, exactly engine-replayable). "
    "Trained on the md5-deterministic 80% doc split (lang='en' as "
    "the positive label), scoring the HELD-OUT 20% — unseen buckets "
    "back off to the smoothed default, the doc-count class prior "
    "calibrates the posterior, logodds is dround(6)-pinned before "
    "the sigmoid, predicted = logodds >= 0. Scale: one gram-count "
    "shuffle trains; the <=4096-row model + two 1-row scalars "
    "broadcast onto the scoring grams (dsir_score's plan); the fit "
    "is pinned against a pure-Python reference in pytest. Reference "
    "analog: none — the selection tier extends the engine the same "
    "way the dedup/ANN families do.",
    parts=8,
)
def q_quality_classifier_select(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        nb_prior,
        nb_quality_model,
        nb_quality_scores,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("toks"),
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    train = base.filter(h < "cd")
    held_out = base.filter(h >= "cd")
    # materialize the ≤4096-row model + 1-row prior ONCE (r12): the
    # scorer consumes the model twice (dflt agg + broadcast) and the
    # prior once, and un-checkpointed each consumer re-executes the
    # corpus-sized train-gram aggregation under it — 3-4 train passes
    # for tables that are O(model), not O(corpus)
    model = nb_quality_model(train, "toks", "is_t").localCheckpoint()
    prior = nb_prior(train, "is_t").localCheckpoint()
    return (
        nb_quality_scores(held_out, "toks", "doc_id", model, prior)
        .withColumn("predicted", F.col("logodds") >= 0)
        .orderBy("doc_id")
    )


@_register(
    "selection_funnel_cls",
    f"""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), stage1 AS (
      SELECT doc_id, is_t, t FROM toks
      WHERE len(t) BETWEEN 50 AND 100000
        AND {sql_dround(
            "list_aggregate(list_transform(t, x -> len(x)), 'sum')"
            "::DOUBLE / greatest(len(t), 1)", 4)} BETWEEN 3 AND 10
        AND {sql_dround(
            "len(list_filter(t, x -> regexp_matches(x, '[a-z]')))"
            "::DOUBLE / greatest(len(t), 1)", 4)} >= 0.8
    ), {_nb_ctes("stage1")},
    sc AS (
      SELECT doc_id, sum(coalesce(wgt, dflt)) AS sw
      FROM nbb LEFT JOIN nbm USING (bucket) CROSS JOIN nbd
      GROUP BY doc_id
    ), keep AS (
      SELECT doc_id,
             {sql_dround("prior + sw", 6)} AS logodds,
             {sql_dround(
                 "1.0 / (1.0 + exp(-(" + sql_dround("prior + sw", 6)
                 + ")))", 6)} AS prob
      FROM sc CROSS JOIN nbp
      WHERE {sql_dround("prior + sw", 6)} >= 0
    ), kt AS (
      SELECT s.doc_id, s.is_t, s.t FROM stage1 s JOIN keep USING (doc_id)
    ), grams AS ({_GRAMS_SQL.format(src="kt")}
    ), db AS (
      SELECT doc_id, is_t, substr(md5(g), 1, 3) AS bucket FROM grams
    ), counts AS (
      SELECT bucket, count(*) AS rc,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc
      FROM db GROUP BY bucket
    ), tot AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM counts
    ), llr AS (
      SELECT bucket,
             {sql_dround(
                 "ln((tc + 0.5) / (tt + 2048.0))"
                 " - ln((rc + 0.5) / (rt + 2048.0))", 6)} AS llr
      FROM counts CROSS JOIN tot
    ), w AS (
      SELECT doc_id, {sql_dround("sum(llr)", 6)} AS logw
      FROM db JOIN llr USING (bucket) GROUP BY doc_id
    )
    SELECT w.doc_id, keep.logodds, keep.prob, w.logw,
           {sql_dround(
               "logw - ln(-ln((('0x' || substr(md5(w.doc_id::VARCHAR),"
               " 1, 8))::BIGINT + 0.5) / 4294967296.0))", 6)} AS gkey
    FROM w JOIN keep USING (doc_id)
    ORDER BY gkey DESC, doc_id
    LIMIT 50
    """,
    doc="Training-data op: the selection funnel with the MODEL-BASED "
    "rung — the FineWeb-edu-shaped variant of selection_funnel, "
    "wiring the NB quality classifier between the Gopher bounds and "
    "DSIR: (1) Gopher word-level bounds (same stage as "
    "selection_funnel), (2) the quality_classifier_select scorer "
    "self-trained ON the survivor pool (lang='en' positives), "
    "keeping predicted-positive docs (logodds >= 0 — the posterior "
    "0.5 threshold), (3) DSIR top-50 over the kept pool with "
    "hash-seeded Gumbel keys. Output (doc_id, logodds, prob, logw, "
    "gkey). The classifier-keep table is localCheckpoint()ed "
    "between stages for the same reason selection_funnel's tercile "
    "table is (the r10 430-Exchange plan-blowup lesson; CCNet "
    "materializes each funnel stage too). Scale: every stage's "
    "posture is its standalone query's — zero-exchange projection "
    "filter, vocab-bounded broadcast-model scoring, "
    "TakeOrderedAndProject top-k. Gates the COMPOSITION of "
    "gopher_quality_rules + quality_classifier_select + "
    "dsir_select.",
    parts=8,
)
def q_selection_funnel_cls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        dsir_logweights,
        dsir_resample,
        nb_prior,
        nb_quality_model,
        nb_quality_scores,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("t"),
    )
    nw = F.greatest(F.size("t"), F.lit(1))
    wchars = F.aggregate(
        F.transform("t", F.length), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_len = dround(wchars.cast("double") / nw, 4)
    alpha = dround(
        F.size(F.filter(F.col("t"), lambda x: x.rlike("[a-z]")))
        .cast("double") / nw, 4,
    )
    stage1 = base.filter(
        F.size("t").between(50, 100000)
        & mean_len.between(3, 10)
        & (alpha >= 0.8)
    # materialize the Gopher-survivor pool ONCE (r12): stage1 feeds
    # the NB model build, the prior, the scoring grams, AND the
    # kept-pool join — four re-executions of the scan + tokenize +
    # HOF rule filter otherwise. CCNet materializes each funnel
    # stage to disk for the same reason; localCheckpoint is the
    # in-session form.
    ).localCheckpoint()
    # model/prior materialized for the same reason as
    # quality_classifier_select's (3-4 train passes → 1)
    model = nb_quality_model(stage1, "t", "is_t").localCheckpoint()
    prior = nb_prior(stage1, "is_t").localCheckpoint()
    keep = (
        nb_quality_scores(stage1, "t", "doc_id", model, prior)
        .filter(F.col("logodds") >= 0)
        .select("doc_id", "logodds", "prob")
        # same stage-boundary materialization as selection_funnel:
        # `keep` feeds both the pool join and the final projection,
        # and each reference would otherwise inline the whole
        # stage1→NB-model→scoring subtree into the plan twice
        .localCheckpoint()
    )
    kt = stage1.join(keep.select("doc_id"), "doc_id")
    w = dsir_logweights(kt, "t", "doc_id", "is_t")
    sel = dsir_resample(w, "doc_id", 50)
    return (
        sel.join(keep, "doc_id")
        .select("doc_id", "logodds", "prob", "logw", "gkey")
        .orderBy(F.desc("gkey"), "doc_id")
    )


# ---------------------------------------------------------------------------
# r11 second wave: classifier EVALUATION ops (exact ROC-AUC via the
# tie-corrected rank-sum, reliability/calibration bins), streaming
# rung 15 (online scoring against a frozen NB model), and the hybrid
# backend's composed prep gate.
# ---------------------------------------------------------------------------

#: shared held-out scoring CTE tail: NB model/prior from the train
#: split, logodds per held-out doc. Appended after _nb_ctes("tr").
_NB_HO_SCORE_CTES = f"""
    hog AS ({_GRAMS_SQL.format(src="ho")}
    ), hob AS (
      SELECT doc_id, substr(md5(g), 1, 3) AS bucket FROM hog
    ), hosc AS (
      SELECT doc_id, count(*) AS n_grams,
             sum(coalesce(wgt, dflt)) AS sw
      FROM hob LEFT JOIN nbm USING (bucket) CROSS JOIN nbd
      GROUP BY doc_id
    ), scored AS (
      SELECT doc_id, n_grams,
             {sql_dround("prior + sw", 6)} AS logodds,
             {sql_dround(
                 "1.0 / (1.0 + exp(-(" + sql_dround("prior + sw", 6)
                 + ")))", 6)} AS prob
      FROM hosc CROSS JOIN nbp
    )"""


@_register(
    "classifier_auc",
    f"""
    WITH d AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), tr AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) < 'cd'
    ), ho AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) >= 'cd'
    ), {_nb_ctes("tr")},
    {_NB_HO_SCORE_CTES},
    lab AS (
      SELECT s.logodds, ho.is_t FROM scored s JOIN ho USING (doc_id)
    ), r AS (
      SELECT is_t,
             rank() OVER (ORDER BY logodds)
               + (count(*) OVER (PARTITION BY logodds) - 1) / 2.0 AS ar
      FROM lab
    ), a AS (
      SELECT sum(CASE WHEN is_t THEN ar END) AS rs,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS nn
      FROM r
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           CASE WHEN np * nn = 0 THEN NULL ELSE {sql_dround(
               "(rs - np * (np + 1) / 2.0) / (np * nn)", 6)} END AS auc
    FROM a
    """,
    doc="Classifier-evaluation op: EXACT ROC-AUC of the NB quality "
    "classifier on its held-out split, via the tie-corrected "
    "Mann-Whitney rank-sum — AUC = (sum of positives' average ranks "
    "- n_pos(n_pos+1)/2) / (n_pos*n_neg), average rank per tie group "
    "= rank + (ties-1)/2. O(n log n), no O(n^2) pair join; ties are "
    "engine-identical because the ranking key is the dround(6)-"
    "pinned logodds. Completes the model-based rung with the metric "
    "every quality-classifier paper reports (FineWeb-edu reports "
    "F1/agreement on its held-out set; CCNet eyeballs head/tail "
    "precision). Scale note: the rank window is a single partition "
    "BY DESIGN — evaluation sets are bounded samples (here the 20% "
    "held-out split), not the corpus; the corpus-scale twin is "
    "classifier_auc_scaled (per-score cumulative histogram, zero "
    "unpartitioned windows, hash-equal to this form). A single-class "
    "split (np*nn = 0) is pinned to auc = NULL on BOTH engines — "
    "unguarded it is NULL on Spark but a division error in DuckDB "
    "(ADVICE r11). Reference analog: none.",
    parts=8,
)
def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        nb_prior,
        nb_quality_model,
        nb_quality_scores,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("toks"),
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    train = base.filter(h < "cd")
    held_out = base.filter(h >= "cd")
    # materialize the ≤4096-row model + 1-row prior ONCE (r12): the
    # scorer consumes the model twice (dflt agg + broadcast) and the
    # prior once, and un-checkpointed each consumer re-executes the
    # corpus-sized train-gram aggregation under it — 3-4 train passes
    # for tables that are O(model), not O(corpus)
    model = nb_quality_model(train, "toks", "is_t").localCheckpoint()
    prior = nb_prior(train, "is_t").localCheckpoint()
    scores = nb_quality_scores(held_out, "toks", "doc_id", model, prior)
    lab = scores.join(held_out.select("doc_id", "is_t"), "doc_id")
    ar = (
        F.rank().over(Window.orderBy("logodds"))
        + (F.count(F.lit(1)).over(Window.partitionBy("logodds")) - 1)
        / 2.0
    )
    r = lab.select("is_t", ar.alias("ar"))
    a = r.agg(
        F.sum(F.when(F.col("is_t"), F.col("ar"))).alias("rs"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("nn"),
    )
    # single-class guard (ADVICE r11): np*nn = 0 is NULL on Spark's
    # Divide but a hard division-by-zero ERROR in DuckDB — pin the
    # degenerate split to an explicit NULL sentinel on both engines
    return a.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        F.when(F.col("np") * F.col("nn") == 0, F.lit(None)).otherwise(
            dround(
                (F.col("rs") - F.col("np") * (F.col("np") + 1) / 2.0)
                / (F.col("np") * F.col("nn")),
                6,
            )
        ).alias("auc"),
    )


@_register(
    "classifier_calibration",
    f"""
    WITH d AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), tr AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) < 'cd'
    ), ho AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) >= 'cd'
    ), {_nb_ctes("tr")},
    {_NB_HO_SCORE_CTES},
    lab AS (
      SELECT s.prob, ho.is_t FROM scored s JOIN ho USING (doc_id)
    )
    SELECT CAST(least(floor(prob * 10), 9) AS INTEGER) AS bin,
           count(*) AS n,
           {sql_dround("avg(prob)", 6)} AS avg_conf,
           {sql_dround(
               "avg(CASE WHEN is_t THEN 1.0 ELSE 0.0 END)", 6
           )} AS frac_pos
    FROM lab GROUP BY 1 ORDER BY bin
    """,
    doc="Classifier-evaluation op: the RELIABILITY DIAGRAM "
    "(calibration bins) of the NB quality classifier on its held-out "
    "split — posterior probability bucketed into 10 equal-width bins "
    "(the top bin closed at 1.0), per-bin count, mean predicted "
    "confidence, and empirical positive rate. A well-calibrated "
    "scorer puts frac_pos ~ avg_conf per bin; NB's independence "
    "assumption typically over-confidences the extremes — exactly "
    "what a selection pipeline must know before thresholding on "
    "prob. One grouped aggregation over the bounded held-out set, "
    "zero windows; probs are dround(6)-pinned upstream so binning "
    "is engine-identical. Pairs with classifier_auc as the eval "
    "suite of the model-based rung. Reference analog: none.",
    parts=8,
)
def q_classifier_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        nb_prior,
        nb_quality_model,
        nb_quality_scores,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("toks"),
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    train = base.filter(h < "cd")
    held_out = base.filter(h >= "cd")
    # materialize the ≤4096-row model + 1-row prior ONCE (r12): the
    # scorer consumes the model twice (dflt agg + broadcast) and the
    # prior once, and un-checkpointed each consumer re-executes the
    # corpus-sized train-gram aggregation under it — 3-4 train passes
    # for tables that are O(model), not O(corpus)
    model = nb_quality_model(train, "toks", "is_t").localCheckpoint()
    prior = nb_prior(train, "is_t").localCheckpoint()
    scores = nb_quality_scores(held_out, "toks", "doc_id", model, prior)
    lab = scores.join(held_out.select("doc_id", "is_t"), "doc_id")
    return (
        lab.groupBy(
            F.least(F.floor(F.col("prob") * 10), F.lit(9))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.avg("prob"), 6).alias("avg_conf"),
            dround(
                F.avg(F.when(F.col("is_t"), 1.0).otherwise(0.0)), 6
            ).alias("frac_pos"),
        )
        .orderBy("bin")
    )


@_register(
    "stream_nb_score_batch_eq",
    f"""
    WITH d AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), n AS (SELECT count(*) AS n FROM d
    ), thr AS (
      SELECT doc_id AS p60 FROM d ORDER BY doc_id
      OFFSET (SELECT CAST(floor(n * 0.6) AS BIGINT) FROM n) LIMIT 1
    ), seed AS (
      SELECT * FROM d WHERE doc_id < (SELECT p60 FROM thr)
    ), inc AS (
      SELECT * FROM d WHERE doc_id >= (SELECT p60 FROM thr)
    ), {_nb_ctes("seed")},
    ig AS ({_GRAMS_SQL.format(src="inc")}
    ), ib AS (
      SELECT doc_id, substr(md5(g), 1, 3) AS bucket FROM ig
    ), sc AS (
      SELECT doc_id, count(*) AS n_grams,
             sum(coalesce(wgt, dflt)) AS sw
      FROM ib LEFT JOIN nbm USING (bucket) CROSS JOIN nbd
      GROUP BY doc_id
    )
    SELECT doc_id, n_grams,
           {sql_dround("prior + sw", 6)} AS logodds,
           {sql_dround(
               "1.0 / (1.0 + exp(-(" + sql_dround("prior + sw", 6)
               + ")))", 6)} AS prob
    FROM sc CROSS JOIN nbp ORDER BY doc_id
    """,
    doc="Streaming rung 15 — ONLINE quality classification: the NB "
    "model + class prior train once on the seed corpus (first 60% "
    "by doc_id, lang='en' positives) and are FROZEN, then two "
    "id-ordered increments land as parquet drained by separate "
    "availableNow runs sharing one checkpoint, foreachBatch scoring "
    "each arriving doc against the frozen broadcast model — the "
    "rung-13 delivery shape with the selection tier's SECOND model "
    "family (a production funnel streams docs through BOTH the DSIR "
    "weights and the quality classifier). What the hash gates: "
    "exactly-once micro-batch delivery, model/prior freshness (a "
    "batch-2 re-train breaks the weights AND the prior), and the "
    "unseen-bucket backoff through the classifier's dflt path. The "
    "streamed per-doc (n_grams, logodds, prob) rows must hash-match "
    "a full DuckDB recompute of seed-model + increment scoring. "
    "Scale: scoring is two 1-row broadcasts + one <=4096-row "
    "broadcast + a per-doc agg per micro-batch; model and prior "
    "persist across batches, released in the finally.",
    parts=8,
)
def q_stream_nb_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        nb_prior,
        nb_quality_model,
        nb_quality_scores,
    )
    from yahoofinancedatalake_spark.queries._registry import (  # noqa: PLC0415
        _await_stream,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("toks"),
    )
    n = base.count()
    p60 = (
        base.select("doc_id")
        .orderBy("doc_id")
        .offset(int(n * 0.6))
        .limit(1)
        .collect()[0][0]
    )
    seed = base.filter(F.col("doc_id") < p60)
    incs = [
        base.filter(
            (F.col("doc_id") >= p60) & (F.col("doc_id") % 2 == 0)
        ),
        base.filter(
            (F.col("doc_id") >= p60) & (F.col("doc_id") % 2 == 1)
        ),
    ]

    root = tempfile.mkdtemp(prefix="stream_nb_")
    indir = f"{root}/incoming"
    outdir = f"{root}/scored"
    ckpt = f"{root}/ckpt"
    os.makedirs(indir)
    model = nb_quality_model(seed, "toks", "is_t").persist()
    prior = nb_prior(seed, "is_t").persist()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # batch-derived reduce width — see q_stream_dsir_score
        width = max(1, len(batch_df.inputFiles()))
        nb_quality_scores(
            batch_df, "toks", "doc_id", model, prior
        ).coalesce(width).write.mode("append").parquet(outdir)

    try:
        model.count()  # materialize BEFORE any increment lands
        prior.count()
        for inc in incs:
            inc.coalesce(1).write.mode("append").parquet(indir)
            q = (
                spark.readStream.schema(base.schema)
                .parquet(indir)
                .writeStream.foreachBatch(_process)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            _await_stream(q)
        rows = spark.read.parquet(outdir).collect()
    finally:
        model.unpersist()
        prior.unpersist()
        shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        rows,
        schema="doc_id bigint, n_grams bigint, logodds double,"
        " prob double",
    ).orderBy("doc_id")


@_register(
    "prep_stage_counts_hybrid",
    f"""
    WITH RECURSIVE
    {_PREP_Q_EX_CTES},
    {_winnow_ctes("ex")},
    dfreq AS (SELECT fp, count(*) AS df FROM sel GROUP BY fp),
    kept AS (
      SELECT sel.doc_id, sel.fp FROM sel
      JOIN dfreq USING (fp) WHERE df BETWEEN 2 AND {_WIN_CAP}
    ),
    wp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    wnd AS (
      SELECT id_a, id_b FROM wp
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(shared AS DOUBLE) / least(sa.n_fp, sb.n_fp)
            >= {_HYB_T}
    ),
    {_cc_decontam_ctes("wnd")}
    SELECT * FROM (
      SELECT 1 AS stage_idx, 'quality_gate' AS stage,
             (SELECT count(*) FROM documents) AS rows_in,
             (SELECT count(*) FROM q) AS rows_out,
             (SELECT count(*) FROM documents) - (SELECT count(*) FROM q)
               AS dropped
      UNION ALL SELECT 2, 'exact_dedup',
             (SELECT count(*) FROM q), (SELECT count(*) FROM ex),
             (SELECT count(*) FROM q) - (SELECT count(*) FROM ex)
      UNION ALL SELECT 3, 'near_dedup_hybrid',
             (SELECT count(*) FROM ex), (SELECT count(*) FROM dd),
             (SELECT count(*) FROM ex) - (SELECT count(*) FROM dd)
      UNION ALL SELECT 4, 'decontaminate',
             (SELECT count(*) FROM dd), (SELECT count(*) FROM cl),
             (SELECT count(*) FROM dd) - (SELECT count(*) FROM cl)
    ) ORDER BY stage_idx
    """,
    doc="The composed prep pipeline with near_dup_backend='hybrid' "
    "(the r11 LSH-proposes/winnow-decides matcher at its gated "
    f"parameters, accept threshold {_HYB_T}): prep.py's quality_gate "
    "→ exact_stage → near_dup_stage(backend='hybrid') → "
    "decontaminate run in sequence, per-stage audit value-hashed "
    "against one DuckDB statement. The oracle is the pure winnow "
    "recompute at the hybrid's threshold — valid because at "
    f"{_HYB_T} the hybrid EQUALS the pure winnow policy on this "
    "corpus (the hybrid_near_dup gate's measured premise, which "
    "holds a fortiori on the exact-dedup survivor subset), so the "
    "composition gate doubles as a standing re-verification of that "
    "equality inside the full pipeline. Stages 5-7 are backend-"
    "independent code already composed under prep_stage_counts. "
    "Scale: inherits the hybrid matcher's posture — LSH-bounded "
    "candidate volume, array-intersect verify moving |candidates| "
    "rows; the matcher's internal fingerprint persist is released "
    "in the query's finally.",
    parts=8,
)
def q_prep_stage_counts_hybrid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yahoofinancedatalake_spark import prep  # noqa: PLC0415

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    eval_set = docs.filter(F.col("doc_id") % 37 == 0)

    persisted: list = []

    def _stage(frame):
        persisted.append(frame.persist())
        return persisted[-1]

    try:
        n_input = docs.count()
        gated = _stage(prep.quality_gate(docs))
        n_gate = gated.count()
        exact = _stage(prep.exact_stage(gated))
        n_exact = exact.count()
        deduped = _stage(prep.near_dup_stage(exact, backend="hybrid"))
        n_dedup = deduped.count()
        n_clean = prep.decontaminate(deduped, eval_set).count()
    finally:
        for frame in persisted:
            frame.unpersist()
        # the hybrid matcher persists its fingerprint table
        # internally (cache=True, caller-owned release)
        spark.catalog.clearCache()

    stages = [
        (1, "quality_gate", n_input, n_gate),
        (2, "exact_dedup", n_gate, n_exact),
        (3, "near_dedup_hybrid", n_exact, n_dedup),
        (4, "decontaminate", n_dedup, n_clean),
    ]
    rows = [(i, s, a, b, a - b) for i, s, a, b in stages]
    return spark.createDataFrame(
        rows, schema="stage_idx int, stage string, rows_in bigint, "
        "rows_out bigint, dropped bigint"
    ).orderBy("stage_idx")


@_register(
    "data_card",
    f"""
    WITH d AS (
      SELECT source, lang, n_chars, text,
             len({_WORD_TOKS_SQL}) AS n_toks,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fp
      FROM documents
    )
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           {sql_dround("avg(n_chars)", 4)} AS avg_chars,
           {sql_dround(
               "avg(CASE WHEN n_toks >= " + str(_PREP_MIN_TOKENS)
               + " AND n_chars >= " + str(_PREP_MIN_CHARS)
               + " THEN 1.0 ELSE 0.0 END)", 6)} AS quality_pass_frac,
           {sql_dround(
               "count(DISTINCT fp)::DOUBLE / count(*)", 6
           )} AS distinct_frac,
           {sql_dround("quantile_cont(n_chars, 0.5)", 4)} AS p50_chars,
           {sql_dround("quantile_cont(n_chars, 0.9)", 4)} AS p90_chars
    FROM d GROUP BY source, lang ORDER BY source, lang
    """,
    doc="Training-data op: the DATA CARD — the per-(source, lang) "
    "datasheet a training-data pipeline publishes with every corpus "
    "release (Gebru et al.'s Datasheets; the table every dataset "
    "paper's composition section carries): doc and token counts, "
    "mean chars, the fraction passing the prep quality gate (the "
    "exact MIN_TOKENS/MIN_CHARS rule prep.py applies), the "
    "exact-dedup distinct fraction (distinct normalized-text md5 "
    "over docs — 1 minus it is the duplicate rate the dedup stage "
    "will reclaim), and interpolated length percentiles (the "
    "percentiles_price cross-engine pattern). ONE grouped "
    "aggregation over the corpus — every statistic is a map-side "
    "partial except the exact distinct and percentiles, whose 100 TB "
    "twins are approx_count_distinct / approx_percentile (same call "
    "shape, documented on their gated queries). Reference analog: "
    "none — the reference publishes no corpus datasheet.",
    parts=8,
)
def q_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        normalized_text,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    d = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(_word_toks()).alias("n_toks"),
        F.md5(normalized_text(F.col("text"))).alias("fp"),
    )
    pct = F.percentile("n_chars", F.array(F.lit(0.5), F.lit(0.9)))
    qpass = F.when(
        (F.col("n_toks") >= _PREP_MIN_TOKENS)
        & (F.col("n_chars") >= _PREP_MIN_CHARS),
        1.0,
    ).otherwise(0.0)
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            dround(F.avg("n_chars"), 4).alias("avg_chars"),
            dround(F.avg(qpass), 6).alias("quality_pass_frac"),
            dround(
                F.countDistinct("fp").cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("distinct_frac"),
            dround(F.element_at(pct, 1), 4).alias("p50_chars"),
            dround(F.element_at(pct, 2), 4).alias("p90_chars"),
        )
        .orderBy("source", "lang")
    )


#: PR-sweep thresholds (posterior deciles).
_PR_THRESHOLDS = [round(0.1 * i, 1) for i in range(1, 10)]


@_register(
    "classifier_pr_points",
    f"""
    WITH d AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), tr AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) < 'cd'
    ), ho AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) >= 'cd'
    ), {_nb_ctes("tr")},
    {_NB_HO_SCORE_CTES},
    lab AS (
      SELECT s.prob, ho.is_t FROM scored s JOIN ho USING (doc_id)
    ), pts AS (
      SELECT t, 
             sum(CASE WHEN prob >= t AND is_t THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN prob >= t AND NOT is_t THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN prob < t AND is_t THEN 1 ELSE 0 END) AS fn
      FROM lab CROSS JOIN (
        SELECT unnest({_PR_THRESHOLDS!r}::DOUBLE[]) AS t)
      GROUP BY t
    )
    SELECT t AS threshold, CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
           {sql_dround(
               "tp::DOUBLE / greatest(tp + fp, 1)", 6)} AS precision,
           {sql_dround(
               "tp::DOUBLE / greatest(tp + fn, 1)", 6)} AS recall,
           {sql_dround(
               "CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0"
               " ELSE 2.0 * tp / (2 * tp + fp + fn) END", 6)} AS f1
    FROM pts ORDER BY threshold
    """,
    doc="Classifier-evaluation op: the PRECISION/RECALL SWEEP of the "
    "NB quality classifier on its held-out split at nine posterior "
    "deciles — tp/fp/fn counts, precision, recall, and F1 (computed "
    "in the 2tp/(2tp+fp+fn) form, zero-guarded) per threshold: the "
    "table that turns classifier_calibration's reliability read "
    "into an operating-point choice (FineWeb-edu ships exactly this "
    "when it picks its int-score cutoff). Threshold comparisons are "
    "engine-identical because prob is dround(6)-pinned upstream and "
    "the decile literals are exact binary64 on both engines. Plan: "
    "the bounded held-out scores explode 9x (one row per threshold) "
    "into ONE grouped aggregation — no window, no join beyond the "
    "label attach; a corpus-sized sweep would move to the "
    "cumulative-histogram form. Completes the eval suite: "
    "classifier_auc (ranking), classifier_calibration "
    "(probability quality), classifier_pr_points (thresholding).",
    parts=8,
)
def q_classifier_pr_points(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        nb_prior,
        nb_quality_model,
        nb_quality_scores,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("toks"),
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    train = base.filter(h < "cd")
    held_out = base.filter(h >= "cd")
    # materialize the ≤4096-row model + 1-row prior ONCE (r12): the
    # scorer consumes the model twice (dflt agg + broadcast) and the
    # prior once, and un-checkpointed each consumer re-executes the
    # corpus-sized train-gram aggregation under it — 3-4 train passes
    # for tables that are O(model), not O(corpus)
    model = nb_quality_model(train, "toks", "is_t").localCheckpoint()
    prior = nb_prior(train, "is_t").localCheckpoint()
    scores = nb_quality_scores(held_out, "toks", "doc_id", model, prior)
    lab = scores.join(held_out.select("doc_id", "is_t"), "doc_id")
    exploded = lab.withColumn(
        "threshold",
        F.explode(F.array(*[F.lit(t) for t in _PR_THRESHOLDS])),
    )
    hit = F.col("prob") >= F.col("threshold")
    pts = exploded.groupBy("threshold").agg(
        F.sum(F.when(hit & F.col("is_t"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(hit & ~F.col("is_t"), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(~hit & F.col("is_t"), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
    )
    return pts.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        dround(
            F.col("tp").cast("double")
            / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)),
            6,
        ).alias("precision"),
        dround(
            F.col("tp").cast("double")
            / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)),
            6,
        ).alias("recall"),
        dround(
            F.when(
                2 * F.col("tp") + F.col("fp") + F.col("fn") == 0,
                F.lit(0.0),
            ).otherwise(
                2.0 * F.col("tp")
                / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
            ),
            6,
        ).alias("f1"),
    ).orderBy("threshold")


# ---------------------------------------------------------------------------
# r12: paragraph-granularity dedup (Lee et al. 2022 / Dolma shape) —
# sub-document member of the dedup ladder (VERDICT r11 #2).
# ---------------------------------------------------------------------------

#: paragraph unit for the no-newline synthetic corpus: non-overlapping
#: word windows (production corpora split on blank lines — the
#: operator's ``tokens`` hook), the span_dedup_c4 convention.
_PARA_W = 20


@_register(
    "paragraph_dedup",
    f"""
    WITH toks AS (
      SELECT doc_id, {_WORD_TOKS_SQL} AS w FROM documents
    ), base AS (
      SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0
    ), spans AS (
      SELECT doc_id, st // {_PARA_W} AS pos,
             array_to_string(w[st + 1 : st + {_PARA_W}], ' ') AS span
      FROM (SELECT doc_id, w, n,
                   unnest(generate_series(0, n - 1, {_PARA_W})) AS st
            FROM base)
    ), flags AS (
      SELECT doc_id, pos, span,
             row_number() OVER (PARTITION BY md5(span)
                                ORDER BY doc_id, pos) AS rn
      FROM spans
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN rn > 1 THEN length(span) ELSE 0 END)
             AS BIGINT) AS chars_removed,
           coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' '
                               ORDER BY pos), '') AS new_text
    FROM flags GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Training-data op: PARAGRAPH-granularity dedup — the last "
    "published member of the dedup ladder (Lee et al. 2022, "
    "arXiv:2107.06499; Dolma's paragraph dedup, arXiv:2402.00159): "
    "every current matcher (exact/MinHash/winnow/hybrid/SemDeDup) "
    "decides whole DOCUMENTS; this keeps the FIRST occurrence of "
    "each duplicated paragraph corpus-wide (deterministic min "
    "(doc_id, position) — the exact_dedup survivor convention), "
    "drops every later occurrence, and REASSEMBLES each doc from "
    "its surviving paragraphs, reporting paragraphs kept and chars "
    f"removed per doc. Unit = non-overlapping {_PARA_W}-word windows "
    "(this corpus has no newlines — span_dedup_c4's convention; "
    "production splits on blank lines via the operator's tokens "
    "hook). Distinct from span_dedup_c4: C4 removes EVERY occurrence "
    "of corpus-frequent spans; this keeps exactly one. Plan: winner "
    "election is a map-side-partial min over (md5, id, pos) rows — "
    "paragraph text never shuffles; a viral boilerplate paragraph "
    "collapses per task before the exchange (the oracle's "
    "row_number window form was rejected engine-side: no partial "
    "agg, one hot task per mega-paragraph); reassembly re-derives "
    "spans map-side from the per-doc kept-position array, so the "
    "only text movement is the final id-equi-join (exchange-free "
    "bucketed at rest). prep.py exposes it as paragraph_stage / "
    "run_prep(paragraph_level=True). Reference analog: none.",
    parts=8,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        paragraph_dedup,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return paragraph_dedup(
        docs, "text", "doc_id", para_words=_PARA_W, tokens=_word_toks()
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# r12: corpus-scale classifier evaluation twins (VERDICT r11 #3) —
# the cumulative-histogram forms of classifier_auc /
# classifier_pr_points, hash-equal to the exact ops but with zero
# unpartitioned windows and every shuffle bounded by the number of
# DISTINCT dround(6) scores, not the number of documents.
# ---------------------------------------------------------------------------


def _nb_held_out_scored(spark: SparkSession, sf_dir: str):
    """Shared eval harness: train the NB classifier on the 80% split,
    score the held-out 20%, return (logodds, prob, is_t) rows — the
    exact classifier_auc/pr_points preamble, factored."""
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        nb_prior,
        nb_quality_model,
        nb_quality_scores,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        _word_toks().alias("toks"),
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    train = base.filter(h < "cd")
    held_out = base.filter(h >= "cd")
    # materialize the ≤4096-row model + 1-row prior ONCE (r12): the
    # scorer consumes the model twice (dflt agg + broadcast) and the
    # prior once, and un-checkpointed each consumer re-executes the
    # corpus-sized train-gram aggregation under it — 3-4 train passes
    # for tables that are O(model), not O(corpus)
    model = nb_quality_model(train, "toks", "is_t").localCheckpoint()
    prior = nb_prior(train, "is_t").localCheckpoint()
    scores = nb_quality_scores(held_out, "toks", "doc_id", model, prior)
    return scores.join(held_out.select("doc_id", "is_t"), "doc_id")


@_register(
    "classifier_auc_scaled",
    f"""
    WITH d AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), tr AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) < 'cd'
    ), ho AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) >= 'cd'
    ), {_nb_ctes("tr")},
    {_NB_HO_SCORE_CTES},
    lab AS (
      SELECT s.logodds, ho.is_t FROM scored s JOIN ho USING (doc_id)
    ), r AS (
      SELECT is_t,
             rank() OVER (ORDER BY logodds)
               + (count(*) OVER (PARTITION BY logodds) - 1) / 2.0 AS ar
      FROM lab
    ), a AS (
      SELECT sum(CASE WHEN is_t THEN ar END) AS rs,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS nn
      FROM r
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           CASE WHEN np * nn = 0 THEN NULL ELSE {sql_dround(
               "(rs - np * (np + 1) / 2.0) / (np * nn)", 6)} END AS auc
    FROM a
    """,
    doc="Corpus-SCALE ROC-AUC of the NB quality classifier — the "
    "cumulative-histogram twin of classifier_auc (VERDICT r11 #3), "
    "hash-equal to the exact rank-sum form on any eval set (the "
    "oracle IS classifier_auc's) but computable over a corpus-sized "
    "one: scores are dround(6)-pinned, so group by score into a "
    "(score, n_pos, n_neg) histogram (map-side partial; shuffle "
    "keyed by DISTINCT scores, not docs), then AUC = sum over "
    "scores of pos_s * (negs_below + neg_s/2) / (np*nn) — exactly "
    "the tie-corrected Mann-Whitney sum regrouped by tie class. "
    "Cumulation is two-level with ZERO unpartitioned windows: "
    "within-bucket running sums use a window PARTITIONED by "
    "floor(score); cross-bucket offsets come from the tiny "
    "per-bucket totals table via sequence-explode + groupBy (B² "
    "rows, B = O(score range)) — an equi-join shape, because the "
    "bucket_lo < bucket_hi triangular join would plan as the "
    "BroadcastNestedLoopJoin the plan suite bans. Single-class "
    "split pinned to auc NULL on both engines. Reference analog: "
    "none.",
    parts=8,
)
def q_classifier_auc_scaled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    lab = _nb_held_out_scored(spark, sf_dir)
    hist = (
        lab.groupBy("logodds")
        .agg(
            F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("pos"),
            F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("neg"),
        )
        .withColumn("bucket", F.floor("logodds").cast("bigint"))
        # stage boundary (the selection_funnel convention): hist is
        # the BOUNDED distinct-score histogram but embeds the whole
        # NB train+score subtree; bt/lower/cum each reference it, so
        # un-materialized the subtree re-executes 3x (plan audit: 90
        # exchanges vs the exact form's 28 before this line)
        .localCheckpoint()
    )
    bt = hist.groupBy("bucket").agg(F.sum("neg").alias("neg_tot"))
    # cross-bucket offsets WITHOUT a window or an inequality join (a
    # bucket_lo < bucket_hi join would plan as the BNLJ the plan
    # suite bans): each bucket total explodes to every HIGHER bucket
    # id up to the max (a 1-row aggregate equi-joined in via the
    # data-derived const key), then one groupBy sums the offsets —
    # O(B²) rows for B = O(score range) buckets, all equi-join/agg
    from yahoofinancedatalake_spark.queries._registry import (  # noqa: PLC0415
        _const_key,
    )

    maxb = bt.agg(F.max("bucket").alias("mb")).withColumn(
        "__k", _const_key(F.col("mb"))
    )
    lower = (
        bt.withColumn("__k", _const_key(F.col("bucket")))
        .join(F.broadcast(maxb), "__k")
        .filter(F.col("bucket") < F.col("mb"))
        .select(
            F.explode(
                F.sequence(F.col("bucket") + 1, F.col("mb"))
            ).alias("bucket"),
            "neg_tot",
        )
        .groupBy("bucket")
        .agg(F.sum("neg_tot").alias("neg_below_bucket"))
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("logodds")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        hist.join(F.broadcast(lower), "bucket", "left")
        .withColumn(
            "cumneg",
            F.coalesce("neg_below_bucket", F.lit(0))
            + F.coalesce(F.sum("neg").over(w), F.lit(0)),
        )
    )
    a = cum.agg(
        F.sum(
            F.col("pos") * (F.col("cumneg") + F.col("neg") / 2.0)
        ).alias("rs"),
        F.sum("pos").alias("np"),
        F.sum("neg").alias("nn"),
    )
    return a.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        F.when(F.col("np") * F.col("nn") == 0, F.lit(None)).otherwise(
            dround(
                F.col("rs") / (F.col("np") * F.col("nn")), 6
            )
        ).alias("auc"),
    )


@_register(
    "classifier_pr_curve",
    f"""
    WITH d AS (
      SELECT doc_id, lang = 'en' AS is_t, {_WORD_TOKS_SQL} AS t
      FROM documents
    ), tr AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) < 'cd'
    ), ho AS (
      SELECT * FROM d WHERE substr(md5(doc_id::VARCHAR), 1, 2) >= 'cd'
    ), {_nb_ctes("tr")},
    {_NB_HO_SCORE_CTES},
    lab AS (
      SELECT s.prob, ho.is_t FROM scored s JOIN ho USING (doc_id)
    ), pts AS (
      SELECT t, 
             sum(CASE WHEN prob >= t AND is_t THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN prob >= t AND NOT is_t THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN prob < t AND is_t THEN 1 ELSE 0 END) AS fn
      FROM lab CROSS JOIN (
        SELECT unnest({_PR_THRESHOLDS!r}::DOUBLE[]) AS t)
      GROUP BY t
    )
    SELECT t AS threshold, CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
           {sql_dround(
               "tp::DOUBLE / greatest(tp + fp, 1)", 6)} AS precision,
           {sql_dround(
               "tp::DOUBLE / greatest(tp + fn, 1)", 6)} AS recall,
           {sql_dround(
               "CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0"
               " ELSE 2.0 * tp / (2 * tp + fp + fn) END", 6)} AS f1
    FROM pts ORDER BY threshold
    """,
    doc="Corpus-SCALE precision/recall sweep — the cumulative-"
    "histogram twin of classifier_pr_points (VERDICT r11 #3), "
    "hash-equal to the exact form (the oracle IS "
    "classifier_pr_points's) but sized for a corpus: instead of "
    "exploding every held-out DOC 9x, the dround(6)-pinned "
    "posteriors first collapse into a (prob, n_pos, n_neg) "
    "histogram (map-side partial, distinct-score-keyed shuffle); "
    "the 9-threshold explode then multiplies HISTOGRAM rows, and "
    "tp/fp/fn per threshold are one grouped aggregation with fn "
    "counted from the sub-threshold side of the same pass. No "
    "window anywhere, no range join (an interval join of scores x "
    "thresholds would plan as the BroadcastNestedLoopJoin the plan "
    "suite bans). Reference analog: none.",
    parts=8,
)
def q_classifier_pr_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lab = _nb_held_out_scored(spark, sf_dir)
    hist = lab.groupBy("prob").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("neg"),
    )
    exploded = hist.withColumn(
        "threshold",
        F.explode(F.array(*[F.lit(t) for t in _PR_THRESHOLDS])),
    )
    hit = F.col("prob") >= F.col("threshold")
    pts = exploded.groupBy("threshold").agg(
        F.sum(F.when(hit, F.col("pos")).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(hit, F.col("neg")).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(~hit, F.col("pos")).otherwise(0))
        .cast("bigint")
        .alias("fn"),
    )
    return pts.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        dround(
            F.col("tp").cast("double")
            / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)),
            6,
        ).alias("precision"),
        dround(
            F.col("tp").cast("double")
            / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)),
            6,
        ).alias("recall"),
        dround(
            F.when(
                2 * F.col("tp") + F.col("fp") + F.col("fn") == 0,
                F.lit(0.0),
            ).otherwise(
                2.0 * F.col("tp")
                / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
            ),
            6,
        ).alias("f1"),
    ).orderBy("threshold")


# ---------------------------------------------------------------------------
# r12: mixture planning from the datasheet (VERDICT r11 #5) —
# data_card token counts → UniMax epochs-capped allocation → the
# per-group sampling-rate table a training-run config consumes.
# ---------------------------------------------------------------------------


@_register(
    "mixture_plan",
    f"""
    WITH t AS (
      SELECT source, lang,
             CAST(sum(len({_WORD_TOKS_SQL})) AS BIGINT) AS n_toks
      FROM documents GROUP BY source, lang
    ), tot AS (
      SELECT CAST(sum(n_toks) AS BIGINT) AS tt, count(*) AS ng FROM t
    ), g AS (
      SELECT source, lang, source || '/' || lang AS gkey, n_toks,
             floor(1.6 * tt) AS budget, 2.0 * n_toks AS cap, ng
      FROM t CROSS JOIN tot
    ), k AS (
      SELECT *,
        (budget - (sum(cap) OVER (ORDER BY cap, gkey) - cap))
          / (ng - row_number() OVER (ORDER BY cap, gkey) + 1) AS lvl
      FROM g
    ), lv AS (SELECT max(lvl) AS l FROM k),
    al AS (
      SELECT source, lang, n_toks,
             {sql_dround("cap", 4)} AS cap,
             {sql_dround("least(cap, l)", 4)} AS alloc,
             {sql_dround(
                 "least(cap, l) / greatest(n_toks, 1)", 6)} AS epochs
      FROM k CROSS JOIN lv
    ), s AS (SELECT sum(alloc) AS ta FROM al)
    SELECT source, lang, n_toks AS n_tokens, cap, alloc, epochs,
           {sql_dround("alloc / ta", 6)} AS weight
    FROM al CROSS JOIN s ORDER BY source, lang
    """,
    doc="Training-data op: the MIXTURE PLAN — wires the data card's "
    "per-(source, lang) token counts into the UniMax budget-"
    "constrained waterfilling (unimax_allocation at its gated "
    "parameters: budget 1.6x the corpus, 2-epoch cap) and emits the "
    "table a training-run config actually consumes: per-group "
    "allocated tokens, epochs (= the group's sampling rate over its "
    "own data), and normalized mixture weight (alloc / total alloc "
    "— ratio of already-dround(4)-pinned values, exact IEEE on both "
    "engines). Closes the datasheet→plan loop (VERDICT r11 #5): "
    "data_card reports what the corpus IS, this says what to TRAIN "
    "on. Plan: ONE map-side-partial grouped aggregation over the "
    "corpus; everything downstream (waterfilling window, total-"
    "alloc const-key join) runs on the n_groups-row frame — "
    "driver-scale by construction, the same bounded shape as every "
    "production mixture table (UniMax's own is ~100 languages). "
    "The composite group key is source || '/' || lang so the "
    "waterfilling tie-break is engine-identical. Reference analog: "
    "none.",
    parts=8,
)
def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yahoofinancedatalake_spark.operators.selection import (  # noqa: PLC0415
        unimax_allocation,
    )
    from yahoofinancedatalake_spark.queries._registry import (  # noqa: PLC0415
        _const_key,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    counts = (
        docs.select(
            F.concat_ws("/", "source", "lang").alias("gkey"),
            F.size(_word_toks()).alias("nt"),
        )
        .groupBy("gkey")
        .agg(F.sum("nt").cast("bigint").alias("n_toks"))
    )
    # stage boundary: al is the ~n_groups-row allocation but embeds
    # the corpus token aggregation; the total-alloc agg and the
    # output projection both reference it (un-materialized, the
    # corpus agg would run twice — plan audit: 15 exchanges vs
    # unimax_mixture's 7)
    al = unimax_allocation(counts, "gkey").localCheckpoint()
    tot = al.agg(F.sum("alloc").alias("ta")).withColumn(
        "__k", _const_key(F.col("ta"))
    )
    return (
        al.withColumn("__k", _const_key(F.col("gkey")))
        .join(F.broadcast(tot), "__k")
        .select(
            F.split_part(F.col("gkey"), F.lit("/"), F.lit(1))
            .alias("source"),
            F.split_part(F.col("gkey"), F.lit("/"), F.lit(2))
            .alias("lang"),
            F.col("n_toks").alias("n_tokens"),
            "cap",
            "alloc",
            "epochs",
            dround(F.col("alloc") / F.col("ta"), 6).alias("weight"),
        )
        .orderBy("source", "lang")
    )


# ---------------------------------------------------------------------------
# r12: streaming rung 16 — incremental HYBRID near-dup against
# persisted state (VERDICT r11 #4): the hybrid matcher gets the same
# O(batch) indexed-probe mode incremental_dedup_gate proves for
# MinHash candidates, now through the full propose→verify stack.
# ---------------------------------------------------------------------------


@_register(
    "stream_hybrid_dedup_batch_eq",
    "SELECT 'incremental_hybrid_equals_full' AS metric, TRUE AS passed",
    doc="Streaming rung 16 — incremental HYBRID near-dup: documents "
    "split deterministically (xxhash64 pmod 10: 80% history, 20% "
    "daily batch); history lands its three state tables ONCE — the "
    "LSH (id, band, bucket) index, the exploded winnow fingerprint "
    "index, and the per-fingerprint document frequencies — and the "
    "batch streams in as parquet, probed by foreachBatch via "
    "incremental_hybrid_pairs: O(batch) shingle/minhash/winnow + "
    "indexed bucket join for candidates + id-semi-joined fingerprint "
    "arrays for the verify stage; history text is NEVER rescanned. "
    "After the probe the batch's band/fp/df rows are appended+merged "
    "back into state (the daily-ingest loop), and a second "
    "availableNow drain under the SAME checkpoint must deliver "
    "nothing (exactly-once). Gate: the streamed accepted pairs must "
    "EQUAL the full batch hybrid_near_dup_pairs over history ∪ batch "
    "minus the already-known old×old pairs — empty symmetric "
    "difference, passed=TRUE hash-matches the constant oracle only "
    "then. Multi-epoch semantics are the operator's documented "
    "contract (decisions under state-so-far; periodic full recompute "
    "is the compaction). Scale: turns daily hybrid dedup at 100 TB "
    "from O(corpus) re-fingerprint into O(batch) probe against "
    "bucketed state tables.",
    parts=8,
)
def q_stream_hybrid_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from yahoofinancedatalake_spark.operators.dedup import (  # noqa: PLC0415
        hybrid_near_dup_pairs,
        incremental_hybrid_pairs,
        minhash_band_table,
        winnow_fingerprints,
    )
    from yahoofinancedatalake_spark.queries._registry import (  # noqa: PLC0415
        _await_stream,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    bucket = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(10))
    hist = docs.filter(bucket < 8)
    batch = docs.filter(bucket >= 8)

    root = tempfile.mkdtemp(prefix="stream_hybrid_dedup_")
    band_dir = f"{root}/state_band"
    fpi_dir = f"{root}/state_fpi"
    fpd_dir = f"{root}/state_fpd"
    indir = f"{root}/incoming"
    outdir = f"{root}/pairs"
    ckpt = f"{root}/ckpt"

    try:
        # land history state once (the seed run's output)
        minhash_band_table(hist, "text", "doc_id").write.parquet(band_dir)
        hist_fps = winnow_fingerprints(hist, "text", "doc_id").persist()
        hist_fps.select(
            "doc_id", F.explode("fps").alias("fp")
        ).write.parquet(fpi_dir)
        spark.read.parquet(fpi_dir).groupBy("fp").agg(
            F.count("*").alias("df")
        ).write.parquet(fpd_dir)
        hist_fps.unpersist()

        def _probe(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            band = spark.read.parquet(band_dir)
            fpi = spark.read.parquet(fpi_dir)
            fpd = spark.read.parquet(fpd_dir)
            # compute the batch's band table and winnow fingerprints
            # ONCE (r13) and share them between the probe and the
            # state appends — previously each extraction ran twice
            # per micro-batch (once inside incremental_hybrid_pairs,
            # once for the append)
            bband = minhash_band_table(
                batch_df, "text", "doc_id"
            ).persist()
            bfps_arr = winnow_fingerprints(
                batch_df, "text", "doc_id"
            ).persist()
            pairs = incremental_hybrid_pairs(
                batch_df, band, fpi, fpd, "text", "doc_id",
                new_bands=bband, new_fps=bfps_arr,
            )
            pairs.write.mode("append").parquet(outdir)
            # daily-ingest state update: append the batch's band and
            # fingerprint rows; merge its df counts into a new df
            # version (read-modify-write of the SMALL (fp, df) table)
            bband.write.mode("append").parquet(band_dir)
            bfps = bfps_arr.select("doc_id", F.explode("fps").alias("fp"))
            bfps.write.mode("append").parquet(fpi_dir)
            merged = (
                fpd.unionByName(
                    bfps.groupBy("fp").agg(F.count("*").alias("df"))
                )
                .groupBy("fp")
                .agg(F.sum("df").alias("df"))
            )
            merged.write.mode("overwrite").parquet(f"{root}/fpd_next")
            spark.catalog.clearCache()

        batch.coalesce(1).write.parquet(indir)
        for _drain in range(2):  # second drain: exactly-once replay
            q = (
                spark.readStream.schema(batch.schema)
                .parquet(indir)
                .writeStream.foreachBatch(_probe)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            _await_stream(q)

        streamed = spark.read.parquet(outdir).select("id_a", "id_b")
        full = hybrid_near_dup_pairs(docs, "text", "doc_id")
        a_old = hist.select(F.col("doc_id").alias("id_a"))
        b_old = hist.select(F.col("doc_id").alias("id_b"))
        expected = (
            full.join(
                F.broadcast(a_old.withColumn("__ha", F.lit(1))),
                "id_a",
                "left",
            )
            .join(
                F.broadcast(b_old.withColumn("__hb", F.lit(1))),
                "id_b",
                "left",
            )
            .filter(F.col("__ha").isNull() | F.col("__hb").isNull())
            .select("id_a", "id_b")
            # materialize the small expected-pair table ONCE (r12):
            # the symmetric diff consumes each side twice, and
            # un-checkpointed the second consumption re-ran the whole
            # full-corpus hybrid matcher (the gate's most expensive
            # subtree) a second time
            .localCheckpoint()
        )
        sym_diff = expected.exceptAll(streamed).unionByName(
            streamed.exceptAll(expected)
        )
        n_bad = sym_diff.count()
    finally:
        spark.catalog.clearCache()
        shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        [("incremental_hybrid_equals_full", n_bad == 0)],
        schema="metric string, passed boolean",
    )


# ---------------------------------------------------------------------------
# r12: paragraph-composed prep gate — run_prep(paragraph_level=True)'s
# stage chain (quality → exact → LSH near-dup → PARAGRAPH rewrite →
# decontaminate) value-hashed against one DuckDB recompute.
# ---------------------------------------------------------------------------


@_register(
    "prep_stage_counts_paragraph",
    f"""
    WITH RECURSIVE
    {_PREP_CTES_THROUGH_JAC},
    {_cc_dd_ctes("jac")},
    ptoks AS (
      SELECT doc_id, {_WORD_TOKS_SQL} AS w FROM dd
    ), pspans AS (
      SELECT doc_id, st // {_PARA_W} AS pos,
             array_to_string(w[st + 1 : st + {_PARA_W}], ' ') AS span
      FROM (SELECT doc_id, w,
                   unnest(generate_series(0, len(w) - 1, {_PARA_W}))
                     AS st
            FROM ptoks WHERE len(w) > 0)
    ), pflags AS (
      SELECT doc_id, pos, span,
             row_number() OVER (PARTITION BY md5(span)
                                ORDER BY doc_id, pos) AS rn
      FROM pspans
    ), ppx AS (
      SELECT doc_id,
             coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' '
                                 ORDER BY pos), '') AS text
      FROM pflags GROUP BY doc_id
    ), pp AS MATERIALIZED (
      SELECT dd.doc_id, ppx.text, dd.lang, dd.source,
             length(ppx.text) AS n_chars
      FROM dd JOIN ppx USING (doc_id) WHERE length(ppx.text) > 0
    ),
    {_decontam_ctes("pp")}
    SELECT * FROM (
      SELECT 1 AS stage_idx, 'quality_gate' AS stage,
             (SELECT count(*) FROM documents) AS rows_in,
             (SELECT count(*) FROM q) AS rows_out,
             (SELECT count(*) FROM documents) - (SELECT count(*) FROM q)
               AS dropped
      UNION ALL SELECT 2, 'exact_dedup',
             (SELECT count(*) FROM q), (SELECT count(*) FROM ex),
             (SELECT count(*) FROM q) - (SELECT count(*) FROM ex)
      UNION ALL SELECT 3, 'near_dedup',
             (SELECT count(*) FROM ex), (SELECT count(*) FROM dd),
             (SELECT count(*) FROM ex) - (SELECT count(*) FROM dd)
      UNION ALL SELECT 4, 'paragraph_rewrite',
             (SELECT count(*) FROM dd), (SELECT count(*) FROM pp),
             (SELECT count(*) FROM dd) - (SELECT count(*) FROM pp)
      UNION ALL SELECT 5, 'decontaminate',
             (SELECT count(*) FROM pp), (SELECT count(*) FROM cl),
             (SELECT count(*) FROM pp) - (SELECT count(*) FROM cl)
    ) ORDER BY stage_idx
    """,
    doc="The composed prep pipeline with the r12 PARAGRAPH stage "
    "(run_prep(paragraph_level=True)'s chain): prep.py's "
    "quality_gate → exact_stage → near_dup_stage('lsh') → "
    "paragraph_stage → decontaminate run in sequence, per-stage "
    "audit value-hashed against one DuckDB statement that recomputes "
    "the same semantics (quadratic-Jaccard near-dup oracle as in "
    "prep_stage_counts; keep-first paragraph rewrite as in "
    "paragraph_dedup; decontamination n-grams recomputed from the "
    "REWRITTEN text — the stage-order contract). What only this "
    "gate can catch: a drift in how the rewrite composes (e.g. "
    "decontaminating against pre-rewrite text, or paragraph winners "
    "elected before the near-dup survivor set is fixed). Scale: "
    "inherits each stage's documented posture; the paragraph "
    "stage's winner election shuffles fingerprint metadata only.",
    parts=8,
)
def q_prep_stage_counts_paragraph(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yahoofinancedatalake_spark import prep  # noqa: PLC0415

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    eval_set = docs.filter(F.col("doc_id") % 37 == 0)

    persisted: list = []

    def _stage(frame):
        persisted.append(frame.persist())
        return persisted[-1]

    try:
        n_input = docs.count()
        gated = _stage(prep.quality_gate(docs))
        n_gate = gated.count()
        exact = _stage(prep.exact_stage(gated))
        n_exact = exact.count()
        deduped = _stage(prep.near_dup_stage(exact, backend="lsh"))
        n_dedup = deduped.count()
        rewritten = _stage(prep.paragraph_stage(deduped))
        n_para = rewritten.count()
        n_clean = prep.decontaminate(rewritten, eval_set).count()
    finally:
        for frame in persisted:
            frame.unpersist()
        spark.catalog.clearCache()

    stages = [
        (1, "quality_gate", n_input, n_gate),
        (2, "exact_dedup", n_gate, n_exact),
        (3, "near_dedup", n_exact, n_dedup),
        (4, "paragraph_rewrite", n_dedup, n_para),
        (5, "decontaminate", n_para, n_clean),
    ]
    rows = [(i, s, a, b, a - b) for i, s, a, b in stages]
    return spark.createDataFrame(
        rows, schema="stage_idx int, stage string, rows_in bigint, "
        "rows_out bigint, dropped bigint"
    ).orderBy("stage_idx")
