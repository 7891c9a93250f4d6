"""Shared Spark session + tiny fixture frames for the test suite."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from yahoofinancedatalake_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def stocks_df(spark):
    """Tiny reference-shaped stocks table (FIXTURES.md A1)."""
    rows = [
        ("AAPL", "2024-01-02", 100.0, 106.0, 99.0, 105.0, 1_000_000,
         "2024-01-02T21:00:00Z"),
        ("AAPL", "2024-01-03", 105.0, 105.5, 101.0, 102.0, 1_200_000,
         "2024-01-03T21:00:00Z"),
        ("AAPL", "2024-01-04", 102.0, 110.0, 102.0, 108.0, 900_000,
         "2024-01-04T21:00:00Z"),
        ("MSFT", "2024-01-02", 370.0, 376.0, 369.0, 375.0, 2_000_000,
         "2024-01-02T21:00:00Z"),
        ("MSFT", "2024-01-03", 375.0, 380.0, 360.0, 362.0, 2_500_000,
         "2024-01-03T21:00:00Z"),
    ]
    from yahoofinancedatalake_spark.schemas import STOCKS_RAW

    return spark.createDataFrame(rows, STOCKS_RAW)


@pytest.fixture(scope="session")
def news_df(spark):
    rows = [
        ("n1", "AAPL", "Great record profit, strong growth",
         "Analysts see a rally", "2024-01-02T10:00:00Z", "Wire", "company",
         "http://x/1", "", 0.8, "positive", "2024-01-02T21:00:00Z"),
        ("n1", "AAPL", "Great record profit, strong growth",
         "Analysts see a rally", "2024-01-02T10:00:00Z", "Wire", "company",
         "http://x/1", "", 0.8, "positive", "2024-01-02T21:00:00Z"),
        ("n2", "AAPL", "Lawsuit risk and weak decline",
         "Fear of a crash", "2024-01-03T10:00:00Z", "Post", "company",
         "http://x/2", "", -0.7, "negative", "2024-01-03T21:00:00Z"),
        ("n3", "MSFT", "Quarterly report released",
         "Numbers in line", "2024-01-02T12:00:00Z", "Wire", "business",
         "http://x/3", "", 0.0, "neutral", "2024-01-02T21:00:00Z"),
        ("n0", "MSFT", "Pre-epoch artifact", "", "1970-01-01T00:00:00Z",
         "Wire", "company", "http://x/0", "", 0.0, "neutral",
         "2024-01-02T21:00:00Z"),
    ]
    from yahoofinancedatalake_spark.schemas import NEWS_RAW

    return spark.createDataFrame(rows, NEWS_RAW)


@pytest.fixture(scope="session")
def company_df(spark):
    rows = [
        ("AAPL", "Apple Inc.", "Technology", "Consumer Electronics",
         "United States", 3_000_000_000_000, "USD", "2024-01-02T21:00:00Z"),
        ("MSFT", "Microsoft", "Technology", "Software",
         "United States", 2_800_000_000_000, "USD", "2024-01-02T21:00:00Z"),
    ]
    from yahoofinancedatalake_spark.schemas import COMPANY_RAW

    return spark.createDataFrame(rows, COMPANY_RAW)


# ---------------------------------------------------------------------------
# Suite tiering (r13, VERDICT r12 #7): the full suite (~1080 tests,
# 25-45 min on this box) outgrew the driver's verify budget — the r12
# driver capture ended mid-run with zero failures visible, an
# incomplete gate. The driver-budget DEFAULT run deselects the tests
# below (`addopts = -m "not slow"` in pyproject.toml) and completes
# with an explicit "N passed, M deselected" count; the full suite
# stays the builder's closing gate via `pytest tests/ -m ""`.
#
# Selection rule: the slowest measured tests (>= ~9 s each, ~13 min
# total) whose SUBJECT stays covered in the fast tier — every heavy
# composed-gate oracle replay deselected here is re-proven by the
# driver's own oracle gate and tools/selfcheck.py, and each operator
# family keeps at least one fast test (noted per entry in the r13
# optimization log).
_SLOW = {
    "test_dedup.py::test_simhash_hamming_orders_similarity",
    "test_aqe_skew.py::test_aqe_splits_skewed_join_partition",
    "test_graph.py::test_prefix_length_integer_exact",
    "test_graph.py::test_ppjoin_filters_lossless_on_skewed_lengths",
    "test_graph.py::test_prefix_filter_is_lossless",
    "test_query_pack.py::test_query_matches_oracle[incremental_prep_counts]",
    "test_query_pack.py::test_query_matches_oracle[cluster_canonical_docs]",
    "test_query_pack.py::test_query_matches_oracle[prep_stage_counts]",
    "test_query_pack.py::test_query_matches_oracle[prep_stage_counts_paragraph]",
    "test_query_pack.py::test_query_matches_oracle[dedup_clusters_star]",
    "test_query_pack.py::test_query_matches_oracle[dedup_clusters]",
    "test_query_pack.py::test_query_matches_oracle[stream_incremental_prep_batch_eq]",
    "test_query_pack.py::test_query_matches_oracle[minhash_near_dup]",
    "test_streaming.py::test_ttl_eviction_boundary_end_to_end",
    "test_streaming.py::test_running_last_state_accumulates_across_restarts",
    "test_streaming.py::test_stream_contingency_accumulates_across_restarts",
    "test_dedup.py::test_star_components_match_propagation_on_lsh_graph",
    "test_dedup.py::test_mega_bucket_capped",
    "test_dedup.py::test_minhash_lsh_finds_near_dup_not_far",
    "test_prep.py::test_incremental_prep_matches_full_run",
    "test_prep.py::test_incremental_refuses_half_landed_state",
    "test_prep.py::test_seed_then_increment_counts_match_full",
    "test_prep.py::test_zero_row_increment_crash_invalidates_seal",
    "test_prep.py::test_winnow_seeded_state_composes_with_increments",
    "test_vader.py::test_expr_matches_python_twin_fuzz",
    "test_selection.py::test_unimax_closed_form_equals_sequential_hypothesis",
    "test_winnow.py::test_incremental_hybrid_probe_is_batch_local",
    "test_parquet_io.py::test_upsert_rows_replaces_exactly_the_incoming_keys",
    "test_parquet_io.py::test_upsert_rows_write_amplification_is_touched_partitions",
    "test_pipeline.py::test_incremental_format_reads_only_new_partition_and_matches_full",
    "test_plans.py::test_no_unexpected_expand[incremental_prep_counts]",
    "test_plans.py::test_no_unexpected_expand[stream_incremental_prep_batch_eq]",
    "test_plans.py::test_no_scale_killers_in_any_query[incremental_prep_counts]",
    "test_plans.py::test_no_scale_killers_in_any_query[stream_incremental_prep_batch_eq]",
    "test_plans.py::test_no_scale_killers_in_any_query[stream_hybrid_dedup_batch_eq]",
    "test_streaming_sinks.py::test_stream_upsert_maintains_latest_row_per_key",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in _SLOW:
            item.add_marker(pytest.mark.slow)
