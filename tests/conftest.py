from __future__ import annotations

import pytest

from mlcast_sourcedata_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


# Second tier of the slow set (5-25s each, measured via --durations on a
# quiet machine): marked here by node id so parametrized cases can be
# included without touching the parametrize lists. The first tier
# (>=12s) is marked with @pytest.mark.slow at the definition site.
# `pytest -m "not slow"` is the inner-loop fast path; CI / per-round
# verify run the unfiltered suite.
_SLOW_NODE_IDS = {
    "test_extra_oracles.py::test_extra_query_matches_oracle[ivfpq_topk_embeddings]",
    "test_extra_oracles.py::test_extra_query_matches_oracle[pq_topk_embeddings]",
    "test_extra_oracles.py::test_extra_query_matches_oracle[embedding_near_dup_pairs]",
    "test_extra_oracles.py::test_extra_query_matches_oracle[semantic_dedup_embeddings]",
    "test_bpe_property.py::test_bpe_three_way_on_tie_cascades",
    "test_bpe_property.py::test_bpe_three_way_regressions",
    "test_suite_e2e.py::test_compiler_edge_contracts",
    "test_suite_e2e.py::test_quarantine_splits_clean_and_flagged",
    "test_behavior_property.py::test_funnel_steps_equals_greedy_reference",
    "test_sampled_partitioned.py::test_sampled_resume_skips_committed",
    "test_functions.py::test_semantic_dedup_exact_and_clustered",
    "test_functions.py::test_pair_verify_join_stage_compiles_at_dim64",
    "test_functions.py::test_connected_components_reliable_checkpoint_resume",
    "test_functions.py::test_simhash64_banded_equals_self_join",
    "test_functions.py::test_embedding_lsh_near_dup_recall_and_precision",
    "test_functions.py::test_lsh_verified_and_clusters_bucket_cap_passthrough",
    "test_drift.py::test_incremental_baseline_equals_whole_table_build",
    "test_rollup.py::test_cli_exit_1_on_rollup_audit_violation",
    "test_rollup.py::test_compact_rollup_preserves_state_and_resume",
    "test_joins_property.py::test_asof_matches_naive_on_random_inputs",
    "test_documents_suite.py::test_cli_content_index_flag",
    "test_documents_suite.py::test_schema_drift_check",
    "test_hash_property.py::test_char_shingles_match_duckdb",
    "test_hash_property.py::test_word_shingles_match_duckdb",
    "test_hash_property.py::test_scalar_kernels_match_duckdb",
    "test_search_property.py::test_bm25_matches_reference",
    "test_sampled.py::test_sample_is_deterministic_and_conversation_atomic",
    "test_pipeline_golden.py::test_golden_pipeline_jsonl_to_training_shard",
    "test_source_formats.py::test_jsonl_and_csv_suite_match_parquet",
    "test_layout.py::test_zorder_write_preserves_rows_and_skips_files",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid.split("tests/")[-1]
        if nid in _SLOW_NODE_IDS:
            item.add_marker(pytest.mark.slow)
