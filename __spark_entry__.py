"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over flink_realtime_edu_demo_spark: the registry holds every
implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame
plus its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import flink_realtime_edu_demo_spark.queries  # noqa: E402,F401 — populates registry
from flink_realtime_edu_demo_spark.registry import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return QUERIES["q_agg_basic"](spark, "/root/testdata/sf0.001")


# Keys the driver already verified (green hash-match, or the declared
# rows-only verdict) in rounds 1-2 and that are unchanged since. The driver
# checks the FIRST 50 keys of queries() per round, so these rotate to the
# back and the unverified / newly-changed keys surface first. Ordered
# stalest-verdict-first so the window's spare slots re-check the oldest
# greens. Refresh each round from CORRECTNESS_r{N}.json; staleness is
# enforced by tests/test_verified_green.py against the recorded source
# hashes (regenerate with tools/gen_green_hashes.py after a driver round).
_VERIFIED_GREEN = (
    # Refreshed for round 7 from CORRECTNESS_r06.json (judge next-step
    # #1): all 50 round-6 window keys came back green, so the round-6
    # sentinels (kmeans/CC/CEP/ANN blocks) rotate in here, as do the 40
    # re-greened round-2->6 verdicts. Held OUT of green and surfaced in
    # _REVERIFY_FRONT instead: every q_cep_* key (operators/cep.py
    # changes this round: try_element_at hardening, empty-types
    # validation, ALL ROWS PER MATCH + interior runagg additions) and
    # q_llm_keyword_topk (in-query unpersist fix, VERDICT r6 item 4).
    # Ordered stalest-verdict-first: the 7 round-3 verdicts that did
    # not fit round 7's window lead, so round 8 re-checks them first.
    # --- round-3 verdicts deferred from the round-7 window ---
    # (q_tpch_q18/q19/q6 moved here late in round 7 to free window
    # slots for the three llm3.py additions — round 8 re-checks them
    # first along with the rest of this block)
    "q_tpch_q18", "q_tpch_q19", "q_tpch_q6",
    "q_mm_resize", "q_agg_filtered", "q_agg_stats", "q_agg_collect", "q_agg_rollup",
    "q_agg_cube", "q_agg_having", "q_agg_percentile", "q_upsert_latest", "q_project_arith", "q_filter_pred",
    "q_explode_array", "q_distinct", "q_case_when", "q_json_extract",
    # --- round-4 verdicts (CORRECTNESS_r04.json) ---
    "q_agg_approx_uv_kmv", "q_unpivot", "q_explode_outer", "q_fn_url",
    "q_fn_struct", "q_fn_monthmath", "q_join_asof",
    "q_stream_session_dyngap", "q_ts_gapfill", "q_ts_interp", "q_ts_ohlc",
    "q_dq_profile", "q_agg_approx_quantile", "q_agg_regression",
    "q_llm_minhash_lsh", "q_llm_substring_dedup", "q_llm_bigram_score",
    "q_llm_pack_chunks", "q_llm_pack_greedy", "q_llm_pii_scrub",
    "q_llm_heavy_hitters", "q_llm_token_len_hist", "q_llm_rand_proj",
    "q_tpch_q1", "q_tpch_q13", "q_tpch_q15", "q_tpch_q17", "q_tpch_q8",
    "q_tpch_q9", "q_tpch_q12", "q_tpch_q21", "q_tpch_q2", "q_tpch_q11",
    "q_tpch_q16", "q_join_lateral",
    # --- round-5 verdicts (CORRECTNESS_r05.json) ---
    "q_fn_bitwise", "q_fn_datetime",
    "q_fn_hash", "q_fn_map", "q_fn_math", "q_fn_string", "q_fn_string2",
    "q_join_anti", "q_join_cross_topk", "q_join_full", "q_join_inner",
    "q_join_interval", "q_join_left", "q_join_semi", "q_join_theta",
    "q_join_window", "q_llm_dedup_chargram", "q_llm_dedup_exact",
    "q_llm_dedup_fuzzy", "q_mm_dedup_payload",
    "q_scd2_asof_enrich", "q_scd2_build", "q_set_except", "q_set_intersect",
    "q_set_union", "q_set_union_all", "q_side_output", "q_sort_limit",
    "q_stream_hop", "q_stream_session", "q_stream_tumble",
    "q_stream_window_topn", "q_topn_per_key", "q_tpch_q20", "q_tpch_q22",
    "q_ts_interval_merge", "q_win_laglead", "q_win_moving_avg", "q_win_rank",
    # --- round-6 verdicts (CORRECTNESS_r06.json; freshest) ---
    "q_agg_basic", "q_agg_count_distinct", "q_agg_grouping_sets", "q_pivot",
    "q_agg_bool", "q_agg_argminmax", "q_sort_nulls", "q_agg_null_group",
    "q_fn_cast", "q_fn_array", "q_fn_trig", "q_fn_datetime2",
    "q_fn_editdist", "q_join_range_bin", "q_win_running_sum", "q_win_dist",
    "q_win_range_frame", "q_set_intersect_all", "q_set_except_all",
    "q_stream_cumulate", "q_dedup_exact", "q_funnel", "q_stream_late_branch",
    "q_llm_knn", "q_llm_quality", "q_llm_lang_id",
    "q_llm_fingerprint", "q_llm_tokens", "q_llm_dedup_simhash",
    "q_llm_winnow", "q_llm_centroids", "q_udf_scalar", "q_udaf_groupagg",
    "q_udtf_split", "q_tpch_q3", "q_tpch_q5", "q_mm_meta_filter",
    "q_mm_frames", "q_mm_features", "q_llm_kmeans_assign", "q_llm_ann_ivf",
    "q_llm_dup_groups", "q_llm_kmeans", "q_llm_knn_ivf_scaled",
)

# Keys deliberately re-surfaced for the round-7 driver window.
# FIRST: q_cep_reluctant / q_cep_permute — the only two declared keys
# with zero driver CORRECTNESS rows (they landed just past the full
# round-6 window; VERDICT r6 next-step #1 mandates green r7 rows).
# Then every other q_cep_* key as changed-operator sentinels
# (operators/cep.py changes this round), q_llm_keyword_topk (in-query
# unpersist fix), and the stalest 22 of the 40 round-3 verdicts (now 4
# rounds old). The 15 round-7 additions (9 CEP keys: all_rows /
# all_rows_define / measures / within / within_define / unmatched_rows
# / negation / runagg_interior / runagg_sessionized, the 3
# skew/lookup oracle upgrades: q_join_skew_salted /
# q_join_lookup_async / q_agg_salted_count, and the 3 llm3.py keys:
# q_llm_quality_clf / q_llm_decontam_bloom / q_llm_semantic_dedup)
# are NOT listed here or in _VERIFIED_GREEN, so they land in `rest`
# right after this block — window total is exactly
# 1 warmup + 12 + 22 + 15 = 50.
_REVERIFY_FRONT = (
    # --- never driver-verified (VERDICT r6 next-step #1) ---
    "q_cep_reluctant", "q_cep_permute",
    # --- changed-operator sentinels (operators/cep.py, llm2.py) ---
    "q_cep_runagg", "q_cep_pattern", "q_cep_quantifier", "q_cep_skip_last",
    "q_cep_alternation", "q_cep_sessionized", "q_cep_prev",
    "q_cep_prev_sessionized", "q_cep_skip_next", "q_llm_keyword_topk",
    # --- round-3 verdicts, stalest (25 of 40; the rest lead green) ---
    "q_agg_approx_uv", "q_agg_listagg", "q_agg_mode", "q_agg_corr",
    "q_fn_try", "q_win_ntile", "q_llm_tfidf", "q_llm_clean_corpus",
    "q_llm_embed_quant", "q_llm_split", "q_llm_repetition", "q_llm_entropy",
    "q_llm_stratified_sample", "q_llm_mix_weights", "q_llm_decontam",
    "q_llm_sample_exact_k", "q_tpch_q7", "q_tpch_q10", "q_subquery_scalar",
    "q_subquery_corr", "q_tpch_q4", "q_tpch_q14",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # q_warmup absolutely first: it absorbs the cold-harness JVM/Arrow
    # start-up cost that round-2 bench billed to the first real queries.
    back = [k for k in _VERIFIED_GREEN if k in QUERIES]
    head = [k for k in _REVERIFY_FRONT if k in QUERIES]
    rest = [
        k for k in QUERIES
        if k not in _VERIFIED_GREEN and k not in _REVERIFY_FRONT
        and k != "q_warmup"
    ]
    order = ["q_warmup"] + head + rest + back
    return {k: QUERIES[k] for k in order if k in QUERIES}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
