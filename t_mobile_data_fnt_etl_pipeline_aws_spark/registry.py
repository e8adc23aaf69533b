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
    "operators.linkage",
    "operators.stats",
    "operators.mining",
    "operators.graph",
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
#: registration order. Cumulative record r01-r09: all 286 then-registered
#: keys minus the 37 post-freeze additions have a passing latest row
#: (236 hash-green, 13 rows-only by design, 0 failures ever). Staleness
#: histogram entering round 10 (recomputed from the CORRECTNESS_r01-r09
#: union): r4:49 / r5:50 / r6:50 / r8:50 / r9:50, plus 37 never-checked
#: keys added after the round-9 window froze.
#:
#: ROUND-10 WINDOW (this list), in priority order:
#:   1. ALL 37 never-driver-checked round-9 additions (VERDICT r9 item 1)
#:      — every "— (new)" SURVEY row gets its first driver row this round.
#:   2. ALL 10 NEW round-10 keys (the ingest-surface build-out: Avro
#:      batch sink/scan + reader-schema evolution + streaming
#:      landing-dir ingest, protobuf flat projected decode + nested
#:      envelope, native-XML file round-trip, partition-bounded sqlite
#:      ingest, parquet codec audit, federated DB-dim x parquet-fact
#:      join — never driver-checked, so they outrank stale-green keys).
#:   3. 3 of the 49 r4-stale keys: the two bench anchors (q_agg_hash,
#:      q_join_sortmerge) first, then q_agg_multi. 37 + 10 + 3 fills
#:      the 50 slots exactly; the remaining 46 r4-stale keys head the
#:      ROUND-11 rotation (q_agg_approx_distinct, q_agg_boolean,
#:      q_agg_distinct, q_agg_having, q_agg_rollup, q_agg_cube,
#:      q_agg_grouping_sets, q_agg_conditional, q_filter_pred,
#:      q_agg_median_exact, q_agg_mode_deterministic, the
#:      scan/sink/window/join remainder — recompute from the
#:      CORRECTNESS_r* union at round-11 open).
#: Keep test_driver_window_rotation in sync.
_DRIVER_WINDOW = [
    # --- 1. the 37 never-driver-checked round-9 additions ---
    "q_sink_python_datasource",
    "q_report_shared_scan",
    "q_join_shuffled_hash",
    "q_join_dpp_prune",
    "q_er_resolve_entities",
    "q_er_golden_record",
    "q_window_gaps_islands",
    "q_scan_file_metadata",
    "q_udf_iterator_pandas",
    "q_join_skew_aqe",
    "q_sql_group_by_all",
    "q_sql_lateral_alias",
    "q_agg_median_mode",
    "q_agg_bitmap_distinct",
    "q_sql_pipe_syntax",
    "q_sql_collation_group",
    "q_join_null_skew",
    "q_scan_csv_permissive",
    "q_etl_mv_incremental",
    "q_sql_variables",
    "q_agg_percentile_within_group",
    "q_udf_pandas_struct",
    "q_string_regexp_battery",
    "q_text_url_parse",
    "q_sql_named_window",
    "q_sql_pivot_unpivot",
    "q_xml_funcs",
    "q_agg_grouping_id",
    "q_agg_hll_sketch_merge",
    "q_sink_rowgroup_stats_audit",
    "q_date_timezone",
    "q_join_geo_grid",
    "q_graph_hierarchy_rollup",
    "q_join_nearest_value",
    "q_interval_concurrency",
    "q_graph_hierarchy_path",
    "q_filter_inset_large",
    # --- 2. new round-10 keys (never driver-checked) ---
    "q_sink_avro_python",
    "q_scan_avro_python",
    "q_events_protobuf_decode",
    "q_scan_avro_evolution",
    "q_stream_avro_ingest",
    "q_events_protobuf_nested",
    "q_scan_xml_roundtrip",
    "q_scan_sqlite_partitioned",
    "q_sink_parquet_codecs",
    "q_join_federated_sources",
    # --- 3. 3 r4-stale keys (bench anchors first, then agg core) ---
    "q_agg_hash",
    "q_join_sortmerge",
    "q_agg_multi",
]

#: Keys added AFTER the current round's window was frozen. Empty at the
#: round-10 freeze: all 37 round-9 post-window additions moved into the
#: window above. New keys registered during round 10 are appended here
#: and head the round-11 window (never-checked > stale); if a new key
#: lands before the driver has run, it may instead displace a tail
#: r4-stale entry in the window above. Keep
#: test_driver_window_rotation's exemption in sync.
_POST_WINDOW_ADDITIONS: list[str] = []


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
