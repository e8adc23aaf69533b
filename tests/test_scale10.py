"""Generated-scale (10× sf0.1 ≈ TPC-H sf1) DuckDB-oracle parity.

Why this opt-in marker exists (VERDICT r8 item 3): correctness is proven
at sf ≤ 0.1 and timing at the 10× generated family, but until round 9
the ORACLE had never run past sf0.1 — and two whole bug classes only
appear with bigger data: (a) synthetic-key constructions that collide
past fixture scale (the q_etl_merge_tombstones +10**7 insert-key offset
fixed in 3ff3f0f collided from ~sf7 — the negated-key fix is exercised
here at 10× the key range), and (b) rounding/rank ties that need enough
accumulated mass to land ON a tie (the round-5 q_agg_linreg_trend
quantizer split; the replicated events family is deliberately TIE-DENSE
— every timestamp appears 10×).

Run with:  python -m pytest tests/ -m scale10 -q
Deselected by default (pytest.ini addopts); generation is seeded and
cached under /tmp/spark_graft_scaling/x10full (~200 MB, first run only).

Key set: the sf01_decimal battery (accumulation-deep keys) plus the
synthetic-key ETL merges and q_etl_upsert — the constructions VERDICT r8
names as the collision class.
"""

from __future__ import annotations

import pytest

from t_mobile_data_fnt_etl_pipeline_aws_spark.oracle import check_query
from t_mobile_data_fnt_etl_pipeline_aws_spark.registry import (
    all_oracles,
    all_queries,
)

from test_sf01_decimal import DECIMAL_HEAVY  # noqa: E402 (tests are rootdir-imported)

#: synthetic-key / scale-sensitive additions beyond the decimal battery
SCALE_SENSITIVE_EXTRA = [
    "q_etl_upsert",            # full-join MERGE with derived change keys
    # r9 second session: exact order statistics — interpolation and DISC
    # rank picks are where tie-density bites (the replicated family makes
    # every key appear 10×, so quartile boundaries land ON ties)
    "q_agg_median_mode",
    "q_agg_percentile_within_group",
    # r9 third session: key-derived hierarchy — closure depth grows with
    # the keyspace (log3), the class scale10 exists to exercise
    "q_graph_hierarchy_rollup",
    # VERDICT r9 item 6: the remaining round-9 additions whose failure
    # class is scale-coupled —
    # NOTE q_join_nearest_value is deliberately NOT here: the operator is
    # O(n log m) map-only, but its ground-truth ORACLE is the full
    # orders x supplier cross product — 150e9 pairs at 10x, infeasible in
    # DuckDB (measured: >15 min before kill). Its tie semantics stay
    # covered by the sf0.01 driver mirror (1.5e6 oracle pairs — fine);
    # past that, only the operator scales, not its ground truth.
    # batch top-k retrieval: rank ties within the capped probe batch get
    # denser as the corpus replicates 10×
    "q_sim_search_batch_topk",
    # entity resolution: blocking-key collision rate grows with the
    # keyspace — the exact class (a) synthetic-key construction
    "q_er_resolve_entities",
    # round-10: Avro container round-trip — 10× data exercises the
    # multi-block path (block_rows boundaries) and varint edges at
    # larger keys
    "q_scan_avro_python",
    # round-10 ingest build-out: each new wire/DB path at 10× proves
    # the codec/connector linear and lossless past fixture scale —
    # 1.5M orders through XML text, 1M events through proto3 bytes
    # (flat + enveloped), 1.5M rows through sqlite range slices, and
    # reader-schema resolution over 10× v1 files
    "q_scan_xml_roundtrip",
    "q_events_protobuf_decode",
    "q_events_protobuf_nested",
    "q_scan_sqlite_partitioned",
    "q_scan_avro_evolution",
    # round-11: argmin/argmax-by-struct keys — the replicated family
    # makes every event timestamp appear 10×, so the (ts, event_id)
    # struct tiebreak is ACTUALLY load-bearing at this scale (the exact
    # tie-dense class this marker exists for)
    "q_timeseries_ohlc",
    "q_stream_foreachbatch_upsert",
    # round-11: binned KS — 10× counts through the bucket CDF windows
    # (integer cumsum magnitudes, DuckDB window-sum HUGEINT path)
    "q_stats_ks_drift",
    # NOTE q_join_spatial_knn is deliberately NOT here, same class as
    # q_join_nearest_value: the operator is grid-pruned O(n·k), but its
    # ground-truth ORACLE is the full customer × supplier cross product
    # — 1.5e9 ranked pairs at 10×, infeasible in DuckDB. Its tie
    # semantics stay covered by the sf0.01 driver mirror plus the
    # cell-size-invariance pin (tests/test_invariants.py).
    # round-11 manifest table format (VERDICT r11 item 6): the pruning
    # and file-count arithmetic is EXACTLY the class that breaks past
    # fixture scale (r9 lesson) — at 10× each year-slice commit lands
    # real multi-row-group files, so footer-stat harvesting, typed
    # range pruning, compaction layout invariants, diff consumption,
    # and vacuum liveness all run against non-toy file geometry. All
    # oracles are single-pass aggregates — cheap in DuckDB at 10×.
    "q_etl_time_travel",
    "q_scan_files_pruned_by_stats",
    "q_etl_manifest_compact",
    "q_etl_incremental_consume",
    "q_etl_manifest_vacuum",
    "q_stats_ab_lift",
    "q_stream_manifest_sink",
    # round-12: schema evolution null-fill across 10× v1 files;
    # conflict/retry with full-size staged commits; per-batch as-of dim
    # join (equi-join oracle, linear at 10×)
    "q_etl_schema_evolution_add_column",
    "q_etl_concurrent_commit_retry",
    "q_stream_manifest_dim_join",
    # round-12 metadata plane: footer-count folds, bloom construction
    # over 10× keyspace (the fpp math and uint64 hashing at real n),
    # z-order prunability at custkey > 65536 — the EXACT wrap scale the
    # adaptive-dims design exists for (a mod fold would pass sf0.1 and
    # silently stop pruning here) — and CoW merge with multi-row-group
    # affected files
    "q_scan_count_metadata_only",
    "q_scan_files_pruned_bloom",
    "q_scan_files_pruned_zorder",
    "q_etl_manifest_merge_cow",
    # incremental view maintenance: 10× deltas through the unfinished-
    # decimal state fold (the finish-is-terminal rule under real mass)
    "q_stream_manifest_cdc_apply",
    # round-13: merge-on-read delete vectors — at 10× the doomed-row
    # identity set (~1% of 15M orders) is a real broadcast and the
    # (file_path, row_index) anti-join runs against multi-row-group
    # files (row_index semantics past one row group is the exact thing
    # fixture scale can't prove); hidden partitioning — ~84 month files
    # at real size, transform-bound mapping over the full year range
    "q_etl_manifest_delete_mor",
    "q_etl_hidden_partitioning",
    # equality deletes at 10×: the blind value-set commit masks ~115k
    # of 15M keys through the broadcast anti-join, and the compaction
    # that restores count-exactness rewrites real multi-row-group
    # files; the change feed materializes ~1% deleted rows by joining
    # vectors back to multi-row-group v_from files (row_index past one
    # row group again)
    "q_etl_manifest_delete_equality",
    "q_etl_changefeed_rowlevel",
    # WAP at 10×: the audit scans a real staged snapshot and the
    # restore/publish ref dance runs over full-size manifests; the
    # retraction MV folds ~1% deletes + a blind eq-mask through the
    # unfinished-decimal state at real mass
    "q_etl_write_audit_publish",
    "q_stream_changefeed_apply_retract",
    # metadata tables at 10×: footer-stat min/max folds across REAL
    # multi-row-group files (the per-row-group fold is the
    # scale-coupled arithmetic), cumulative history over full-size
    # commits
    "q_scan_manifest_files_table",
    "q_scan_manifest_history_table",
    # clone isolation + atomic MoR update over full-size multi-row-group
    # files (vector row_index past one row group; CoW-vs-MoR file
    # arithmetic at real geometry)
    "q_etl_manifest_clone",
    "q_etl_manifest_update_mor",
    # partition evolution at 10×: both generations at real file sizes,
    # 24 month files + year files pruned under their own transforms
    "q_etl_partition_evolution",
    # round-14: the three-clause MoR MERGE at 10× — ~1% masked + ~0.5%
    # synthetic insert keys over multi-row-group files (the +1e8 offset
    # is the class-(a) collision construction this battery exists for);
    # $partitions folds real per-value file sets across two transform
    # generations; defaults + widening read mixed-generation scans at
    # real file geometry (narrow files upcast natively next to wide);
    # timestamp travel resolves over full-size manifests; branch
    # fast-forward publishes a multi-commit dev line of real files
    "q_etl_manifest_merge_mor",
    "q_scan_manifest_partitions_table",
    "q_etl_schema_default_values",
    "q_etl_type_widening",
    "q_etl_time_travel_timestamp",
    "q_etl_branch_fastforward",
    # row lineage at 10x: id allocation + the stability join over
    # multi-row-group files (row position past one row group is the
    # class this battery exists for)
    "q_etl_row_lineage",
    # constraints + streaming merge sink at 10x: the violation probe
    # scans a real batch; the CDC fold accumulates counts over
    # replicated keys (tie-dense argmax class)
    "q_etl_table_constraints",
    "q_stream_manifest_merge_sink",
    # binpack OPTIMIZE at 10x: bins over multi-row-group files, vector
    # pruning against a real ~1% mask, lineage join at real mass
    "q_etl_optimize_binpack",
    # r14 continuation: auto-evolving MERGE at 10x — the +1e8 synthetic
    # insert offset is the class-(a) collision construction, and the
    # initial-default must resolve over multi-row-group pre-evolution
    # files; GDPR purge at 10x — the auditor raw-read sweeps real file
    # mass and the victim's rows span row-group boundaries
    "q_etl_merge_schema_evolution",
    "q_etl_gdpr_purge",
]

SCALE10_KEYS = DECIMAL_HEAVY + SCALE_SENSITIVE_EXTRA


@pytest.fixture(scope="module")
def x10_dir() -> str:
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench_scaling import ensure_full_scale_dir

    return ensure_full_scale_dir(10)


@pytest.mark.scale10
@pytest.mark.parametrize("key", SCALE10_KEYS)
def test_scale10_oracle_mirror(spark, x10_dir, key):
    queries, oracles = all_queries(), all_oracles()
    assert key in oracles, f"{key} lost its oracle (marker list stale?)"
    diff = check_query(spark, x10_dir, queries[key], oracles[key])
    assert diff is None, f"{key} @ x10full: {diff}"
