"""sf0.1 exact-oracle mirror of the decimal-heaviest registry keys.

Why this subset exists (VERDICT r5 item 8): decimal-tie parity bugs only
surface at sf0.1 — the round-5 q_agg_linreg_trend quantizer split passed
every sf0.001/sf0.01 check because no accumulated value happened to land
ON a rounding tie until the data was 10× bigger. The full 205-key sf0.1
mirror takes ~10 min, too slow for the inner loop; this marked subset
re-proves exactly the keys whose answers flow through decimal
accumulation / finish() quantization (functions/numeric.py) in ~2 min:

    python -m pytest tests/ -m sf01_decimal -q

Deselected from the default run via pytest.ini addopts. Keys chosen by
accumulation depth: multi-power-sum moments, windowed moments, OLS normal
equations, weighted medians, rank-weighted sums, iterative per-round
finishes (PageRank, k-means), and the flagship decimal rollup.
"""

from __future__ import annotations

import pytest

from t_mobile_data_fnt_etl_pipeline_aws_spark.oracle import check_query
from t_mobile_data_fnt_etl_pipeline_aws_spark.registry import (
    all_oracles,
    all_queries,
)

SF01 = "/root/testdata/sf0.1"

#: decimal-accumulation-bearing keys (each uses finish()/dsum()/davg()
#: or per-iteration decimal finishing on values large enough at sf0.1 to
#: reach rounding-tie territory).
DECIMAL_HEAVY = [
    "q_agg_hash",              # flagship: decimal sum/avg rollup
    "q_agg_linreg_trend",      # OLS normal equations (the r5 tie bug)
    "q_agg_higher_moments",    # 4 power-sum accumulators
    "q_agg_weighted_median",   # cumulative decimal weight crossing
    "q_agg_pythagorean_means", # ln-sum (GM) + reciprocal-sum (HM)
    "q_agg_gini",              # rank-weighted concentration sums
    "q_window_moving_zscore",  # windowed decimal moments
    "q_window_autocorr",       # lag-1 Pearson via decimal sums
    "q_window_ewma",           # truncated-kernel decimal dot
    "q_stats_chi2",            # expected-count ratios
    "q_graph_pagerank",        # per-iteration finished rank sums
    "q_cluster_kmeans",        # per-iteration finished centroid means
    "q_agg_multi",             # multi-aggregate decimal battery
    "q_report_mom_growth",     # decimal month sums + growth ratios
    "q_window_rolling_median", # sorted-frame median of finished sums
    "q_etl_merge_tombstones",  # r7: dsum over merged/deleted price sets
    "q_join_bloom_pruned",     # r7: dsum revenue over the selective join
    "q_report_wow_growth",     # r7: decimal week sums + WoW ratio division
    "q_sim_search_batch_topk", # r9: finished-decimal IVF centroid means
    "q_report_shared_scan",    # r9: dsum branches over the cached base
    "q_join_shuffled_hash",    # r9: dsum revenue through the SHJ
    "q_join_dpp_prune",        # r9: dsum revenue over pruned partitions
    "q_er_resolve_entities",   # r9: dsum retail per resolved entity
    "q_etl_mv_incremental",    # r9: unfinished-decimal partial-state merge
    # r13 (VERDICT r12 item 8): the two newest numeric/behavioral paths
    # most likely to diverge at 10× — the change-feed state fold keeps
    # the decimal accumulator UNFINISHED across refreshes (finish must
    # stay terminal under real mass), and the schema-evolution null-fill
    # must not perturb decimal aggregates over pre-evolution files
    "q_stream_manifest_cdc_apply",
    "q_etl_schema_evolution_add_column",
    # r14 continuation: Welch t folds six conditional decimal moments in
    # one pass — the 2^53 finish-window arithmetic must hold at real
    # group masses (prescale /1e6 keeps Σx² << 2^53/10^6 at any SF here)
    "q_stats_welch_ttest",
]


@pytest.mark.sf01_decimal
@pytest.mark.parametrize("key", DECIMAL_HEAVY)
def test_sf01_decimal_mirror(spark, key):
    queries, oracles = all_queries(), all_oracles()
    assert key in oracles, f"{key} lost its oracle (marker list stale?)"
    diff = check_query(spark, SF01, queries[key], oracles[key])
    assert diff is None, f"{key} @ sf0.1: {diff}"
