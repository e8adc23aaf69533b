#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {key: sec, ...}, "sf": ...}.

Protocol (BASELINE.md): warm one SparkSession; per query, one warm-up
run then N timed runs (median reported). Timing covers full
materialization via the noop sink — executors do all the work, no
driver-collect tax, plans can't stay lazy.

Query set: every registered query except the bounded-slice micro
queries would over-weight tiny fixed work; headline = the scale-bearing
representatives of each SURVEY §2 block. Override with
SPARK_GRAFT_BENCH_QUERIES=comma,separated,keys or "all".
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from t_mobile_data_fnt_etl_pipeline_aws_spark import get_spark  # noqa: E402
from t_mobile_data_fnt_etl_pipeline_aws_spark.registry import all_queries  # noqa: E402

#: scale-bearing headline set (one+ per SURVEY §2 block)
HEADLINE = [
    "q_agg_hash",            # flagship scan→filter→hash-agg
    "q_agg_cube",            # grouping-set expansion
    "q_agg_distinct",        # distinct-agg expand
    "q_join_inner_hash",     # dim chain join
    "q_join_sortmerge",      # fact-fact shuffle join
    "q_join_asof",           # as-of window pick-latest
    "q_window_rank",         # 3-window rank battery
    "q_window_range_frame",  # range-frame over events
    "q_topk_per_group",      # WindowGroupLimit
    "q_sort_multi",          # global sort
    "q_union_all",           # set-op concat
    "q_string_funcs",        # codegen scalar battery
    "q_json_funcs",          # JSON extraction
    "q_array_funcs",         # higher-order vector math
    "q_udf_scalar_pandas",   # Arrow UDF boundary
    "q_udtf_grouped_map",    # applyInPandas boundary
    "q_dedup_exact",         # full-text hash agg
    "q_dedup_fuzzy_minhash", # LSH banding pipeline
    "q_text_token_stats",    # explode-heavy text path
    "q_text_langid",         # self-join profile scoring
    "q_sim_search_topk",     # brute-force ANN baseline
    "q_knn_join_bucketed",   # LSH bucket join
    "q_label_centroids",     # posexplode centroid agg
    "q_stream_tumbling",     # event-time windowing (batch form)
    "q_stream_session",      # session windows
    "q_scan_parquet",        # raw scan throughput
    "q_sink_parquet_partitioned",  # partitioned write+read
    "q_pipeline_shipping_priority",  # TPC-H Q3 shape (3-way join + topk)
    "q_pipeline_region_volume",      # TPC-H Q5 shape (6-way star join)
    "q_etl_upsert",                  # full-join merge
    "q_sim_search_topk_vectorized",  # BLAS ANN path
    "q_join_salted_skew",            # skew-mitigated salted join
    "q_join_theta_bucketed",         # geometric-bucket band equi-join
    "q_chunk_overlap",               # token-window chunking (map-only explode)
    "q_contamination_ngram",         # 5-gram decontamination semi-join
    "q_pack_sequences",              # prefix-sum sequence packing
    "q_etl_scd2",                    # SCD2 lag/lead validity chaining
    "q_resample_ffill",              # daily-grid resample + forward fill
    "q_cdc_compact",                 # change-log compaction pick-latest
    "q_dq_referential",              # FK orphan audit (3 probe joins)
    "q_join_asof_tolerance",         # union-merge LOCF as-of (no join)
    "q_text_edit_distance",          # blocked levenshtein pair gen
    "q_subquery_waiting_supplier",   # Q21 double decorrelation
    "q_pipeline_market_share",       # Q8 conditional-share star join
    "q_multimodal_framesample",      # map-only Arrow byte kernel
    "q_agg_mad_outliers",            # double window-sort robust stats
    "q_funnel_conversion",           # conditional-min funnel (1 shuffle)
    "q_cohort_retention",            # cohort join + distinct triangle
]

RUNS = 3


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = all_queries()
    sel = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    if sel == "all":
        keys = sorted(queries)
    elif sel:
        keys = [k.strip() for k in sel.split(",") if k.strip()]
    else:
        keys = HEADLINE
    spark = get_spark("spark-graft-bench")

    timings: dict[str, float] = {}
    for key in keys:
        # Isolate queries sharing one JVM: drop cached plans/data and nudge
        # GC so query N's garbage doesn't tax query N+1's timed runs (round-2
        # bench showed 2.5-2.8x phantom regressions on unchanged queries once
        # the suite grew from 33 to 48 keys).
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        fn = queries[key]
        materialize(fn(spark, sf_dir))  # warm-up (plan + JIT + page cache)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[key] = round(statistics.median(samples), 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                # value = SUM over queries of the per-query median-of-3;
                # per-query medians are under "queries".
                "metric": "total_seconds_noop_materialize_sum_of_medians",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
