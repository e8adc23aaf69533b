"""Sorts / limits / top-k (SURVEY.md §2.6).

Every LIMIT query carries a unique tiebreak key so the surviving row SET is
deterministic (the driver's hash is order-insensitive, but WHICH rows pass
a limit is only stable under a total order — SURVEY.md §5.5).

Scale: global sort is a range-partitioned exchange (sampled boundaries);
global top-k plans as TakeOrderedAndProject — per-partition heaps + a
driver-side merge of k·partitions rows, no full sort. That is the shape
that survives 100 TB; a sort-then-limit would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           nullif(o_orderstatus, 'P') AS status_np,
           o_totalprice
    FROM orders
    ORDER BY status_np ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort: mixed ASC/DESC with explicit NULLS FIRST placement."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_np").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
    )


@query(
    "q_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LIMIT after a total order on a unique key."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — no full sort at any scale)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )
