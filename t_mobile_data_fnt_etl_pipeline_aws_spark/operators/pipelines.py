"""End-to-end ETL/analytics pipeline queries (SURVEY.md §2 capstones).

Multi-operator compositions in the shape a reference-pipeline user
actually runs: TPC-H-style reporting joins (the fixture schema is
TPC-H-ish by construction — TESTDATA.md), an idempotent upsert/merge, and
a data-quality column profiler. Each stitches together operators proven
individually in the other modules, so these double as integration tests
of the engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, sql_dsum
from ..registry import query
from ..sources.tables import load


@query(
    "q_pipeline_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, o_orderdate,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_pipeline_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: unshipped high-revenue BUILDING orders, top 10.

    customer(broadcast) ⋈ orders ⋈ lineitem with date band filters pushed
    to both fact scans, revenue agg, global top-k. The revenue sort key
    is the FINISHED double (identical in both engines), so the LIMIT
    survivor set is deterministic with the l_orderkey tiebreak.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-03-15 00:00:00'")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '1998-03-15 00:00:00'")
    )
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_pipeline_region_volume",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           count(*) AS n_lineitems
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = (SELECT min(r_name) FROM region)
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_pipeline_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped: local-supplier revenue per nation in one region.

    Six-table star join: the three dims broadcast, the fact chain
    shuffles on its natural keys, and the s_nationkey = c_nationkey
    residual keeps only 'local' supply lines. (Region picked as
    min(r_name) so the query is fixture-value agnostic.)
    """
    r = load(spark, sf_dir, "region")
    first_region = r.agg(F.min("r_name")).first()[0]
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        F.broadcast(r.filter(F.col("r_name") == first_region))
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "q_etl_upsert",
    oracle=f"""
    WITH changes AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'N' AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 1000 = 0
    ),
    merged AS (
        SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               coalesce(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
               coalesce(c.o_totalprice, b.o_totalprice) AS o_totalprice,
               CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                    WHEN c.o_orderkey IS NULL THEN 'keep'
                    ELSE 'update' END AS action
        FROM orders b FULL JOIN changes c ON b.o_orderkey = c.o_orderkey
    )
    SELECT action, o_orderstatus, count(*) AS n_rows,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM merged
    GROUP BY action, o_orderstatus
    """,
)
def q_etl_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert/merge without a table format: base FULL JOIN changes →
    coalesce-newest → per-action audit counts.

    The changes feed is derived from the base (10% updates with a price
    bump, 0.1% inserts with shifted keys) so the merge exercises all
    three actions deterministically. On a real lakehouse this is MERGE
    INTO; the full-join + coalesce form is the engine-level equivalent
    and shuffles once on the merge key.
    """
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = (
        base.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
    )
    inserts = base.filter(F.col("o_orderkey") % 1000 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    changes = updates.unionByName(inserts)
    b, c = base.alias("b"), changes.alias("c")
    merged = b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full").select(
        F.coalesce(F.col("c.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("c.o_orderstatus"), F.col("b.o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.coalesce(F.col("c.o_totalprice"), F.col("b.o_totalprice")).alias(
            "o_totalprice"
        ),
        F.when(F.col("b.o_orderkey").isNull(), "insert")
        .when(F.col("c.o_orderkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )
    return merged.groupBy("action", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("o_totalprice"), "sum_price"),
    )


@query(
    "q_profile_table",
    oracle="""
    SELECT 'c_custkey' AS column_name, count(*) AS n_rows,
           count(c_custkey) AS n_non_null,
           count(DISTINCT c_custkey) AS n_distinct,
           cast(min(c_custkey) as varchar) AS min_value,
           cast(max(c_custkey) as varchar) AS max_value
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*), count(c_mktsegment),
           count(DISTINCT c_mktsegment),
           min(c_mktsegment), max(c_mktsegment)
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', count(*), count(c_nationkey),
           count(DISTINCT c_nationkey),
           cast(min(c_nationkey) as varchar), cast(max(c_nationkey) as varchar)
    FROM customer
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profile (long form): null/distinct/min/max per
    column — the ETL ingest-validation report. min/max render as strings
    so one schema serves every column type; a production profiler would
    add the approx paths (HLL, approx quantiles) from §2.4 for width.
    """
    c = load(spark, sf_dir, "customer")

    def profile(col: str) -> DataFrame:
        return c.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_non_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_value"),
            F.max(col).cast("string").alias("max_value"),
        )

    return (
        profile("c_custkey")
        .unionByName(profile("c_mktsegment"))
        .unionByName(profile("c_nationkey"))
    )
