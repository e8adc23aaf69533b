"""Entity resolution / record linkage (SURVEY.md §2.11 family).

The master-data shape every warehouse and training-data pipeline hits:
free-text entity names arrive in VARIANTS (typos, synonyms, re-spellings)
and downstream joins/aggregations need one canonical entity id. The
scale-correct decomposition, mirrored from the BPE trainer's word-TYPE
insight (llmprep.py): never pair INSTANCES — collapse to the distinct
name-TYPE table first (bounded by the name vocabulary, corpus-size-
independent: 62–64 distinct part names at sf0.001→0.1 while instance
rows grow 200→20,000), resolve entities on types, then broadcast the
(name → entity) assignment back onto the instance table. At 100 TB the
instance table never shuffles for resolution at all — the only
corpus-scale operations are one distinct() and one broadcast map-side
join.

Pipeline stages (each its own scale argument):
  1. multi-pass BLOCKING on the type table — candidate pairs only
     within a block (same head token; same tail token), never all-pairs;
  2. pairwise fuzzy scoring — levenshtein (exact, integer, identical
     semantics in Spark / DuckDB / textbooks) under a threshold;
  3. transitive closure — the alternating large/small-star CC from
     clustering.py (O(log n) rounds), labels = min name per component;
  4. survivorship — deterministic golden-record attribute picks
     (modal value with count-desc/value-asc tiebreak, extremes).

The DuckDB oracle replays all four stages relationally (recursive-CTE
closure, the q_dedup_clusters_cc precedent) — exact hash parity, no
tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum as _dsum
from ..functions.numeric import sql_dsum as _sql_dsum
from ..registry import query
from ..sources.tables import load
from .clustering import alternating_cc

#: Edit-distance threshold for a name-variant edge. Domain tuning is the
#: practitioner's job (2 is aggressive for 3-letter adjectives — it
#: merges new/red); the operator contract is the machinery, and the
#: threshold sits in ONE place shared by engine and oracle.
_LEV_MAX = 2

#: Oracle CTE shared by both linkage keys: distinct name types, two
#: blocking passes (head token, tail token), levenshtein edges,
#: recursive reachability closure, min-name component label.
_ER_ORACLE_WITH = f"""
    WITH RECURSIVE types AS (
        SELECT DISTINCT p_name FROM part
    ),
    blocked AS (
        SELECT a.p_name AS na, b.p_name AS nb
        FROM types a JOIN types b
          ON string_split(a.p_name, ' ')[1] = string_split(b.p_name, ' ')[1]
         AND a.p_name < b.p_name
        UNION
        SELECT a.p_name, b.p_name
        FROM types a JOIN types b
          ON string_split(a.p_name, ' ')[-1] = string_split(b.p_name, ' ')[-1]
         AND a.p_name < b.p_name
    ),
    pairs AS (
        SELECT na, nb FROM blocked
        WHERE levenshtein(na, nb) <= {_LEV_MAX}
    ),
    edges AS (
        SELECT na AS src, nb AS dst FROM pairs
        UNION ALL
        SELECT nb, na FROM pairs
    ),
    reach(node, r) AS (
        SELECT p_name, p_name FROM types
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ),
    entity AS (
        SELECT node AS p_name, min(r) AS entity_id FROM reach GROUP BY node
    )
"""


def _entity_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_name, entity_id) on the distinct-name TYPE table.

    Blocking passes generate candidate pairs inside same-token blocks
    only; block COUNT is fixed by the token vocabulary and block SIZE
    by the name vocabulary, so the pairing cost is corpus-size-
    independent — the whole reason to resolve types, not instances.
    """
    # Materialized once (round-15, guide §2.4): `types` feeds both
    # blocking passes' two join sides plus the CC node list — 5
    # references each replaying the scan + distinct.
    types = (
        load(spark, sf_dir, "part").select("p_name").distinct().localCheckpoint()  # row-cap: distinct part-name vocabulary (fixed name lexicon, not corpus rows)
    )
    head = F.split(F.col("p_name"), " ").getItem(0)
    tail = F.element_at(F.split(F.col("p_name"), " "), -1)
    a = types.select(
        F.col("p_name").alias("na"), head.alias("bk"), tail.alias("bk2")
    )
    b = types.select(
        F.col("p_name").alias("nb"), head.alias("bk"), tail.alias("bk2")
    )
    blocked = (
        a.join(b, ["bk"]).select("na", "nb")
        .union(
            a.drop("bk").withColumnRenamed("bk2", "bk")
            .join(b.drop("bk").withColumnRenamed("bk2", "bk"), ["bk"])
            .select("na", "nb")
        )
        .filter(F.col("na") < F.col("nb"))
        .distinct()
    )
    pairs = blocked.filter(F.levenshtein("na", "nb") <= _LEV_MAX)
    labels, _rounds = alternating_cc(
        types.select(F.col("p_name").alias("doc_id")),
        pairs.select(F.col("na").alias("src"), F.col("nb").alias("dst")),
    )
    return labels.select(
        F.col("doc_id").alias("p_name"), F.col("cluster_id").alias("entity_id")
    )


@query(
    "q_er_resolve_entities",
    oracle=f"""
    {_ER_ORACLE_WITH}
    SELECT e.entity_id,
           count(DISTINCT e.p_name) AS n_variants,
           count(*) AS n_parts,
           {_sql_dsum('p.p_retailprice', 'sum_retail')}
    FROM part p JOIN entity e ON p.p_name = e.p_name
    GROUP BY e.entity_id
    """,
)
def q_er_resolve_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution over the part catalog: every
    part row labeled with its canonical entity (min name in the
    levenshtein-variant component), rolled up per entity.

    The corpus-scale stage is exactly one broadcast equi-join (the
    ~64-row type→entity map onto part) plus the rollup — resolution
    itself (blocking, scoring, closure) runs on the type table and
    never touches instance cardinality. Plan contract
    (tests/test_plans.py::test_er_assignment_is_broadcast): the
    assignment join onto part must be a BroadcastHashJoin.
    """
    labels = _entity_labels(spark, sf_dir)
    p = load(spark, sf_dir, "part")
    return (
        p.join(F.broadcast(labels), "p_name", "inner")
        .groupBy("entity_id")
        .agg(
            F.countDistinct("p_name").alias("n_variants"),
            F.count(F.lit(1)).alias("n_parts"),
            _dsum(F.col("p_retailprice"), "sum_retail"),
        )
    )


@query(
    "q_er_golden_record",
    oracle=f"""
    {_ER_ORACLE_WITH},
    labeled AS (
        SELECT e.entity_id, p.p_name, p.p_brand, p.p_retailprice
        FROM part p JOIN entity e ON p.p_name = e.p_name
    ),
    brand_rank AS (
        SELECT entity_id, p_brand,
               row_number() OVER (
                   PARTITION BY entity_id
                   ORDER BY count(*) DESC, p_brand
               ) AS rn
        FROM labeled GROUP BY entity_id, p_brand
    ),
    golden AS (
        SELECT entity_id,
               min(p_name) AS canonical_name,
               max(p_retailprice) AS max_retail,
               count(*) AS n_source_rows
        FROM labeled GROUP BY entity_id
    )
    SELECT g.entity_id, g.canonical_name, b.p_brand AS modal_brand,
           g.max_retail, g.n_source_rows
    FROM golden g
    JOIN brand_rank b ON b.entity_id = g.entity_id AND b.rn = 1
    """,
)
def q_er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: one golden record per resolved entity, every
    attribute picked by a DETERMINISTIC rule — canonical name = min
    variant (the component label), brand = modal value with
    count-desc/brand-asc tiebreak (an arbitrary-row `first()` would be
    partition-order-dependent and unverifiable), price = max observed.

    Same type-level resolution as q_er_resolve_entities; the instance
    table is touched by one broadcast join and two hash aggregates
    (brand histogram per entity, then the record roll-up) — no window
    over instance rows, no shuffle keyed on anything bigger than
    (entity, brand).
    """
    labels = _entity_labels(spark, sf_dir)
    p = load(spark, sf_dir, "part")
    labeled = p.join(F.broadcast(labels), "p_name", "inner").select(
        "entity_id", "p_name", "p_brand", "p_retailprice"
    )
    brand_rank = (
        labeled.groupBy("entity_id", "p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("entity_id").orderBy(
                    F.col("cnt").desc(), F.col("p_brand")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("entity_id", F.col("p_brand").alias("modal_brand"))
    )
    return (
        labeled.groupBy("entity_id")
        .agg(
            F.min("p_name").alias("canonical_name"),
            F.max("p_retailprice").alias("max_retail"),
            F.count(F.lit(1)).alias("n_source_rows"),
        )
        .join(F.broadcast(brand_rank), "entity_id")
        .select(
            "entity_id",
            "canonical_name",
            "modal_brand",
            "max_retail",
            "n_source_rows",
        )
    )
