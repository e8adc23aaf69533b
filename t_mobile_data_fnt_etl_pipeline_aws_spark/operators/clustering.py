"""Near-duplicate clustering: pairs → connected components → canonical doc.

The step a real dedup pipeline runs AFTER candidate generation: MinHash
(q_dedup_fuzzy_minhash) yields near-dup PAIRS, but dropping duplicates
needs CLUSTERS — the transitive closure of the pair graph — and one kept
representative per cluster. Components are computed by iterative
min-label propagation (each node adopts the smallest doc_id reachable so
far) with a driver-side convergence check; the per-iteration work is two
hash joins + an aggregate, all executor-side.

Scale design (100 TB): this is the bounded-iteration pattern behind
GraphX/GraphFrames connected components — O(diameter) rounds, each a
shuffle keyed on node id. Near-dup graphs have tiny diameters (dup
clusters are cliques-ish), so 3-4 rounds close real corpora; the
large-star/small-star optimization (Kiveris et al., "Connected
Components in MapReduce and Beyond") halves rounds on adversarial chains
but isn't needed for dedup graphs. Edges here come from the bounded
exact-Jaccard slice (doc_id < 500) so the DuckDB recursive-CTE oracle
can verify the closure exactly at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load
from .dedup import _shingles, _tokens

#: Jaccard edge threshold for the cluster graph (looser than the ≥0.5
#: near-dup report so chains of moderately-similar docs merge).
_EDGE_J = 0.3

#: shared oracle CTE: nodes (bounded slice), symmetric jaccard edges,
#: reachability closure, min-reachable-label per node = component id.
_CC_ORACLE_WITH = f"""
    WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2]
               )) AS shingles
        FROM documents WHERE doc_id < 500
    ),
    pair AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE cast(len(list_intersect(a.shingles, b.shingles)) as double) /
              (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) >= {_EDGE_J}
    ),
    edges AS (
        SELECT src, dst FROM pair UNION ALL SELECT dst, src FROM pair
    ),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM sh
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ),
    comp AS (
        SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
    )
"""


def _components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for the bounded slice via label propagation."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    sh = d.select("doc_id", _shingles(_tokens()).alias("sh"))
    a = sh.select(F.col("doc_id").alias("src"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("dst"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (
        F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    ).cast("double")
    pair = (
        a.join(b, F.col("src") < F.col("dst"))
        .filter(inter / union >= _EDGE_J)
        .select("src", "dst")
    )
    # materialize the (quadratic, bounded) pair join ONCE — every
    # propagation round re-reads the edge list, and localCheckpoint
    # truncates the lineage so round k's plan doesn't re-plan rounds 1..k-1.
    edges = pair.union(
        pair.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()

    labels = sh.select("doc_id", F.col("doc_id").alias("cluster_id"))
    for _ in range(8):  # >= diameter of any fixture dup-cluster
        nbr = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(nbr, labels.doc_id == nbr.dst, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), on="doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


@query(
    "q_dedup_clusters_cc",
    oracle=f"""
    {_CC_ORACLE_WITH}
    SELECT c.doc_id, c.cluster_id,
           count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
    FROM comp c
    """,
)
def q_dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup graph: every doc in the
    bounded slice labeled with its cluster (min reachable doc_id) and
    the cluster's size — singletons are their own cluster of 1."""
    labels = _components(spark, sf_dir)
    from pyspark.sql import Window

    return labels.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
    )


@query(
    "q_dedup_keep_canonical",
    oracle=f"""
    {_CC_ORACLE_WITH}
    SELECT d.lang,
           count(*) AS n_docs,
           count(DISTINCT c.cluster_id) AS n_kept,
           count(*) - count(DISTINCT c.cluster_id) AS n_dropped
    FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    GROUP BY d.lang
    """,
)
def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rewrite summary: keep one canonical doc (the min doc_id =
    the cluster label itself) per near-dup cluster, count survivors and
    drops per language — the dedup pipeline's final accounting."""
    labels = _components(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        labels.join(d, on="doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_kept"),
            (F.count(F.lit(1)) - F.countDistinct("cluster_id")).alias(
                "n_dropped"
            ),
        )
    )
