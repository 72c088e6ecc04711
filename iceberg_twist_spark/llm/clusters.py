"""Duplicate-cluster resolution — connected components over near-dup pairs.

Candidate generators (llm/dedup.py) emit PAIRS; production dedup needs
CLUSTERS: if A~B and B~C, one keeper must survive for {A,B,C} even
though A~C was never scored. That closure is a connected-components
problem on the similarity graph.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the min of its own and its
neighbors' labels; converged when no label changes. Rounds needed =
graph diameter — for dedup graphs this is small (near-dup clusters are
dense blobs, typically diameter ≤ 3), so the driver loop runs a
handful of bounded iterations, each ONE shuffle join + ONE min-agg.
``localCheckpoint`` truncates the lineage each round so the plan stays
flat regardless of iteration count. This is the degenerate-but-
sufficient form of the large-star/small-star CC algorithm; at 100 TB
the same loop runs with labels hash-partitioned by node and AQE
handling skewed hub nodes.

The registered query is oracle-checked despite being iterative: the
DuckDB side computes the same components with a recursive CTE
(transitive closure is affordable because only near-dup docs — a tiny
fraction of the corpus — enter the graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.llm.dedup import _JACCARD_ORACLE, q_llm_ngram_jaccard
from iceberg_twist_spark.registry import register

CC_MAX_ITER = 20


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = CC_MAX_ITER
) -> DataFrame:
    """(node, label) for every node touched by an edge; label = min
    node id in the component.

    Deterministic: labels are ids, propagation is min() — no RNG, no
    ordering sensitivity, so the result is identical on any engine or
    partitioning.
    """
    sym = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nbr")
    ).unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select("node").distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # each node offers its label to every neighbor; keep the min of
        # (own label, best offer)
        offers = sym.join(labels, "node").select(
            F.col("nbr").alias("node"), "label"
        )
        new_labels = (
            labels.unionByName(offers)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a AND r.a <> e.b
),
labels AS (
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
)
SELECT l.doc_id, l.cluster_id, s.cluster_size
FROM labels l
JOIN (SELECT cluster_id, count(*) AS cluster_size
      FROM labels GROUP BY cluster_id) s USING (cluster_id)
"""


@register("q_llm_dup_clusters", oracle=_CLUSTERS_ORACLE, tags=("llm", "dedup"))
def q_llm_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve 3-gram-Jaccard near-dup pairs into clusters.

    Output: one row per document in any dup cluster with its cluster
    id (min doc_id in the component — the canonical keeper) and the
    cluster size. Downstream: keep ``doc_id == cluster_id``, drop the
    rest.
    """
    pairs = q_llm_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b")
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "cluster_size",
        )
    )
