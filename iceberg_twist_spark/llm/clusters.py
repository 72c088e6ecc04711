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
DuckDB side unrolls the SAME min-label + pointer-jumping rounds as
fixed CTE stages (see _cc_label_sql) — linear in E per round, log-depth
— so the oracle survives the sf1 zipf mega-component that killed the
earlier transitive-closure formulation at 29 GB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import r4
from iceberg_twist_spark.llm.dedup import _VERIFIED_ORACLE, q_llm_minhash_verified
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
    # Lazy checkpoints throughout the loop: every checkpointed frame
    # is immediately forced by the convergence-sum collect below, so
    # the lazy form materializes the blocks INSIDE that collect's job
    # instead of paying a separate eager-materialization job first —
    # one scheduler round-trip per CC round instead of two, same
    # lineage truncation (r11, guide §1.2: fewer passes).
    sym = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nbr")
    ).unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
    sym = sym.localCheckpoint(eager=False)

    labels = (
        sym.select("node").distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=False)
    # Labels only ever decrease, so the label sum strictly decreases
    # until the fixpoint — a scalar compare replaces the old
    # join-the-previous-round convergence check (one fewer shuffle
    # join per round). Summed as decimal(38,0): with non-ANSI Spark an
    # int64 sum wraps silently, and for callers whose node ids are
    # full-range 64-bit hashes an overflow coincidence could end the
    # loop early. decimal(38,0) holds 2^63 · any realistic node count.
    _label_sum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = labels.agg(_label_sum).collect()[0][0]

    for _ in range(max_iter):
        # each node offers its label to every neighbor; keep the min of
        # (own label, best offer)
        offers = sym.join(labels, "node").select(
            F.col("nbr").alias("node"), "label"
        )
        propagated = (
            labels.unionByName(offers)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: follow label → label-of-label, halving the
        # effective distance to the component minimum each round —
        # convergence in O(log diameter) rounds instead of O(diameter),
        # the property that makes CC tractable on web-scale graphs
        # (large-star/small-star). l_label ≤ label by monotonicity.
        lbl_map = propagated.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        new_labels = (
            propagated.join(lbl_map, propagated.label == lbl_map.l_node)
            .select("node", F.col("l_label").alias("label"))
        ).localCheckpoint(eager=False)
        cur_sum = new_labels.agg(_label_sum).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


# Oracle-side connected components. Was a recursive-CTE transitive
# closure — QUADRATIC in component size: on the sf1 zipf twin's
# ~12M-edge mega-component DuckDB blew past 29 GB and was killed
# (PERF.md, r4 skew rehearsal), so the cluster family could only be
# skew-verified at sf0.1. Now it mirrors the ENGINE's algorithm:
# min-label propagation + pointer jumping, unrolled to a fixed round
# count. Each round is one edge join + one min-aggregate + one
# label→label-of-label jump — O(E + V) memory and work per round, and
# the jump doubles the effective propagation distance per round, so
# _ORACLE_CC_ROUNDS rounds cover any component of diameter
# ≤ 2^_ORACLE_CC_ROUNDS (12 → 4096; near-dup blobs are diameter ≤ ~5).
# MATERIALIZED pins each round to evaluate once (every CTE is
# referenced 2-3 times downstream — inlining would double work per
# reference and go exponential over 12 rounds). Single statement, so
# it remains a valid driver oracle_sql() entry.
_ORACLE_CC_ROUNDS = 12


def _cc_label_sql(pairs_sql: str, rounds: int = _ORACLE_CC_ROUNDS) -> str:
    """Unrolled min-label propagation over the pair graph; yields CTE
    text ending in ``labels(doc_id, cluster_id)``."""
    sql = f"""pairs AS MATERIALIZED ({pairs_sql}),
sym AS MATERIALIZED (
    SELECT doc_a AS node, doc_b AS nbr FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
r0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM sym)"""
    prev = "r0"
    for i in range(1, rounds + 1):
        sql += f""",
p{i} AS MATERIALIZED (
    SELECT x.node, min(x.label) AS label FROM (
        SELECT node, label FROM {prev}
        UNION ALL
        SELECT s.nbr AS node, l.label FROM sym s JOIN {prev} l USING (node)
    ) x GROUP BY x.node
),
r{i} AS MATERIALIZED (
    SELECT p.node, m.label FROM p{i} p JOIN p{i} m ON p.label = m.node
)"""
        prev = f"r{i}"
    sql += f""",
labels AS MATERIALIZED (SELECT node AS doc_id, label AS cluster_id FROM {prev})"""
    return sql


_CLUSTERS_ORACLE = f"""
WITH {_cc_label_sql(_VERIFIED_ORACLE)}
SELECT l.doc_id, l.cluster_id, s.cluster_size
FROM labels l
JOIN (SELECT cluster_id, count(*) AS cluster_size
      FROM labels GROUP BY cluster_id) s USING (cluster_id)
"""


@register("q_llm_dup_clusters", oracle=_CLUSTERS_ORACLE, tags=("llm", "dedup"))
def q_llm_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve verified near-dup pairs into clusters.

    Pairs come from q_llm_minhash_verified (LSH candidates, exact
    Jaccard ≥ 0.2 verification) — the pair tier whose cost is bounded
    by banding rather than shingle-frequency skew, so this chain (and
    everything composed on it: survivorship, the corpus pipeline)
    keeps the same shape at 1M docs as at 1k (r6 corpus bench: the
    previous exact-inverted-index source filled the disk at 1M).

    Output: one row per document in any dup cluster with its cluster
    id (min doc_id in the component — the canonical keeper) and the
    cluster size. Downstream: keep ``doc_id == cluster_id``, drop the
    rest.
    """
    pairs = q_llm_minhash_verified(spark, sf_dir).select("doc_a", "doc_b")
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


_SURVIVOR_ORACLE = f"""
WITH clusters AS ({_CLUSTERS_ORACLE}),
scored AS (
    SELECT d.doc_id,
           coalesce(c.cluster_id, d.doc_id) AS cluster_id,
           floor((d.n_chars * 1.0 / len(string_split(d.text, ' '))) * 10000 + 0.5)
               / 10000 AS score
    FROM documents d LEFT JOIN clusters c USING (doc_id)
),
ranked AS (
    SELECT doc_id, cluster_id, score,
           row_number() OVER (
               PARTITION BY cluster_id ORDER BY score DESC, doc_id
           ) AS rn
    FROM scored
)
SELECT r.doc_id, r.cluster_id, r.score,
       (r.rn = 1) AS is_kept,
       k.doc_id AS keeper_id
FROM ranked r
JOIN (SELECT cluster_id, doc_id FROM ranked WHERE rn = 1) k USING (cluster_id)
"""


@register("q_llm_dedup_survivor", oracle=_SURVIVOR_ORACLE, tags=("llm", "dedup", "window"))
def q_llm_dedup_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: materialize the corpus-level keep/drop decision.

    Every document gets a cluster (its near-dup component, or a
    singleton of itself), the highest-quality member survives
    (mean-word-length score, doc_id tiebreak), and each row carries
    its cluster's keeper id — the full dedup pipeline output a corpus
    build actually writes: candidates (llm/dedup.py) → components
    (connected_components) → survivors. Unclustered docs pass through
    untouched; the survivor rank is a per-cluster WindowGroupLimit.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    clusters = q_llm_dup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    score = r4(F.col("n_chars") * F.lit(1.0) / F.size(F.split("text", " ")))
    scored = (
        docs.select("doc_id", score.alias("score"))
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    keepers = ranked.filter(F.col("rn") == 1).select(
        "cluster_id", F.col("doc_id").alias("keeper_id")
    )
    return ranked.join(keepers, "cluster_id").select(
        "doc_id", "cluster_id", "score",
        (F.col("rn") == 1).alias("is_kept"),
        "keeper_id",
    )


# ------------------------------------------- leakage-safe splitting
# The classic eval-contamination leak: a hash split on doc_id sends
# near-duplicate documents to DIFFERENT splits, so val/test contain
# soft copies of training docs and benchmark numbers inflate. The
# group-aware fix assigns the dup CLUSTER, not the document: every doc
# maps to its component root (singletons root at themselves), the
# 80/10/10 hash gate runs on the ROOT id, and the whole cluster
# inherits the root's split. Scale shape: the cluster labels are the
# iterative-CC output the pipeline already computes; the split itself
# is a pure projection — one left join beyond q_llm_dup_clusters.

_LEAKAGE_SPLIT_CASE = (
    "CASE WHEN substr(md5(cast(root AS varchar)), 1, 2) < 'cc' THEN 'train' "
    "WHEN substr(md5(cast(root AS varchar)), 1, 2) < 'e6' THEN 'val' "
    "ELSE 'test' END"
)

_LEAKAGE_SAFE_ORACLE = f"""
WITH {_cc_label_sql(_VERIFIED_ORACLE)},
rooted AS (
    SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS root
    FROM documents d
    LEFT JOIN (SELECT doc_id, cluster_id FROM labels) l USING (doc_id)
)
SELECT doc_id, root, {_LEAKAGE_SPLIT_CASE} AS split
FROM rooted
"""


@register(
    "q_llm_split_leakage_safe",
    oracle=_LEAKAGE_SAFE_ORACLE,
    tags=("llm", "sample", "dedup"),
)
def q_llm_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test assignment: near-duplicates never
    straddle splits. Each document's split is a pure function of its
    dup-cluster ROOT (min doc_id of its component; itself when it has
    no near-dups), using the same 80/10/10 md5 gate as
    q_llm_split_assign — so adding documents never moves existing
    clusters between splits, and an entire near-dup family lands in
    one split by construction."""
    docs = load_tables(spark, sf_dir)["documents"]
    clusters = q_llm_dup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    rooted = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster_id", "doc_id").alias("root"))
    )
    bucket = F.substring(F.md5(F.col("root").cast("string")), 1, 2)
    split = (
        F.when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test")
    )
    return rooted.select("doc_id", "root", split.alias("split"))
