"""Modern Spark 4 SQL surface — VARIANT semi-structured type,
LATERAL correlated subqueries, and recursive CTEs.

The reference's property/message model is semi-structured key/value
data decoded ad hoc (`iceberg-twist/serial_streaming.lua:366-381`
property tables; JSON-ish `props` on the events fixture). Spark 4
gives that surface first-class types and SQL forms; these operators
pin each one with a DuckDB oracle so the engine's SQL entry point
(SURVEY §3.4 #2) is exercised as thoroughly as the DataFrame API.

Scale notes: VARIANT parses once into a binary-encoded tree (cheaper
than repeated ``get_json_object`` string re-parsing — one decode, many
typed extractions); the LATERAL per-group top-k plans as a window
group-limit, not a per-row re-execution; the recursive CTE iterates
join+filter steps exactly like the PageRank loop, with the frontier
shrinking each round and the depth bound capping state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.registry import register

_VARIANT_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       json_extract(props, '$.missing') IS NULL AS no_missing_path
FROM events
WHERE props IS NOT NULL
"""


@register("q_json_variant", oracle=_VARIANT_ORACLE, tags=("scalar", "json", "spark4"))
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of the events ``props`` JSON: one
    ``parse_json`` decode, then typed ``try_variant_get`` extractions
    (int value, derived bucket, and a miss that must be NULL, not an
    error). The scale win over get_json_object is decode-once: VARIANT
    stores a binary tree, so N extractions don't re-parse N times."""
    events = load_tables(spark, sf_dir)["events"]
    v = events.filter(F.col("props").isNotNull()).select(
        "event_id", F.parse_json("props").alias("v")
    )
    k = F.try_variant_get("v", "$.k", "int")
    return v.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_bucket"),
        F.try_variant_get("v", "$.missing", "string").isNull().alias("no_missing_path"),
    )


_LATERAL_SQL = """
SELECT r.r_name, t.n_name, t.n_cust
FROM region r
JOIN LATERAL (
    SELECT n.n_name, count(*) AS n_cust
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    ORDER BY n_cust DESC, n_name
    LIMIT 2
) t ON true
"""

_LATERAL_ORACLE = """
SELECT r.r_name, t.n_name, CAST(t.n_cust AS BIGINT) AS n_cust
FROM region r
JOIN LATERAL (
    SELECT n.n_name, count(*) AS n_cust
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    ORDER BY n_cust DESC, n_name
    LIMIT 2
) t ON true
"""


@register("q_lateral_topk", oracle=_LATERAL_ORACLE, tags=("join", "subquery", "spark4"))
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: per region, the top-2 nations by
    customer count — the SQL-native form of per-group top-k. Catalyst
    decorrelates the lateral into a join + ranked window (same plan
    family as q_win_topk_group), not a per-outer-row re-execution."""
    t = load_tables(spark, sf_dir)
    for name in ("region", "nation", "customer"):
        t[name].createOrReplaceTempView(name)
    return spark.sql(_LATERAL_SQL).select(
        "r_name", "n_name", F.col("n_cust").cast("long").alias("n_cust")
    )


REACH_DEPTH = 2

_REACH_SQL_BODY = """
WITH RECURSIVE
edges AS (
    SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst FROM lineitem
    UNION
    SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM lineitem
),
reach(node, depth) AS (
    SELECT 's1' AS node, 0 AS depth
    UNION ALL
    SELECT e.dst AS node, r.depth + 1 AS depth
    FROM reach r JOIN edges e ON e.src = r.node
    WHERE r.depth < {d}
)
SELECT node, CAST(min(depth) AS BIGINT) AS depth
FROM reach GROUP BY node
""".format(d=REACH_DEPTH)


@register("q_cte_recursive", oracle=_REACH_SQL_BODY, tags=("subquery", "graph", "spark4"))
def q_cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): supply-chain reachability — every
    part/supplier within 2 hops of supplier s1 in the lineitem
    bipartite graph, labeled with its shortest hop depth. The same
    SQL text runs on both engines. The depth bound caps the frontier;
    min(depth) collapses the UNION ALL path multiplicity."""
    t = load_tables(spark, sf_dir)
    t["lineitem"].createOrReplaceTempView("lineitem")
    return spark.sql(_REACH_SQL_BODY)
