"""Fuzzy (edit-distance) matching with blocking.

Entity-resolution primitive: find name pairs within small edit
distance WITHOUT the O(n²) all-pairs scan. The classic recipe is
block → compare: an equi join on a cheap blocking key (here the first
word) bounds candidate pairs to same-block mass, then the exact
Levenshtein runs only on candidates — the same never-go-quadratic
shape as the shingle/band joins in llm/dedup.py.

Scale notes: the blocking join is a plain hash-partitioned equi join
(AQE-splittable; a skewed block is just a skewed key). Levenshtein is
a JVM built-in evaluated on the bounded candidate set. Recall is the
blocking key's business: a production resolver unions several keys
(first token, prefix, phonetic code) and dedups candidates — each key
is the same plan repeated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.registry import register

_FUZZY_ORACLE = """
WITH n AS (SELECT DISTINCT p_name FROM part),
p AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM n)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM p a JOIN p b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
"""


@register("q_fuzzy_join", oracle=_FUZZY_ORACLE, tags=("join", "dedup", "text"))
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part-name pairs: same first word, edit distance 1–3.

    Distinct names first (dedup before compare), then the blocked
    candidate join, then exact Levenshtein as a residual — candidates
    never exceed same-block pairs.
    """
    part = load_tables(spark, sf_dir)["part"]
    names = part.select("p_name").distinct()
    p = names.withColumn("blk", F.element_at(F.split("p_name", " "), 1))
    a = p.select(F.col("p_name").alias("name_a"), F.col("blk").alias("blk_a"))
    b = p.select(F.col("p_name").alias("name_b"), F.col("blk").alias("blk_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .filter(dist.between(1, 3))
        .select("name_a", "name_b", dist.cast("long").alias("edit_dist"))
    )
