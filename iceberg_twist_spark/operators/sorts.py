"""Sort / limit / top-k operators.

Scale notes: a global ORDER BY is a range-partitioned sort (sampled
boundaries, no single-reducer bottleneck); ORDER BY + LIMIT k compiles
to TakeOrderedAndProject — per-partition top-k then a k-sized merge on
the driver, which is THE plan you want for top-k over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.registry import register

_SORT_ORACLE = """
SELECT o_orderkey, o_orderstatus, status_or_null, o_totalprice
FROM (
  SELECT o_orderkey, o_orderstatus,
         nullif(o_orderstatus, 'O') AS status_or_null, o_totalprice
  FROM orders
)
ORDER BY status_or_null ASC NULLS LAST, o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("q_sort_multi", oracle=_SORT_ORACLE, tags=("sort",))
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with NULLS LAST + unique tiebreak + limit (the limit
    makes the order semantics hash-observable)."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
    )


_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("q_topk", oracle=_TOPK_ORACLE, tags=("sort",))
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — TakeOrderedAndProject (no full sort, no full shuffle)."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
