"""Set operations — union / intersect / except / distinct.

The reference's event multiplexer unions N event queues into one loop
(`iceberg-twist/serial_streaming.lua:282-320`, A16); DISTINCT is the
degenerate exact-dedup case (NS mandate).

Scale notes: UNION ALL is a zero-shuffle concatenation of children;
INTERSECT/EXCEPT/DISTINCT each hash-shuffle on the full row — keep the
projected width minimal before applying them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.registry import register

_UNION_ORACLE = """
SELECT o_orderkey, o_orderpriority, 'urgent' AS slice_tag
FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_orderpriority, 'low' AS slice_tag
FROM orders WHERE o_orderpriority = '5-LOW'
"""


@register("q_set_union", oracle=_UNION_ORACLE, tags=("setop",))
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered slices (the A16 queue multiplex)."""
    o = load_tables(spark, sf_dir)["orders"]
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority", F.lit("urgent").alias("slice_tag")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_orderkey", "o_orderpriority", F.lit("low").alias("slice_tag")
    )
    return urgent.unionByName(low)


_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("q_set_intersect", oracle=_INTERSECT_ORACLE, tags=("setop",))
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.intersect(o_cust)


_EXCEPT_ORACLE = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
"""


@register("q_set_except", oracle=_EXCEPT_ORACLE, tags=("setop",))
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    all_cust = t["customer"].select(F.col("c_custkey").alias("custkey"))
    p_cust = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return all_cust.subtract(p_cust)


_DISTINCT_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


@register("q_distinct", oracle=_DISTINCT_ORACLE, tags=("setop", "dedup"))
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select("l_returnflag", "l_linestatus").distinct()
