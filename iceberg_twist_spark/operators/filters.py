"""Filter / projection operators.

Reference surface covered (SURVEY.md §2.A):
- A10 predicate scan — byte-equality filter (`iceberg-twist/main.py:86`)
- A15 routing / dispatch by key (`iceberg-twist/transparent_serial_proxy.lua:204-215`)
- A11 derived per-record metrics (`iceberg-twist/main.py:92`)

Scale notes: every predicate here is a Catalyst expression, so it is
pushed down to the parquet scan (explain shows PushedFilters) and
evaluated inside whole-stage codegen — zero shuffles, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import r4
from iceberg_twist_spark.registry import register

_EQ_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem WHERE l_returnflag = 'R'
"""


@register("q_filter_eq", oracle=_EQ_ORACLE, tags=("filter",))
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate — the A10 byte-equality scan, pushed to parquet."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )


_RANGE_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20 AND l_discount < 0.05
"""


@register("q_filter_range", oracle=_RANGE_ORACLE, tags=("filter",))
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(
        F.col("l_quantity").between(10, 20) & (F.col("l_discount") < 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


_IN_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderpriority
FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
"""


@register("q_filter_in", oracle=_IN_ORACLE, tags=("filter",))
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate — the A15 SIN/MIN dispatch table as a filter."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )


_LIKE_ORACLE = """
SELECT p_partkey, p_name, p_type
FROM part WHERE p_name LIKE '%red%' AND p_type LIKE 'PRO%'
"""


@register("q_filter_like", oracle=_LIKE_ORACLE, tags=("filter",))
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"]
    return p.filter(
        F.col("p_name").like("%red%") & F.col("p_type").like("PRO%")
    ).select("p_partkey", "p_name", "p_type")


_NULL_ORACLE = """
SELECT o_orderkey,
       nullif(o_orderstatus, 'O') AS status_or_null,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled
FROM orders
WHERE nullif(o_orderstatus, 'O') IS NULL OR o_totalprice > 100000
"""


@register("q_filter_null", oracle=_NULL_ORACLE, tags=("filter",))
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics — isNull / coalesce over a synthesized nullable column
    (the fixtures contain no physical nulls)."""
    o = load_tables(spark, sf_dir)["orders"]
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("OPEN")).alias("status_filled"),
        "o_totalprice",
    ).filter(
        F.col("status_or_null").isNull() | (F.col("o_totalprice") > 100000)
    ).drop("o_totalprice")


_ARITH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000 AS revenue,
       floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000 + 0.5) / 10000 AS charged
FROM lineitem
"""


@register("q_project_arith", oracle=_ARITH_ORACLE, tags=("project",))
def q_project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column projection — the A11 per-frame metric generalized."""
    li = load_tables(spark, sf_dir)["lineitem"]
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(revenue).alias("revenue"),
        r4(revenue * (1 + F.col("l_tax"))).alias("charged"),
    )


_COND_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS price_bucket
FROM orders
"""


@register("q_project_conditional", oracle=_COND_ORACLE, tags=("project",))
def q_project_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN bucketing — the A15 routing switch as an expression."""
    o = load_tables(spark, sf_dir)["orders"]
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return o.select("o_orderkey", bucket.alias("price_bucket"))
