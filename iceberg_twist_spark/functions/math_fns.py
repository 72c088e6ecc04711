"""Math-function suite (round/abs/floor/ceil/ln/sqrt/mod).

Derived numeric metrics generalize the reference's kB conversions and
word counts (`iceberg-twist/serial_streaming.lua:221`,
`iceberg-twist/main.py:92`, A11/A18).

Cross-engine notes: DuckDB ``floor``/``ceil`` return DOUBLE while Spark
returns LONG — both sides cast to BIGINT; ``pmod`` is emulated in the
oracle as ``((x % y) + y) % y``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import r2, r4
from iceberg_twist_spark.registry import register

_MATH_ORACLE = """
SELECT o_orderkey,
       floor((o_totalprice) * 100 + 0.5) / 100 AS price_r2,
       floor((abs(o_totalprice - 250000.0)) * 10000 + 0.5) / 10000 AS dist_from_mid,
       CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_kilo_floor,
       CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS price_kilo_ceil,
       floor((ln(o_totalprice)) * 10000 + 0.5) / 10000 AS price_ln,
       floor((sqrt(o_totalprice)) * 10000 + 0.5) / 10000 AS price_sqrt,
       CAST(((o_orderkey % 7) + 7) % 7 AS BIGINT) AS key_pmod7
FROM orders
"""


@register("q_math_funcs", oracle=_MATH_ORACLE, tags=("scalar", "math"))
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        r2("o_totalprice").alias("price_r2"),
        r4(F.abs(F.col("o_totalprice") - 250000.0)).alias("dist_from_mid"),
        F.floor(F.col("o_totalprice") / 1000.0).cast("long").alias("price_kilo_floor"),
        F.ceil(F.col("o_totalprice") / 1000.0).cast("long").alias("price_kilo_ceil"),
        r4(F.log(F.col("o_totalprice"))).alias("price_ln"),
        r4(F.sqrt("o_totalprice")).alias("price_sqrt"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).cast("long").alias("key_pmod7"),
    )


_TRY_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity = 25 THEN NULL
            ELSE floor((l_extendedprice / (l_quantity - 25)) * 10000 + 0.5) / 10000
       END AS price_per_excess,
       TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int
FROM lineitem
"""


@register("q_scalar_try", oracle=_TRY_ORACLE, tags=("scalar", "math"))
def q_scalar_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe scalar surface: ``try_divide`` yields NULL (never an
    error or Inf) where the divisor hits zero, and ``try_cast`` yields
    NULL for an unparseable cast — the error-containment functions a
    pipeline needs so one bad row can't fail a 100 TB job."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select(
        "l_orderkey", "l_linenumber",
        r4(F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25)).alias(
            "price_per_excess"
        ),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
    )
