"""Bitwise / binary expression suite.

Reference surface covered: sub-byte bit-packed field decode —
``getBits(4)/getBits(32)/getBits(4)`` and ``getBits(24)/getBits(25)``
(`iceberg-twist/notes.org:56-77`, A36). Spark needs no codegen work
for these: shift/mask expressions compose inside whole-stage codegen
(SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.registry import register

_BITOPS_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
       CAST((o_orderkey >> 4) & 15 AS BIGINT) AS nibble1,
       CAST(o_orderkey >> 8 AS BIGINT) AS high_bits,
       CAST(o_orderkey << 2 AS BIGINT) AS shifted_up,
       CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored
FROM orders
"""


@register("q_bitops", oracle=_BITOPS_ORACLE, tags=("scalar", "binary", "telemetry"))
def q_bitops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-field extraction — getBits(n) as shift+mask expressions (A36)."""
    o = load_tables(spark, sf_dir)["orders"]
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        F.shiftright(k, 4).bitwiseAND(F.lit(15)).cast("long").alias("nibble1"),
        F.shiftright(k, 8).cast("long").alias("high_bits"),
        F.shiftleft(k, 2).cast("long").alias("shifted_up"),
        k.bitwiseXOR(F.lit(21845)).cast("long").alias("xored"),
    )
