"""Date/time-function suite.

Reference surface covered: epoch-seconds timestamps and wall-clock vs
uptime reconciliation (`iceberg-twist/main.py:60-62`,
`iceberg-twist/serial_streaming.lua:219-221`, A22) — generalized to
calendar functions over event-time columns.

Temporal outputs are rendered to strings canonically on both engines
(FIXTURES.md determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_ts_str, ts_str
from iceberg_twist_spark.registry import register

_DATE_ORACLE = f"""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(dayofmonth(o_orderdate) AS BIGINT) AS order_day,
       {duck_ts_str("date_trunc('month', o_orderdate)")} AS order_month_start,
       CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
FROM orders
"""


@register("q_date_funcs", oracle=_DATE_ORACLE, tags=("scalar", "date"))
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/epoch — epoch matches the reference's
    epoch-seconds time model (A22)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        ts_str(F.date_trunc("month", F.col("o_orderdate"))).alias("order_month_start"),
        F.unix_timestamp("o_orderdate").cast("long").alias("order_epoch"),
    )


_DATEDIFF_ORACLE = """
SELECT l.l_orderkey, l.l_linenumber,
       CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS ship_delay_days,
       CAST(datediff('month', o.o_orderdate, l.l_shipdate) AS BIGINT) AS ship_delay_months
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


@register("q_date_diff", oracle=_DATEDIFF_ORACLE, tags=("scalar", "date"))
def q_date_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff across a join (ship delay per line item).

    Note: Spark ``datediff`` counts calendar days (date-truncated);
    month delta is computed as month-boundaries-crossed to match
    DuckDB's ``datediff('month', ...)`` semantics.
    """
    t = load_tables(spark, sf_dir)
    li, o = t["lineitem"], t["orders"]
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("ship_delay_days"),
        (
            (F.year("l_shipdate") - F.year("o_orderdate")) * 12
            + (F.month("l_shipdate") - F.month("o_orderdate"))
        )
        .cast("long")
        .alias("ship_delay_months"),
    )
