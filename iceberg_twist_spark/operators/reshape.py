"""Reshape operators — unpivot (wide→long melt).

Complement of the pivot in operators/aggregates.py (q_agg_pivot). The
reference's schema evolution (25 columns → 8, `iceberg-twist/
notes.org:36-39`) is exactly a wide→long→wide reshaping problem:
melting measure columns into (measure, value) rows is how a pipeline
re-shapes telemetry for per-measure processing without N separate
scans.

Scale notes: unpivot is a narrow Expand node — each input row emits
one output row per measure column in the same task, no shuffle, and
column pruning still reaches the scan (only the id + melted columns
are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_r4, r4
from iceberg_twist_spark.registry import register

_MEASURES = ("l_quantity", "l_discount", "l_tax")

_UNPIVOT_ORACLE = f"""
SELECT l_orderkey, l_linenumber, measure, {duck_r4('val')} AS val
FROM (
    {" UNION ALL ".join(
        f"SELECT l_orderkey, l_linenumber, '{m}' AS measure, {m} AS val "
        f"FROM lineitem WHERE l_orderkey < 1000"
        for m in _MEASURES
    )}
)
"""


@register("q_unpivot", oracle=_UNPIVOT_ORACLE, tags=("reshape", "project"))
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt three lineitem measures into (measure, val) long form.

    Uses the native ``unpivot`` API (Expand node); the oracle spells
    the equivalent UNION ALL. Result keyed by (orderkey, linenumber,
    measure) so the long form stays uniquely addressable.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_orderkey") < 1000)
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=list(_MEASURES),
            variableColumnName="measure",
            valueColumnName="raw_val",
        )
        .select(
            "l_orderkey", "l_linenumber", "measure", r4(F.col("raw_val")).alias("val")
        )
    )
