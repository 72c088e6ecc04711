"""Array-function suite over the embeddings fixture.

Reference surface covered: byte-slice projection and int16[] sample
vectors (`iceberg-twist/main.py:65-81`, A8/A9) — generalized to array
columns with higher-order functions.

Scale notes: ``transform``/``aggregate`` are Catalyst higher-order
functions evaluated JVM-side per row — no UDF, no Python, no shuffle.
This is the building block the similarity-search operators reuse for
dot products (llm/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import r4
from iceberg_twist_spark.registry import register

_ARRAY_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       floor((CAST(embedding[1] AS DOUBLE)) * 10000 + 0.5) / 10000 AS first_el,
       floor((CAST(embedding[64] AS DOUBLE)) * 10000 + 0.5) / 10000 AS last_el,
       floor((list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)))) * 10000 + 0.5) / 10000 AS head_sum
FROM embeddings
"""


@register("q_array_funcs", oracle=_ARRAY_ORACLE, tags=("scalar", "array"))
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / slice — the A8 byte-slice projection on arrays."""
    e = load_tables(spark, sf_dir)["embeddings"]
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        r4(F.element_at("embedding", 1).cast("double")).alias("first_el"),
        r4(F.element_at("embedding", 64).cast("double")).alias("last_el"),
        r4(
            F.aggregate(
                F.slice("embedding", 1, 8),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            )
        ).alias("head_sum"),
    )


_HOF_ORACLE = """
SELECT vec_id,
       floor((list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 10000 + 0.5) / 10000 AS sum_squares,
       floor((sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) * 10000 + 0.5) / 10000 AS l2_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
"""


@register("q_array_hof", oracle=_HOF_ORACLE, tags=("scalar", "array"))
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions: transform/aggregate/filter (sum of squares,
    L2 norm, positive-count) — all JVM-side, zero Python."""
    e = load_tables(spark, sf_dir)["embeddings"]
    sum_sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        r4(sum_sq).alias("sum_squares"),
        r4(F.sqrt(sum_sq)).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )
