"""UDF / UDAF / grouped-map surface (Arrow-batched, never row-at-a-time).

Reference surface covered: the per-queue accounting aggregates
(`iceberg-twist/serial_streaming.lua:217-248`, A18) as a grouped-agg
pandas UDF, and per-key record normalization as ``applyInPandas``
(the NS mandate's custom-stateless-operator shape).

Scale notes: grouped-agg / grouped-map UDFs shuffle once on the group
key and stream Arrow batches per group; keys here (returnflag,
user_id) are low-skew. The scalar decode UDF lives in ingest/frames.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import r4
from iceberg_twist_spark.registry import register

_UDAF_ORACLE = """
SELECT l_returnflag,
       floor((min(l_extendedprice)) * 10000 + 0.5) / 10000 AS min_price_udaf,
       floor((max(l_extendedprice) - min(l_extendedprice)) * 10000 + 0.5) / 10000 AS price_span_udaf
FROM lineitem GROUP BY l_returnflag
"""


@pandas_udf(T.DoubleType())
def _min_udaf(v: pd.Series) -> float:
    return float(v.min())


@pandas_udf(T.DoubleType())
def _span_udaf(v: pd.Series) -> float:
    return float(v.max() - v.min())


@register("q_udaf_grouped", oracle=_UDAF_ORACLE, tags=("udf",))
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF (min / span per group) checked against the
    built-in equivalents in SQL."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        r4(_min_udaf("l_extendedprice")).alias("min_price_udaf"),
        r4(_span_udaf("l_extendedprice")).alias("price_span_udaf"),
    )


_NORMALIZE_ORACLE = """
SELECT event_id, user_id,
       floor((CASE WHEN stddev_samp(value) OVER w IS NULL THEN NULL
                  WHEN stddev_samp(value) OVER w = 0 THEN NULL
                  ELSE (value - avg(value) OVER w) / stddev_samp(value) OVER w
             END) * 10000 + 0.5) / 10000 AS value_z
FROM events
WINDOW w AS (PARTITION BY user_id)
"""


@register("q_udtf_apply", oracle=_NORMALIZE_ORACLE, tags=("udf",))
def q_udtf_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-user z-score normalization.

    NaN (single-row or zero-variance groups) is mapped to null to match
    SQL semantics on both engines.
    """
    e = load_tables(spark, sf_dir)["events"]

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        if pd.isna(std) or std == 0.0:
            z = pd.Series([np.nan] * len(pdf), index=pdf.index)
        else:
            z = (pdf["value"] - pdf["value"].mean()) / std
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "value_z": z,
            }
        )
        out["value_z"] = out["value_z"].where(pd.notna(out["value_z"]), None)
        return out

    normalized = (
        e.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(normalize, "event_id bigint, user_id bigint, value_z double")
    )
    # Round JVM-side so rounding matches the SQL oracle bit-for-bit
    # (pandas .round is banker's rounding).
    return normalized.withColumn("value_z", r4("value_z"))


_UDTF_CHUNK_ORACLE = """
SELECT doc_id, CAST(i AS BIGINT) AS chunk_no,
       substr(text, CAST(i * 64 + 1 AS INT), 64) AS piece
FROM (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS i
  FROM documents
)
"""


@register("q_udtf_chunk", oracle=_UDTF_CHUNK_ORACLE, tags=("udf", "udtf"))
def q_udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 ``@udtf``): explode each document into
    64-char chunks — the A33 chunker as a table function, lateral-joined
    per input row. The JVM-expression equivalent is q_chunk_payload;
    this exercises the UDTF surface itself."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no bigint, piece string")
    class ChunkUdtf:
        def eval(self, text: str):
            if text is None:
                return
            for i in range(0, (len(text) + 63) // 64):
                yield i, text[i * 64 : (i + 1) * 64]

    spark.udtf.register("itws_chunk", ChunkUdtf)
    docs = load_tables(spark, sf_dir)["documents"]
    docs.createOrReplaceTempView("itws_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_no, c.piece "
        "FROM itws_udtf_docs d, LATERAL itws_chunk(d.text) c"
    )
