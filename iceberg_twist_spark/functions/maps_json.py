"""Map / JSON function suite over the events.props fixture.

Reference surface covered: the dynamic key/value property model +
recursive key extraction (`iceberg-twist/serial_streaming.lua:188-195,
366-382`, A24/A26) — properties arrive as JSON, keys are introspected,
values extracted by path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.registry import register

_MAP_ORACLE = """
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
       CAST(len(json_keys(props)) AS BIGINT) AS n_keys
FROM events
"""


@register("q_map_funcs", oracle=_MAP_ORACLE, tags=("scalar", "map"))
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → map → sorted key list (A26 ``keys(t)``)."""
    e = load_tables(spark, sf_dir)["events"]
    keys = F.map_keys(F.from_json("props", "map<string,string>"))
    return e.select(
        "event_id",
        F.array_join(F.sort_array(keys), ",").alias("prop_keys"),
        F.size(keys).cast("long").alias("n_keys"),
    )


_JSON_ORACLE = """
SELECT event_id,
       props ->> '$.k' AS k_str,
       CAST(props ->> '$.k' AS BIGINT) AS k_int,
       CAST(props ->> '$.missing' AS VARCHAR) AS missing_val
FROM events
"""


@register("q_json_extract", oracle=_JSON_ORACLE, tags=("scalar", "json"))
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object path extraction (A24 property lookup)."""
    e = load_tables(spark, sf_dir)["events"]
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


_MAP_HOF_ORACLE = """
SELECT doc_id, stat, val FROM (
    SELECT doc_id, 'chars' AS stat, CAST(n_chars * 2 AS BIGINT) AS val
    FROM documents
    UNION ALL
    SELECT doc_id, 'words' AS stat,
           CAST(len(string_split(text, ' ')) * 2 AS BIGINT) AS val
    FROM documents
) WHERE val > 100
"""


@register("q_map_hof", oracle=_MAP_HOF_ORACLE, tags=("scalar", "map"))
def q_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: build a per-doc stats map with
    ``map_from_arrays``, double every value with ``transform_values``,
    drop small entries with ``map_filter``, then explode to rows —
    the property-bag manipulation surface (A26/A24's config tables)
    as pure JVM expressions. The oracle states the same result
    relationally (maps have no cross-engine literal form, so the
    contract is the exploded rows)."""
    docs = load_tables(spark, sf_dir)["documents"]
    m = F.map_from_arrays(
        F.array(F.lit("chars"), F.lit("words")),
        F.array(F.col("n_chars"), F.size(F.split("text", " ")).cast("long")),
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    kept = F.map_filter(doubled, lambda k, v: v > 100)
    return (
        docs.select("doc_id", F.explode(kept).alias("stat", "val"))
        .select("doc_id", "stat", F.col("val").cast("long").alias("val"))
    )
