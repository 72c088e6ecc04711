"""String-function suite.

Reference surface covered: hex tracing (`iceberg-twist/main.py:92`,
`iceberg-twist/transparent_serial_proxy.lua:26`, A12), delimiter
splitting (A5), and frame validation via pattern matching
(`iceberg-twist/notes.org:8`, A35).

All expressions are JVM built-ins inside whole-stage codegen — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.registry import register

_STR_ORACLE = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       lower(c_name) AS name_lower,
       substring(c_name, 1, 8) AS name_prefix,
       CAST(length(c_name) AS BIGINT) AS name_len,
       concat(c_mktsegment, ':', c_name) AS seg_name,
       trim(concat('  ', c_name, '  ')) AS name_trim
FROM customer
"""


@register("q_str_funcs", oracle=_STR_ORACLE, tags=("scalar", "string"))
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat("c_mktsegment", F.lit(":"), "c_name").alias("seg_name"),
        F.trim(F.concat(F.lit("  "), "c_name", F.lit("  "))).alias("name_trim"),
    )


_SPLIT_ORACLE = """
SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
FROM part
"""


@register("q_str_split", oracle=_SPLIT_ORACLE, tags=("scalar", "string"))
def q_str_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode — the A5 frame split applied to words."""
    p = load_tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


_REGEXP_ORACLE = """
SELECT p_partkey, p_brand,
       regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked
FROM part
"""


@register("q_str_regexp", oracle=_REGEXP_ORACLE, tags=("scalar", "string"))
def q_str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract/replace — A35 frame validation as pattern matching.
    (Spark regexp_replace is global by default; DuckDB needs the 'g' flag.)
    """
    p = load_tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_masked"),
    )


_HEX_ORACLE = """
SELECT o_orderkey,
       hex(o_orderkey) AS key_hex,
       CAST(o_orderkey AS VARCHAR) AS key_dec_roundtrip
FROM orders
"""


@register("q_str_hex", oracle=_HEX_ORACLE, tags=("scalar", "string", "telemetry"))
def q_str_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hex encode + conv roundtrip — the A12 bytes→hex tracing path.
    ``conv(hex(k),16,10)`` must reproduce the decimal key (oracle states
    the roundtrip identity directly)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.hex("o_orderkey").alias("key_hex"),
        F.conv(F.hex("o_orderkey"), 16, 10).alias("key_dec_roundtrip"),
    )


_MASK_ORACLE = """
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
       CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g'))
            AS BIGINT) AS n_digits,
       right(regexp_replace(c_name, '[^0-9]', '', 'g'), 4) AS last4
FROM customer
"""


@register("q_str_mask", oracle=_MASK_ORACLE, tags=("scalar", "string", "llm"))
def q_str_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit masking / redaction: replace digits with '#', count them,
    keep the last four — the PII-scrub shape (mask account numbers,
    keep a verification suffix) every corpus-cleaning pipeline needs.
    Pure regexp expressions inside codegen; character classes keep the
    Java-regex and RE2 dialects in exact agreement."""
    c = load_tables(spark, sf_dir)["customer"]
    digits_only = F.regexp_replace("c_name", "[^0-9]", "")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked_name"),
        (F.length("c_name") - F.length(F.regexp_replace("c_name", "[0-9]", "")))
        .cast("long")
        .alias("n_digits"),
        F.substring(digits_only, -4, 4).alias("last4"),
    )


_EXTRACT_ALL_ORACLE = """
SELECT p_partkey,
       array_to_string(regexp_extract_all(p_name, '[a-z]+'), ' ') AS words,
       CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
       array_to_string(regexp_extract_all(p_brand, '[0-9]+'), ' ') AS brand_nums
FROM part
"""


@register("q_str_extract_all", oracle=_EXTRACT_ALL_ORACLE, tags=("scalar", "string"))
def q_str_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: every match as an array (words from p_name,
    digit runs from p_brand) — the multi-capture companion to
    q_str_regexp's single-group extract. Character-class patterns keep
    Java regex and RE2 in exact agreement. Array outputs are serialized
    with array_join per the registry convention (see q_agg_collect) —
    the driver's canonicalizer sorts a pandas frame over all columns and
    cannot hash raw list cells (the one red row of CORRECTNESS_r07)."""
    p = load_tables(spark, sf_dir)["part"]
    words = F.regexp_extract_all("p_name", F.lit("[a-z]+"), F.lit(0))
    nums = F.regexp_extract_all("p_brand", F.lit("[0-9]+"), F.lit(0))
    return p.select(
        "p_partkey",
        F.array_join(words, " ").alias("words"),
        F.size(words).cast("long").alias("n_words"),
        F.array_join(nums, " ").alias("brand_nums"),
    )
