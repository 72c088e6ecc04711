"""Scan operators — parquet full scan, projected scan, framed-binary scan.

Reference surface covered (SURVEY.md §2.A):
- A3 binary/whole-file source (`iceberg-twist/main.py:43-47`)
- A5 frame split on the ``0x3a`` (':') delimiter
  (`iceberg-twist/main.py:87,101`)
- A11 per-frame length metric (`iceberg-twist/main.py:92`)
- A29 column drop / projection (`iceberg-twist/notes.org:18,36-39`)

Scale notes: projection is declared via ``select`` so Catalyst prunes
columns down to the parquet reader (ReadSchema shows only the selected
columns); the frame splitter is pure ``split``+``explode`` — narrow,
whole-stage-codegen'd, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_ts_str, ts_str
from iceberg_twist_spark.registry import register

_SCAN_ORACLE = f"""
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
       {duck_ts_str('l_shipdate')} AS ship_date
FROM lineitem
"""


@register("q_scan_parquet", oracle=_SCAN_ORACLE, tags=("scan",))
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of lineitem (timestamp rendered canonically)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        ts_str("l_shipdate").alias("ship_date"),
    )


_PROJ_ORACLE = """
SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
"""


@register("q_scan_projection", oracle=_PROJ_ORACLE, tags=("scan",))
def q_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan — Catalyst pushes the 3-column ReadSchema to parquet."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select("l_orderkey", "l_partkey", "l_quantity")


_BINARY_ORACLE = """
SELECT doc_id, frame, length(frame) AS frame_len
FROM (
  SELECT doc_id, unnest(string_split(replace(text, ' ', ':'), ':')) AS frame
  FROM documents
)
"""


@register("q_scan_binary", oracle=_BINARY_ORACLE, tags=("scan", "telemetry"))
def q_scan_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimiter-framed telemetry scan.

    Re-expresses the reference's frame pipeline — a byte stream split on
    the ``0x3a``/':' delimiter with a per-frame length metric
    (`iceberg-twist/main.py:87,92,101`) — over a deterministic text
    fixture: each document becomes a ':'-delimited stream, exploded to
    one row per frame.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    frames = docs.select(
        "doc_id",
        F.explode(F.split(F.regexp_replace("text", " ", ":"), ":")).alias("frame"),
    )
    return frames.select("doc_id", "frame", F.length("frame").alias("frame_len"))


_TABLE_FILES = [
    "customer.parquet", "documents.parquet", "embeddings.parquet",
    "events.parquet", "lineitem.parquet", "nation.parquet",
    "orders.parquet", "part.parquet", "region.parquet",
    "supplier.parquet",
]

_BINARYFILE_ORACLE = (
    "SELECT unnest(["
    + ", ".join(f"'{f}'" for f in _TABLE_FILES)
    + "]) AS file_name, TRUE AS magic_ok"
)


@register("q_source_binaryfile", oracle=_BINARYFILE_ORACLE, tags=("scan", "source"))
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary source (A3): each parquet file as an opaque
    blob, now checked (r4 upgrade from rows-only): the listing must be
    exactly the fixture's ten tables and every blob must carry the
    PAR1 parquet magic at both ends — validated from the CONTENT
    bytes, like the reference validates frame markers
    (`iceberg-twist/main.py:43-47`). File sizes/mtimes stay
    environmental and out of the hash.

    Layout-independent (r5, ADVICE): the driver fixture writes each
    table as ONE ``<table>.parquet`` file, but every generated twin
    (tools/gen_sf.py) writes a ``<table>.parquet/`` DIRECTORY of
    ``part-*.snappy.parquet`` files. Paths normalize to the table
    entry's name (the path element ending in ``.parquet``), and
    ``magic_ok`` aggregates over the entry's content files with
    ``bool_and`` — so the result is the same ten rows on both layouts
    and the static oracle holds on the sf1/sf3/zipf twins too.
    ``pathGlobFilter`` keeps ``_SUCCESS`` markers out of the scan."""
    magic = F.encode(F.lit("PAR1"), "utf-8")
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(f"{sf_dir}/*.parquet")
    )
    entry = F.regexp_extract("path", r"([^/]+\.parquet)(/[^/]+)?$", 1)
    per_file_ok = (
        (F.substring("content", 1, 4) == magic)
        & (F.substring(F.col("content"), -4, 4) == magic)
        & (F.length("content") == F.col("length"))
    )
    return (
        blobs.select(entry.alias("file_name"), per_file_ok.alias("ok"))
        .groupBy("file_name")
        .agg(F.bool_and("ok").alias("magic_ok"))
    )
