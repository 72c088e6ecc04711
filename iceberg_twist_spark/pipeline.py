"""End-to-end telemetry pipeline — the reference's main loop, Spark-first.

Composes the reference's literal program (`iceberg-twist/main.py:84-103`
+ the notes.org requirements) as ONE declarative plan:

    byte stream (per-sensor ':'-delimited frames)      A1/A3
      → frame split on 0x3a                            A5
      → frame validation (fixed v2 length)             A35
      → fixed-layout decode incl. counter column       A7/A9/A34
      → 5 Hz → 1 Hz downsample (first sample/minute)   A28
      → per-window report                              A18

Frame format v2 (the notes.org:36-41 schema evolution — record =
(timestamp, position, counter)): 6B header | int32-LE epoch-seconds |
int16-LE s1 | int16-LE s2 | int32-LE counter — 18 bytes, 36 hex chars.

Everything except the struct-unpack is JVM expressions; the decode is
one Arrow-batched pandas UDF. The whole pipeline is deterministic and
DuckDB-oracle-checked end-to-end (the oracle recomputes every stage
directly from the source columns).
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_ts_str, ts_str
from iceberg_twist_spark.ingest.frames import _le_hex
from iceberg_twist_spark.registry import register

FRAME_V2_HEX_LEN = 36  # 18 bytes

FRAME_V2 = T.StructType(
    [
        T.StructField("ts_sec", T.LongType()),
        T.StructField("s1", T.IntegerType()),
        T.StructField("s2", T.IntegerType()),
        T.StructField("counter", T.LongType()),
    ]
)


@pandas_udf(FRAME_V2)
def decode_frame_v2(frame_hex: pd.Series) -> pd.DataFrame:
    """Arrow-batched v2 decode: int32 ts @6, int16 s1/s2 @10/12,
    int32 counter @14 (all little-endian)."""
    ts, s1, s2, ctr = [], [], [], []
    for h in frame_hex:
        b = bytes.fromhex(h)
        t, a, c, n = struct.unpack_from("<ihhi", b, 6)
        ts.append(t)
        s1.append(a)
        s2.append(c)
        ctr.append(n)
    return pd.DataFrame({"ts_sec": ts, "s1": s1, "s2": s2, "counter": ctr})


def build_sensor_streams(events: DataFrame) -> DataFrame:
    """Per-user ':'-delimited hex byte stream, frames ordered by event
    id — the satellite-link payload a sensor would have transmitted."""
    frame_hex = F.concat(
        F.lit("00" * 6),
        _le_hex(F.unix_timestamp("ts"), 4),
        _le_hex((F.col("value") * 100).cast("int") % 32768, 2),
        _le_hex((F.col("event_id") % 32768).cast("int"), 2),
        _le_hex(F.col("event_id").cast("int"), 4),
    )
    return (
        events.select("user_id", "event_id", frame_hex.alias("fh"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(":", F.array_sort(F.collect_list(F.struct("event_id", "fh")))
                        .getField("fh")).alias("stream")
        )
    )


_PIPELINE_ORACLE = f"""
WITH decoded AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
         CAST(CAST(trunc(value * 100) AS BIGINT) % 32768 AS INT) AS s1,
         event_id AS counter
  FROM events
),
by_minute AS (
  SELECT user_id,
         to_timestamp(ts_sec - ts_sec % 60) AS minute_start,
         arg_min(s1, counter) AS s1_first,
         arg_min(ts_sec, counter) AS ts_first,
         CAST(count(*) AS BIGINT) AS n_raw,
         CAST(min(counter) AS BIGINT) AS first_counter
  FROM decoded
  GROUP BY user_id, ts_sec - ts_sec % 60
)
SELECT user_id, {duck_ts_str('minute_start')} AS minute_start,
       s1_first, CAST(ts_first AS BIGINT) AS ts_first, n_raw, first_counter
FROM by_minute
"""


@register("q_telemetry_pipeline", oracle=_PIPELINE_ORACLE, tags=("telemetry", "pipeline"))
def q_telemetry_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole program as one plan (see module docstring).

    Stream assembly → split/explode → length validation → v2 decode →
    per-(user, minute) downsample keeping the first sample by counter
    order. The oracle recomputes the same report straight from the
    source events — any error in assembly, framing, validation, decode,
    or window logic breaks the hash match."""
    events = load_tables(spark, sf_dir)["events"]
    streams = build_sensor_streams(events)
    frames = streams.select(
        "user_id", F.explode(F.split("stream", ":")).alias("fh")
    )
    valid = frames.filter(F.length("fh") == FRAME_V2_HEX_LEN)  # A35
    decoded = valid.select("user_id", decode_frame_v2("fh").alias("r")).select(
        "user_id", "r.ts_sec", "r.s1", "r.counter"
    )
    minute = F.expr("timestamp_seconds(ts_sec - ts_sec % 60)")
    return (
        decoded.groupBy("user_id", minute.alias("m"))
        .agg(
            F.min_by("s1", "counter").alias("s1_first"),
            F.min_by("ts_sec", "counter").alias("ts_first"),
            F.count("*").alias("n_raw"),
            F.min("counter").alias("first_counter"),
        )
        .select(
            "user_id",
            ts_str("m").alias("minute_start"),
            "s1_first",
            "ts_first",
            "n_raw",
            "first_counter",
        )
    )
