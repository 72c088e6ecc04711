"""Live streaming sources — the reference's serial ports, beyond replay.

A1/A2 (`iceberg-twist/main.py:34-40` timed-drain reads;
`iceberg-twist/main.lua:29-43` sized reads with timeout) are continuous
byte sources the service decodes as it reads. The file-replay harness in
``jobs.py`` proves the *operators*; this module proves the *source*
story with Spark's generator sources — no staged files anywhere:

- ``q_stream_rate_frames`` uses ``rate-micro-batch`` (deterministic:
  fixed rows-per-batch, fixed start timestamp) under
  ``Trigger.AvailableNow`` so the run is bounded and exactly
  reproducible — which makes the full frame-encode → Arrow-decode path
  HASH-CHECKABLE against a DuckDB ``range()`` oracle, unlike every
  replay-based streaming query (rows-only).
- ``read_live_rate_frames`` is the genuinely-live wall-clock variant
  (``format("rate")``): unbounded micro-batches at a configured
  rows/sec, the shape a serial port or Kafka topic presents. The
  integration test drives it for a few real micro-batches and checks
  every decoded record (tests/test_streaming.py).

Both reuse the byte-layout round trip from ``ingest/frames.py``: the
frame is assembled with JVM expressions (6-byte header, little-endian
int32 epoch at offset 6, two int16 samples at offset 10) and decoded by
the Arrow-batched ``decode_frame_hex`` pandas UDF — the only Python in
the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.ingest.frames import _le_hex, decode_frame_hex
from iceberg_twist_spark.registry import register
from iceberg_twist_spark.streaming.jobs import run_to_memory

# Deterministic telemetry derivation from the generator's `value`:
# epoch anchor keeps ts_sec int32-safe; both samples are int16-safe.
_EPOCH_ANCHOR = 1_700_000_000
_RATE_ROWS = 500


def encode_decode_frames(stream: DataFrame) -> DataFrame:
    """value → hex frame (JVM exprs) → Arrow decode → decoded record.

    The same offset-6/offset-10 layout as ``build_event_frames``; the
    encode stays in whole-stage codegen, the decode is one
    ``ArrowEvalPython`` node.
    """
    v = F.col("value")
    frame_hex = F.concat(
        F.lit("00" * 6),
        _le_hex((v + _EPOCH_ANCHOR).cast("int"), 4),
        _le_hex((v % 32768).cast("int"), 2),
        _le_hex(((v * 7) % 32768).cast("int"), 2),
    )
    rec = decode_frame_hex(frame_hex)
    return stream.select(
        v.alias("value"),
        rec["ts_sec"].alias("ts_sec"),
        rec["s1"].alias("s1"),
        rec["s2"].alias("s2"),
    )


def read_live_rate_frames(spark: SparkSession, rows_per_second: int = 200) -> DataFrame:
    """Unbounded live source: wall-clock ``rate`` rows → decoded frames.

    Run with a processing-time trigger and stop when enough arrived —
    exactly how the reference drains its port until the read budget is
    met (`iceberg-twist/main.py:85,94`).
    """
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", 2)
        .load()
    )
    return encode_decode_frames(stream)


_RATE_ORACLE = f"""
SELECT CAST(r.range AS BIGINT) AS value,
       CAST(r.range + {_EPOCH_ANCHOR} AS BIGINT) AS ts_sec,
       CAST(r.range % 32768 AS INT) AS s1,
       CAST((r.range * 7) % 32768 AS INT) AS s2
FROM range({_RATE_ROWS}) r
"""


@register("q_stream_rate_frames", oracle=_RATE_ORACLE, tags=("streaming", "source"))
def q_stream_rate_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic generator-source run: one bounded micro-batch of
    {n} rows through encode → decode, hash-checked against range().

    ``sf_dir`` is unused — the source is the generator itself; that is
    the point (no staged files, a real streaming source node in the
    plan).
    """
    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", _RATE_ROWS)
        .option("numPartitions", 4)
        .option("startTimestamp", 0)
        .load()
    )
    return run_to_memory(encode_decode_frames(stream))


q_stream_rate_frames.__doc__ = q_stream_rate_frames.__doc__.format(n=_RATE_ROWS)
