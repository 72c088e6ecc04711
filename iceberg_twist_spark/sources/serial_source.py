"""Spark-4 Python DataSource connector for the reference's serial
telemetry link (A1/A2 — `iceberg-twist/main.py:21-41` opens the port
and reads framed sensor packets; `transparent_serial_proxy.lua:84-130`
validates frame checksums and drops corrupt frames).

``SerialTelemetryDataSource`` is a first-class `spark.read.format`
connector built on the PySpark 4 ``pyspark.sql.datasource`` API — the
idiomatic way to graft a device protocol into Spark (vs. staging files
out-of-band). Each ``InputPartition`` is one logical port: partitions
generate/read their frame stripe independently, so a deployment with
N devices reads N-way parallel with no driver involvement; here the
device is stood in by a seeded generator (no hardware in this
container), emitting the SAME wire format the reference speaks:

    0xAA 0x55 | sensor u8 | ts_offset u32be | value-cents u32be | crc u8

crc = sum of payload bytes mod 256; the generator corrupts every 97th
frame's crc, and the source RECOMPUTES the checksum from the raw bytes
(like the proxy) rather than trusting a flag — `crc_ok` is validation
output, not input. All fields are md5-derived pure functions of
``frame_id``, so a DuckDB oracle reproduces the decoded stream exactly
and the whole connector path (generate → pack → validate → decode) is
hash-checked end-to-end.
"""

from __future__ import annotations

import datetime
import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from iceberg_twist_spark.common import duck_r4, duck_ts_str, r4, ts_str
from iceberg_twist_spark.registry import register

_EPOCH0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
_CORRUPT_EVERY = 97

_SCHEMA = (
    "frame_id long, sensor_id int, ts timestamp, value double, "
    "crc_ok boolean, raw binary"
)


def _u32(key: str) -> int:
    """First 8 md5 hex digits as uint32 — the repo's cross-engine
    deterministic-hash convention (DuckDB: '0x'||substr(md5..)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def _frame(frame_id: int, n_sensors: int) -> tuple:
    sensor = _u32(f"{frame_id}:s") % n_sensors
    ts_off = frame_id  # 1 Hz global sequence
    cents = _u32(f"{frame_id}:v") % 1_000_000
    payload = bytes([sensor]) + ts_off.to_bytes(4, "big") + cents.to_bytes(4, "big")
    crc = sum(payload) % 256
    stored = (crc + 1) % 256 if frame_id % _CORRUPT_EVERY == 0 else crc
    raw = b"\xaa\x55" + payload + bytes([stored])
    # validate like the proxy: recompute from the wire bytes
    crc_ok = sum(raw[2:11]) % 256 == raw[11]
    return (
        frame_id,
        sensor,
        _EPOCH0 + datetime.timedelta(seconds=ts_off),
        cents / 100.0,
        crc_ok,
        raw,
    )


class _PortPartition(InputPartition):
    def __init__(self, port: int, n_ports: int, n_frames: int, n_sensors: int):
        self.port = port
        self.n_ports = n_ports
        self.n_frames = n_frames
        self.n_sensors = n_sensors


class _SerialReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_frames = int(options.get("n_frames", 10_000))
        self.n_ports = int(options.get("n_ports", 8))
        self.n_sensors = int(options.get("n_sensors", 16))

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _PortPartition(p, self.n_ports, self.n_frames, self.n_sensors)
            for p in range(self.n_ports)
        ]

    def read(self, part: _PortPartition) -> Iterator[tuple]:
        # stripe by modulus: port p owns frame ids ≡ p (mod n_ports)
        for fid in range(part.port, part.n_frames, part.n_ports):
            yield _frame(fid, part.n_sensors)


class _SerialStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch pull from the port: each ``read`` drains whatever
    frames arrived since the last offset (here: a fixed chunk of the
    bounded generator; a live port would drain its buffer). Offsets
    are frame counters, so restart/replay re-reads the exact range —
    the property checkpoint recovery depends on."""

    def __init__(self, options: dict):
        self.n_frames = int(options.get("n_frames", 10_000))
        self.n_sensors = int(options.get("n_sensors", 16))
        self.chunk = int(options.get("frames_per_batch", 5_000))

    def initialOffset(self) -> dict:
        return {"frame": 0}

    def read(self, start: dict):
        lo = int(start["frame"])
        hi = min(lo + self.chunk, self.n_frames)
        # iter(list), not a bare generator or list: the prefetch cache
        # copy.copy()s the entry (kills generators) AND calls next() on
        # it (kills bare lists); a list_iterator survives both
        return (
            iter([_frame(fid, self.n_sensors) for fid in range(lo, hi)]),
            {"frame": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                _frame(fid, self.n_sensors)
                for fid in range(int(start["frame"]), int(end["frame"]))
            ]
        )


class SerialTelemetryDataSource(DataSource):
    """``spark.read.format("itws_serial")`` (batch) and
    ``spark.readStream.format("itws_serial")`` (micro-batch) — options:
    n_frames, n_ports (batch parallelism), n_sensors,
    frames_per_batch (stream chunk)."""

    @classmethod
    def name(cls) -> str:
        return "itws_serial"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _SerialReader:  # noqa: ANN001
        return _SerialReader(self.options)

    def simpleStreamReader(self, schema) -> _SerialStreamReader:  # noqa: ANN001
        return _SerialStreamReader(self.options)


def register_serial_source(spark: SparkSession) -> None:
    """Idempotently register the connector with the session.

    Only the duplicate-registration case is swallowed — a genuine
    failure (missing pyspark.sql.datasource API, schema error) must
    propagate here, not resurface later as a confusing
    'format itws_serial not found' at read time."""
    try:
        spark.dataSource.register(SerialTelemetryDataSource)
    except Exception as exc:  # noqa: BLE001
        msg = str(exc).lower()
        if "already" in msg and "regist" in msg:
            return
        raise


_N_FRAMES = 50_000
_N_SENSORS = 16

# The oracle rebuilds the decoded stream from frame ids alone: every
# emitted field is the same md5 arithmetic, and crc_ok is the spec'd
# corruption rule (the Spark side recomputes it from wire bytes — that
# the two agree IS the packing/validation check).
_PYDS_ORACLE = f"""
WITH f AS (
  SELECT i AS frame_id,
         CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':s'), 1, 8) AS BIGINT)
           % {_N_SENSORS} AS sensor_id,
         TIMESTAMP '2024-01-01 00:00:00' + to_seconds(i) AS ts,
         (CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':v'), 1, 8) AS BIGINT)
           % 1000000) / 100.0 AS value,
         i % {_CORRUPT_EVERY} <> 0 AS crc_ok
  FROM generate_series(0, {_N_FRAMES - 1}) t(i)
)
SELECT sensor_id,
       CAST(count(*) FILTER (WHERE crc_ok) AS BIGINT) AS n_ok,
       CAST(count(*) FILTER (WHERE NOT crc_ok) AS BIGINT) AS n_dropped,
       {duck_r4('sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) FILTER (WHERE crc_ok) / 100.0 / count(*) FILTER (WHERE crc_ok)')} AS avg_value,
       {duck_ts_str('max(ts) FILTER (WHERE crc_ok)')} AS last_ts
FROM f
GROUP BY sensor_id
"""


@register("q_source_pyds", oracle=_PYDS_ORACLE, tags=("source", "stream"))
def q_source_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor rollup with loss accounting read THROUGH the Python
    DataSource connector: 8 port-partitions generate/validate frames in
    parallel (Arrow-batched into the JVM), and the aggregate is the
    reference's health counters (A18-A20): delivered frames, dropped
    (crc-fail) frames, mean value, last timestamp. The oracle rebuilds
    the same stream arithmetically — packing, validation, decode, and
    rollup all hash-match."""
    register_serial_source(spark)
    frames = (
        spark.read.format("itws_serial")
        .option("n_frames", _N_FRAMES)
        .option("n_sensors", _N_SENSORS)
        .load()
    )
    return _rollup(frames)


def _rollup(frames: DataFrame) -> DataFrame:
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    ok = F.col("crc_ok")
    return frames.groupBy("sensor_id").agg(
        F.count(F.when(ok, 1)).cast("long").alias("n_ok"),
        F.count(F.when(~ok, 1)).cast("long").alias("n_dropped"),
        r4(F.sum(F.when(ok, cents)) / 100.0 / F.count(F.when(ok, 1))).alias(
            "avg_value"
        ),
        ts_str(F.max(F.when(ok, F.col("ts")))).alias("last_ts"),
    )


@register("q_stream_pyds", oracle=_PYDS_ORACLE, tags=("streaming", "source"))
def q_stream_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME per-sensor loss-accounting rollup, read through the
    connector's STREAMING face: the SimpleDataSourceStreamReader pulls
    10 micro-batches of 5k frames (offsets = frame counters, so
    checkpoint replay re-reads exact ranges), a complete-mode aggregate
    maintains the counters, and the final memory-sink table must
    hash-match the same arithmetic oracle as the batch read — the
    reference's live-link ingest (A2/A17) as one bounded, checked run.
    ``sf_dir`` is unused: the source is the device."""
    import tempfile
    import uuid

    from iceberg_twist_spark.streaming.jobs import _state_partitions

    register_serial_source(spark)
    frames = (
        spark.readStream.format("itws_serial")
        .option("n_frames", _N_FRAMES)
        .option("n_sensors", _N_SENSORS)
        .load()
    )
    # availableNow stops at the simple reader's single prefetched
    # chunk; drain the bounded source with processAllAvailable — the
    # reader reports caught-up (same offset, empty batch) at n_frames.
    name = f"itws_pyds_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="itws_ckpt_")
    with _state_partitions(spark):
        q = (
            _rollup(frames)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)
