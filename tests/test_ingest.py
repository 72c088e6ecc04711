"""Unit tests for the binary-telemetry ingest path (frames.py)."""

from __future__ import annotations

import os
import struct
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.ingest.frames import (
    decode_frame_hex,
    split_frames_map_in_pandas,
)


def _frame_hex(ts: int, s1: int, s2: int) -> str:
    return (b"\x00" * 6 + struct.pack("<ihh", ts, s1, s2)).hex()


def test_decode_frame_hex_roundtrip(spark):
    cases = [
        (1_700_000_000, 123, -456),
        (0, -32768, 32767),
        (2_000_000_000, 0, 0),
    ]
    df = spark.createDataFrame(
        [(i, _frame_hex(*c)) for i, c in enumerate(cases)], "id int, frame_hex string"
    )
    out = (
        df.select("id", decode_frame_hex("frame_hex").alias("r"))
        .select("id", "r.ts_sec", "r.s1", "r.s2")
        .orderBy("id")
        .collect()
    )
    for row, (ts, s1, s2) in zip(out, cases):
        assert (row.ts_sec, row.s1, row.s2) == (ts, s1, s2)


def test_mapinpandas_frame_split(spark):
    df = spark.createDataFrame(
        [(bytearray(b"aa:bbb::cc"),), (bytearray(b"solo"),)], "payload binary"
    )
    rows = split_frames_map_in_pandas(df, "payload").collect()
    frames = sorted((r.frame_no, bytes(r.frame), r.frame_len) for r in rows)
    assert frames == [
        (0, b"aa", 2),
        (0, b"solo", 4),
        (1, b"bbb", 3),
        (2, b"", 0),
        (3, b"cc", 2),
    ]


def test_chunker_covers_whole_payload(spark, sf_dir):
    from iceberg_twist_spark.ingest.frames import q_chunk_payload

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_chars = docs.select(F.sum(F.length("text"))).collect()[0][0]
    chunks = q_chunk_payload(spark, sf_dir)
    reassembled = chunks.select(F.sum(F.length("chunk"))).collect()[0][0]
    assert reassembled == total_chars


def test_decode_frame_hex_prefix_tolerant_and_short_raises(spark):
    """r10 advice: the vectorized decode must keep the reference's
    prefix-decode contract — frames LONGER than the 14-byte fixed
    prefix (the reference reads payload bytes past it) decode their
    prefix instead of erroring on reshape; under-length frames fail
    with a clear fixed-width message."""
    import pytest

    good = _frame_hex(1_700_000_000, 7, -9)
    df = spark.createDataFrame(
        [(0, good + "deadbeefcafe")], "id int, frame_hex string"
    )
    r = (
        df.select(decode_frame_hex("frame_hex").alias("r"))
        .select("r.*")
        .collect()[0]
    )
    assert (r.ts_sec, r.s1, r.s2) == (1_700_000_000, 7, -9)
    short = spark.createDataFrame(
        [(0, good[: 2 * 10])], "id int, frame_hex string"
    )
    with pytest.raises(Exception, match="fixed prefix"):
        short.select(decode_frame_hex("frame_hex").alias("r")).collect()
