"""End-to-end telemetry pipeline semantics."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.pipeline import (
    FRAME_V2_HEX_LEN,
    build_sensor_streams,
    q_telemetry_pipeline,
)


def test_stream_frames_are_fixed_length(spark, sf_dir):
    from iceberg_twist_spark.catalog import load_tables

    events = load_tables(spark, sf_dir)["events"]
    streams = build_sensor_streams(events)
    frames = streams.select(F.explode(F.split("stream", ":")).alias("fh"))
    bad = frames.filter(F.length("fh") != FRAME_V2_HEX_LEN)
    assert bad.count() == 0
    assert frames.count() == events.count()


def test_pipeline_conserves_raw_counts(spark, sf_dir):
    from iceberg_twist_spark.catalog import load_tables

    events = load_tables(spark, sf_dir)["events"]
    out = q_telemetry_pipeline(spark, sf_dir)
    assert out.agg(F.sum("n_raw")).collect()[0][0] == events.count()
    # downsample: one report row per (user, minute)
    dup = out.groupBy("user_id", "minute_start").count().filter("count > 1")
    assert dup.count() == 0
