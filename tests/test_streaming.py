"""Semantics tests for the live Structured Streaming jobs."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.streaming.jobs import (
    QUEUE_SIZE,
    q_stream_dedup_watermark,
    q_stream_queue_ttl,
    q_stream_observe,
)


def test_streaming_dedup_restores_uniqueness(spark, sf_dir):
    out = q_stream_dedup_watermark(spark, sf_dir)
    total_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() == total_events
    assert out.select("event_id").distinct().count() == total_events


def test_queue_accounting_conserves_events(spark, sf_dir):
    out = q_stream_queue_ttl(spark, sf_dir)
    # final cumulative counters per user = last non-expired row; take max
    # since counters are monotone
    final = out.groupBy("user_id").agg(
        F.max("msg_sent").alias("sent"), F.max("msg_lost").alias("lost")
    )
    totals = final.agg(F.sum("sent") + F.sum("lost")).collect()[0][0]
    total_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert totals == total_events
    # per batch, at most QUEUE_SIZE admitted
    over = out.filter(
        ~F.col("expired") & (F.col("batch_events") > QUEUE_SIZE)
    )
    assert over.filter(F.col("msg_lost") == 0).count() == 0
    # TTL fired: every user's state eventually expires in the replay
    assert out.filter("expired").count() > 0


def test_observe_metrics_cover_all_batches(spark, sf_dir):
    out = q_stream_observe(spark, sf_dir).collect()
    assert len(out) >= 2  # chunked replay → multiple micro-batches
    total_rows = sum(r.rows for r in out)
    assert total_rows == spark.read.parquet(f"{sf_dir}/events.parquet").count()
