"""Python DataSource connector: batch/stream parity and checkpoint
recovery (reference analogue: the serial link drops and the reader
resumes — `iceberg-twist/serial_streaming.lua:129-176`)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from iceberg_twist_spark.sources.serial_source import (
    _N_SENSORS,
    register_serial_source,
)


def _read_batch(spark, n_frames):
    register_serial_source(spark)
    return (
        spark.read.format("itws_serial")
        .option("n_frames", n_frames)
        .option("n_sensors", _N_SENSORS)
        .load()
    )


def test_stream_resumes_from_checkpoint_with_exactly_once_frames(spark):
    """Run 1 drains a 10k-frame source to a parquet sink; run 2 reuses
    the SAME checkpoint after 40k more frames 'arrive' (n_frames
    raised). The sink must hold all 50k frames exactly once — offsets
    are frame counters in the checkpoint, and any uncommitted range is
    replayed via readBetweenOffsets."""
    from iceberg_twist_spark.streaming.jobs import _state_partitions

    register_serial_source(spark)
    ckpt = tempfile.mkdtemp(prefix="itws_pyds_ckpt_")
    out = tempfile.mkdtemp(prefix="itws_pyds_out_") + "/sink"

    def run(n_frames):
        s = (
            spark.readStream.format("itws_serial")
            .option("n_frames", n_frames)
            .option("n_sensors", _N_SENSORS)
            .load()
            .select("frame_id", "sensor_id", "crc_ok")
        )
        with _state_partitions(spark):
            q = (
                s.writeStream.format("parquet")
                .outputMode("append")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

    try:
        run(10_000)
        mid = spark.read.parquet(out)
        assert mid.count() == 10_000
        run(50_000)
        got = spark.read.parquet(out)
        assert got.count() == 50_000
        # exactly-once: every frame id 0..49999 appears exactly once
        assert got.select("frame_id").distinct().count() == 50_000
        # and the recovered stream equals a fresh batch read
        batch = _read_batch(spark, 50_000).select(
            "frame_id", "sensor_id", "crc_ok"
        )
        assert got.exceptAll(batch).count() == 0
        assert batch.exceptAll(got).count() == 0
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)


def test_batch_read_parallelism_and_validation(spark):
    """Port partitions stripe the frame space disjointly, and crc_ok
    is recomputed from wire bytes: exactly the every-97th frames fail."""
    df = _read_batch(spark, 9_700)
    assert df.rdd.getNumPartitions() == 8
    bad = df.filter(~F.col("crc_ok")).select("frame_id").collect()
    assert sorted(r.frame_id for r in bad) == list(range(0, 9_700, 97))
    assert df.count() == 9_700
    assert df.select("frame_id").distinct().count() == 9_700
