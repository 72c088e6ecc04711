"""Streaming service control plane — the reference's lifecycle surface.

Port map (SURVEY.md §2.A):

- A13 forward map (frame → message send): ``foreachBatch`` sink writing
  each micro-batch as routed, chunked parquet "transmissions"
  (`iceberg-twist/transparent_serial_proxy.lua:43-51`);
- A14/A15 routing by key: ``partitionBy(route key)`` on the sink
  (`iceberg-twist/transparent_serial_proxy.lua:191,204-215`);
- A20 deferred write: while the controller is paused nothing is
  consumed; data accumulates in the source and is drained on resume
  (`iceberg-twist/serial_streaming.lua:15`);
- A21 pause/enable state machine: ``pause()`` stops the query but
  keeps the checkpoint; ``resume()`` restarts from committed offsets —
  exactly-once across the pause
  (`iceberg-twist/serial_streaming.lua:129-176`);
- A24 config hot-reload: ``reconfigure(**props)`` = stop + restart the
  plan with new properties against the same checkpoint
  (`iceberg-twist/serial_streaming.lua:366-382`);
- A23/A32 status reports + volume cutoff: ``status()`` aggregates
  progress metrics; ``bytes_written`` drives a data-cap check
  (`iceberg-twist/notes.org:21`).

This is driver-side orchestration by design: in Spark the "service
state machine" is query lifecycle management, not dataflow — the
dataflow itself stays a declarative streaming plan.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.streaming.jobs import EVENT_SCHEMA


@dataclass
class TelemetryService:
    """Controllable stream: source dir → transform → routed parquet sink.

    Properties (the reference's runtime property model, A24):
    - ``enabled``: consume or hold (A20/A21)
    - ``max_records_per_file``: transmit chunk size (A33 MTU analogue)
    - ``min_value``: admission filter predicate
    """

    spark: SparkSession
    source_dir: str
    out_dir: str = field(default_factory=lambda: tempfile.mkdtemp(prefix="itws_tx_"))
    ckpt_dir: str = field(default_factory=lambda: tempfile.mkdtemp(prefix="itws_svc_"))
    max_records_per_file: int = 1000
    min_value: float | None = None
    _query: object | None = field(default=None, repr=False)
    _progress: list = field(default_factory=list, repr=False)

    # -- dataflow ---------------------------------------------------------
    def _plan(self) -> DataFrame:
        s = (
            self.spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.source_dir)
        )
        if self.min_value is not None:
            s = s.filter(F.col("value") >= self.min_value)
        return s.select("event_id", "ts", "user_id", "event_type", "value")

    def _transmit(self, batch_df: DataFrame, batch_id: int) -> None:
        """A13: each micro-batch becomes a routed, chunked transmission."""
        (
            batch_df.write.mode("append")
            .option("maxRecordsPerFile", self.max_records_per_file)
            .partitionBy("event_type")
            .parquet(self.out_dir)
        )

    # -- lifecycle (A21/A24) ---------------------------------------------
    def start(self, available_now: bool = True) -> None:
        if self._query is not None:
            raise RuntimeError("service already running; pause() first")
        writer = (
            self._plan()
            .writeStream.foreachBatch(self._transmit)
            .option("checkpointLocation", self.ckpt_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        self._query = writer.start()

    def await_idle(self) -> None:
        if self._query is not None:
            self._query.awaitTermination()
            self._progress.extend(self._query.recentProgress or [])
            self._query = None

    def pause(self) -> None:
        """A21 disable: stop consumption, keep checkpoint state."""
        if self._query is not None:
            self._progress.extend(self._query.recentProgress or [])
            self._query.stop()
            self._query = None

    def resume(self) -> None:
        """A21 enable: restart from committed offsets — rows consumed
        before the pause are not re-transmitted (exactly-once)."""
        self.start()

    def reconfigure(self, **props) -> None:
        """A24 hot reload: apply new properties and restart the plan
        against the same checkpoint."""
        running = self._query is not None
        if running:
            self.pause()
        for k, v in props.items():
            if not hasattr(self, k):
                raise KeyError(f"unknown property {k!r}")
            setattr(self, k, v)
        if running:
            self.resume()

    # -- status (A18/A23/A32) --------------------------------------------
    def status(self) -> dict:
        rows = sum(int(p["numInputRows"]) for p in self._progress)
        batches = len(self._progress)
        bytes_written = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(self.out_dir)
            for f in files
        )
        return {
            "batches": batches,
            "rows_transmitted": rows,
            "bytes_written": bytes_written,
        }

    def over_data_cap(self, cap_bytes: int) -> bool:
        """A32 volume cutoff: the reference shuts down at 100 MB."""
        return self.status()["bytes_written"] >= cap_bytes

    def transmitted(self) -> DataFrame:
        """Read back everything 'sent' (partitioned by route key)."""
        return self.spark.read.schema(
            "event_id long, ts timestamp, user_id long, value double, event_type string"
        ).parquet(self.out_dir)
