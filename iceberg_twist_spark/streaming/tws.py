"""Spark 4 ``transformWithStateInPandas`` port of the bounded-queue
service — the forward-path stateful API next to the
``applyInPandasWithState`` implementation in streaming/jobs.py.

Same semantics as ``q_stream_queue_ttl`` (A17–A21: per-key bounded Rx
queue, overflow drop + cumulative loss/throughput accounting, idle-key
TTL — `iceberg-twist/serial_streaming.lua:217-248,303-310,16`), but on
the operator Spark 4 builds new stateful features on: typed value
state in the RocksDB state-store provider, explicit event-time timers
for TTL, and per-state TTL support. Keeping both lets a user migrate
between the APIs and lets tests pin that they agree.

Scale notes: state is one fixed-width row per key (five counters) in
RocksDB — memory-stable regardless of stream volume; timers are
per-key event-time (deterministic under replay, no wall clock). The
queue admission itself is Arrow-batched pandas, one pass per
micro-batch partition.

Environment gate: the ``transformWithStateInPandas`` Python driver
worker speaks protobuf to the JVM state server, so the operator needs
the ``protobuf`` package. Where it's absent (this sandbox), the query
is not registered — same pattern as the Iceberg-jar guard in
sources/connectors.py — and ``q_stream_queue_ttl`` (identical
semantics on ``applyInPandasWithState``) remains the active
implementation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from iceberg_twist_spark.registry import register
from iceberg_twist_spark.streaming.jobs import (
    QUEUE_SIZE,
    TTL_MS,
    read_event_stream,
    run_to_memory,
)

_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("batch_events", T.LongType()),
        T.StructField("msg_sent", T.LongType()),
        T.StructField("msg_lost", T.LongType()),
        T.StructField("byte_sent", T.LongType()),
        T.StructField("byte_lost", T.LongType()),
        T.StructField("expired", T.BooleanType()),
    ]
)

# counters + last event-time seen (ms) for TTL arbitration
_STATE_SCHEMA = (
    "msg_sent long, msg_lost long, byte_sent long, byte_lost long, last_ts_ms long"
)


class BoundedQueueProcessor(StatefulProcessor):
    """Per-key bounded Rx queue with loss accounting and event-time TTL."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("counters", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        (user_id,) = key
        if self._state.exists():
            msg_sent, msg_lost, byte_sent, byte_lost, last_ts = self._state.get()
        else:
            msg_sent = msg_lost = byte_sent = byte_lost = last_ts = 0
        batch_events = 0
        batch_admitted = 0  # per-micro-batch budget across Arrow
        # chunks — kept in lockstep with _queue_fn in streaming/jobs.py
        for pdf in rows:
            sizes = pdf["props"].str.len().fillna(0).astype(int)
            n = len(pdf)
            batch_events += n
            admitted = min(n, max(0, QUEUE_SIZE - batch_admitted))
            batch_admitted += admitted
            msg_sent += admitted
            byte_sent += int(sizes.iloc[:admitted].sum())
            msg_lost += n - admitted
            byte_lost += int(sizes.iloc[admitted:].sum())
            if n:
                last_ts = max(last_ts, int(pdf["ts"].max().value // 1_000_000))
        self._state.update((msg_sent, msg_lost, byte_sent, byte_lost, last_ts))
        if last_ts:
            # one live timer per key: re-arm at latest activity + TTL
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last_ts + TTL_MS)
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "batch_events": batch_events,
                    "msg_sent": msg_sent,
                    "msg_lost": msg_lost,
                    "byte_sent": byte_sent,
                    "byte_lost": byte_lost,
                    "expired": False,
                }
            ]
        )

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ):
        (user_id,) = key
        if not self._state.exists():
            return
        msg_sent, msg_lost, byte_sent, byte_lost, _last = self._state.get()
        self._state.clear()
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "batch_events": 0,
                    "msg_sent": msg_sent,
                    "msg_lost": msg_lost,
                    "byte_sent": byte_sent,
                    "byte_lost": byte_lost,
                    "expired": True,
                }
            ]
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """True when the protobuf runtime the TWS driver worker needs is
    importable (checked the same way the worker imports it)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def q_stream_queue_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded queue + TTL on ``transformWithStateInPandas`` (Spark 4
    stateful API, RocksDB state store, explicit event-time timers).
    Semantics match q_stream_queue_ttl; tests pin the agreement."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    s = read_event_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    stats = s.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=BoundedQueueProcessor(),
        outputStructType=_OUT,
        outputMode="update",
        timeMode="EventTime",
    )
    return run_to_memory(stats, output_mode="update")


if tws_available():  # pragma: no cover — sandbox lacks protobuf
    q_stream_queue_tws = register("q_stream_queue_tws", tags=("streaming", "stateful"))(
        q_stream_queue_tws
    )
