"""Unit tests for the transformWithStateInPandas bounded-queue
processor (streaming/tws.py).

The sandbox lacks the protobuf runtime the TWS driver worker needs, so
the live-stream path can't run here (the query registers itself only
when `tws_available()`); these tests drive the processor's accounting
logic directly through fakes, pinning that its semantics match the
applyInPandasWithState implementation it mirrors (q_stream_queue_ttl).
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.streaming.jobs import QUEUE_SIZE, TTL_MS
from iceberg_twist_spark.streaming.tws import BoundedQueueProcessor, tws_available


class FakeState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class FakeHandle:
    def __init__(self):
        self.state = FakeState()
        self.timers = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


def _batch(n, ts="2024-01-01 00:00:00", props="x" * 10):
    return pd.DataFrame(
        {"props": [props] * n, "ts": pd.to_datetime([ts] * n)}
    )


def _proc():
    p = BoundedQueueProcessor()
    h = FakeHandle()
    p.init(h)
    return p, h


def test_admission_and_overflow_accounting():
    p, h = _proc()
    n = QUEUE_SIZE + 5
    (out,) = list(p.handleInputRows((7,), iter([_batch(n)]), None))
    row = out.iloc[0]
    assert row["batch_events"] == n
    assert row["msg_sent"] == QUEUE_SIZE
    assert row["msg_lost"] == 5
    assert row["byte_sent"] == QUEUE_SIZE * 10
    assert row["byte_lost"] == 5 * 10
    assert not row["expired"]


def test_counters_accumulate_across_batches():
    p, h = _proc()
    list(p.handleInputRows((7,), iter([_batch(4)]), None))
    (out,) = list(p.handleInputRows((7,), iter([_batch(3)]), None))
    assert out.iloc[0]["msg_sent"] == 7
    assert out.iloc[0]["msg_lost"] == 0


def test_timer_rearmed_at_latest_activity_plus_ttl():
    p, h = _proc()
    list(p.handleInputRows((7,), iter([_batch(1, "2024-01-01 00:00:00")]), None))
    list(p.handleInputRows((7,), iter([_batch(1, "2024-01-01 01:00:00")]), None))
    assert len(h.timers) == 1  # old timer deleted, one live timer per key
    expect_ms = int(pd.Timestamp("2024-01-01 01:00:00").value // 1_000_000) + TTL_MS
    assert h.timers[0] == expect_ms


def test_expired_timer_emits_final_counters_and_clears_state():
    p, h = _proc()
    list(p.handleInputRows((7,), iter([_batch(3)]), None))
    (out,) = list(p.handleExpiredTimer((7,), None, None))
    assert out.iloc[0]["expired"]
    assert out.iloc[0]["msg_sent"] == 3
    assert not h.state.exists()
    # a second fire on the cleared key emits nothing
    assert list(p.handleExpiredTimer((7,), None, None)) == []


def test_registration_matches_environment():
    from iceberg_twist_spark.registry import REGISTRY, _load_all_modules

    _load_all_modules()
    assert ("q_stream_queue_tws" in REGISTRY) == tws_available()
