"""Streaming rehearsal at sf1 — stream≡batch equivalence + state-store
size accounting at 1M events (PERF.md "Streaming at rehearsal scale").

The driver fixture exercises the stream≡batch family at sf0.01 (10k
events) only; until round 7 the stateful jobs (bounded-queue TTL state
store, stream-stream join, upsert sink) had never replayed a
corpus-sized chain. This tool runs every batch_twin-carrying streaming
job against an sf1 twin, hash-compares the completed stream to its
independent batch plan with tools/check.py's comparator, and reads the
per-micro-batch ``stateOperators`` progress captured by
``run_to_memory`` to GATE state-store growth: the failure this catches
is a watermark/timeout regression where state stops expiring and
``numRowsTotal`` tracks the corpus instead of the live window.

Ceilings are calibrated at sf1 (measured → ~2.5× headroom), in ROWS —
rows are what the watermark bounds; bytes follow the row schema.

Usage: python tools/stream_rehearsal.py [sf_dir]
Generate the twin first: python tools/gen_sf.py /root/repo/.localdata/sf1 1.0
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check import compare, duck_connection  # noqa: E402

from iceberg_twist_spark.registry import REGISTRY, _load_all_modules  # noqa: E402
from iceberg_twist_spark.session import get_spark  # noqa: E402

# Every stream≡batch job, stateful ones first. q_stream_upsert_sink's
# state lives in its foreachBatch parquet store (no stateOperators);
# q_stream_observe's progress carries metrics but no state. Both still
# hash-check.
JOBS = (
    "q_stream_queue_ttl",
    "q_stream_stream_join",
    "q_stream_dedup_watermark",
    "q_stream_late_drop",
    "q_stream_throttle",
    "q_stream_enrich_join",
    "q_stream_upsert_sink",
    "q_stream_observe",
)

# Max state rows (max over micro-batches of numRowsTotal summed across
# state operators) at sf1 = 1M events. Calibrated r7 (measured →
# ~2.5× headroom). The load-bearing claims: queue state is keyed by
# USER (15k rows at 1M events — live-key cardinality, not event
# count); dedup/throttle state is keyed by (key, window) and bounded
# by one watermark interval's arrivals (~250k = one replay chunk —
# the watermark advances each batch and closes everything older); the
# stream-stream join buffers only the 1h-interval-live rows of both
# sides (101k at 1M). A watermark/timeout regression makes these
# track the CORPUS (1M+) instead and trips the gate.
STATE_ROW_CEILING = {
    "q_stream_queue_ttl": 40_000,        # 15,000 measured = |users|
    "q_stream_stream_join": 260_000,     # 100,909 measured
    "q_stream_dedup_watermark": 650_000,  # 250,480 measured
    "q_stream_late_drop": 1_000,         # 118 measured — closed windows drop
    "q_stream_throttle": 650_000,        # 250,085 measured
    "q_stream_enrich_join": 1,           # stream-static: no state
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    if not os.path.isdir(sf_dir):
        print(f"sf twin missing: {sf_dir} — generate it first", file=sys.stderr)
        return 2
    _load_all_modules()
    from iceberg_twist_spark.streaming import jobs as jobs_mod

    spark = get_spark("stream-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    results: dict[str, dict] = {}
    violations: dict[str, str] = {}
    failures: dict[str, str] = {}
    for name in JOBS:
        jobs_mod.LAST_PROGRESS[:] = []
        t0 = time.perf_counter()
        ok, msg, _ = compare(name, spark, con, sf_dir)
        wall = round(time.perf_counter() - t0, 3)
        if not ok:
            failures[name] = msg
        # per-batch state accounting from the captured progress
        per_batch = []
        for p in jobs_mod.LAST_PROGRESS:
            ops = p.get("stateOperators") or []
            per_batch.append(
                {
                    "batch": p.get("batchId"),
                    "rows": int(p.get("numInputRows") or 0),
                    "state_rows": sum(int(o.get("numRowsTotal") or 0) for o in ops),
                    "state_bytes": sum(
                        int(o.get("memoryUsedBytes") or 0) for o in ops
                    ),
                }
            )
        max_state = max((b["state_rows"] for b in per_batch), default=0)
        max_bytes = max((b["state_bytes"] for b in per_batch), default=0)
        ceil = STATE_ROW_CEILING.get(name)
        if ceil is not None and max_state > ceil:
            violations[name] = f"max state rows {max_state} > ceiling {ceil}"
        results[name] = {
            "ok": ok,
            "msg": msg,
            "wall_s": wall,
            "n_batches": len(per_batch),
            "max_state_rows": max_state,
            "max_state_bytes": max_bytes,
        }
        print(
            f"# {name}: {'PASS' if ok else 'FAIL'} {wall}s "
            f"batches={len(per_batch)} max_state_rows={max_state:,} "
            f"max_state_bytes={max_bytes:,} — {msg}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "stream_rehearsal",
                "sf_dir": sf_dir,
                "results": results,
                "state_violations": violations,
                "failures": failures,
            }
        )
    )
    return 1 if failures or violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
