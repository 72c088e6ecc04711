"""Live Structured Streaming jobs — the reference's service surface.

Port map (SURVEY.md §2.A → Spark):

- bounded per-key queue with overflow drop + loss/throughput accounting
  (`iceberg-twist/serial_streaming.lua:217-248,303-310`, A17/A18) →
  ``applyInPandasWithState`` with cumulative per-key counters;
- TTL / data lifetime (`iceberg-twist/serial_streaming.lua:16`, A19) →
  processing-time state timeout clearing idle keys;
- watermark + late-data drop (A17/A19) → ``withWatermark`` + windowed agg;
- streaming dedup (NS) → ``dropDuplicatesWithinWatermark``;
- 5 Hz → 1 Hz throttle (`iceberg-twist/notes.org:17`, A28) → 1-second
  tumbling window keeping the first sample;
- GPS enrichment (`iceberg-twist/notes.org:19,34`, A30) → stream-static
  broadcast join;
- status reports / volume accounting (`iceberg-twist/serial_streaming.lua:172-174`,
  A18/A23/A32) → ``observe()`` metrics drained by a listener/progress.

Execution model: the events table is re-staged as a directory of
time-ordered parquet chunk files; ``maxFilesPerTrigger=1`` +
``Trigger.AvailableNow`` replays it as a sequence of micro-batches so
state genuinely evolves across batches, then terminates. Results land
in a memory sink and are returned as a normal DataFrame. The driver
records a rows-only check (streaming state is not DuckDB-expressible),
but the local harness goes further: every job here carries a
``batch_twin`` — an independent batch plan over the same replay chunks
— and ``tools/check.py`` hash-compares the completed stream against it
(stream≡batch equivalence; see the twins section below).

At scale the same plans run unchanged against a real source (Kafka /
files-on-S3): only ``stage_replay_dir`` is test harness.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import ts_str
from iceberg_twist_spark.registry import register

_REPLAY_CACHE: dict[tuple[str, int], str] = {}

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def chunked_events(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> DataFrame:
    """``events`` + its deterministic replay-chunk id ``__chunk``.

    Exact ntile over the unique (ts, event_id) order via the bucketed
    distributed global rank (``operators.windows._global_rank`` — no
    single-reducer sort). This is the SINGLE source of micro-batch
    boundaries: ``stage_replay_dir`` writes one file per chunk from it,
    and the batch twins (stream≡batch equivalence) reason about
    per-micro-batch state transitions from the same assignment — the
    two cannot diverge.
    """
    from iceberg_twist_spark.operators.windows import _global_rank

    events = load_tables(spark, sf_dir)["events"].select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    # NTZ timestamps don't cast to double directly; the tz-cast chain
    # is monotone in ts (fixed session tz), which is all the rank needs
    tsd = F.col("ts").cast("timestamp").cast("double")
    ranked, n = _global_rank(events.withColumn("__tsd", tsd), "__tsd", "event_id")
    step = (n + n_chunks - 1) // n_chunks
    return (
        ranked.withColumn("__chunk", F.floor((F.col("__rank") - 1) / step).cast("int"))
        .drop("__tsd", "__rank")
    )


def stage_replay_dir(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> str:
    """Stage ``events`` as N time-ordered parquet chunks for file replay.

    Chunk k holds the k-th time-quantile slice, so replaying one file
    per trigger presents data in event-time order — the same arrival
    pattern the satellite link gives the reference service.

    Fully distributed: chunk assignment is an exact ntile over
    (ts, event_id) via the bucketed global rank
    (``operators.windows._global_rank`` — no single-reducer sort), and
    every chunk file is written by an executor task; the round-2
    ``toPandas()`` here was the repo's last driver-side data
    materialization. Deterministic: the (ts, event_id) order is unique,
    and chunk files get strictly ascending mtimes so the file stream
    source replays them in the same order every run. At a larger
    events fixture, raise ``n_chunks`` — staging cost stays one
    distributed rank + n_chunks filtered writes.
    """
    key = (sf_dir, n_chunks)
    if key in _REPLAY_CACHE and os.path.isdir(_REPLAY_CACHE[key]):
        return _REPLAY_CACHE[key]
    chunked = chunked_events(spark, sf_dir, n_chunks).localCheckpoint(
        eager=True  # rank once, reuse across chunk writes
    )
    out = tempfile.mkdtemp(prefix="itws_replay_")
    for k in range(n_chunks):
        stage = os.path.join(out, f".stage_{k}")
        (
            chunked.filter(F.col("__chunk") == k)
            .drop("__chunk")
            .coalesce(1)  # one replay file per chunk = one micro-batch each
            .write.mode("overwrite")
            .parquet(stage)
        )
        parts = [p for p in os.listdir(stage) if p.endswith(".parquet")]
        if parts:
            dst = os.path.join(out, f"chunk_{k:03d}.parquet")
            os.replace(os.path.join(stage, parts[0]), dst)
            # ascending mtimes: FileStreamSource orders by modification
            # time, and same-millisecond writes would leave replay
            # order to tie-breaking
            os.utime(dst, (1_600_000_000 + k, 1_600_000_000 + k))
        shutil.rmtree(stage, ignore_errors=True)
    _REPLAY_CACHE[key] = out
    return out


def read_event_stream(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> DataFrame:
    """File-replay streaming source over the staged events chunks."""
    replay = stage_replay_dir(spark, sf_dir, n_chunks)
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )


# State-store sizing: a stateful query creates one state store per
# shuffle partition, and the count is pinned into the checkpoint at
# first start. The session default (32, sized for batch shuffles) is
# 4× oversized for the replay fixtures — state-store open/commit
# overhead dominated every stateful query (stream-stream join: 36 s →
# 7 s at sf0.01 just from this). Production sizes this to key
# cardinality × executor count; the harness pins a small count around
# .start() and restores the batch default after the run terminates.
STATE_PARTITIONS = 8


class _state_partitions:
    """Pin spark.sql.shuffle.partitions around a streaming start.

    Safe because the harness executes queries sequentially on one
    session; the value is captured into the query's checkpoint at
    start and the batch default is restored afterward.
    """

    def __init__(self, spark: SparkSession, n: int = STATE_PARTITIONS) -> None:
        self.spark, self.n = spark, n

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


# Most recent completed stream's per-micro-batch progress (dicts from
# StreamingQueryProgress). Populated by run_to_memory for the
# rehearsal harness (tools/stream_rehearsal.py reads stateOperators —
# per-batch state rows / memory — to gate state-store growth at sf1);
# queries never read it.
LAST_PROGRESS: list[dict] = []


def run_to_memory(sdf: DataFrame, output_mode: str = "append") -> DataFrame:
    """Execute a streaming plan to completion into a memory sink."""
    name = f"itws_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="itws_ckpt_")
    with _state_partitions(sdf.sparkSession):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            LAST_PROGRESS[:] = list(q.recentProgress or [])
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
    return sdf.sparkSession.table(name)


# ---------------------------------------------------------------------------
# Batch twins — stream≡batch equivalence (SURVEY §5 round-3 upgrade)
#
# Each `_twin_*` is a BATCH plan producing the semantically identical
# result the streaming job materializes over the same replay data;
# tools/check.py runs the streaming job to completion AND its twin and
# hash-compares the two. Micro-batch boundaries come from
# ``chunked_events`` — the same assignment the staging writes — and
# per-batch watermarks are re-derived as wm_k = max(ts of chunks < k)
# − delay, so the twins model exactly what the streaming engine does:
# window-close (append emits windows with end ≤ final watermark),
# state timeouts (fire when watermark passes the set timestamp), and
# per-batch bounded-queue admission.
# ---------------------------------------------------------------------------

def _tsx():
    # batch parquet is NTZ; stream reads LTZ — UTC session makes them equal
    return F.col("ts").cast("timestamp")


def _final_wm(events: DataFrame, delay: str = "10 minutes"):
    """1-row frame carrying the run's final watermark (broadcast scalar)."""
    return events.agg(
        (F.max(_tsx()) - F.expr(f"INTERVAL {delay}")).alias("__wm")
    )


def _twin_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_twist_spark.common import ts_str

    events = load_tables(spark, sf_dir)["events"]
    agg = (
        events.groupBy(F.window(_tsx(), "1 minute").alias("w"), "user_id")
        .agg(
            F.min_by("value", F.struct(_tsx(), F.col("event_id"))).alias("first_value"),
            F.count("*").alias("n_raw"),
        )
    )
    return (
        agg.crossJoin(F.broadcast(_final_wm(events)))
        .filter(F.col("w.end") <= F.col("__wm"))
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "user_id", "first_value", "n_raw",
        )
    )


# r9 promotion (r8 verdict item #4): the three `no_oracle` streaming
# ids whose final answers ARE ANSI-SQL-expressible get full DuckDB
# hash oracles — the SQL forms of their batch twins. The driver still
# executes the LIVE streaming job on the Spark side, so the hash now
# gates watermark close, interval-state expiry, and the foreachBatch
# merge loop end-to-end. Genuinely stateful jobs (bounded queue + TTL
# timers, observe metrics) stay rows-only with pytest stream≡batch.

def _throttle_oracle() -> str:
    from iceberg_twist_spark.common import duck_ts_str

    wb = "time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP))"
    return f"""
WITH wm AS (
  SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL '10 minutes' AS wm FROM events
), r AS (
  SELECT {wb} AS ws, user_id, value,
         row_number() OVER (PARTITION BY {wb}, user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
         count(*) OVER (PARTITION BY {wb}, user_id) AS n_raw
  FROM events
)
SELECT {duck_ts_str('ws')} AS window_start, user_id,
       value AS first_value, CAST(n_raw AS BIGINT) AS n_raw
FROM r, wm
WHERE rn = 1 AND ws + INTERVAL '1 minute' <= wm.wm
"""


def _stream_join_oracle() -> str:
    from iceberg_twist_spark.common import duck_ts_str

    return f"""
SELECT p.user_id, p.purchase_id, c.click_id, p.amount,
       {duck_ts_str('p.pts')} AS purchase_ts,
       {duck_ts_str('c.cts')} AS click_ts
FROM (SELECT user_id, event_id AS purchase_id,
             CAST(ts AS TIMESTAMP) AS pts, value AS amount
      FROM events WHERE event_type = 'purchase') p
JOIN (SELECT user_id AS c_user, event_id AS click_id,
             CAST(ts AS TIMESTAMP) AS cts
      FROM events WHERE event_type = 'click') c
  ON p.user_id = c.c_user
 AND c.cts <= p.pts
 AND c.cts >= p.pts - INTERVAL '1 hour'
"""


def _dedup_oracle() -> str:
    from iceberg_twist_spark.common import duck_ts_str

    return f"""
SELECT event_id, {duck_ts_str('CAST(ts AS TIMESTAMP)')} AS ts,
       user_id, event_type, value, props
FROM events
"""


def _late_drop_oracle() -> str:
    from iceberg_twist_spark.common import duck_ts_str

    return f"""
WITH wm AS (
  SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL '10 minutes' AS wm FROM events
), agg AS (
  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
)
SELECT {duck_ts_str('ws')} AS window_start, cnt
FROM agg, wm WHERE ws + INTERVAL '1 hour' <= wm.wm
"""


def _enrich_oracle() -> str:
    from iceberg_twist_spark.common import duck_ts_str

    return f"""
SELECT e.event_id, {duck_ts_str('CAST(e.ts AS TIMESTAMP)')} AS ts,
       e.user_id, c.c_nationkey AS nation_key, c.c_acctbal AS acctbal,
       e.value
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


# The observe oracle re-derives the micro-batch boundaries the replay
# staging uses (chunked_events: exact global rank over the unique
# (ts, event_id) order, chunk = floor((rank-1)/ceil(n/4))) — so the
# engine's per-batch observed row/byte counters must equal a pure SQL
# derivation of the same partitioning. 4 = read_event_stream's default
# n_chunks.
def _observe_oracle(n_chunks: int = 4) -> str:
    return f"""
WITH r AS (
  SELECT props,
         row_number() OVER (ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
         count(*) OVER () AS n
  FROM events
)
SELECT CAST((rn - 1) // ((n + {n_chunks - 1}) // {n_chunks}) AS BIGINT)
           AS batch_id,
       CAST(count(*) AS BIGINT) AS "rows",
       CAST(sum(length(props)) AS BIGINT) AS bytes
FROM r GROUP BY 1
"""


def _upsert_oracle() -> str:
    from iceberg_twist_spark.common import duck_ts_str

    return f"""
WITH r AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                     event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events,
         max(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id) AS mts
  FROM events
)
SELECT user_id, value AS last_value, CAST(n_events AS BIGINT) AS n_events,
       {duck_ts_str('mts')} AS last_ts
FROM r WHERE rn = 1
"""


def _twin_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir)["events"]
    agg = events.groupBy(F.window(_tsx(), "1 hour").alias("w")).agg(
        F.count("*").alias("cnt")
    )
    return (
        agg.crossJoin(F.broadcast(_final_wm(events)))
        .filter(F.col("w.end") <= F.col("__wm"))
        .select(ts_str(F.col("w.start")).alias("window_start"), "cnt")
    )


def _twin_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # duplicates are exact per-event copies within one batch, so the
    # watermarked dedup restores precisely the original events
    return load_tables(spark, sf_dir)["events"].select(
        "event_id", ts_str(_tsx()).alias("ts"),
        "user_id", "event_type", "value", "props",
    )


def _twin_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    customer = t["customer"].select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_nationkey").alias("nation_key"),
        F.col("c_acctbal").alias("acctbal"),
    )
    return (
        t["events"]
        .select("event_id", ts_str(_tsx()).alias("ts"), "user_id", "value")
        # customer grows with SF — no forced broadcast (the per-batch
        # planner / AQE broadcasts while the dim is actually small).
        .join(customer, "user_id", "left")
        .select("event_id", "ts", "user_id", "nation_key", "acctbal", "value")
    )


def _twin_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # in-order replay retains every click a purchase can still match,
    # and inner stream-stream joins emit on match — so the complete
    # batch interval join IS the streaming answer
    events = load_tables(spark, sf_dir)["events"]
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        _tsx().alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        _tsx().alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id", "click_id", "amount",
        ts_str(F.col("purchase_ts")).alias("purchase_ts"),
        ts_str(F.col("click_ts")).alias("click_ts"),
    )


def _twin_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # latest-wins across time-ordered batches = latest-wins overall
    return (
        load_tables(spark, sf_dir)["events"]
        .groupBy("user_id")
        .agg(
            F.max_by("value", F.struct(_tsx(), F.col("event_id"))).alias("last_value"),
            F.count("*").cast("long").alias("n_events"),
            ts_str(F.max(_tsx())).alias("last_ts"),
        )
    )


def _twin_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        chunked_events(spark, sf_dir)
        .groupBy(F.col("__chunk").cast("long").alias("batch_id"))
        .agg(F.count("*").alias("rows"), F.sum(F.length("props")).alias("bytes"))
    )


def _twin_queue_ttl(
    spark: SparkSession, sf_dir: str, flush_after: tuple[int, ...] = ()
) -> DataFrame:
    """Batch re-implementation of the bounded-queue state machine.

    Per (user, micro-batch): events counted, the first QUEUE_SIZE in
    (ts, event_id) order admitted (bytes accounted send/lost), counters
    cumulative per key; a key idle past its event-time TTL when a later
    batch's watermark arrives emits an expiry row and resets. The
    per-key fold runs in a batch ``applyInPandas`` over at most
    n_chunks+1 pre-aggregated rows per key — a genuinely independent
    execution path from ``applyInPandasWithState``, which is the point
    of the equivalence check.

    ``flush_after=(k, …)`` models an INTERRUPTED replay (availableNow
    stop + checkpoint restart after the first ``k`` chunks): at the
    cut, the engine runs a trailing no-data batch whose advanced
    watermark fires every due timer — including keys that, in a
    continuous run, would have been kept alive by data in the very
    next batch (Spark suppresses a group's timer whenever the trigger
    has data for it). A real link outage changes the event sequence
    the same way; the recovery test asserts the restarted run matches
    this cut-aware twin exactly.
    """
    n_chunks = 4
    ch = chunked_events(spark, sf_dir, n_chunks).withColumn("tsx", _tsx())
    w = Window.partitionBy("user_id", "__chunk").orderBy("tsx", "event_id")
    per = (
        ch.withColumn("rn", F.row_number().over(w))
        .withColumn("sz", F.coalesce(F.length("props"), F.lit(0)))
        .groupBy("user_id", "__chunk")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("rn") <= QUEUE_SIZE, F.col("sz")).otherwise(0)).alias("adm_bytes"),
            F.sum(F.when(F.col("rn") > QUEUE_SIZE, F.col("sz")).otherwise(0)).alias("lost_bytes"),
            (F.floor(F.unix_micros(F.max("tsx")) / 1000)).alias("last_ts_ms"),
        )
    )
    # per-batch watermarks: wm entering batch k = max ts of chunks < k
    # − 10 min; one extra no-data batch fires the remaining timeouts.
    # ms precision, matching the engine's event-time stats. n_chunks+1
    # scalars — one-time constant materialization, never O(rows).
    chunk_max = {
        r[0]: r[1]
        for r in ch.groupBy("__chunk")
        .agg(F.floor(F.unix_micros(F.max("tsx")) / 1000))
        .collect()
    }
    delay_ms, run = 10 * 60 * 1000, None
    wms: list[int | None] = []
    for k in range(n_chunks):
        wms.append(run - delay_ms if run is not None else None)
        m = chunk_max.get(k)
        # An empty chunk (n_events < n_chunks, or a sparse tail) has no
        # maximum — the watermark simply does not advance that batch.
        if m is not None:
            run = m if run is None else max(run, m)
    final_wm = run - delay_ms if run is not None else None

    def fold(pdf: pd.DataFrame):
        (user,) = pdf["user_id"].unique()
        rows = {int(r["__chunk"]): r for _, r in pdf.iterrows()}
        out = []
        ms_ = ml = bs = bl = 0
        exists, timeout = False, None

        def expire_if_due(wm):
            nonlocal ms_, ml, bs, bl, exists, timeout
            if exists and wm is not None and wm > timeout:
                out.append((user, 0, ms_, ml, bs, bl, True))
                ms_ = ml = bs = bl = 0
                exists, timeout = False, None

        for k in range(n_chunks):
            if k not in rows:
                # no data for this key: the engine's timer may fire
                expire_if_due(wms[k])
            else:
                r = rows[k]
                adm = min(int(r["n"]), QUEUE_SIZE)
                ms_ += adm
                ml += int(r["n"]) - adm
                bs += int(r["adm_bytes"])
                bl += int(r["lost_bytes"])
                exists, timeout = True, int(r["last_ts_ms"]) + TTL_MS
                out.append((user, int(r["n"]), ms_, ml, bs, bl, False))
            if (k + 1) in flush_after:
                # interrupted replay: the stop's trailing no-data batch
                # fires every due timer, data-in-next-chunk or not
                expire_if_due(wms[k + 1] if k + 1 < n_chunks else final_wm)
        expire_if_due(final_wm)
        return pd.DataFrame(
            out,
            columns=[
                "user_id", "batch_events", "msg_sent", "msg_lost",
                "byte_sent", "byte_lost", "expired",
            ],
        )

    return per.groupBy("user_id").applyInPandas(fold, _QOUT)


@register(
    "q_stream_throttle",
    oracle=_throttle_oracle(),
    tags=("streaming",),
    batch_twin=_twin_throttle,
)
def q_stream_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A28 throttle: 1-minute tumbling windows keeping the first sample
    per user (min_by on event time), watermarked 10 minutes. The LIVE
    stream's append-mode output (only watermark-closed windows emit)
    is hash-gated against the batch SQL with the same final-watermark
    cutoff."""
    from iceberg_twist_spark.common import ts_str

    s = read_event_stream(spark, sf_dir)
    return run_to_memory(
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"), "user_id")
        .agg(
            # event_id tiebreak: duplicate ts within a (user, minute)
            # must pick the same survivor on every engine/run
            F.min_by("value", F.struct("ts", "event_id")).alias("first_value"),
            F.count("*").alias("n_raw"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "user_id", "first_value", "n_raw",
        )
    )


@register(
    "q_stream_dedup_watermark",
    oracle=_dedup_oracle(),
    tags=("streaming",),
    batch_twin=_twin_dedup,
)
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: each event duplicated 2× upstream, then
    ``dropDuplicatesWithinWatermark`` on event_id restores uniqueness
    (state for old keys is reclaimed once the watermark passes).
    Duplicates are exact within-batch copies, so the LIVE stream's
    output must hash-match the original events table (r9 promotion
    from rows-only)."""
    s = read_event_stream(spark, sf_dir)
    doubled = s.withColumn("copy", F.explode(F.array(F.lit(1), F.lit(2)))).drop("copy")
    deduped = doubled.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return run_to_memory(deduped).select(
        "event_id", ts_str(F.col("ts")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )


@register(
    "q_stream_late_drop",
    oracle=_late_drop_oracle(),
    tags=("streaming",),
    batch_twin=_twin_late_drop,
)
def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark + windowed count in append mode: rows later than the
    10-minute watermark are dropped from closed windows; closed windows
    emit exactly once — the hash gates exactly the watermark-close set
    (r9 promotion from rows-only)."""
    s = read_event_stream(spark, sf_dir, n_chunks=6)
    return run_to_memory(
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(ts_str(F.col("w.start")).alias("window_start"), "cnt")
    )


@register(
    "q_stream_enrich_join",
    oracle=_enrich_oracle(),
    tags=("streaming",),
    batch_twin=_twin_enrich,
)
def q_stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A30 enrichment: stream-static join against the customer dim
    (the 'GPS fix attached to every IMU broadcast' pattern); the
    planner broadcasts the dim per micro-batch while it fits. The
    LIVE stream's enriched rows hash-match the batch LEFT JOIN (r9
    promotion from rows-only)."""
    s = read_event_stream(spark, sf_dir)
    customer = load_tables(spark, sf_dir)["customer"].select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_nationkey").alias("nation_key"),
        F.col("c_acctbal").alias("acctbal"),
    )
    # No broadcast hint: the static dim grows with SF; Spark's
    # per-micro-batch planner broadcasts it only while it fits.
    enriched = s.join(customer, "user_id", "left").select(
        "event_id", ts_str(F.col("ts")).alias("ts"),
        "user_id", "nation_key", "acctbal", "value",
    )
    return run_to_memory(enriched)


# ---------------------------------------------------------------------------
# Bounded per-key queue with loss accounting + TTL (A17–A21)
# ---------------------------------------------------------------------------

QUEUE_SIZE = 16  # RxQueueSize analogue (serial_streaming.lua:303-310)

_QSTATE = T.StructType(
    [
        T.StructField("msg_sent", T.LongType()),
        T.StructField("msg_lost", T.LongType()),
        T.StructField("byte_sent", T.LongType()),
        T.StructField("byte_lost", T.LongType()),
    ]
)

_QOUT = T.StructType(
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


TTL_MS = 30 * 60 * 1000  # 30-minute event-time idle TTL


def _queue_fn(key, pdf_iter, state: GroupState):
    """Per-key bounded Rx queue: ≤QUEUE_SIZE events admitted per batch
    (the rest dropped + counted), queue drained (sent) at batch end,
    cumulative sent/lost counters kept in state.

    TTL is EVENT-time (watermark-driven): a key idle for 30 event-time
    minutes is expired and its state reclaimed (A19 lifetime
    management). Event-time — not processing-time — so the replay is
    deterministic and an availableNow run terminates instead of
    spinning no-data batches on the wall clock.
    """
    (user_id,) = key
    if state.hasTimedOut:
        msg_sent, msg_lost, byte_sent, byte_lost = state.get
        state.remove()
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
        return
    msg_sent, msg_lost, byte_sent, byte_lost = (
        state.get if state.exists else (0, 0, 0, 0)
    )
    # Admission order is (ts, event_id) — concatenate the batch's Arrow
    # chunks and sort before admitting, so WHICH rows the bounded queue
    # keeps is deterministic (arrival order within a micro-batch is
    # scheduler-dependent) and the batch twin can reproduce it exactly.
    # Memory: one micro-batch's rows for one key — the same bound the
    # un-sorted form already had via the state-store write.
    batch = pd.concat(list(pdf_iter), ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
    batch_events = len(batch)
    max_ts_ms = 0
    if batch_events:
        sizes = batch["props"].str.len().fillna(0).astype(int)
        admitted = min(batch_events, QUEUE_SIZE)
        msg_sent += admitted
        byte_sent += int(sizes.iloc[:admitted].sum())
        msg_lost += batch_events - admitted
        byte_lost += int(sizes.iloc[admitted:].sum())
        max_ts_ms = int(batch["ts"].max().value // 1_000_000)
    state.update((msg_sent, msg_lost, byte_sent, byte_lost))
    if max_ts_ms:
        state.setTimeoutTimestamp(max_ts_ms + TTL_MS)
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


@register("q_stream_queue_ttl", tags=("streaming", "stateful"), batch_twin=_twin_queue_ttl)
def q_stream_queue_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful bounded queue with loss accounting and TTL — the direct
    port of the reference's Rx queue service (A17–A21). One status row
    per (user, micro-batch): cumulative sent/lost message and byte
    counters, overflow beyond QUEUE_SIZE dropped-and-accounted."""
    s = read_event_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    stats = s.groupBy("user_id").applyInPandasWithState(
        _queue_fn,
        outputStructType=_QOUT,
        stateStructType=_QSTATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_to_memory(stats, output_mode="update")


@register(
    "q_stream_observe",
    oracle=_observe_oracle(),
    tags=("streaming", "metrics"),
    batch_twin=_twin_observe,
)
def q_stream_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18/A23/A32 observed metrics: per-micro-batch row and byte
    counters via ``observe()``, harvested from query progress — the
    'status report' channel. Returns one row per micro-batch."""
    s = read_event_stream(spark, sf_dir)
    observed = s.observe(
        "traffic",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.length("props")).alias("bytes"),
    )
    name = f"itws_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="itws_ckpt_")
    q = (
        observed.writeStream.format("noop")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        progress = [
            (
                int(p["batchId"]),
                int(p["observedMetrics"]["traffic"]["rows"]),
                int(p["observedMetrics"]["traffic"]["bytes"]),
            )
            for p in (q.recentProgress or [])
            if p.get("observedMetrics", {}).get("traffic") is not None
        ]
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(
        progress or [], "batch_id long, rows long, bytes long"
    )


def build_stream_join(click_src: DataFrame, purchase_src: DataFrame) -> DataFrame:
    """The attribution-join plan over two (possibly streaming) event
    sources — factored out so the checkpoint-recovery test can drive
    the SAME plan over an interrupted replay directory."""
    clicks = (
        click_src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "30 minutes")
    )
    purchases = (
        purchase_src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", "30 minutes")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id", "click_id", "amount",
        ts_str(F.col("purchase_ts")).alias("purchase_ts"),
        ts_str(F.col("click_ts")).alias("click_ts"),
    )


@register(
    "q_stream_stream_join",
    oracle=_stream_join_oracle(),
    tags=("streaming", "join"),
    batch_twin=_twin_stream_join,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: per user, join each ``purchase``
    event to ``click`` events from the preceding hour — the canonical
    attribution join, and the one streaming shape not covered by the
    stream-static enrichment (A30). Both sides are watermarked so
    Spark can bound the join state buffer (clicks retained only while
    a matching purchase can still arrive); the interval condition is
    what lets the state manager expire rows, exactly the mechanism
    that keeps this runnable forever at production volume.
    """
    joined = build_stream_join(
        read_event_stream(spark, sf_dir), read_event_stream(spark, sf_dir)
    )
    return run_to_memory(joined)


UPSERT_STORE_SCHEMA = (
    "user_id long, last_value double, n_events long, last_ts timestamp"
)


def make_upsert_merger(store_dir: str):
    """foreachBatch merger for the CDC upsert store — factored out so
    the checkpoint-recovery test can point the SAME merge logic at its
    own store across an interrupted replay."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        incoming = (
            batch_df.groupBy("user_id")
            .agg(
                # event_id tiebreak keeps the per-batch survivor
                # deterministic under duplicate ts
                F.max_by("value", F.struct("ts", "event_id")).alias("last_value"),
                F.count("*").alias("n_events"),
                F.max("ts").alias("last_ts"),
            )
        )
        try:
            current = sp.read.schema(UPSERT_STORE_SCHEMA).parquet(store_dir)
        except Exception:  # first batch: empty store
            current = sp.createDataFrame([], UPSERT_STORE_SCHEMA)
        merged = (
            current.withColumn("v", F.lit(1))
            .unionByName(incoming.withColumn("v", F.lit(2)))
        )
        # latest-wins on identity; counts accumulate across versions
        out = (
            merged.groupBy("user_id")
            .agg(
                F.max_by("last_value", "v").alias("last_value"),
                F.sum("n_events").cast("long").alias("n_events"),
                F.max("last_ts").alias("last_ts"),
            )
        )
        out.coalesce(1).write.mode("overwrite").parquet(store_dir + "_next")
        # atomic-ish swap for the local fixture store
        shutil.rmtree(store_dir, ignore_errors=True)
        os.rename(store_dir + "_next", store_dir)

    return merge_batch


@register(
    "q_stream_upsert_sink",
    oracle=_upsert_oracle(),
    tags=("streaming", "cdc"),
    batch_twin=_twin_upsert,
)
def q_stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch CDC sink: every micro-batch merges latest-wins
    per-sensor state (last value, event count, last event time) into
    an accumulating store — the merge-on-stream pattern that writes a
    streaming upsert into a lakehouse table. Each batch merges via
    union + per-key latest-wins aggregate (``max_by`` on the version
    tag — no window sort needed); with the Iceberg jar present the
    store write becomes ``MERGE INTO`` against a real table, unchanged
    otherwise.
    """
    store_dir = tempfile.mkdtemp(prefix="itws_upsert_")
    merge_batch = make_upsert_merger(store_dir)
    store_schema = UPSERT_STORE_SCHEMA
    s = read_event_stream(spark, sf_dir)
    name = f"itws_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="itws_ckpt_")
    try:
        with _state_partitions(spark):
            q = (
                s.writeStream.foreachBatch(merge_batch)
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        # the STORE keeps a native timestamp; only the query boundary
        # renders it canonically (determinism convention). Materialize
        # before the finally block removes the per-invocation store.
        out = spark.read.schema(store_schema).parquet(store_dir).select(
            "user_id", "last_value", "n_events",
            ts_str(F.col("last_ts")).alias("last_ts"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(store_dir, ignore_errors=True)
    return out


def snapshot_commit_batch(tbl):
    """The reusable lakehouse-sink ``foreachBatch`` callable: each
    micro-batch lands as ONE atomic snapshot commit, EXACTLY-ONCE
    under checkpoint restart. Structured Streaming's contract is
    at-least-once delivery to ``foreachBatch`` — after a crash between
    the sink commit and the checkpoint write-ahead record, the same
    (batch_id, data) pair is replayed — so the sink records the batch
    id in the commit's summary and SKIPS replayed ids ≤ the table's
    last committed batch (the table's own commit log is the
    idempotence ledger, the same trick Spark's file sink plays with
    ``_spark_metadata``). At 100 TB cadence this is what stops a
    flapping driver from silently doubling ingest."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        # replay check FIRST: it reads commit metadata only, so a
        # replayed batch after restart skips without the isEmpty
        # probe's Spark job (r11 — order is otherwise equivalent:
        # both branches return with no side effects)
        if batch_id <= tbl.last_streaming_batch_id():
            return  # checkpoint replay of an already-committed batch
        if batch_df.isEmpty():
            return
        summary = {"streaming-batch-id": int(batch_id)}
        if tbl.current_snapshot_id() == 0:
            tbl.create(batch_df, summary=summary)
        else:
            tbl.append(batch_df, summary=summary)

    return commit


def _iceberg_sink_oracle() -> str:
    from iceberg_twist_spark.common import duck_ts_str

    return f"""
SELECT event_id, {duck_ts_str('CAST(ts AS TIMESTAMP)')} AS ts,
       user_id, event_type, value, props
FROM events
"""


@register(
    "q_stream_iceberg_sink",
    oracle=_iceberg_sink_oracle(),
    tags=("streaming", "iceberg", "sink"),
)
def q_stream_iceberg_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest INTO the snapshot table — the lakehouse sink:
    every micro-batch lands as one atomic APPEND commit
    (foreachBatch → SnapshotTable.append), so readers always see a
    complete batch or none (the pointer swap), the commit HISTORY is
    one append per micro-batch (asserted), and the table's
    INCREMENTAL read between two batch snapshots returns exactly that
    batch's rows (asserted — the changelog a downstream consumer
    tails). The final table must hash-match the full events table: a
    lost, duplicated, or torn micro-batch breaks the oracle. This is
    the per-minute-commit ingest shape whose small-file debris
    ``rewrite_data_files`` exists to compact. A fresh table per
    invocation keeps re-runs idempotent; the final read is eagerly
    checkpointed and the table directory removed before returning, so
    repeated harness runs cannot leak /tmp."""
    from iceberg_twist_spark.sources.snapshots import SnapshotTable

    tdir = tempfile.mkdtemp(prefix="itws_stream_ice_")
    ckpt = tempfile.mkdtemp(prefix="itws_ckpt_")
    try:
        tbl = SnapshotTable(spark, tdir)
        s = read_event_stream(spark, sf_dir)

        name = f"itws_{uuid.uuid4().hex[:12]}"
        q = (
            s.writeStream.foreachBatch(snapshot_commit_batch(tbl))
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        hist = tbl.snapshots()
        ops = [m["operation"] for m in hist]
        assert ops and ops[0] == "overwrite" and all(
            o == "append" for o in ops[1:]
        ), ops
        # the incremental read between two consecutive batch snapshots
        # is exactly that batch: totals compose to the full table. The
        # incremental READ is the data path under test (counted for
        # real); the reference totals come from the manifests' row
        # facts — at 100 TB the old form paid two full-table scans to
        # re-derive numbers the commit log already holds (r11,
        # guide §5; append-only table, so row_count ≡ count exactly)
        if len(hist) >= 2:
            first, last = hist[0]["snapshot_id"], hist[-1]["snapshot_id"]
            n_incr = tbl.read_incremental(first, last).count()
            assert n_incr == tbl.row_count() - tbl.row_count(first)
        # materialize NOW — the caller's collect runs after the finally
        # block has removed the table directory
        out = tbl.read().select(
            "event_id", ts_str(F.col("ts")).alias("ts"),
            "user_id", "event_type", "value", "props",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tdir, ignore_errors=True)
    return out
