"""Event-time windowing — tumbling / sliding / session.

Reference surface covered: the 5 Hz → 1 Hz downsample requirement
(`iceberg-twist/notes.org:17`, A28 → tumbling), size/timeout frame
assembly (`iceberg-twist/transparent_serial_proxy.lua:35-48`, A6 →
sliding), and the sleep/wait duty cycle (`iceberg-twist/notes.org:15-16`,
A31 → session gaps).

These are the BATCH forms of the same ``window()`` /
``session_window()`` expressions the streaming queries use (Structured
Streaming plans the identical aggregation incrementally with state) —
which is what makes them DuckDB-oracle-checkable. The live streaming
variants are in streaming/jobs.py.

Determinism: ``events.ts`` is ns-precision parquet; Spark truncates to
µs. Hour/30-min buckets are insensitive to that truncation; the
session query truncates to whole seconds on BOTH sides before gap
comparison (FIXTURES.md risk note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_ts_str, r4, ts_str
from iceberg_twist_spark.registry import register

_TUMBLE_ORACLE = f"""
SELECT {duck_ts_str("time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))")} AS window_start,
       CAST(count(*) AS BIGINT) AS cnt,
       floor((sum(value)) * 10000 + 0.5) / 10000 AS sum_value
FROM events
GROUP BY time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
"""


@register("q_stream_tumble", oracle=_TUMBLE_ORACLE, tags=("streaming", "window"))
def q_stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts — the A28 downsample as an
    event-time aggregation."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"), r4(F.sum("value")).alias("sum_value"))
        .select(ts_str(F.col("w.start")).alias("window_start"), "cnt", "sum_value")
    )


_SLIDE_ORACLE = f"""
SELECT {duck_ts_str('window_start')} AS window_start,
       CAST(count(*) AS BIGINT) AS cnt,
       floor((avg(value)) * 10000 + 0.5) / 10000 AS avg_value
FROM (
  SELECT unnest([
           time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
           time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes'
         ]) AS window_start,
         value
  FROM events
)
GROUP BY window_start
"""


@register("q_stream_slide", oracle=_SLIDE_ORACLE, tags=("streaming", "window"))
def q_stream_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): each event lands in two
    windows; the oracle unnests the two window starts explicitly."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), r4(F.avg("value")).alias("avg_value"))
        .select(ts_str(F.col("w.start")).alias("window_start"), "cnt", "avg_value")
    )


_SESSION_ORACLE = f"""
WITH t AS (
  SELECT user_id, date_trunc('second', CAST(ts AS TIMESTAMP)) AS tss, value
  FROM events
),
flagged AS (
  SELECT user_id, tss, value,
         CASE WHEN lag(tss) OVER w IS NULL
                   OR tss - lag(tss) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY tss)
),
sessions AS (
  SELECT user_id, tss, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY tss
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_no
  FROM flagged
)
SELECT user_id,
       {duck_ts_str('min(tss)')} AS session_start,
       {duck_ts_str("max(tss) + INTERVAL '30 minutes'")} AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       floor((sum(value)) * 10000 + 0.5) / 10000 AS sum_value
FROM sessions
GROUP BY user_id, session_no
"""


@register("q_stream_session", oracle=_SESSION_ORACLE, tags=("streaming", "window"))
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user (30-min gap) — `session_window` merge
    semantics replicated in the oracle as gaps-and-islands SQL. The
    session end is last-event + gap (Spark's definition)."""
    e = load_tables(spark, sf_dir)["events"]
    tss = F.date_trunc("second", F.col("ts"))
    return (
        e.select("user_id", tss.alias("tss"), "value")
        .groupBy(F.session_window("tss", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), r4(F.sum("value")).alias("sum_value"))
        .select(
            "user_id",
            ts_str(F.col("w.start")).alias("session_start"),
            ts_str(F.col("w.end")).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
