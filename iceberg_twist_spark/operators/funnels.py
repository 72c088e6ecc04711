"""Event-sequence analytics — ordered funnels and cohort retention.

The events fixture is a user-event stream; the questions a product or
telemetry team actually asks of it are sequential: "who progressed
view → click → purchase, in order?" and "of the users who first
appeared on day D, how many were still active on day D+k?". Both are
ordered-sequence aggregations the reference's status/loss accounting
(`iceberg-twist/serial_streaming.lua:217-248`) foreshadows: cumulative
per-entity progress metrics over an ordered stream.

Scale notes: every stage of the funnel is a per-user aggregate (hash
shuffle on user_id, partial aggs map-side) followed by an equi join
back on user_id — the stage chain reuses the same partitioning, so
AQE coalesces rather than re-shuffles. Retention is two aggregations
(first-seen, active-days) joined on user_id, output |cohorts|×|offsets|
rows regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.registry import register

_FUNNEL_ORACLE = """
WITH e AS (
    SELECT user_id, event_type,
           date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts
    FROM events
), v AS (
    SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t1
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t2
    GROUP BY e.user_id
)
SELECT stage, users FROM (
    SELECT '1_view' AS stage, count(*) AS users FROM v
    UNION ALL SELECT '2_click', count(*) FROM c
    UNION ALL SELECT '3_purchase', count(*) FROM p
)
"""


@register("q_funnel_3step", oracle=_FUNNEL_ORACLE, tags=("analytics", "agg"))
def q_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel: view → later click → later purchase.

    Stage N counts users whose first stage-N event strictly follows
    their first stage-(N-1) event — order matters, not mere presence.
    Each stage is one per-user min-aggregate joined back on user_id.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", F.date_trunc("second", F.col("ts")).alias("ts")
    )

    def first_after(prev: DataFrame, etype: str, prev_ts: str, out_ts: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after(v, "click", "t1", "t2")
    p = first_after(c, "purchase", "t2", "t3")

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )

    return (
        stage(v, "1_view")
        .unionByName(stage(c, "2_click"))
        .unionByName(stage(p, "3_purchase"))
    )


_RETENTION_ORACLE = """
WITH days AS (
    SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
    FROM events GROUP BY 1, 2
), cohorts AS (
    SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', c.cohort_day, d.day) AS BIGINT) AS day_offset,
       count(*) AS active_users
FROM days d JOIN cohorts c ON d.user_id = c.user_id
GROUP BY 1, 2
"""


@register("q_retention_cohort", oracle=_RETENTION_ORACLE, tags=("analytics", "agg"))
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users active k days after first seen.

    Cohort = first-active day per user; one row per (cohort, offset)
    with the active-user count. Output is |cohorts| × |offsets| rows
    however large the event volume — the aggregation does all the
    compression.
    """
    ev = load_tables(spark, sf_dir)["events"]
    days = (
        ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("day")).distinct()
    )
    cohorts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohorts, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


_TRANSITIONS_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS prev_type
    FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


@register("q_event_transitions", oracle=_TRANSITIONS_ORACLE, tags=("funnel", "window", "agg"))
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (Markov counts): for each user's
    time-ordered stream, count prev→next event-type pairs — the
    behavioral-model / anomaly-baseline primitive over clickstreams.

    One shuffle on user_id for the lag window; the transition count
    partial-aggregates map-side onto at most |types|² groups."""
    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )


# ------------------------------------------- sequence pattern match
# MATCH_RECOGNIZE-lite: detect the exact CONSECUTIVE event pattern
# view → click → purchase per user (no intervening events — stricter
# than q_funnel_3step's ordered-presence semantics) completing within
# a day. The standard sessionized-journey detector, expressed as
# two lead windows over one user_id shuffle — the pattern window never
# materializes candidate subsequences.

_SEQ_SPAN_S = 86_400

_SEQ_ORACLE = f"""
WITH seq AS (
    SELECT user_id,
           event_type AS e1,
           lead(event_type, 1) OVER w AS e2,
           lead(event_type, 2) OVER w AS e3,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec1,
           CAST(floor(epoch(lead(CAST(ts AS TIMESTAMP), 2) OVER w)) AS BIGINT) AS sec3,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS start_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
hits AS (
    SELECT user_id, start_ts, sec3 - sec1 AS span_s
    FROM seq
    WHERE e1 = 'view' AND e2 = 'click' AND e3 = 'purchase'
      AND sec3 - sec1 <= {_SEQ_SPAN_S}
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       min(start_ts) AS first_match_ts,
       CAST(min(span_s) AS BIGINT) AS min_span_s
FROM hits GROUP BY user_id
"""


@register("q_seq_pattern", oracle=_SEQ_ORACLE, tags=("funnel", "window", "pattern"))
def q_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-pattern detection (MATCH_RECOGNIZE-lite): per user,
    occurrences of the exact adjacent sequence view→click→purchase
    completing within a day; returns match count, first match start,
    and tightest span.

    The two lead windows and the final aggregate all hash on user_id —
    one shuffle end-to-end, output |matching users|-bounded. Longer
    patterns extend the lead chain, still one window pass; at 100 TB
    this beats self-join pattern matching (k-way join on user_id)
    because no candidate subsequence ever materializes.
    """
    from iceberg_twist_spark.common import ts_str

    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).cast("long")
    seq = events.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        sec.alias("sec1"),
        F.lead(sec, 2).over(w).alias("sec3"),
        ts_str("ts").alias("start_ts"),
    )
    span = F.col("sec3") - F.col("sec1")
    hits = seq.filter(
        (F.col("e1") == "view")
        & (F.col("e2") == "click")
        & (F.col("e3") == "purchase")
        & (span <= _SEQ_SPAN_S)
    )
    return hits.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_matches"),
        F.min("start_ts").alias("first_match_ts"),
        F.min(span).cast("long").alias("min_span_s"),
    )
