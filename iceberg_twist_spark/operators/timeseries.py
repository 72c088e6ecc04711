"""Time-series operators — dense gap-fill and forward-fill interpolation.

The reference's telemetry is a regular 5 Hz → 1 Hz time series with
dropouts (bounded-queue overflow drops records, the modem sleeps 20
minutes at a time — `iceberg-twist/serial_streaming.lua:303-310`,
`iceberg-twist/notes.org:15-17`). Downstream analytics over such data
needs the missing-slot structure made explicit: a dense time spine
(every slot present, zero-filled) and value interpolation across the
gaps. These operators provide both over the ``events`` fixture.

Scale notes: the spine is |keys| × |slots| rows built from a
``sequence``+``explode`` (JVM-side, no shuffle to generate); the join
back to observed aggregates is an equi join on (key, slot) — at 100 TB
the spine is always the small side per key-partition and AQE
broadcast/shuffle-picks accordingly. Forward-fill is one window per
key ordered by slot: a single shuffle, state bounded by one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_r4, r4
from iceberg_twist_spark.registry import register

SPINE_START = "2024-01-01 00:00:00"
SPINE_END = "2024-01-07 23:00:00"

_SPINE_SQL = (
    f"unnest(generate_series(TIMESTAMP '{SPINE_START}', "
    f"TIMESTAMP '{SPINE_END}', INTERVAL 1 HOUR))"
)

_GAPFILL_ORACLE = f"""
WITH spine AS (
    SELECT u.user_id, {_SPINE_SQL} AS hour
    FROM (SELECT DISTINCT user_id FROM events) u
), hourly AS (
    SELECT user_id,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           count(*) AS cnt,
           {duck_r4('sum(value)')} AS sum_value
    FROM events
    WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{SPINE_END}' + INTERVAL 1 HOUR
    GROUP BY 1, 2
)
SELECT s.user_id,
       strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
       coalesce(h.cnt, 0) AS cnt,
       coalesce(h.sum_value, 0.0) AS sum_value
FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
"""


def _spine(spark: SparkSession, users: DataFrame) -> DataFrame:
    """Dense (user, hour) spine over the fixed analysis window."""
    return users.select(
        "user_id",
        F.explode(
            F.expr(
                f"sequence(timestamp'{SPINE_START}', timestamp'{SPINE_END}',"
                " interval 1 hour)"
            )
        ).alias("hour"),
    )


def _hourly(events: DataFrame) -> DataFrame:
    return (
        events.filter(
            F.col("ts") < F.lit(SPINE_END).cast("timestamp") + F.expr("INTERVAL 1 HOUR")
        )
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("cnt"), r4(F.sum("value")).alias("sum_value"))
    )


@register("q_ts_gapfill", oracle=_GAPFILL_ORACLE, tags=("timeseries", "agg", "join"))
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled hourly series per user over a 7-day spine.

    Every (user, hour) slot appears exactly once; silent hours carry
    cnt=0 — the dense form windowed models and SLO dashboards need.
    """
    ev = load_tables(spark, sf_dir)["events"]
    users = ev.select("user_id").distinct()
    spine = _spine(spark, users)
    hourly = _hourly(ev)
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


_FFILL_ORACLE = f"""
WITH spine AS (
    SELECT u.user_id, {_SPINE_SQL} AS hour
    FROM (SELECT DISTINCT user_id FROM events) u
), hourly AS (
    SELECT user_id,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           {duck_r4('avg(value)')} AS avg_value
    FROM events
    WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{SPINE_END}' + INTERVAL 1 HOUR
    GROUP BY 1, 2
), dense AS (
    SELECT s.user_id, s.hour, h.avg_value
    FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
)
SELECT user_id,
       strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       last_value(avg_value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value
FROM dense
"""


@register("q_ts_ffill", oracle=_FFILL_ORACLE, tags=("timeseries", "window"))
def q_ts_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill: carry each user's last observed hourly avg across gaps.

    The sensor-dropout repair: silent slots inherit the most recent
    reading (null until the first observation). One window per user —
    rounding happens on the observed value BEFORE the fill so both
    engines propagate bit-identical numbers.
    """
    ev = load_tables(spark, sf_dir)["events"]
    users = ev.select("user_id").distinct()
    spine = _spine(spark, users)
    hourly = (
        ev.filter(
            F.col("ts") < F.lit(SPINE_END).cast("timestamp") + F.expr("INTERVAL 1 HOUR")
        )
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(r4(F.avg("value")).alias("avg_value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .withColumn("filled_value", F.last("avg_value", ignorenulls=True).over(w))
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "filled_value",
        )
    )


SESSION_GAP_MIN = 30

_SESSIONIZE_ORACLE = f"""
WITH e AS (
    SELECT event_id, user_id,
           date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts
    FROM events
), flagged AS (
    SELECT event_id, user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_MIN} * 60
                THEN 1 ELSE 0 END AS new_session
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS session_num
FROM flagged
"""


@register("q_ts_sessionize", oracle=_SESSIONIZE_ORACLE, tags=("timeseries", "window"))
def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign a per-user session number to every event (30-min gap rule).

    Gaps-and-islands: flag events starting a new session (first event,
    or >30 min after the previous one), then a running sum of flags
    numbers the sessions. Two windows over the SAME (user_id, ts)
    partitioning-and-order — one shuffle, the second window reuses the
    sort. This is the event-level complement of the session_window
    aggregate (q_stream_session): it labels rows instead of collapsing
    them, so downstream joins can attach session context to each event.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", F.date_trunc("second", F.col("ts")).alias("ts")
    )
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > SESSION_GAP_MIN * 60),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .select(
            "event_id",
            "user_id",
            F.sum("new_session").over(wrun).alias("session_num"),
        )
    )


_ROLLUP_CASCADE_ORACLE = """
WITH hourly AS (
    SELECT user_id,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           count(*) AS cnt,
           sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS sum_scaled
    FROM events
    GROUP BY 1, 2
)
SELECT user_id,
       strftime(date_trunc('day', hour), '%Y-%m-%d') AS day,
       CAST(sum(cnt) AS BIGINT) AS cnt,
       CAST(sum(sum_scaled) AS DOUBLE) / 10000 AS sum_value,
       CAST(sum(sum_scaled) AS DOUBLE) / 10000 / sum(cnt) AS avg_value
FROM hourly
GROUP BY 1, 2
"""


@register("q_ts_rollup_cascade", oracle=_ROLLUP_CASCADE_ORACLE, tags=("timeseries", "agg"))
def q_ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading rollup: raw → hourly → daily.

    The daily tier is computed FROM the hourly tier by re-aggregating
    mergeable partials (sum of counts, sum of sums) — never from raw —
    and the daily average is rebuilt as sum/count of partials (an
    avg-of-avgs would be wrong whenever hours have unequal volume).
    This is the continuous-aggregate pattern: at 100 TB the hourly
    tier is a materialized table ~1000× smaller than raw, every
    coarser resolution reads the tier above it, and late data only
    re-aggregates its own hour.

    The partials are FIXED-POINT (value scaled ×1e4 to integers):
    integer sums are exact and associative, so the result is identical
    under any partitioning / merge order. A double-sum partial here
    intermittently flipped the 4th decimal of one avg across runs —
    the true value sat exactly on the 0.00005 rounding boundary, and
    Spark's float-sum order is not deterministic. Mergeable partials
    that feed a fixed-decimal output should be integers.
    """
    ev = load_tables(spark, sf_dir)["events"]
    scaled = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("cnt"), F.sum(scaled).alias("sum_scaled"))
    )
    return (
        hourly.groupBy(
            "user_id", F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            (F.sum("sum_scaled").cast("double") / 10000).alias("sum_value"),
            (F.sum("sum_scaled").cast("double") / 10000 / F.sum("cnt")).alias(
                "avg_value"
            ),
        )
    )


_GAPS_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_type,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
           lag(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS prev_sec
    FROM events
)
SELECT user_id,
       CAST(count(prev_sec) AS BIGINT) AS n_gaps,
       {duck_r4('avg(sec - prev_sec)')} AS avg_gap_s,
       CAST(min(sec - prev_sec) AS BIGINT) AS min_gap_s,
       CAST(max(sec - prev_sec) AS BIGINT) AS max_gap_s
FROM seq
WHERE prev_sec IS NOT NULL
GROUP BY user_id
"""


@register("q_ts_gaps", oracle=_GAPS_ORACLE, tags=("timeseries", "window", "agg"))
def q_ts_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per sensor — the dropout/cadence
    monitor for a telemetry link (the reference's 4-minute transmit
    cadence and 20-minute sleeps make gap structure the primary
    health signal). Lag window and aggregate share one user_id
    shuffle."""
    events = load_tables(spark, sf_dir)["events"]
    sec = F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", sec.alias("sec"), F.lag(sec).over(w).alias("prev_sec")
    )
    gap = F.col("sec") - F.col("prev_sec")
    return (
        seq.filter(F.col("prev_sec").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            r4(F.avg(gap)).alias("avg_gap_s"),
            F.min(gap).cast("long").alias("min_gap_s"),
            F.max(gap).cast("long").alias("max_gap_s"),
        )
    )


# ------------------------------------------ linear-interp resampling
# The third resampling primitive after gap-fill (null spine) and
# forward-fill (step function): reconstruct the signal at hour-aligned
# grid points by linear interpolation between each consecutive
# observation pair. Segment-explode shape: ONE lead window pairs the
# observations, each pair emits only the grid points it covers — no
# spine join, no second shuffle; output is |grid points|-bounded.

_INTERP_STEP = 3600

_INTERP_ORACLE = f"""
WITH seq AS (
    SELECT user_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t0,
           value AS v0,
           lead(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
               OVER w AS t1,
           lead(value) OVER w AS v1
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
grid AS (
    SELECT user_id, t0, v0, t1, v1, g.g AS gsec
    FROM seq,
         LATERAL unnest(range((CAST(floor(t0 / {_INTERP_STEP}) AS BIGINT) + 1)
                                  * {_INTERP_STEP},
                              t1 + 1, {_INTERP_STEP})) AS g(g)
    WHERE t1 IS NOT NULL
      AND (CAST(floor(t0 / {_INTERP_STEP}) AS BIGINT) + 1) * {_INTERP_STEP} <= t1
)
SELECT user_id, gsec AS grid_sec,
       floor((v0 + (v1 - v0) * (gsec - t0) * 1.0 / (t1 - t0)) * 10000 + 0.5)
           / 10000 AS interp_value
FROM grid
"""


@register("q_ts_interp", oracle=_INTERP_ORACLE, tags=("timeseries", "window"))
def q_ts_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each sensor's value series onto an hour-aligned grid by
    linear interpolation between consecutive observations.

    One user_id lead window pairs observations; each pair explodes to
    exactly the grid instants inside it (start > t0 guard keeps Spark's
    inclusive ``sequence`` bounds valid and drops zero-width pairs, so
    the divisor is never zero). Same keyed-window + narrow-explode
    discipline as gap-fill: no spine table, no extra shuffle, and at
    100 TB output scales with grid density, not event volume.
    """
    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).cast("long")
    seq = events.select(
        "user_id",
        sec.alias("t0"),
        F.col("value").alias("v0"),
        F.lead(sec).over(w).alias("t1"),
        F.lead("value").over(w).alias("v1"),
    )
    start = (F.floor(F.col("t0") / _INTERP_STEP) + 1) * _INTERP_STEP
    pairs = seq.filter(F.col("t1").isNotNull() & (start <= F.col("t1")))
    grid = pairs.select(
        "user_id", "t0", "v0", "t1", "v1",
        F.explode(F.sequence(start.cast("long"), F.col("t1"), F.lit(_INTERP_STEP))).alias("gsec"),
    )
    interp = F.col("v0") + (F.col("v1") - F.col("v0")) * (
        F.col("gsec") - F.col("t0")
    ) / (F.col("t1") - F.col("t0"))
    return grid.select(
        "user_id",
        F.col("gsec").alias("grid_sec"),
        r4(interp).alias("interp_value"),
    )
