"""Telemetry analytics — per-sensor anomaly detection and OHLC-style
time-bar downsampling over the ``events`` stream fixture.

The reference's deployment watches a sensor stream for operational
health (loss counters, status events — `iceberg-twist/
serial_streaming.lua:217-248,172-174`) and downsamples 5 Hz telemetry
to a 1 Hz report rate (`iceberg-twist/notes.org:17`). These operators
are the analytical generalizations: flag statistically-anomalous
readings per sensor, and compress a high-rate value stream into
per-key time bars (open/high/low/close) — the canonical lossy
downsample that preserves envelope structure.

Scale notes: the z-score pass is one keyed aggregate (per-sensor
moments, map-side partials) broadcast back onto the stream — the
stream itself is never shuffled. OHLC shuffles once on
(key, bar): partial min/max combine map-side, and open/close ride the
same shuffle as ordered-frame window functions; state per group is
O(1). Both shapes are linear scans at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_r4, r4
from iceberg_twist_spark.registry import register

Z_CUTOFF = 2.0

_ZSCORE_ORACLE = f"""
WITH stats AS (
    SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sigma,
           count(*) AS n_obs
    FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.value,
       {duck_r4('(e.value - s.mu) / s.sigma')} AS z,
       CAST(s.n_obs AS BIGINT) AS n_obs
FROM events e JOIN stats s USING (user_id)
WHERE s.sigma > 0
  AND abs({duck_r4('(e.value - s.mu) / s.sigma')}) >= {Z_CUTOFF}
"""


@register("q_ts_zscore", oracle=_ZSCORE_ORACLE, tags=("timeseries", "agg", "filter"))
def q_ts_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor z-score outliers: readings ≥2σ from that sensor's
    mean. Per-key moments are one map-side-combined aggregate joined
    back onto the stream (AQE broadcasts while the stats side is
    small; a shuffled join is the correct plan once the key space
    outgrows it); the cutoff applies to the *rounded* score so the
    boundary is engine-independent."""
    events = load_tables(spark, sf_dir)["events"]
    stats = events.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count("*").alias("n_obs"),
    )
    z = r4((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        # per-key stats grow with the key space — no forced broadcast;
        # AQE picks broadcast whenever the stats side is actually small.
        events.join(stats, "user_id")
        .filter(F.col("sigma") > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= Z_CUTOFF)
        .select(
            "event_id", "user_id", "value", "z",
            F.col("n_obs").cast("long").alias("n_obs"),
        )
    )


_OHLC_ORACLE = f"""
WITH e AS (
    SELECT user_id,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           value, CAST(ts AS TIMESTAMP) AS ts, event_id
    FROM events
),
w AS (
    SELECT user_id, day, value,
           first_value(value) OVER (
               PARTITION BY user_id, day ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS open_v,
           last_value(value) OVER (
               PARTITION BY user_id, day ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS close_v
    FROM e
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       min(open_v) AS open, max(value) AS high, min(value) AS low,
       min(close_v) AS close,
       CAST(count(*) AS BIGINT) AS n_events,
       {duck_r4('sum(value)')} AS volume
FROM w GROUP BY user_id, day
"""


@register("q_ts_ohlc", oracle=_OHLC_ORACLE, tags=("timeseries", "window", "agg"))
def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor daily OHLC bars: open/high/low/close + volume.

    The lossy downsample that keeps envelope structure (what the
    reference's 5 Hz → 1 Hz throttle approximates crudely). One
    shuffle on (user_id, day): open/close are ordered-frame window
    values (ts, event_id tiebreak) computed on the same partitioning
    the final aggregate uses, so Spark plans a single exchange.
    """
    events = load_tables(spark, sf_dir)["events"]
    e = events.select(
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "value", "ts", "event_id",
    )
    w = (
        Window.partitionBy("user_id", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.withColumn("open_v", F.first("value").over(w))
        .withColumn("close_v", F.last("value").over(w))
        .groupBy("user_id", F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.min("open_v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.min("close_v").alias("close"),
            F.count("*").cast("long").alias("n_events"),
            r4(F.sum("value")).alias("volume"),
        )
    )


_DRIFT_ORACLE = f"""
WITH seq AS (
    SELECT user_id, value,
           row_number() OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
),
halves AS (
    -- exact integer-cent moments: avg/var_samp over doubles are
    -- summation-order-dependent in the last ulp, which flips the r4
    -- boundary between engines (surfaced by the sf1 twin data)
    SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
           (rn * 2 <= n) AS first_half
    FROM seq
),
moments AS (
    SELECT user_id,
           sum(CASE WHEN first_half THEN c END) AS s1,
           sum(CASE WHEN first_half THEN c * c END) AS q1,
           count(CASE WHEN first_half THEN c END) AS n1,
           sum(CASE WHEN NOT first_half THEN c END) AS s2,
           sum(CASE WHEN NOT first_half THEN c * c END) AS q2,
           count(CASE WHEN NOT first_half THEN c END) AS n2
    FROM halves GROUP BY user_id
),
stats AS (
    SELECT user_id, n1, n2,
           s1 / (n1 * 100.0) AS m1,
           s2 / (n2 * 100.0) AS m2,
           -- square in DOUBLE to mirror Spark's IEEE sequence exactly
           -- (sum(BIGINT) here is HUGEINT; Spark's is a wrapping int64)
           (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
               / (n1 - 1) / 10000.0 AS v1,
           (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
               / (n2 - 1) / 10000.0 AS v2
    FROM moments WHERE n1 >= 2 AND n2 >= 2
)
SELECT user_id,
       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       {duck_r4('m1')} AS mean_first, {duck_r4('m2')} AS mean_second,
       {duck_r4('(m2 - m1) / sqrt(v1 / n1 + v2 / n2)')} AS drift_z,
       abs({duck_r4('(m2 - m1) / sqrt(v1 / n1 + v2 / n2)')}) >= 2.0 AS drifted
FROM stats
WHERE v1 / n1 + v2 / n2 > 0
"""


@register("q_ts_drift", oracle=_DRIFT_ORACLE, tags=("timeseries", "window", "agg"))
def q_ts_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detector per sensor: Welch z-statistic
    between the first and second half of each sensor's time-ordered
    stream — the "did this sensor's behavior change?" monitor (and the
    same test a training pipeline runs between data snapshots).

    One shuffle on user_id shared by the ordering window and the
    half-stats aggregate. Mean/variance come from EXACT integer-cent
    moment sums (values carry 2 decimals) so every double op after the
    aggregation is one identical IEEE sequence on both engines —
    avg/var_samp over doubles drift by summation order and can flip
    the r4 boundary (caught by the sf1 twin data).
    """
    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n"),
    )
    first = F.col("rn") * 2 <= F.col("n")
    half = lambda cond, e: F.when(cond, e)  # noqa: E731
    c, c2 = F.col("c"), F.col("c") * F.col("c")
    moments = seq.groupBy("user_id").agg(
        F.sum(half(first, c)).alias("s1"),
        F.sum(half(first, c2)).alias("q1"),
        F.count(half(first, c)).alias("n1"),
        F.sum(half(~first, c)).alias("s2"),
        F.sum(half(~first, c2)).alias("q2"),
        F.count(half(~first, c)).alias("n2"),
    )
    s1, q1, n1 = F.col("s1"), F.col("q1"), F.col("n1")
    s2, q2, n2 = F.col("s2"), F.col("q2"), F.col("n2")
    # Square in DOUBLE, not int64: a user-half's cent sum overflows
    # int64 silently in Spark (non-ANSI wraps) once it passes ~3.0e9,
    # while DuckDB's sum(BIGINT) is HUGEINT and squares exactly. Both
    # engines now run the identical IEEE double sequence (oracle casts
    # the same way).
    s1d, s2d = s1.cast("double"), s2.cast("double")
    q1d, q2d = q1.cast("double"), q2.cast("double")
    stats = moments.filter((n1 >= 2) & (n2 >= 2)).select(
        "user_id", "n1", "n2",
        (s1 / (n1 * 100.0)).alias("m1"),
        (s2 / (n2 * 100.0)).alias("m2"),
        ((q1d - s1d * s1d / n1) / (n1 - 1) / 10000.0).alias("v1"),
        ((q2d - s2d * s2d / n2) / (n2 - 1) / 10000.0).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    z = r4((F.col("m2") - F.col("m1")) / F.sqrt(se2))
    return (
        stats.filter(se2 > 0)
        .select(
            "user_id",
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            r4("m1").alias("mean_first"),
            r4("m2").alias("mean_second"),
            z.alias("drift_z"),
            (F.abs(z) >= 2.0).alias("drifted"),
        )
    )


_TREND_ORACLE = f"""
WITH e AS (
    SELECT user_id, value,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
               - 1704067200 AS x
    FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       {duck_r4('regr_slope(value, x) * 86400')} AS slope_per_day,
       {duck_r4('regr_intercept(value, x)')} AS intercept,
       {duck_r4('regr_r2(value, x)')} AS r2
FROM e GROUP BY user_id
"""


@register("q_ts_trend", oracle=_TREND_ORACLE, tags=("timeseries", "agg"))
def q_ts_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor linear trend: least-squares slope (per day),
    intercept, and R² of value over time — battery-decay / drift-rate
    estimation for the reference's dying-battery deployment, computed
    with the SQL-standard ``regr_*`` aggregates (one map-side-combined
    pass; x is re-based to the epoch of 2024-01-01 so the moment sums
    stay well-conditioned in doubles)."""
    events = load_tables(spark, sf_dir)["events"]
    x = (
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))) - F.lit(1704067200)
    ).alias("x")
    e = events.select("user_id", "value", x)
    return e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        r4(F.regr_slope("value", "x") * 86400).alias("slope_per_day"),
        r4(F.regr_intercept("value", "x")).alias("intercept"),
        r4(F.regr_r2("value", "x")).alias("r2"),
    )
