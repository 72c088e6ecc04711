"""Warehouse modeling operators: SCD2 history, activity streaks,
interval-overlap join, equi-depth histogram, weighted sampling.

The round-2 breadth family: the dimensional-modeling and interval
shapes a warehouse user reaches for daily, each expressed as one
declarative plan with the repo's determinism conventions (r4 rounding,
canonical timestamp strings, explicit tiebreaks) so every query
hash-matches its DuckDB oracle.

Scale discipline (PERF.md rules):
- SCD2 and streaks hash once on the entity key and reuse that
  partitioning across their lag/lead/rank windows and aggregates.
- The interval-overlap join quantizes time into interval-width buckets
  and equi-joins on (key, bucket) — candidate cost is shared-bucket
  mass, never |left|×|right| (same shape as operators/rangejoin.py).
- Equi-depth bin edges are a one-row in-plan broadcast (no driver
  collect); bin assignment is a JVM higher-order filter over the
  9-element edge array.
- Weighted sampling scores rows with a pure content hash (md5, the
  cross-engine convention from operators/sampling.py) scaled by
  1/weight — selection is a `TakeOrderedAndProject` top-k, independent
  of partitioning and cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_r4, duck_ts_str, r4, ts_str
from iceberg_twist_spark.registry import register

# --------------------------------------------------------------- SCD2
# The events stream is read as attribute observations: event_type is
# the observed value of a per-user attribute. SCD2 = collapse repeat
# observations, version the changes with [valid_from, valid_to) ranges,
# open-ended current row. This is the standard dimension-history build
# (Kimball type-2) that MERGE-based pipelines materialize.

_SCD2_SENTINEL = "9999-12-31 00:00:00"

_SCD2_ORACLE = f"""
WITH obs AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type
    FROM events
),
chg AS (
    SELECT user_id, event_type, ts, event_id FROM obs
    WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id,
       event_type AS attr_value,
       {duck_ts_str('ts')} AS valid_from,
       coalesce(
           {duck_ts_str("lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")},
           '{_SCD2_SENTINEL}'
       ) AS valid_to,
       CAST(
           CASE WHEN lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL THEN 1 ELSE 0 END AS BIGINT
       ) AS is_current
FROM chg
"""


@register("q_scd2_build", oracle=_SCD2_ORACLE, tags=("warehouse", "window", "cdc"))
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an observation
    stream: drop repeat observations per user (lag), then stamp each
    surviving version with [valid_from, valid_to) via lead, sentinel
    end + is_current flag on the open row.

    Both windows partition on user_id, so the change-detect and the
    interval-stamp share ONE shuffle; output is |versions|-bounded,
    never |events|-bounded. At 100 TB this is the plan an SCD2 MERGE
    materializes per batch (complements q_cdc_upsert's type-1 form).
    """
    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        events.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return chg.select(
        "user_id",
        F.col("event_type").alias("attr_value"),
        ts_str("ts").alias("valid_from"),
        F.coalesce(ts_str(nxt), F.lit(_SCD2_SENTINEL)).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
    )


# ------------------------------------------------- gaps and islands
_ISLANDS_ORACLE = """
WITH days AS (
    SELECT DISTINCT user_id,
           CAST(floor(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) / 86400)
                AS BIGINT) AS day_no
    FROM events
),
runs AS (
    SELECT user_id,
           day_no - row_number() OVER (
               PARTITION BY user_id ORDER BY day_no
           ) AS anchor
    FROM days
),
islands AS (
    SELECT user_id, anchor, count(*) AS len
    FROM runs GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(sum(len) AS BIGINT) AS active_days
FROM islands GROUP BY user_id
"""


@register("q_ts_islands", oracle=_ISLANDS_ORACLE, tags=("warehouse", "timeseries", "window"))
def q_ts_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of consecutive active days per
    user (day_no − row_number anchor trick), plus streak count and
    total active days.

    Distinct-days, the rank window, and both aggregates all hash on
    user_id — one partitioning reused end-to-end; output is
    |users|-bounded. UTC session timezone pins day boundaries across
    engines (session.py).
    """
    events = load_tables(spark, sf_dir)["events"]
    day_no = F.floor(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400)
    ).cast("long")
    days = events.select("user_id", day_no.alias("day_no")).distinct()
    w = Window.partitionBy("user_id").orderBy("day_no")
    islands = (
        days.withColumn("anchor", F.col("day_no") - F.row_number().over(w))
        .groupBy("user_id", "anchor")
        .agg(F.count("*").alias("len"))
    )
    return islands.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak_days"),
        F.count("*").cast("long").alias("n_streaks"),
        F.sum("len").cast("long").alias("active_days"),
    )


# --------------------------------------------- interval-overlap join
# Error episodes [ts, ts+30min) × purchase windows [ts−15min, ts+15min)
# for the same user: which incidents overlapped buying activity.
_OVL_W = 1800  # bucket width = error-episode length (seconds)

_OVERLAP_ORACLE = f"""
WITH err AS (
    SELECT user_id, event_id AS err_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ls,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + 1800 AS le
    FROM events WHERE event_type = 'error'
),
pur AS (
    SELECT user_id, event_id AS pur_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) - 900 AS rs,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + 900 AS re
    FROM events WHERE event_type = 'purchase'
)
SELECT err.user_id,
       CAST(count(*) AS BIGINT) AS n_overlaps,
       {duck_r4('avg(least(le, re) - greatest(ls, rs))')} AS avg_overlap_s,
       CAST(max(least(le, re) - greatest(ls, rs)) AS BIGINT) AS max_overlap_s
FROM err JOIN pur
  ON err.user_id = pur.user_id AND ls < re AND rs < le
GROUP BY err.user_id
"""


@register(
    "q_join_interval_overlap",
    oracle=_OVERLAP_ORACLE,
    tags=("warehouse", "join", "timeseries"),
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join, bucketed: both interval sets
    explode to the {w}-second buckets they cover (≤2 each), equi-join
    on (user_id, bucket), de-dup the ≤2-bucket pair copies, then apply
    the exact overlap predicate `ls < re AND rs < le` as a residual.

    Never a nested-loop: candidate cost is shared-(key,bucket) mass.
    The same plan at 100 TB is the standard time-grid interval join —
    bucket width tunes candidate fan-out vs duplicate rate. Distinct
    from q_join_range (point-in-interval); this is interval-vs-interval.
    """
    events = load_tables(spark, sf_dir)["events"]
    sec = F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).cast("long")

    err = events.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("err_id"),
        sec.alias("ls"),
        (sec + 1800).alias("le"),
    )
    pur = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pur_id"),
        (sec - 900).alias("rs"),
        (sec + 900).alias("re"),
    )

    def with_buckets(df: DataFrame, lo: str, hi: str) -> DataFrame:
        # buckets covered by [lo, hi): floor(lo/W) .. floor((hi-1)/W)
        return df.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / _OVL_W).cast("long"),
                    F.floor((F.col(hi) - 1) / _OVL_W).cast("long"),
                )
            ),
        )

    cand = (
        with_buckets(err, "ls", "le")
        .join(with_buckets(pur, "rs", "re"), ["user_id", "bucket"])
        .filter((F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")))
        .select("user_id", "err_id", "pur_id", "ls", "le", "rs", "re")
        .distinct()
    )
    ovl = F.least("le", "re") - F.greatest("ls", "rs")
    return cand.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_overlaps"),
        r4(F.avg(ovl)).alias("avg_overlap_s"),
        F.max(ovl).cast("long").alias("max_overlap_s"),
    )


q_join_interval_overlap.__doc__ = q_join_interval_overlap.__doc__.format(w=_OVL_W)


# ------------------------------------------- equi-depth histogram
_DECILES = [i / 10 for i in range(1, 10)]

_EQDEPTH_ORACLE = f"""
WITH e AS (
    SELECT quantile_cont(o_totalprice,
                         [{", ".join(str(q) for q in _DECILES)}]) AS edges
    FROM orders
)
SELECT CAST(len(list_filter(e.edges, x -> o.o_totalprice > x)) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt,
       {duck_r4('min(o.o_totalprice)')} AS bin_min,
       {duck_r4('max(o.o_totalprice)')} AS bin_max
FROM orders o CROSS JOIN e
GROUP BY 1
"""


@register("q_agg_histogram_eqdepth", oracle=_EQDEPTH_ORACLE, tags=("warehouse", "agg"))
def q_agg_histogram_eqdepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order totals: exact
    interpolated deciles computed in ONE aggregate row, broadcast back
    onto the scan, bin = |edges below value| via a JVM higher-order
    filter — no ntile, no global window, no second scan of sorted data.

    Complements q_agg_histogram (equi-width). The edges row is an
    in-plan broadcast (never a driver collect), so the plan is scan →
    1-row agg → broadcast join → hash agg at any scale.
    """
    orders = load_tables(spark, sf_dir)["orders"]
    edges = orders.agg(
        F.expr(
            f"percentile(o_totalprice, array({', '.join(str(q) for q in _DECILES)}))"
        ).alias("edges")
    )
    binned = orders.crossJoin(F.broadcast(edges)).withColumn(
        "bin",
        F.size(F.filter("edges", lambda x: F.col("o_totalprice") > x)).cast("long"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("cnt"),
        r4(F.min("o_totalprice")).alias("bin_min"),
        r4(F.max("o_totalprice")).alias("bin_max"),
    )


# --------------------------------------------- weighted hash sample
_WSAMPLE_K = 200

_WSAMPLE_ORACLE = f"""
WITH scored AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':w42'), 1, 8)
                     AS BIGINT) AS DOUBLE)
           / 4294967296.0 / o_totalprice AS priority
    FROM orders
)
SELECT o_orderkey, o_orderstatus,
       {duck_r4('o_totalprice')} AS total_price,
       {duck_r4('priority * 1e6')} AS priority_ppm
FROM scored
ORDER BY priority, o_orderkey
LIMIT {_WSAMPLE_K}
"""


@register("q_sample_weighted", oracle=_WSAMPLE_ORACLE, tags=("warehouse", "sample", "topk"))
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample: priority = hash-uniform(key) /
    weight, keep the K smallest — heavier rows (price as weight) draw
    proportionally smaller priorities, so selection skews toward them
    while remaining a pure function of the key (engine-, partition-,
    and cluster-size-independent, like the whole sampling suite).

    The md5→uint32→[0,1) uniform uses only integer arithmetic and one
    IEEE division, so priorities are bit-identical across engines; the
    top-K compiles to `TakeOrderedAndProject` (per-partition heap, no
    global sort).
    """
    orders = load_tables(spark, sf_dir)["orders"]
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":w42"))), 1, 8),
        16,
        10,
    ).cast("long")
    priority = u32.cast("double") / F.lit(4294967296.0) / F.col("o_totalprice")
    return (
        orders.select(
            "o_orderkey",
            "o_orderstatus",
            r4("o_totalprice").alias("total_price"),
            r4(priority * 1e6).alias("priority_ppm"),
            priority.alias("_p"),
        )
        .orderBy("_p", "o_orderkey")
        .limit(_WSAMPLE_K)
        .drop("_p")
    )


# ----------------------------------------------- incremental MV merge
# Incremental view maintenance: a materialized per-group aggregate is
# refreshed by combining its saved partial state with the partial
# state of just the NEW rows — never rescanning the base. Works for
# any algebraic aggregate (count/sum/min/max merge directly; avg is
# re-derived from merged (sum, count)). The oracle recomputes from the
# full table, so the query proves merged-incremental ≡ full-recompute.
# At 100 TB this is the difference between an O(|delta|) nightly
# refresh and an O(|base|) rescan.
_MV_SPLIT_FRAC = 0.8  # base = first 80% of orderkeys, delta = rest

_MV_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS cnt,
       floor(((sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0)) * 10000 + 0.5) / 10000 AS sum_price,
       floor(((sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0) / count(*)) * 10000 + 0.5) / 10000 AS avg_price,
       floor((min(o_totalprice)) * 10000 + 0.5) / 10000 AS min_price,
       floor((max(o_totalprice)) * 10000 + 0.5) / 10000 AS max_price
FROM orders
GROUP BY o_orderpriority
"""


@register("q_mv_incremental", oracle=_MV_ORACLE, tags=("warehouse", "agg"))
def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh ≡ full recompute.

    The orders table is split into a 'materialized base' (first 80% of
    orderkeys — the state a nightly job saved) and a 'delta' (the new
    arrivals). Each side aggregates to per-group PARTIAL state
    (count, integer-cent sum, min, max); the refresh merges the two
    3-or-6-row states — sum the counts and cent-sums, min/max the
    extrema, re-derive avg — and the result must hash-match the
    full-table recompute oracle. Partial states are |groups| rows, so
    the merge is O(groups) however large base and delta are."""
    orders = load_tables(spark, sf_dir)["orders"]
    split = orders.agg(
        F.expr(f"percentile_approx(o_orderkey, {_MV_SPLIT_FRAC}, 10000)").alias("s")
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(cents).alias("cents"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )

    with_split = orders.crossJoin(F.broadcast(split))  # 1-row scalar
    base = partial(with_split.filter(F.col("o_orderkey") <= F.col("s")))
    delta = partial(with_split.filter(F.col("o_orderkey") > F.col("s")))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("cents").alias("cents"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    sum_price = F.col("cents") / 100.0
    return merged.select(
        "o_orderpriority",
        "cnt",
        r4(sum_price).alias("sum_price"),
        r4(sum_price / F.col("cnt")).alias("avg_price"),
        r4(F.col("mn")).alias("min_price"),
        r4(F.col("mx")).alias("max_price"),
    )
