"""Window-function operators.

Reference surface covered: the monotonic per-record counter
(`iceberg-twist/notes.org:37-38`, A34 → row_number), lag-based
enrichment (A30), and running loss/throughput accounting
(`iceberg-twist/serial_streaming.lua:217-248`, A18 → running frames).

Scale notes: each window is one shuffle on its partition key followed
by an in-partition sort; partition keys are chosen high-cardinality
(orderkey, custkey, user_id) so no single partition concentrates data.
Ordering keys always include a unique tiebreak so results are
deterministic. Top-k-per-group uses row_number + filter, which Spark
4 rewrites with InferWindowGroupLimit (per-partition top-k pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_r4, exact_sum, r4
from iceberg_twist_spark.registry import register

_ROWNUM_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS BIGINT) AS rn
FROM lineitem
"""


@register("q_win_rownum", oracle=_ROWNUM_ORACLE, tags=("window",))
def q_win_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number — the reference's +1 monotonic counter column (A34)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).cast("long").alias("rn"),
    )


_RANK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
"""


@register("q_win_rank", oracle=_RANK_ORACLE, tags=("window",))
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


_LAG_ORACLE = """
SELECT event_id, user_id,
       floor((value) * 10000 + 0.5) / 10000 AS val,
       floor((lag(value) OVER w) * 10000 + 0.5) / 10000 AS prev_val,
       floor((lead(value) OVER w) * 10000 + 0.5) / 10000 AS next_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


@register("q_win_lag", oracle=_LAG_ORACLE, tags=("window",))
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user over event order (event_id is time-ordered and
    unique — immune to the ns→µs timestamp truncation, FIXTURES.md)."""
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "event_id",
        "user_id",
        r4("value").alias("val"),
        r4(F.lag("value").over(w)).alias("prev_val"),
        r4(F.lead("value").over(w)).alias("next_val"),
    )


_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       floor((sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000 AS running_total,
       CAST(count(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cnt
FROM orders
"""


@register("q_win_running", oracle=_RUNNING_ORACLE, tags=("window",))
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals — the A18 cumulative byteSent/msgSent counters."""
    o = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        r4(F.sum("o_totalprice").over(w)).alias("running_total"),
        F.count("*").over(w).alias("running_cnt"),
    )


_RANGE_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       floor((avg(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice
         RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000 AS nearby_avg
FROM orders
"""


@register("q_win_range_frame", oracle=_RANGE_ORACLE, tags=("window",))
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, peers included) — deterministic because
    peers at equal o_totalprice aggregate identically on both engines."""
    o = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        r4(F.avg("o_totalprice").over(w)).alias("nearby_avg"),
    )


def _global_rank(
    df: DataFrame, value_col: str, tiebreak_col: str, n_buckets: int = 64
) -> tuple[DataFrame, int]:
    """Distributed EXACT global rank over a unique total order
    (value_col, tiebreak_col) — no single-reducer window anywhere.

    Shape (the scale-out form of ``row_number() OVER (ORDER BY …)``):
    1. value-range bucketing on ``value_col`` — a pure expression of
       the row, so it is deterministic under stage recomputation
       (unlike ``spark_partition_id()`` after ``repartitionByRange``,
       whose sampled boundaries a retried stage may re-draw);
    2. per-bucket ``row_number`` — parallel windows, one per bucket;
    3. per-bucket counts (≤ ``n_buckets`` rows) materialized once and
       re-emitted as cumulative offsets via a broadcast join — the
       same one-time tiny-constant materialization pattern as
       ``similarity._plane_signs``, never O(rows) driver traffic;
    4. ``global_rank = bucket_offset + local row_number``.

    At 100 TB the same plan holds: each bucket sorts independently
    (bucket count sized to executor memory), and the offsets frame
    stays ≤ n_buckets rows regardless of data volume. Returns
    (df + ``__rank`` column, total row count).
    """
    lo, hi = df.agg(F.min(value_col), F.max(value_col)).first()
    if lo is None:
        # All-null value column: one bucket, tiebreak decides the order.
        bucket = F.lit(0).cast("int")
    else:
        span = float(hi) - float(lo) or 1.0
        # NULLs go to bucket 0 explicitly: within-bucket orderBy is ASC
        # NULLS FIRST, so they take the lowest ranks deterministically —
        # matching a global NULLS FIRST total order — instead of being
        # silently dropped by the inner offsets join on a NULL bucket.
        bucket = F.when(F.col(value_col).isNull(), F.lit(0)).otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor(
                    (F.col(value_col) - F.lit(float(lo))) * n_buckets / F.lit(span)
                ),
            )
        ).cast("int")
    b = df.withColumn("__bucket", bucket)
    counts = {r[0]: r[1] for r in b.groupBy("__bucket").count().collect()}
    total = sum(counts.values())
    run, rows = 0, []
    for k in range(n_buckets):
        rows.append((k, run))
        run += counts.get(k, 0)
    off = df.sparkSession.createDataFrame(rows, "__bucket INT, __offset BIGINT")
    w = Window.partitionBy("__bucket").orderBy(value_col, tiebreak_col)
    ranked = (
        b.join(F.broadcast(off), "__bucket")
        .withColumn("__rank", F.col("__offset") + F.row_number().over(w))
        .drop("__bucket", "__offset")
    )
    return ranked, total


def attach_range_bucket(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 256,
    descending: bool = False,
    bucket_col: str = "__bucket",
) -> DataFrame:
    """Attach an int bucket id that is monotone non-decreasing in the
    (value_col asc|desc) order — i.e. bucket k's rows all precede
    bucket k+1's — so per-bucket windows + cumulative offsets
    reconstruct a global per-partition order (the ``_global_rank``
    shape, kept fully IN-PLAN: the min/max is a 1-row broadcast
    cross join, no driver collect, so composed pipelines stay one
    Catalyst plan). NULL values take bucket 0 ascending (NULLS FIRST)
    and the last bucket descending (desc() is NULLS LAST)."""
    mm = df.agg(F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi"))
    v = F.col(value_col).cast("double")
    lo, hi = F.col("__lo").cast("double"), F.col("__hi").cast("double")
    span = hi - lo
    pos = F.when(span <= 0, F.lit(0.0)).otherwise(
        ((hi - v) if descending else (v - lo)) / span
    )
    b = F.least(F.lit(n_buckets - 1), F.floor(pos * n_buckets)).cast("int")
    null_bucket = F.lit(n_buckets - 1 if descending else 0).cast("int")
    b = F.when(F.col(value_col).isNull(), null_bucket).otherwise(b)
    return (
        df.crossJoin(F.broadcast(mm)).withColumn(bucket_col, b).drop("__lo", "__hi")
    )


def two_phase_cumsum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list,
    value_col: str,
    out_col: str,
    bucket_col: str = "__bucket",
) -> DataFrame:
    """Running sum of ``value_col`` over (part_cols, order_cols) without
    a per-partition serial sort: ``df`` must already carry
    ``bucket_col`` — an int monotone in the order within each partition
    (see ``attach_range_bucket``). Phase 1 runs parallel per-(part,
    bucket) running sums; phase 2 broadcasts the ≤ |parts|×buckets-row
    per-bucket totals back as cumulative offsets. Hash-identical to
    ``Window.partitionBy(part).orderBy(order)`` with a fraction of one
    task's sort — the shape a bounded-cardinality partition key needs
    at 100 TB (explain-audit invariant (e))."""
    w_local = (
        Window.partitionBy(*part_cols, bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn(out_col, F.sum(value_col).over(w_local))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (
        df.groupBy(*part_cols, bucket_col)
        .agg(F.sum(value_col).alias("__bt"))
        .withColumn("__cumoff", F.coalesce(F.sum("__bt").over(w_off), F.lit(0)))
        .drop("__bt")
    )
    return (
        local.join(F.broadcast(off), [*part_cols, bucket_col])
        .withColumn(out_col, F.col(out_col) + F.col("__cumoff"))
        .drop("__cumoff")
    )


def two_phase_row_number(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list,
    out_col: str,
    bucket_col: str = "__bucket",
) -> DataFrame:
    """row_number over (part_cols, order_cols) without a per-partition
    serial sort — requires a pre-attached order-monotone ``bucket_col``
    (see ``attach_range_bucket`` / hash-prefix bucketing). Same
    two-phase shape as ``two_phase_cumsum`` with COUNTS as the bucket
    totals."""
    w_local = Window.partitionBy(*part_cols, bucket_col).orderBy(*order_cols)
    local = df.withColumn(out_col, F.row_number().over(w_local).cast("long"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (
        df.groupBy(*part_cols, bucket_col)
        .agg(F.count("*").alias("__bn"))
        .withColumn("__cumoff", F.coalesce(F.sum("__bn").over(w_off), F.lit(0)))
        .drop("__bn")
    )
    return (
        local.join(F.broadcast(off), [*part_cols, bucket_col])
        .withColumn(out_col, F.col(out_col) + F.col("__cumoff"))
        .drop("__cumoff")
    )


def two_phase_percent_rank(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list,
    out_col: str,
    bucket_col: str = "__bucket",
) -> DataFrame:
    """percent_rank over (part_cols, order_cols) without a per-partition
    serial sort — requires a UNIQUE total order (a tiebreak column in
    ``order_cols``, so percent_rank ≡ (row_number-1)/(n-1)) and a
    pre-attached order-monotone ``bucket_col``. Same two-phase shape as
    ``two_phase_cumsum``; the per-partition row counts ride the same
    tiny offsets frame."""
    w_local = Window.partitionBy(*part_cols, bucket_col).orderBy(*order_cols)
    local = df.withColumn("__rn", F.row_number().over(w_local).cast("long"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(*part_cols)
    off = (
        df.groupBy(*part_cols, bucket_col)
        .agg(F.count("*").alias("__bn"))
        .withColumn("__cumoff", F.coalesce(F.sum("__bn").over(w_off), F.lit(0)))
        .withColumn("__n", F.sum("__bn").over(w_tot))
        .drop("__bn")
    )
    pr = (F.col("__cumoff") + F.col("__rn") - 1) / (F.col("__n") - 1)
    return (
        local.join(F.broadcast(off), [*part_cols, bucket_col])
        .withColumn(out_col, F.when(F.col("__n") > 1, pr).otherwise(F.lit(0.0)))
        .drop("__rn", "__cumoff", "__n")
    )


_NTILE_ORACLE = """
SELECT c_custkey, c_acctbal,
       CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
FROM customer
"""


@register("q_win_ntile", oracle=_NTILE_ORACLE, tags=("window",))
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed ntile over a total order (c_custkey tiebreak).

    ntile(k) is pure arithmetic once the global rank exists: the first
    ``n % k`` tiles get ``n//k + 1`` rows, the rest ``n//k`` — so the
    single-reducer ``Window.orderBy`` the naive form needs is replaced
    by ``_global_rank`` (bucketed parallel sort) + a closed-form tile
    expression. Holds at fact-table scale, not just on dimensions."""
    c = load_tables(spark, sf_dir)["customer"]
    ranked, n = _global_rank(c, "c_acctbal", "c_custkey")
    k = 4
    base, rem = divmod(n, k)
    boundary = rem * (base + 1)
    r = F.col("__rank")
    tile = F.when(
        r <= boundary, F.floor((r - 1) / (base + 1)) + 1
    ).otherwise(rem + F.floor((r - boundary - 1) / max(base, 1)) + 1)
    return ranked.select(
        "c_custkey",
        "c_acctbal",
        tile.cast("long").alias("quartile"),
    )


_TOPK_GROUP_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 2
"""


@register("q_win_topk_group", oracle=_TOPK_GROUP_ORACLE, tags=("window",))
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer — row_number + filter; Spark's
    InferWindowGroupLimit prunes to per-partition top-k before the
    shuffle (the scalable top-k-per-group plan)."""
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )


_FIRST_LAST_ORACLE = """
SELECT o_orderkey, o_custkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_price,
       nth_value(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("q_win_first_last", oracle=_FIRST_LAST_ORACLE, tags=("window",))
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value per customer order history.

    The frame matters: last_value needs UNBOUNDED FOLLOWING (the
    default frame ends at CURRENT ROW, silently yielding the current
    row's value); nth_value(…, 2) is null until the second order
    enters the frame. Identical frames declared on both engines.
    """
    o = load_tables(spark, sf_dir)["orders"]
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    grow = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(grow).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(grow).alias("second_price"),
    )


_SHARE_ORACLE = f"""
WITH rev AS (
    SELECT n.n_name, r.r_name,
           (sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5) AS BIGINT)) / 10000.0) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
)
SELECT n_name, r_name,
       {duck_r4('revenue')} AS revenue,
       {duck_r4('revenue / sum(revenue) OVER (PARTITION BY r_name)')} AS region_share,
       {duck_r4('revenue / sum(revenue) OVER ()')} AS global_share
FROM rev
"""


@register("q_win_share", oracle=_SHARE_ORACLE, tags=("window", "agg", "join"))
def q_win_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue share of its region and
    of the world — the percent-of-total window over a pre-aggregated
    frame. The windows run on |nations| rows (post-aggregation), so
    the unpartitioned global-share window is a 25-row frame, not a
    single-partition pass over the fact table."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return rev.select(
        "n_name", "r_name",
        r4("revenue").alias("revenue"),
        r4(F.col("revenue") / F.sum("revenue").over(w_region)).alias("region_share"),
        r4(F.col("revenue") / F.sum("revenue").over(w_all)).alias("global_share"),
    )


_CUMDIST_ORACLE = """
WITH seq AS (
    SELECT user_id, event_id, event_type,
           CAST(ts AS TIMESTAMP) AS ts,
           row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) = 1 AS first_seen
    FROM events
)
SELECT event_id, user_id,
       CAST(sum(CASE WHEN first_seen THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS types_seen
FROM seq
"""


@register("q_win_cum_distinct", oracle=_CUMDIST_ORACLE, tags=("window",))
def q_win_cum_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding distinct count: how many distinct event types each
    user has seen up to each event. COUNT(DISTINCT) isn't a window
    aggregate, so it's composed as first-occurrence flags (rank 1 per
    (user, type)) running-summed over event order — two windows that
    share the same user_id shuffle, the standard rewrite."""
    events = load_tables(spark, sf_dir)["events"]
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = events.select(
        "event_id", "user_id", "ts",
        (F.row_number().over(w_first) == 1).cast("int").alias("first_seen"),
    )
    return seq.select(
        "event_id", "user_id",
        F.sum("first_seen").over(w_run).cast("long").alias("types_seen"),
    )


_CUMEDIST_ORACLE = f"""
SELECT c_custkey, c_acctbal,
       {duck_r4('percent_rank() OVER (ORDER BY c_acctbal, c_custkey)')} AS pct_rank,
       {duck_r4('cume_dist() OVER (ORDER BY c_acctbal, c_custkey)')} AS cume
FROM customer
"""


@register("q_win_cume_dist", oracle=_CUMEDIST_ORACLE, tags=("window",))
def q_win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed percent_rank + cume_dist over a total order.

    The ordering (c_acctbal, c_custkey) is UNIQUE, so there are no
    peers: rank == row_number, percent_rank = (rank-1)/(n-1) and
    cume_dist = rank/n become closed-form arithmetic over the
    ``_global_rank`` bucketed parallel sort — the fact-scale form of
    what a single-reducer ``Window.orderBy`` would compute."""
    c = load_tables(spark, sf_dir)["customer"]
    ranked, n = _global_rank(c, "c_acctbal", "c_custkey")
    r = F.col("__rank")
    return ranked.select(
        "c_custkey", "c_acctbal",
        r4((r - 1) / F.lit(max(n - 1, 1))).alias("pct_rank"),
        r4(r / F.lit(n)).alias("cume"),
    )
