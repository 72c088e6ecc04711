"""Aggregation operators.

The reference's aggregation surface is its loss/throughput accounting —
cumulative byteSent/msgSent/byteLost counters and kB conversions
(`iceberg-twist/serial_streaming.lua:217-248`, SURVEY.md A18) and the
5 Hz → 1 Hz downsample requirement (`iceberg-twist/notes.org:17`, A28).
Here that generalizes to the full hash-aggregate family.

Scale notes: every ``groupBy().agg()`` compiles to two-phase
HashAggregate (map-side partial + final after one shuffle on the group
keys) — the reference's manual pre-aggregation, done automatically.
``count(distinct)`` uses Catalyst's Expand rewrite; rollup/cube expand
grouping sets map-side. The flagship groups on a 6-value key → trivial
shuffle fan-in at any scale; AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_exact_sum, duck_r4, exact_sum, r4
from iceberg_twist_spark.registry import register

_GLOBAL_ORACLE = f"""
SELECT CAST(count(*) AS BIGINT) AS cnt,
       floor((sum(l_quantity)) * 10000 + 0.5) / 10000 AS sum_qty,
       floor(({duck_exact_sum('l_extendedprice')}) * 10000 + 0.5) / 10000 AS sum_price,
       floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
       floor((min(l_extendedprice)) * 10000 + 0.5) / 10000 AS min_price,
       floor((max(l_extendedprice)) * 10000 + 0.5) / 10000 AS max_price
FROM lineitem
"""


@register("q_agg_global", oracle=_GLOBAL_ORACLE, tags=("agg",))
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate — the A18 cumulative counters in one pass."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.agg(
        F.count("*").alias("cnt"),
        r4(F.sum("l_quantity")).alias("sum_qty"),  # integral values: exact
        r4(exact_sum("l_extendedprice")).alias("sum_price"),
        r4(F.avg("l_discount")).alias("avg_disc"),
        r4(F.min("l_extendedprice")).alias("min_price"),
        r4(F.max("l_extendedprice")).alias("max_price"),
    )


_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       floor((sum(l_quantity)) * 10000 + 0.5) / 10000 AS sum_qty,
       floor(({duck_exact_sum('l_extendedprice')}) * 10000 + 0.5) / 10000 AS sum_base_price,
       floor(({duck_exact_sum('l_extendedprice * (1 - l_discount)', 10000)}) * 10000 + 0.5) / 10000 AS sum_disc_price,
       floor(({duck_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 10000)}) * 10000 + 0.5) / 10000 AS sum_charge,
       floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
       floor((avg(l_extendedprice)) * 10000 + 0.5) / 10000 AS avg_price,
       floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_agg_group", oracle=_Q1_ORACLE, tags=("agg", "flagship"))
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary.

    Scan → shipdate filter (pushed to parquet) → derived columns →
    grouped aggregation → two-phase HashAggregate. This is the direct
    generalization of the reference's decode → downsample → report
    pipeline (SURVEY.md §7 phase 0).
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),  # integral: exact
            r4(exact_sum("l_extendedprice")).alias("sum_base_price"),
            # 4-decimal fixed-point accounting for the product sums —
            # per-row floor at 1e-4 grain, exact int64 accumulation
            r4(exact_sum(disc_price, 10000)).alias("sum_disc_price"),
            r4(exact_sum(disc_price * (1 + F.col("l_tax")), 10000)).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_DISTINCT_ORACLE = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
       CAST(count(*) AS BIGINT) AS cnt
FROM lineitem GROUP BY l_returnflag
"""


@register("q_agg_distinct", oracle=_DISTINCT_ORACLE, tags=("agg",))
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.count("*").alias("cnt"),
    )


_ROLLUP_ORACLE = """
SELECT r.r_name, n.n_name, CAST(count(*) AS BIGINT) AS cnt
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@register("q_agg_rollup", oracle=_ROLLUP_ORACLE, tags=("agg",))
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    joined = t["nation"].join(
        F.broadcast(t["region"]),
        t["nation"].n_regionkey == t["region"].r_regionkey,
    )
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("cnt"))


_CUBE_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS cnt,
       floor(({duck_exact_sum('o_totalprice')}) * 10000 + 0.5) / 10000 AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("q_agg_cube", oracle=_CUBE_ORACLE, tags=("agg",))
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt"),
        r4(exact_sum("o_totalprice")).alias("sum_price"),
    )


_GSETS_ORACLE = """
SELECT r.r_name, n.n_name, CAST(count(*) AS BIGINT) AS cnt
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY GROUPING SETS ((r.r_name), (r.r_name, n.n_name), ())
"""


@register("q_agg_grouping_sets", oracle=_GSETS_ORACLE, tags=("agg",))
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t["nation"].createOrReplaceTempView("nation")
    t["region"].createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT r.r_name, n.n_name, count(*) AS cnt
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r.r_name), (r.r_name, n.n_name), ())
        """
    )


_STATS_ORACLE = """
SELECT l_returnflag,
       floor((stddev_samp(l_extendedprice)) * 10000 + 0.5) / 10000 AS std_price,
       floor((var_samp(l_quantity)) * 10000 + 0.5) / 10000 AS var_qty,
       floor((corr(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS corr_pq
FROM lineitem GROUP BY l_returnflag
"""


@register("q_agg_stats", oracle=_STATS_ORACLE, tags=("agg",))
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        r4(F.stddev_samp("l_extendedprice")).alias("std_price"),
        r4(F.var_samp("l_quantity")).alias("var_qty"),
        r4(F.corr("l_extendedprice", "l_quantity")).alias("corr_pq"),
    )


_PCT_ORACLE = """
SELECT l_returnflag,
       floor((CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE)) * 10000 + 0.5) / 10000 AS median_qty,
       floor((CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE)) * 10000 + 0.5) / 10000 AS p90_qty
FROM lineitem GROUP BY l_returnflag
"""


@register("q_agg_percentile", oracle=_PCT_ORACLE, tags=("agg",))
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Spark ``percentile`` ↔ DuckDB ``quantile_cont``)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        r4(F.percentile("l_quantity", 0.5)).alias("median_qty"),
        r4(F.percentile("l_quantity", 0.9)).alias("p90_qty"),
    )


_COLLECT_ORACLE = """
SELECT l_orderkey,
       string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_list
FROM lineitem GROUP BY l_orderkey
"""


@register("q_agg_collect", oracle=_COLLECT_ORACLE, tags=("agg",))
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect — the A9 int16[] sample-vector reassembly per record,
    rendered canonically as a CSV string for hash stability."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("line_list")
    )


_PIVOT_ORACLE = """
SELECT user_id % 10 AS user_bucket,
       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS "click",
       CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS "error",
       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS "purchase",
       CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS "signup",
       CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS "view"
FROM events GROUP BY user_id % 10
"""

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register("q_agg_pivot", oracle=_PIVOT_ORACLE, tags=("agg",))
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct pass — the
    value scan would be a full-data job at 100 TB)."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


_APPROX_DISTINCT_EXACT = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS approx_users,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY event_type
"""


@register(
    "q_agg_approx_distinct",
    tags=("agg", "sketch"),
    approx_oracle=_APPROX_DISTINCT_EXACT,
    approx_rtol=0.05,
    approx_keys=("event_type",),
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct (rows-only: estimator differs from DuckDB).

    The constant-memory sketch is the 100 TB path for cardinality —
    exact distinct on a high-cardinality key shuffles every value."""
    e = load_tables(spark, sf_dir)["events"]
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count("*").alias("cnt"),
    )


_APPROX_PCTL_EXACT = f"""
SELECT o_orderstatus,
       {duck_r4('quantile_cont(o_totalprice, 0.5)')} AS p50,
       {duck_r4('quantile_cont(o_totalprice, 0.95)')} AS p95,
       {duck_r4('quantile_cont(o_totalprice, 0.99)')} AS p99
FROM orders GROUP BY o_orderstatus
"""


@register(
    "q_agg_approx_percentile",
    tags=("agg", "sketch"),
    approx_oracle=_APPROX_PCTL_EXACT,
    approx_rtol=0.05,
    approx_keys=("o_orderstatus",),
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile p50/p95/p99 of order totals per status.

    Rows-only: Spark's KLL-style sketch and DuckDB's t-digest give
    different estimates by design. The exact-percentile counterpart
    (q_agg_percentile) carries the cross-engine oracle; this is the
    constant-memory form a 100 TB aggregation actually runs.
    """
    o = load_tables(spark, sf_dir)["orders"]
    pct = F.percentile_approx("o_totalprice", [0.5, 0.95, 0.99], 10_000)
    return (
        o.groupBy("o_orderstatus")
        .agg(pct.alias("p"))
        .select(
            "o_orderstatus",
            r4(F.element_at("p", 1)).alias("p50"),
            r4(F.element_at("p", 2)).alias("p95"),
            r4(F.element_at("p", 3)).alias("p99"),
        )
    )


_WEIGHTED_ORACLE = f"""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       {duck_r4('sum(l_extendedprice * l_quantity) / sum(l_quantity)')} AS wavg_price,
       {duck_r4('avg(l_extendedprice)')} AS avg_price
FROM lineitem GROUP BY l_returnflag
"""


@register("q_agg_weighted", oracle=_WEIGHTED_ORACLE, tags=("agg",))
def q_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag next to the
    plain mean — the weighted-aggregate shape (sum(w·x)/sum(w)), one
    map-side-combined pass."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        r4(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
            / F.sum("l_quantity")
        ).alias("wavg_price"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
    )


# Composite arg key: price has 2 decimals (< 1e8 after scaling) and
# orderkey is unique, so price*1e8 + orderkey is a total order that
# both engines compute as the identical double (|key| < 2^53).
_ARG_KEY = "l_extendedprice * 100000000 + l_orderkey"

_ARGEXT_ORACLE = f"""
SELECT l_returnflag,
       arg_max(l_orderkey, {_ARG_KEY}) AS max_price_order,
       {duck_r4(f'arg_max(l_extendedprice, {_ARG_KEY})')} AS max_price,
       arg_min(l_orderkey, {_ARG_KEY}) AS min_price_order,
       {duck_r4(f'arg_min(l_extendedprice, {_ARG_KEY})')} AS min_price
FROM lineitem GROUP BY l_returnflag
"""


@register("q_agg_argextrema", oracle=_ARGEXT_ORACLE, tags=("agg",))
def q_agg_argextrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (arg-extrema): which order carries each return
    flag's highest and lowest price. The ordering key is a composite
    (price scaled + unique orderkey) so ties are impossible and both
    engines pick the same witness — the 'top row per group without a
    window' aggregate."""
    li = load_tables(spark, sf_dir)["lineitem"]
    key = F.col("l_extendedprice") * 100000000 + F.col("l_orderkey")
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", key).alias("max_price_order"),
        r4(F.max_by("l_extendedprice", key)).alias("max_price"),
        F.min_by("l_orderkey", key).alias("min_price_order"),
        r4(F.min_by("l_extendedprice", key)).alias("min_price"),
    )
