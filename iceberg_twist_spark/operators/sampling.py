"""Sampling operators — systematic, hash-Bernoulli, stratified, per-group k.

A 100 TB pipeline samples constantly: quality audits, eval-set draws,
stratified training mixes, per-key spot checks. The reference's own
probes are samples (read 64 bytes of the stream, pick frame #1 —
`iceberg-twist/main.lua:32`, `iceberg-twist/main.py:87`); these
operators generalize that to statistically meaningful, *deterministic*
sampling over tables.

Determinism: native ``df.sample`` draws per-partition RNG streams, so
results depend on partitioning — useless for cross-engine checks and
non-reproducible across cluster sizes. The checked operators instead
sample on ``md5(cast(key as string))``: content-derived, identical on
every engine and any partitioning, and stable under repartition —
exactly how production eval-set splits should be drawn. The native-API
form is kept as a rows-only query.

Scale notes (100 TB): systematic/hash/stratified sampling is a narrow
per-row filter — no shuffle, pushed into the scan stage, cost O(rows
scanned) with output O(sample). Per-group top-k sampling shuffles on
the group key once and prunes map-side via WindowGroupLimit, so each
partition emits ≤k rows per group before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_exact_sum, duck_r4, exact_sum, r4
from iceberg_twist_spark.registry import register


def _hash_bucket(key):
    """First two hex chars of md5(key) — a uniform 0..255 bucket."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


# ----------------------------------------------------- systematic
_SYSTEMATIC_ORACLE = f"""
SELECT o_orderstatus,
       count(*) * 20 AS est_orders,
       {duck_r4(duck_exact_sum('o_totalprice') + ' * 20')} AS est_revenue
FROM orders
WHERE o_orderkey % 20 = 3
GROUP BY o_orderstatus
"""


@register("q_sample_systematic", oracle=_SYSTEMATIC_ORACLE, tags=("sample", "agg"))
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-in-20 systematic sample of orders with scaled estimates.

    Key-modulus sampling: valid when the key is uncorrelated with the
    measure (true for synthetic orderkeys); the estimate scales the
    sampled aggregate by the sampling period.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 20 == 3)
        .groupBy("o_orderstatus")
        .agg(
            (F.count("*") * 20).alias("est_orders"),
            r4(exact_sum("o_totalprice") * 20).alias("est_revenue"),
        )
    )


# -------------------------------------------------- hash Bernoulli
_HASH_ORACLE = f"""
SELECT l_returnflag,
       count(*) AS sampled_rows,
       count(*) * 16 AS est_rows,
       {duck_r4('avg(l_extendedprice)')} AS avg_price
FROM lineitem
WHERE substr(md5(cast(l_orderkey * 10 + l_linenumber AS varchar)), 1, 2) < '10'
GROUP BY l_returnflag
"""


@register("q_sample_hash", oracle=_HASH_ORACLE, tags=("sample", "agg"))
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~1/16 Bernoulli sample of lineitem keyed on a content hash.

    The sampling decision is a pure function of the row key (md5
    prefix < '10' ⇒ bucket 0..15 of 256), so the same rows are chosen
    regardless of engine, partitioning, or cluster size — the property
    that makes hash sampling the right tool for reproducible eval
    splits at 100 TB.
    """
    t = load_tables(spark, sf_dir)
    rowkey = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    return (
        t["lineitem"]
        .filter(_hash_bucket(rowkey) < "10")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("sampled_rows"),
            (F.count("*") * 16).alias("est_rows"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
        )
    )


# ---------------------------------------------------- stratified
# Per-stratum hash thresholds: rare strata kept at higher rates.
_STRATA = {"purchase": ("80", 2), "signup": ("80", 2), "error": ("40", 4),
           "click": ("10", 16), "view": ("10", 16)}

_STRAT_CASES = " ".join(
    f"WHEN event_type = '{k}' THEN '{thr}'" for k, (thr, _) in _STRATA.items()
)
_SCALE_CASES = " ".join(
    f"WHEN event_type = '{k}' THEN {scale}" for k, (_, scale) in _STRATA.items()
)

_STRATIFIED_ORACLE = f"""
SELECT event_type,
       count(*) AS sampled_rows,
       count(*) * (CASE {_SCALE_CASES} END) AS est_rows,
       {duck_r4(duck_exact_sum('value') + ' * (CASE ' + _SCALE_CASES + ' END)')} AS est_value
FROM events
WHERE substr(md5(cast(event_id AS varchar)), 1, 2)
      < (CASE {_STRAT_CASES} END)
GROUP BY event_type
"""


@register("q_sample_stratified", oracle=_STRATIFIED_ORACLE, tags=("sample", "agg"))
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample of events: rare types kept at 1/2, common at 1/16.

    The training-mix primitive: per-stratum rates as hash thresholds,
    per-stratum inverse-probability scaling for unbiased estimates.
    Unlike ``df.sampleBy`` this is deterministic across engines and
    cluster layouts.
    """
    t = load_tables(spark, sf_dir)
    threshold = None
    scale_expr = None
    for k, (th, sc) in _STRATA.items():
        cond = F.col("event_type") == k
        threshold = F.when(cond, th) if threshold is None else threshold.when(cond, th)
        scale_expr = F.when(cond, sc) if scale_expr is None else scale_expr.when(cond, sc)
    return (
        t["events"]
        .filter(_hash_bucket(F.col("event_id")) < threshold)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("sampled_rows"),
            (F.count("*") * F.max(scale_expr)).alias("est_rows"),
            r4(exact_sum("value") * F.max(scale_expr)).alias("est_value"),
        )
    )


# ------------------------------------------------- per-group k
_GROUP_K_ORACLE = """
SELECT c_custkey, o_orderkey, o_totalprice
FROM (
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
           row_number() OVER (
               PARTITION BY c.c_custkey
               ORDER BY md5(cast(o.o_orderkey AS varchar)), o.o_orderkey
           ) AS rn
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE c.c_nationkey < 5
) t
WHERE rn <= 2
"""


@register("q_sample_group_k", oracle=_GROUP_K_ORACLE, tags=("sample", "window"))
def q_sample_group_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 2-per-customer order sample (hash-ordered top-k).

    Ordering by the key's md5 makes the pick uniform-at-random yet
    reproducible; the window is partitioned by customer so the plan is
    one shuffle on ``c_custkey`` with WindowGroupLimit pruning each
    map partition to ≤2 rows per group before the exchange.
    """
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("c_custkey")
        .orderBy(F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey"))
    )
    return (
        t["customer"]
        .filter(F.col("c_nationkey") < 5)
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


# --------------------------------------- native API (ε-band checked)
_BERNOULLI_EXACT = """
SELECT l_returnflag,
       CAST(count(*) * 0.1 AS DOUBLE) AS sampled_rows,
       floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty
FROM lineitem GROUP BY l_returnflag
"""


@register(
    "q_sample_bernoulli",
    tags=("sample",),
    approx_oracle=_BERNOULLI_EXACT,
    approx_rtol=0.25,
    approx_keys=("l_returnflag",),
)
def q_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``df.sample`` Bernoulli draw (seeded), per-flag estimates.

    Per-partition RNG means the drawn ROW SET depends on physical
    layout, so there is no exact cross-engine oracle — but the
    ESTIMATORS are checked: per-flag sample count must sit within the
    ε-band of fraction×exact and the sampled mean within the band of
    the true mean (rtol 0.25 ≈ 3-4σ at the sf0.001 per-flag sample
    sizes; tighter at every larger SF). The seeded TABLESAMPLE SQL
    form plans to the same SampleExec node."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("double").alias("sampled_rows"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
        )
    )
