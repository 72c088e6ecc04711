"""Join operators — all join shapes from SURVEY.md §2.B.

Scale notes per shape:
- inner/left/full/semi/anti on big×big → sort-merge with AQE; Catalyst
  picks broadcast-hash automatically when a side fits the threshold.
- dimension joins (nation, region, bands) are explicitly
  ``broadcast()`` — no shuffle of the fact side's data beyond its own.
- the theta (band) join broadcasts the tiny band table → broadcast
  nested-loop, cost O(|facts| × |bands|) with |bands| constant.
- the as-of join uses the union-sort trick (see operators/asof.py) —
  one shuffle, no row explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_ts_str, ts_str
from iceberg_twist_spark.operators.asof import asof_join
from iceberg_twist_spark.registry import register

_INNER_ORACLE = """
SELECT o.o_orderkey, o.o_custkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


@register("q_join_inner", oracle=_INNER_ORACLE, tags=("join",))
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
    )


_BCAST_ORACLE = """
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register("q_join_broadcast", oracle=_BCAST_ORACLE, tags=("join",))
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension join with an explicit broadcast hint — the fact side
    never shuffles."""
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), t["nation"].n_regionkey == t["region"].r_regionkey)
        .select("n_nationkey", "n_name", "r_name")
    )


_MULTI_ORACLE = """
SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, c.c_name, n.n_name
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


@register("q_join_multiway", oracle=_MULTI_ORACLE, tags=("join",))
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join — Catalyst/AQE reorders; nation broadcasts."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey", "c_name", "n_name")
    )


_LEFT_ORACLE = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o
  ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
"""


@register("q_join_left", oracle=_LEFT_ORACLE, tags=("join",))
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with an extra ON predicate so null probes actually occur."""
    t = load_tables(spark, sf_dir)
    o, c = t["orders"], t["customer"]
    cond = (o.o_custkey == c.c_custkey) & (o.o_orderpriority == "1-URGENT")
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


_FULL_ORACLE = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
  ON o.o_custkey = c.c_custkey
"""


@register("q_join_full", oracle=_FULL_ORACLE, tags=("join",))
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over asymmetric slices → nulls on both sides."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_acctbal") > 5000)
    o = t["orders"].filter(F.col("o_totalprice") > 400000)
    return c.join(o, o.o_custkey == c.c_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


@register("q_join_semi", oracle=_SEMI_ORACLE, tags=("join",))
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return t["customer"].join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


@register("q_join_anti", oracle=_ANTI_ORACLE, tags=("join",))
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return t["customer"].join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


_THETA_ORACLE = """
SELECT o.o_orderkey, b.band_id, o.o_totalprice
FROM orders o
JOIN (SELECT r_regionkey AS band_id,
             r_regionkey * 100000.0 AS lo,
             (r_regionkey + 1) * 100000.0 AS hi
      FROM region) b
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
"""


@register("q_join_theta", oracle=_THETA_ORACLE, tags=("join",))
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/band) join — broadcast nested-loop over a tiny
    derived band table."""
    t = load_tables(spark, sf_dir)
    bands = t["region"].select(
        F.col("r_regionkey").alias("band_id"),
        (F.col("r_regionkey") * 100000.0).alias("lo"),
        ((F.col("r_regionkey") + 1) * 100000.0).alias("hi"),
    )
    o = t["orders"]
    cond = (o.o_totalprice >= F.col("lo")) & (o.o_totalprice < F.col("hi"))
    return o.join(F.broadcast(bands), cond).select(
        "o_orderkey", "band_id", "o_totalprice"
    )


_CROSS_ORACLE = """
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
"""


@register("q_join_cross", oracle=_CROSS_ORACLE, tags=("join",))
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


_ASOF_ORACLE = f"""
SELECT event_id, user_id, matched_orderkey, order_date, matched_totalprice
FROM (
  SELECT e.event_id, e.user_id,
         o.o_orderkey AS matched_orderkey,
         {duck_ts_str('o.o_orderdate')} AS order_date,
         o.o_totalprice AS matched_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
WHERE rn = 1
"""


@register("q_join_asof", oracle=_ASOF_ORACLE, tags=("join", "asof"))
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event enriched with the latest prior order of the
    same user (A30 GPS-enrichment semantics). Union-sort implementation —
    see operators/asof.py; the oracle uses the equivalent join+window SQL.
    """
    t = load_tables(spark, sf_dir)
    left = t["events"].select("event_id", "user_id", "ts")
    right = t["orders"].select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    joined = asof_join(
        left,
        right,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_seq="o_orderkey",
        payload_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("matched_orderkey"),
        ts_str("o_orderdate").alias("order_date"),
        F.col("o_totalprice").alias("matched_totalprice"),
    )


_NULLSAFE_ORACLE = """
WITH c AS (
    SELECT c_custkey, nullif(c_nationkey, 0) AS nk FROM customer
), n AS (
    SELECT nullif(n_nationkey, 0) AS nk, n_name FROM nation
)
SELECT coalesce(n.n_name, 'NULL_KEY') AS nation, count(*) AS customers
FROM c JOIN n ON c.nk IS NOT DISTINCT FROM n.nk
GROUP BY 1
"""


@register("q_join_nullsafe", oracle=_NULLSAFE_ORACLE, tags=("join",))
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM).

    nationkey 0 is mapped to NULL on both sides; the null-safe
    comparator matches NULL with NULL (a plain ``=`` would drop those
    rows). Spark plans ``<=>`` as an equi join key — still a hash
    join, not a nested loop.
    """
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.nullif(F.col("c_nationkey"), F.lit(0)).alias("c_nk"))
    n = t["nation"].select(
        F.nullif(F.col("n_nationkey"), F.lit(0)).alias("n_nk"), "n_name"
    )
    return (
        c.join(F.broadcast(n), F.col("c_nk").eqNullSafe(F.col("n_nk")))
        .groupBy(F.coalesce("n_name", F.lit("NULL_KEY")).alias("nation"))
        .agg(F.count("*").alias("customers"))
    )
