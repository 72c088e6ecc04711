"""TPC-H-shaped query suite (Q1-Q22) adapted to the testdata schema.

The fixtures (FIXTURES.md) are TPC-H-ish but omit ``partsupp`` and
several columns (comments, addresses, ship modes, commit/receipt
dates). Every query below keeps the *shape* of its TPC-H namesake —
the join graph, the aggregation/subquery structure, the physical-plan
stress it exercises — with documented substitutions:

- ``partsupp`` → distinct ``(l_partkey, l_suppkey)`` pairs from
  ``lineitem``; "supply cost" → ``min(l_extendedprice/l_quantity)``
  per pair (Q2/Q11/Q16/Q20).
- ``l_commitdate``/``l_receiptdate`` lateness → ``l_shipdate``
  shipped more than N days after ``o_orderdate`` (Q4/Q12/Q21).
- comment/phone/container filters → priority / brand / size /
  name-word filters of similar selectivity (Q13/Q16/Q17/Q19/Q22).

Determinism: every float aggregate is ``r4``-rounded in the query on
BOTH engines; quantity sums are exact (integer-valued doubles); every
ORDER BY+LIMIT carries a unique tiebreak key; date outputs render as
canonical strings.

Scale notes (100 TB): dimension sides (region/nation/part slices,
scalar thresholds) broadcast; the fact joins (lineitem⋈orders) shuffle
on their keys and AQE handles skew; grouped-HAVING subqueries
decorrelate to aggregates joined back, so shuffle volume is |groups|.
Reference parity: these generalize the reference's
decode→filter→downsample→report pipeline (iceberg-twist/main.py:84-103,
iceberg-twist/notes.org:17-21) to the full relational surface the
north star mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import (
    duck_exact_sum,
    duck_r4,
    duck_ts_str,
    exact_sum,
    r4,
    ts_str,
)
from iceberg_twist_spark.registry import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------- Q1
_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {duck_r4('sum(l_quantity)')} AS sum_qty,
       {duck_r4(duck_exact_sum('l_extendedprice'))} AS sum_base_price,
       {duck_r4(duck_exact_sum('l_extendedprice * (1 - l_discount)', 10000))} AS sum_disc_price,
       {duck_r4(duck_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 10000))} AS sum_charge,
       {duck_r4('avg(l_quantity)')} AS avg_qty,
       {duck_r4('avg(l_extendedprice)')} AS avg_price,
       {duck_r4('avg(l_discount)')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_tpch_q01", oracle=_Q1_ORACLE, tags=("tpch", "agg"))
def q_tpch_q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary — scan → filter → 8-way grouped agg."""
    t = load_tables(spark, sf_dir)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),  # integral: exact
            r4(exact_sum("l_extendedprice")).alias("sum_base_price"),
            # order-proof 4-decimal fixed-point sums (common.exact_sum)
            r4(exact_sum(disc, 10000)).alias("sum_disc_price"),
            r4(exact_sum(disc * (1 + F.col("l_tax")), 10000)).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------- Q2
_Q2_ORACLE = f"""
WITH ps AS (
    SELECT l_partkey, l_suppkey,
           {duck_r4('min(l_extendedprice / l_quantity)')} AS unit_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
), euro AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
), cand AS (
    SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.n_name, ps.unit_cost
    FROM ps JOIN euro e ON ps.l_suppkey = e.s_suppkey
            JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
)
SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost
FROM cand c
WHERE unit_cost = (SELECT min(unit_cost) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
"""


@register("q_tpch_q02", oracle=_Q2_ORACLE, tags=("tpch", "subquery"))
def q_tpch_q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 min-cost supplier (partsupp → lineitem pair substitution).

    The correlated-min subquery decorrelates to a per-part aggregate
    joined back; unit_cost is r4-rounded before the min-equality so
    the comparison is exact on both engines.
    """
    t = load_tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(r4(F.min(F.col("l_extendedprice") / F.col("l_quantity"))).alias("unit_cost"))
    )
    euro = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t["part"].filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
    cand = (
        # `parts` and `min_cost` are SF-growing (filtered part / per-part
        # aggregate) — no forced broadcast; AQE converts at safe sizes.
        ps.join(euro, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "unit_cost")
    )
    min_cost = cand.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return cand.join(
        min_cost,
        (F.col("p_partkey") == F.col("mc_partkey")) & (F.col("unit_cost") == F.col("min_cost")),
    ).select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "unit_cost")


# ---------------------------------------------------------------- Q3
_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       {duck_r4('sum(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
       {duck_ts_str('o.o_orderdate')} AS o_orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("q_tpch_q03", oracle=_Q3_ORACLE, tags=("tpch", "join", "topk"))
def q_tpch_q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority — 3-way join, grouped revenue, top-10."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < _ts("1998-03-15"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > _ts("1998-03-15"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("l_orderkey", "revenue", ts_str("o_orderdate").alias("o_orderdate"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------- Q4
_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
  AND o.o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority
"""


@register("q_tpch_q04", oracle=_Q4_ORACLE, tags=("tpch", "subquery"))
def q_tpch_q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order priority check — EXISTS → left-semi join.

    Lateness substitution: shipped >30 days after the order date
    (no commit/receipt dates in the fixture).
    """
    t = load_tables(spark, sf_dir)
    o, line = t["orders"], t["lineitem"]
    cond = (line.l_orderkey == o.o_orderkey) & (
        line.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.filter(
            (F.col("o_orderdate") >= _ts("1997-07-01"))
            & (F.col("o_orderdate") < _ts("1997-10-01"))
        )
        .join(line, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------- Q5
_Q5_ORACLE = f"""
SELECT n.n_name,
       {duck_r4(duck_exact_sum('l.l_extendedprice * (1 - l.l_discount)', 10000))} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


@register("q_tpch_q05", oracle=_Q5_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local supplier volume — 6-way join with a same-nation predicate."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1997-01-01"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(r4(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue"))
    )


# ---------------------------------------------------------------- Q6
_Q6_ORACLE = f"""
SELECT {duck_r4(duck_exact_sum('l_extendedprice * l_discount', 10000))} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


@register("q_tpch_q06", oracle=_Q6_ORACLE, tags=("tpch", "filter", "agg"))
def q_tpch_q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting revenue — pushdown-friendly conjunctive filter."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(r4(exact_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000)).alias("revenue"))
    )


# ---------------------------------------------------------------- Q7
_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       {duck_r4(duck_exact_sum('l.l_extendedprice * (1 - l.l_discount)', 10000))} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_12')
    OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_7'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""


@register("q_tpch_q07", oracle=_Q7_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping — bidirectional nation pair, per-year revenue."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_12")) | (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_7")
    )
    return (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(r4(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue"))
    )


# ---------------------------------------------------------------- Q8
_Q8_ORACLE = f"""
SELECT year(o.o_orderdate) AS o_year,
       {duck_r4(
           "sum(CASE WHEN n2.n_name = 'NATION_1' "
           "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)"
           " / sum(l.l_extendedprice * (1 - l.l_discount))"
       )} AS mkt_share
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o.o_orderdate)
"""


@register("q_tpch_q08", oracle=_Q8_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 market share — 8-way join, conditional-share aggregate."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0.0))
    return (
        t["part"]
        .filter(F.col("p_type") == "ECONOMY")
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(t["region"]), F.col("n1_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(r4(F.sum(nat_vol) / F.sum(vol)).alias("mkt_share"))
    )


# ---------------------------------------------------------------- Q9
_Q9_ORACLE = f"""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       {duck_r4(duck_exact_sum(
           'l.l_extendedprice * (1 - l.l_discount)'
           ' - 0.8 * p.p_retailprice * l.l_quantity', 10000
       ))} AS sum_profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


@register("q_tpch_q09", oracle=_Q9_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit.

    Supply-cost substitution: ``0.8 * p_retailprice`` stands in for
    ``ps_supplycost`` (no partsupp table).
    """
    t = load_tables(spark, sf_dir)
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.8 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        t["part"]
        .filter(F.col("p_name").like("%widget%"))
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(r4(exact_sum(profit, 10000)).alias("sum_profit"))
    )


# --------------------------------------------------------------- Q10
_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name,
       {duck_r4('sum(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("q_tpch_q10", oracle=_Q10_ORACLE, tags=("tpch", "join", "topk"))
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting — top-20 customers by lost revenue."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-10-01"))
            & (F.col("o_orderdate") < _ts("1997-01-01"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------- Q11
_Q11_ORACLE = f"""
WITH val AS (
    SELECT l.l_partkey,
           {duck_r4('sum(l.l_extendedprice * (1 - l.l_discount))')} AS value
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_8')
    GROUP BY l.l_partkey
)
SELECT l_partkey, value FROM val
WHERE value > (SELECT 0.001 * sum(value) FROM val)
"""


@register("q_tpch_q11", oracle=_Q11_ORACLE, tags=("tpch", "subquery"))
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock — group-agg vs a global-scalar threshold.

    Partsupp substitution: per-part shipped value from lineitem,
    restricted to two supplier nations; the HAVING threshold is an
    uncorrelated scalar that broadcasts.
    """
    t = load_tables(spark, sf_dir)
    val = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_3", "NATION_8"))
        .groupBy("l_partkey")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("value"))
    )
    total = val.agg((0.001 * F.sum("value")).alias("threshold"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


# --------------------------------------------------------------- Q12
_Q12_ORACLE = """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_returnflag
"""


@register("q_tpch_q12", oracle=_Q12_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping modes — returnflag stands in for l_shipmode;
    lateness = shipped >60 days after order date."""
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------- Q13
_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c.c_custkey
) t
GROUP BY c_count
"""


@register("q_tpch_q13", oracle=_Q13_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order distribution — outer join + double aggregate.

    Comment-filter substitution: exclude '4-NOT SPECIFIED' priority.
    """
    t = load_tables(spark, sf_dir)
    o, c = t["orders"], t["customer"]
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "4-NOT SPECIFIED")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# --------------------------------------------------------------- Q14
_Q14_ORACLE = f"""
SELECT {duck_r4(
    "100.0 * sum(CASE WHEN p.p_type = 'PROMO' "
    "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)"
    " / sum(l.l_extendedprice * (1 - l.l_discount))"
)} AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' AND l.l_shipdate < TIMESTAMP '1997-10-01'
"""


@register("q_tpch_q14", oracle=_Q14_ORACLE, tags=("tpch", "join", "agg"))
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect — conditional-revenue percentage."""
    t = load_tables(spark, sf_dir)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-09-01"))
            & (F.col("l_shipdate") < _ts("1997-10-01"))
        )
        # No broadcast hint: part grows linearly with SF (~200k rows/SF), so a
        # forced broadcast OOMs at scale. AQE picks broadcast whenever the
        # filtered build side is actually small.
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(r4(100.0 * F.sum(promo) / F.sum(vol)).alias("promo_revenue"))
    )


# --------------------------------------------------------------- Q15
_Q15_ORACLE = f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           {duck_r4('sum(l_extendedprice * (1 - l_discount))')} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q_tpch_q15", oracle=_Q15_ORACLE, tags=("tpch", "subquery", "cte"))
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier — quarter-windowed revenue CTE used twice."""
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------- Q16
_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 7, 10, 15, 20, 25, 30, 35, 40)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q_tpch_q16", oracle=_Q16_ORACLE, tags=("tpch", "subquery", "agg"))
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship — distinct pairs, NOT-IN → anti join.

    Complaint-comment substitution: exclude suppliers with negative
    account balance.
    """
    t = load_tables(spark, sf_dir)
    ps = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 15, 20, 25, 30, 35, 40))
    )
    return (
        # `bad` and `parts` grow with SF (filtered supplier / filtered
        # part) — no forced broadcast; size-based planning decides.
        ps.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------- Q17
_Q17_ORACLE = f"""
SELECT {duck_r4('sum(l.l_extendedprice) / 7.0')} AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
"""


@register("q_tpch_q17", oracle=_Q17_ORACLE, tags=("tpch", "subquery"))
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity revenue — correlated scalar avg per part.

    Quantity sums are integer-valued doubles, so the per-part average
    is bit-exact on both engines (no rounding needed in the filter).
    """
    t = load_tables(spark, sf_dir)
    avg_qty = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("aq_partkey"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        t["lineitem"]
        # one brand is ~1/|brands| of part — still linear in SF, so no
        # forced broadcast; AQE converts while the build side is small.
        .join(t["part"].filter(F.col("p_brand") == "Brand#3"),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# --------------------------------------------------------------- Q18
_Q18_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       {duck_ts_str('o.o_orderdate')} AS o_orderdate,
       o.o_totalprice, sum(l.l_quantity) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("q_tpch_q18", oracle=_Q18_ORACLE, tags=("tpch", "subquery", "topk"))
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customer — grouped-HAVING IN → semi join, top-100."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 200)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        # `big` is ~0.004% of orders but still linear in SF — no forced
        # broadcast; AQE chooses broadcast while it is safely small.
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            ts_str("o_orderdate").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------- Q19
_Q19_ORACLE = f"""
SELECT {duck_r4(duck_exact_sum('l.l_extendedprice * (1 - l.l_discount)', 10000))} AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("q_tpch_q19", oracle=_Q19_ORACLE, tags=("tpch", "join", "filter"))
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue — OR-of-conjunctions over an equi join."""
    t = load_tables(spark, sf_dir)
    def band(brand, smax, qlo, qhi):
        return (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= 1) & (F.col("p_size") <= smax)
            & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi)
        )
    return (
        t["lineitem"]
        # Part-side disjuncts are pre-extracted so only the three candidate
        # brands survive the scan (Catalyst's PushExtraPredicateThroughJoin
        # derives the same, but stating it keeps the pushdown explicit).
        # No broadcast hint — part grows with SF; AQE decides the strategy.
        .join(
            t["part"].filter(
                ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5)))
                | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10)))
                | ((F.col("p_brand") == "Brand#15") & (F.col("p_size").between(1, 15)))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(band("Brand#12", 5, 1, 11) | band("Brand#23", 10, 10, 20)
                | band("Brand#15", 15, 20, 30))
        .agg(r4(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue"))
    )


# --------------------------------------------------------------- Q20
_Q20_ORACLE = """
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'blue%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 100
  )
"""


@register("q_tpch_q20", oracle=_Q20_ORACLE, tags=("tpch", "subquery"))
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential promotion — nested grouped-HAVING IN → semi join.

    Partsupp/availqty substitution: suppliers who shipped >100 units
    of 'blue…' parts in the window.
    """
    t = load_tables(spark, sf_dir)
    shippers = (
        t["lineitem"]
        # 'blue%' parts are a fixed fraction of an SF-growing table — no
        # forced broadcast (AQE decides).
        .join(t["part"].filter(F.col("p_name").like("blue%")),
              F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        # `shippers` (grouped-HAVING set) grows with SF — no forced broadcast.
        .join(shippers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


# --------------------------------------------------------------- Q21
_Q21_ORACLE = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3' AND o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


@register("q_tpch_q21", oracle=_Q21_ORACLE, tags=("tpch", "subquery", "topk"))
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting — EXISTS + NOT EXISTS.

    Lateness = shipped >90 days after order date (receipt/commit
    substitution). The semi/anti probes join on orderkey with a
    supplier-inequality residual — still equi-shuffle joins, never
    nested loops.
    """
    t = load_tables(spark, sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    base = (
        t["supplier"]
        .join(F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"].filter(F.col("o_orderstatus") == "F"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(late)
        .select("s_name", "l_orderkey", "l_suppkey")
    )
    others = t["lineitem"].select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(late)
        .select(F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey"))
    )
    return (
        base.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


# --------------------------------------------------------------- Q22
_Q22_ORACLE = f"""
SELECT c.c_nationkey AS cntrycode, count(*) AS numcust,
       {duck_r4(duck_exact_sum('c.c_acctbal'))} AS totacctbal
FROM customer c
WHERE c.c_nationkey IN (3, 8, 13, 18, 23)
  AND c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (3, 8, 13, 18, 23))
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
"""


@register("q_tpch_q22", oracle=_Q22_ORACLE, tags=("tpch", "subquery"))
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity — scalar avg + NOT EXISTS anti join.

    Phone-country-code substitution: ``c_nationkey`` in a 5-key list;
    "no orders" → "no 1-URGENT orders" (every fixture customer has
    orders, so the literal predicate would be degenerate).
    """
    t = load_tables(spark, sf_dir)
    keys = [3, 8, 13, 18, 23]
    cust = t["customer"].filter(F.col("c_nationkey").isin(keys))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(F.count("*").alias("numcust"), r4(exact_sum("c_acctbal")).alias("totacctbal"))
    )
