"""Skew-mitigation join: explicit key salting.

AQE's runtime skew-join splitting (enabled in session defaults) is the
first line of defense; explicit salting is the deterministic fallback
for pathological producers (one sensor emitting 99% of rows — the
reference's single-IMU deployment is exactly that shape at fleet
scale). The salted plan must be RESULT-identical to the plain join,
which is what the oracle asserts.

Mechanism: the probe (large) side gets a uniform salt in [0, N); the
build side is replicated N× with every salt value; the join key
becomes (key, salt), splitting each hot key's rows across N tasks.
Build-side replication costs N×|build| — acceptable when build ≪ probe,
which is the only regime where salting is the right tool anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import r4
from iceberg_twist_spark.registry import register

N_SALT = 8


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salt: int = N_SALT,
    how: str = "inner",
) -> DataFrame:
    """Join ``probe ⋈ build`` on ``key`` with build-side salting.

    The probe salt must be uniform but NOT key-derived (a key-derived
    salt sends every row of a hot key to the same salt again); here it
    hashes the probe row's full tuple."""
    probe_s = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salt))
    )
    build_s = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = probe_s.join(build_s, [key, "__salt"], how)
    return out.drop("__salt")


_SALTED_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       -- exact integer-cent sum (see q_iceberg_compact: at sf1 the
       -- group sums outgrow the 1e-4 grain of double rounding)
       floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0)
             * 10000 + 0.5) / 10000 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@register("q_join_salted", oracle=_SALTED_ORACLE, tags=("join", "skew"))
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-fact join, aggregated — must be value-identical to
    the plain join (the salt is an execution detail, never visible in
    results)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_extendedprice")
    orders = t["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, "l_orderkey")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        r4(F.sum(cents) / 100.0).alias("revenue"),
    )
