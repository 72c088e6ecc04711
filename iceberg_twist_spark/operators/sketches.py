"""Deterministic sketches — count-min and Bloom filter as dataflows.

Sketch structures usually defeat cross-engine checking because their
hash seeds are engine-private (Spark's HLL vs DuckDB's, q_agg_approx_
distinct is rows-only for exactly that reason). These two are built
from md5 — computable identically in ANY engine — so the *entire
sketch construction and query* is oracle-checked, not just executed.

Count-min: depth d=4 rows × width w=256 counters; each key increments
counter ``(d, md5(key‖d) mod w)``; the estimate for a key is the MIN
over its d counters — an upper bound on the true count with error
bounded by collisions. Bloom: the same hash family sets membership
bits; a probe is "maybe present" iff all its bits are set.

Scale notes: building either sketch is ONE groupBy over (row, depth)
pairs — shuffle volume d×|distinct positions| ≤ d×w counters however
large the input (the sketch IS the partial aggregate: per-partition
sub-sketches merge by cell-wise sum/or, which is what the two-phase
hash aggregation does here automatically). Querying broadcasts the
≤d×w-cell sketch. This is the pattern for approximate heavy-hitter /
membership passes over 100 TB where exact per-key state won't fit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.registry import register

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_pos(key: Column, d: Column) -> Column:
    """Counter position for (key, depth-row): md5-derived, engine-neutral."""
    return F.conv(
        F.substring(F.md5(F.concat(key, F.lit("|"), d.cast("string"))), 1, 2), 16, 10
    ).cast("long")


_CMS_POS_SQL = (
    "CAST(('0x' || substr(md5({key} || '|' || CAST({d} AS VARCHAR)), 1, 2)) "
    "AS BIGINT)"
)

_CMS_ORACLE = f"""
WITH expanded AS (
    SELECT event_type, unnest(range(0, {CMS_DEPTH})) AS d FROM events
), cells AS (
    SELECT d, {_CMS_POS_SQL.format(key='event_type', d='d')} AS pos,
           count(*) AS cnt
    FROM expanded GROUP BY 1, 2
), keys AS (
    SELECT DISTINCT event_type FROM events
), probes AS (
    SELECT event_type, d,
           {_CMS_POS_SQL.format(key='event_type', d='d')} AS pos
    FROM keys, LATERAL (SELECT unnest(range(0, {CMS_DEPTH})) AS d) t
), truth AS (
    SELECT event_type, count(*) AS true_cnt FROM events GROUP BY 1
)
SELECT p.event_type, t.true_cnt, min(c.cnt) AS cms_est
FROM probes p
JOIN cells c ON p.d = c.d AND p.pos = c.pos
JOIN truth t ON p.event_type = t.event_type
GROUP BY p.event_type, t.true_cnt
"""


@register("q_sketch_countmin", oracle=_CMS_ORACLE, tags=("sketch", "agg"))
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimate vs true count per event_type.

    The estimate is always ≥ truth (min over hash-rows of colliding
    counters); with 5 keys in a 4×256 sketch collisions are absent, so
    here est == truth — the query proves the machinery, the sketch
    shape is sized for keys ≫ cells.
    """
    ev = load_tables(spark, sf_dir)["events"]
    depths = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d")
    cells = (
        ev.select(F.col("event_type"), depths)
        .groupBy("d", _cms_pos(F.col("event_type"), F.col("d")).alias("pos"))
        .agg(F.count("*").alias("cnt"))
    )
    keys = ev.select("event_type").distinct()
    probes = keys.select("event_type", depths).select(
        "event_type", "d", _cms_pos(F.col("event_type"), F.col("d")).alias("pos")
    )
    truth = ev.groupBy("event_type").agg(F.count("*").alias("true_cnt"))
    return (
        probes.join(cells, ["d", "pos"])
        .groupBy("event_type")
        .agg(F.min("cnt").alias("cms_est"))
        .join(F.broadcast(truth), "event_type")
        .select("event_type", "true_cnt", "cms_est")
    )


BLOOM_BITS = 1024
BLOOM_HASHES = 4


def _bloom_bit(key: Column, d: Column) -> Column:
    """Bit index in [0, BLOOM_BITS): md5-derived, engine-neutral."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key, F.lit("#"), d.cast("string"))), 1, 4),
            16,
            10,
        ).cast("long")
        % BLOOM_BITS
    )


_BLOOM_BIT_SQL = (
    f"(CAST(('0x' || substr(md5({{key}} || '#' || CAST({{d}} AS VARCHAR)), 1, 4)) "
    f"AS BIGINT) % {BLOOM_BITS})"
)

_BLOOM_ORACLE = f"""
WITH member_keys AS (
    SELECT DISTINCT o_orderpriority AS key FROM orders WHERE o_orderstatus = 'F'
), bits AS (
    SELECT DISTINCT {_BLOOM_BIT_SQL.format(key='key', d='d')} AS bit
    FROM member_keys, LATERAL (SELECT unnest(range(0, {BLOOM_HASHES})) AS d) t
), probe_keys AS (
    SELECT DISTINCT o_orderpriority AS key FROM orders
), probe_bits AS (
    SELECT key, {_BLOOM_BIT_SQL.format(key='key', d='d')} AS bit
    FROM probe_keys, LATERAL (SELECT unnest(range(0, {BLOOM_HASHES})) AS d) t
)
SELECT p.key, (count(b.bit) = {BLOOM_HASHES}) AS maybe_member
FROM probe_bits p LEFT JOIN bits b ON p.bit = b.bit
GROUP BY p.key
"""


@register("q_sketch_bloom", oracle=_BLOOM_ORACLE, tags=("sketch", "filter"))
def q_sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership: build from one key set, probe another.

    A probe is maybe-present iff all of its hash bits are set. The
    filter is |bits| rows however many members — at 100 TB this is the
    semi-join pre-filter shipped to scans before the real join runs
    (the hand-rolled form of Spark's runtime bloom-filter injection).
    """
    o = load_tables(spark, sf_dir)["orders"]
    depths = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_HASHES - 1))).alias("d")
    members = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderpriority").alias("key"))
        .distinct()
    )
    bits = (
        members.select("key", depths)
        .select(_bloom_bit(F.col("key"), F.col("d")).alias("bit"))
        .distinct()
    )
    probes = o.select(F.col("o_orderpriority").alias("key")).distinct()
    probe_bits = probes.select("key", depths).select(
        "key", _bloom_bit(F.col("key"), F.col("d")).alias("bit")
    )
    return (
        probe_bits.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("hits"))
        .join(probes, "key", "right")
        .select(
            "key",
            (F.coalesce("hits", F.lit(0)) == BLOOM_HASHES).alias("maybe_member"),
        )
    )


# --------------------------------------------------- mergeable HLL
# The property that makes sketches THE 100 TB cardinality tool is
# mergeability: per-partition (or per-day, per-shard) sketches union
# into the global answer without re-touching rows. Spark 3.5+ exposes
# Apache DataSketches HLL directly: hll_sketch_agg builds binary
# sketches, hll_union_agg merges them. The estimator is engine-private,
# so like q_agg_approx_distinct this carries an ε-band oracle (exact
# per-group and global distincts, 5% relative error) rather than a
# hash oracle.

_HLL_EXACT = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS approx_users
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS approx_users
FROM events
"""


@register(
    "q_sketch_hll_merge",
    tags=("sketch", "agg"),
    approx_oracle=_HLL_EXACT,
    approx_rtol=0.05,
    approx_keys=("event_type",),
)
def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-cardinality pipeline: build one DataSketches HLL per
    event type (hll_sketch_agg over user_id), then union the per-type
    sketches into the global distinct-user estimate (hll_union_agg) —
    no second scan of the events. At 100 TB this is the daily-rollup
    pattern: per-partition sketches persist as bytes and any slice of
    them unions into an exact-shape answer in |sketches| time.
    """
    events = load_tables(spark, sf_dir)["events"]
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    per_type_est = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    global_est = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    ).select(F.lit("ALL").alias("event_type"), "approx_users")
    return per_type_est.unionByName(global_est)


# ------------------------------------------- bloom-pruned semi join
# The runtime-filter pattern end to end: a bloom built from the
# selective dim side broadcasts onto the fact scan and drops most
# non-matching rows BEFORE the shuffle/join; an exact semi join then
# removes the bloom's false positives. No false negatives ⇒ the result
# provably equals the plain join, which is exactly what the oracle
# asserts. This is the hand-rolled, inspectable form of Spark's
# spark.sql.optimizer.runtime.bloomFilter injection — at 100 TB the
# fact rows that never reach the exchange are the whole win.

_BLOOM_JOIN_ORACLE = """
WITH dim AS (
    SELECT DISTINCT s_suppkey
    FROM supplier WHERE s_suppkey % 4 = 1 AND s_acctbal > 0
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0) * 10000 + 0.5) / 10000 AS revenue
FROM lineitem JOIN dim ON l_suppkey = dim.s_suppkey
GROUP BY l_returnflag
"""


@register("q_join_bloom_prune", oracle=_BLOOM_JOIN_ORACLE, tags=("sketch", "join", "filter"))
def q_join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact⋈dim (selective supplier subset): the dim
    keys' bloom bits collect into ONE
    broadcast row; the fact side keeps a row only when all of its key's
    hash bits are present (forall over the bit set — pure JVM, applied
    in the scan stage), then an exact broadcast semi join removes false
    positives. Hash-checked against the plain join, which it must equal
    because blooms never produce false negatives."""
    t = load_tables(spark, sf_dir)
    dim = (
        t["supplier"]
        .filter((F.col("s_suppkey") % 4 == 1) & (F.col("s_acctbal") > 0))
        .select(F.col("s_suppkey").alias("key"))
        .distinct()
    )
    depths = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_HASHES - 1))).alias("d")
    bloom = (
        dim.select(F.col("key").cast("string").alias("key"), depths)
        .select(_bloom_bit(F.col("key"), F.col("d")).alias("bit"))
        .agg(F.collect_set("bit").alias("bits"))
    )
    fact = t["lineitem"].select("l_suppkey", "l_returnflag", "l_extendedprice")
    probe_bits = F.array(
        *[
            _bloom_bit(F.col("l_suppkey").cast("string"), F.lit(d))
            for d in range(BLOOM_HASHES)
        ]
    )
    pruned = (
        fact.crossJoin(F.broadcast(bloom))
        .filter(F.forall(probe_bits, lambda b: F.array_contains("bits", b)))
        .drop("bits")
    )
    # dim is a fixed *fraction* of an SF-growing table — the bloom bits
    # (ONE row) broadcast above is the bounded part; the exact semi join
    # carries no hint so AQE converts it only while dim is truly small.
    exact = pruned.join(
        dim.select(F.col("key").alias("l_suppkey")), "l_suppkey", "left_semi"
    )
    return exact.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_rows"),
        # data-proportional money sum: exact integer-cent accumulation
        # (the raw double sum's ulp is ~0.08 of the r4 grain already at
        # sf3 — boundary flips are a coin toss, not a tail risk)
        (F.floor((F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")) / 100.0) * 10000 + F.lit(0.5)) / 10000).alias("revenue"),
    )
