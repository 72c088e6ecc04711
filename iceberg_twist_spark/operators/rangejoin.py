"""Range (interval) join — bucketed so it never degenerates to O(n²).

The reference's enrichment requirement ("GPS every 5 min, attach to
each broadcast" — `iceberg-twist/notes.org:19,34`) has two temporal
shapes: *as-of* (latest prior fix — operators/asof.py) and *range*
(all right rows within a time window of each left row). Spark has no
native range-join optimization (Databricks' range-join hints are not
in OSS), and the naive plan for ``l.key = r.key AND r.ts BETWEEN l.ts
- w AND l.ts`` is an equi join whose residual runs over every same-key
pair — quadratic in rows-per-key, which at 100 TB (millions of events
per key) is the difference between minutes and never finishing.

Strategy here: quantize time into buckets of the window width. Each
build row lands in exactly one ``(key, bucket)``; each probe row
explodes to the 2 candidate buckets its window can reach
(``sequence`` + ``explode``, JVM-side). The join becomes a pure equi
join on ``(key, bucket)`` — hash-partitioned shuffle, AQE-splittable,
candidate set per probe bounded by 2 buckets of same-key rows — and
the exact BETWEEN runs as a residual filter on that bounded set. Cost:
O(|probe| × 2 + |build|) shuffled rows, never |probe|×|build per key|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.registry import register


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """All (left, right) same-key pairs with
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s``.

    Timestamps are compared at second precision. Columns from both
    sides are kept (right's key/ts renamed with a ``r_`` prefix when
    colliding). Bucket width = window width, so each probe explodes
    to exactly 2 candidate buckets regardless of data volume.
    """
    assert lower_s <= upper_s
    width = max(upper_s - lower_s, 1)

    l_epoch = F.unix_timestamp(F.date_trunc("second", F.col(left_ts)))
    r_epoch = F.unix_timestamp(F.date_trunc("second", F.col(right_ts)))

    rights = right.select(
        F.col(key).alias("__rk"),
        r_epoch.alias("__rt"),
        F.floor(r_epoch / width).alias("__rbucket"),
        *[F.col(c).alias(f"r_{c}" if c in left.columns else c)
          for c in right.columns],
    )
    lefts = left.withColumn("__lt", l_epoch).withColumn(
        "__lbucket",
        F.explode(
            F.sequence(
                F.floor((F.col("__lt") + lower_s) / width),
                F.floor((F.col("__lt") + upper_s) / width),
            )
        ),
    )
    joined = lefts.join(
        rights,
        (F.col(key) == F.col("__rk"))
        & (F.col("__lbucket") == F.col("__rbucket"))
        & (F.col("__rt") >= F.col("__lt") + lower_s)
        & (F.col("__rt") <= F.col("__lt") + upper_s),
    )
    return joined.drop("__rk", "__rt", "__lt", "__lbucket", "__rbucket")


_RANGE_ORACLE = """
WITH p AS (
    SELECT user_id, event_id,
           date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts
    FROM events WHERE event_type = 'purchase'
), e AS (
    SELECT user_id, event_id, value,
           date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts
    FROM events WHERE event_type = 'error'
)
SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id,
       CAST(epoch(p.ts) - epoch(e.ts) AS BIGINT) AS gap_s
FROM p JOIN e ON p.user_id = e.user_id
WHERE e.ts >= p.ts - INTERVAL 1 HOUR AND e.ts <= p.ts
"""


@register("q_join_range", oracle=_RANGE_ORACLE, tags=("join", "range"))
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors within the hour preceding each purchase, per user.

    The "what went wrong before conversion events" query — a pure
    interval join. Planned via the bucketed strategy above: equi join
    on (user_id, hour-bucket), exact window as residual; the audit
    asserts no nested-loop node appears.
    """
    ev = load_tables(spark, sf_dir)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), "ts"
    )
    out = range_join(
        purchases,
        errors,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_s=-3600,
        upper_s=0,
    )
    # range_join renamed the right ts to r_ts before bucketing
    gap = (
        F.unix_timestamp(F.date_trunc("second", F.col("ts")))
        - F.unix_timestamp(F.date_trunc("second", F.col("r_ts")))
    )
    return out.select(
        "user_id", "purchase_id", "error_id", gap.alias("gap_s")
    )
