"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Semantics: for each left row, attach the payload of the right row with
the same key and the greatest right-timestamp ``<=`` the left
timestamp (ties on timestamp broken by the greatest sequence column).
This is the reference's periodic-enrichment requirement — attach the
most recent GPS fix to each IMU record (`iceberg-twist/notes.org:19,34`,
SURVEY.md A30) — generalized to any slowly-changing dimension.

Scale design (why not join-then-filter): the naive formulation
``left JOIN right ON key AND r.t <= l.t`` explodes to |left|×|orders
per key| intermediate rows before the window prunes them. Instead we
use the union-sort trick: union both sides into one relation tagged by
side, sort per key on (t, side, seq) via ONE window (= one shuffle on
the key, no row explosion), and carry the latest right payload forward
with ``last(payload, ignorenulls=True)``. Cost is O(|L|+|R|) rows
through a single hash-partitioned sort — the same plan shape survives
a 1000-executor 100 TB run (AQE handles key skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_seq: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: latest right row per key with right_ts <= left_ts.

    Returns all left columns plus ``payload_cols`` (null when no right
    row qualifies). Ties on ``right_ts`` resolve to the max ``right_seq``.
    """
    payload_type = ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload_cols
    )
    rights = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_seq).cast("long").alias("__seq"),
        F.struct(*payload_cols).alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    lefts = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(2**62).alias("__seq"),
        F.lit(None).cast(f"struct<{payload_type}>").alias("__payload"),
        *left.columns,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched: Column = F.last("__payload", ignorenulls=True).over(w)
    return (
        rights.unionByName(lefts)
        .withColumn("__match", matched)
        .filter(F.col("__side") == 1)
        .select(
            *left.columns,
            *[F.col(f"__match.{c}").alias(c) for c in payload_cols],
        )
    )
