"""Shared helpers for query builders.

Determinism conventions live here so every operator module applies
them identically (FIXTURES.md determinism rules).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Temporal output format — identical rendering on both engines.
SPARK_TS_FMT = "yyyy-MM-dd HH:mm:ss"
DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S"


def r4(col: Column | str, scale: int = 10_000) -> Column:
    """Fixed-round a float expression to 4 decimals (hash stability).

    Deliberately NOT ``round()``: Spark rounds via BigDecimal(shortest
    decimal repr) half-up while DuckDB rounds in binary, and the two
    disagree whenever the true value ties at the 5th decimal — which is
    COMMON for decimal-valued money columns. ``floor(x*1e4 + 0.5)/1e4``
    is the identical IEEE-double computation on both engines, so equal
    inputs give bit-equal outputs; the oracle side is ``duck_r4``.
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.floor(col * scale + F.lit(0.5)) / scale


def r2(col: Column | str) -> Column:
    return r4(col, scale=100)


def duck_r4(expr: str, scale: int = 10_000) -> str:
    """DuckDB-side fixed-round matching ``r4`` bit-for-bit."""
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def duck_r2(expr: str) -> str:
    return duck_r4(expr, scale=100)


def exact_sum(col: Column | str, scale: int = 100) -> Column:
    """Summation-order-proof sum of a fixed-decimal double column.

    ``sum(double)`` differs between engines (and between partitionings)
    in the last ulp because IEEE addition is order-dependent; once the
    sum's magnitude × 1e-4 approaches its ulp (money sums ≳1e11, i.e.
    sf≳1 group totals), that drift flips the r4 hashing boundary — the
    sf1 rehearsal caught four such queries. Fix: each value is
    converted to an EXACT integer at ``scale`` (cents for 2-decimal
    money, 1e4 for 4-decimal products), summed exactly in int64, and
    divided back once — a single identical IEEE op on both engines.
    int64 headroom: cents of a 5e5-max money column overflow past
    ~1.8e14 rows per group (sf ≈ 3×10⁷) — far beyond any rehearsal.
    The DuckDB twin is ``duck_exact_sum``.
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.sum(F.floor(col * scale + F.lit(0.5)).cast("long")) / float(scale)


def duck_exact_sum(expr: str, scale: int = 100) -> str:
    """DuckDB-side order-proof sum matching ``exact_sum`` bit-for-bit."""
    return f"(sum(CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)) / {scale}.0)"


def spread(df, *cols: str):
    """Repartition ONLY when the upstream plan is under-partitioned
    relative to the session's parallelism.

    Expensive per-row compute (shingling, hash permutations, feature
    extraction) inherits the scan's partitioning; a source staged as
    a handful of files (or one single-row-group parquet, as in the
    local fixtures) pins that work to as many tasks. At 100 TB the
    corpus arrives as thousands of scan splits and this is a no-op —
    it exists for the small-file/ingest-skew regime, where one narrow
    shuffle of the input rows buys full-cluster parallelism for the
    compute that follows (the partition-sizing rule in PERF.md).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def ts_str(col: Column | str) -> Column:
    """Render a timestamp column as a canonical string."""
    return F.date_format(col, SPARK_TS_FMT)


def duck_ts_str(expr: str) -> str:
    """DuckDB-side canonical timestamp rendering of ``expr``."""
    return f"strftime({expr}, '{DUCK_TS_FMT}')"
