"""Testdata catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier
part orders lineitem events documents embeddings — one parquet file
each under a scale-factor directory.

At 100 TB these would be partitioned Iceberg tables; the loader stays
a thin seam so the same query builders run against
``spark.read.parquet`` locally and ``spark.table('db.t')`` on a
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from iceberg_twist_spark.session import pin_session_defaults

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a DataFrame keyed by table name.

    ``events.ts`` arrives as int64 nanoseconds (see
    session.pin_session_defaults) and is floor-truncated to a µs
    TimestampType here — the same truncation DuckDB applies when
    casting TIMESTAMP_NS to TIMESTAMP, so oracles agree.
    """
    pin_session_defaults(spark)
    dfs = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}
    events = dfs["events"]
    if isinstance(events.schema["ts"].dataType, LongType):
        # integer `div` — a double division would lose precision on
        # 1.7e18-scale nanosecond values (53-bit mantissa)
        dfs["events"] = events.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return dfs


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (for spark.sql)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
