"""Connector tests: partition pruning proof + iceberg guard."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.sources.connectors import (
    _sink_dir,
    iceberg_available,
    q_sink_partitioned,
    write_iceberg,
)


def test_partitioned_sink_layout_and_pruning(spark, sf_dir):
    q_sink_partitioned(spark, sf_dir).collect()  # ensure written
    path, _ = _sink_dir("part", sf_dir)
    part_dirs = {d for d in os.listdir(path) if d.startswith("o_orderpriority=")}
    assert len(part_dirs) == 5  # one dir per priority — the A15 routing layout
    # the read-back filter must prune partitions, not scan-and-filter
    import pyspark.sql.functions as F

    back = spark.read.parquet(path).filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_iceberg_guard(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present; guard not applicable")
    with pytest.raises(NotImplementedError, match="iceberg"):
        write_iceberg(df, "local.db.nation")
