"""Oracle-differential test: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 gate (row count + column names +
order-insensitive normalized values) at sf0.001. Oracle-less queries
get a rows-only execution check.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.registry import REGISTRY, _load_all_modules
from tools.check import compare

_load_all_modules()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    ok, msg, _ = compare(name, spark, duck, sf_dir)
    assert ok, f"{name}: {msg}"
