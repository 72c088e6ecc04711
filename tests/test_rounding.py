"""The r4 fixed-round convention must agree bit-for-bit across engines."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.common import duck_r4, r4

# Values chosen to straddle half-up/half-even disagreement points.
CASES = [0.00005, 0.12345, 1.99995, 123.45675, 0.1 + 0.2, 2.675, -1.00005]


def test_r4_matches_duck_r4(spark, duck):
    sdf = spark.createDataFrame([(v,) for v in CASES], "x double")
    got = [r.y for r in sdf.select(r4("x").alias("y")).orderBy("x").collect()]
    expr = duck_r4("x")
    want = [
        duck.execute(f"SELECT {expr} FROM (SELECT CAST(? AS DOUBLE) AS x)", [v]).fetchone()[0]
        for v in sorted(CASES)
    ]
    assert got == want
