"""Property-based tests (hypothesis): invariants over generated inputs.

Each property runs one Spark job per example; examples are capped so
the suite stays fast while still exploring the input space beyond the
fixture data.
"""

from __future__ import annotations

import math
import os
import struct
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.common import duck_r4, r4
from iceberg_twist_spark.operators.skew import salted_join
from iceberg_twist_spark.pipeline import decode_frame_v2

_PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

i16 = st.integers(-(2**15), 2**15 - 1)
i32 = st.integers(-(2**31), 2**31 - 1)


@_PROP
@given(st.lists(st.tuples(i32, i16, i16, i32), min_size=1, max_size=20))
def test_frame_v2_decode_roundtrip(spark, records):
    rows = [
        ((b"\x00" * 6 + struct.pack("<ihhi", ts, s1, s2, ctr)).hex(),)
        for ts, s1, s2, ctr in records
    ]
    df = spark.createDataFrame(rows, "fh string")
    out = [
        (r.r.ts_sec, r.r.s1, r.r.s2, r.r.counter)
        for r in df.select(decode_frame_v2("fh").alias("r")).collect()
    ]
    assert sorted(out) == sorted(records)


@_PROP
@given(st.text(min_size=0, max_size=300, alphabet=st.characters(codec="utf-8")))
def test_chunker_reassembles(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    chunks = F.transform(
        F.sequence(F.lit(0), (F.ceil(F.length("text") / 64.0).cast("int") - 1)),
        lambda i: F.col("text").substr(i * 64 + 1, F.lit(64)),
    )
    got = df.select(
        F.concat_ws("", F.coalesce(chunks, F.array())).alias("re")
    ).collect()[0].re
    assert got == text


@_PROP
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=30),
    st.lists(st.tuples(st.integers(0, 5), st.text("ab", max_size=3)), min_size=0, max_size=8),
)
def test_salted_join_equals_plain_join(spark, probe_rows, build_rows):
    probe = spark.createDataFrame(probe_rows or [(99, 0)], "k long, v long")
    build = spark.createDataFrame(build_rows or [(99, "x")], "k long, w string")
    plain = sorted(map(tuple, probe.join(build, "k").select("k", "v", "w").collect()))
    salted = sorted(
        map(tuple, salted_join(probe, build, "k", n_salt=4).select("k", "v", "w").collect())
    )
    assert salted == plain


@_PROP
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=30))
def test_r4_cross_engine_parity(spark, duck, values):
    sdf = spark.createDataFrame([(v,) for v in values], "x double")
    got = sorted(r.y for r in sdf.select(r4("x").alias("y")).collect())
    want = sorted(
        duck.execute(f"SELECT {duck_r4('CAST(? AS DOUBLE)')}", [v]).fetchone()[0]
        for v in values
    )
    assert all(
        (math.isnan(a) and math.isnan(b)) or a == b for a, b in zip(got, want)
    )
