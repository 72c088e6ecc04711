"""Prove the vectorized multiset-hash compare (ITWS_FAST_COMPARE=1)
agrees with the exact _canon compare — both on passing queries and on
injected mismatches.

The fast path exists because the exact path (Py4J collect + python
tuple sort) is prohibitive on the sf1/sf3 twins (15+ min / 23 GB for a
single 18M-row result). A faster comparator is only trustworthy if it
(a) passes exactly where the exact one passes and (b) FAILS where the
exact one fails — this script checks both at sf0.01 over a
type-diverse query set (floats, dates, timestamps, arrays, maps,
strings, booleans, nulls) plus value/row-drop perturbations injected
via DuckDB ``SELECT * REPLACE`` wrappers.

Usage: python tools/selftest_fast_compare.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.check as C
from iceberg_twist_spark.registry import REGISTRY, _load_all_modules
from iceberg_twist_spark.session import get_spark

# type-diverse: decimals/floats (agg), dates (date_diff), timestamps
# (ohlc, scd2), arrays (collect, array_funcs), maps/json, booleans +
# nulls (filter_null, impute), strings, per-row large-ish frames
PROBE = [
    "q_agg_group",
    "q_date_diff",
    "q_ts_ohlc",
    "q_scd2_build",
    "q_agg_collect",
    "q_array_funcs",
    "q_map_funcs",
    "q_json_extract",
    "q_filter_null",
    "q_impute_mean",
    "q_llm_text_stats",
    "q_win_lag",
    # regression: DuckDB .df() returns HUGEINT sums as float64 while
    # Spark keeps int64 — caught by the first sf3 sweep
    "q_llm_pack_greedy",
    "q_llm_split_assign",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    _load_all_modules()
    spark = get_spark("fast-compare-selftest")
    spark.sparkContext.setLogLevel("ERROR")
    con = C.duck_connection(sf_dir)
    bad = []

    for name in PROBE:
        C._FAST = False
        ok_exact, msg_exact, _ = C.compare(name, spark, con, sf_dir)
        C._FAST = True
        ok_fast, msg_fast, _ = C.compare(name, spark, con, sf_dir)
        agree = ok_exact and ok_fast
        print(f"{'PASS' if agree else 'FAIL':5s} {name:20s} "
              f"exact={ok_exact} fast={ok_fast}"
              + ("" if agree else f"  [{msg_exact} | {msg_fast}]"))
        if not agree:
            bad.append(name)

    # injected mismatches: both paths must FAIL on (a) one perturbed
    # numeric column, (b) one dropped row
    spec = REGISTRY["q_agg_group"]
    d_pdf = con.execute(spec.oracle).df()
    num_col = next(
        c for c in d_pdf.columns if str(d_pdf[c].dtype).startswith(("float", "int"))
    )
    for label, wrapper in [
        ("value-perturbed", f"SELECT * REPLACE ({num_col} + 1 AS {num_col}) "
                            f"FROM ({spec.oracle})"),
        ("row-dropped", f"SELECT * FROM ({spec.oracle}) ORDER BY 1 OFFSET 1"),
    ]:
        fake = SimpleNamespace(
            builder=spec.builder, oracle=wrapper,
            approx_oracle=None, batch_twin=None, approx_keys=(),
        )
        orig = REGISTRY["q_agg_group"]
        REGISTRY["q_agg_group"] = fake
        try:
            C._FAST = False
            ok_exact, _, _ = C.compare("q_agg_group", spark, con, sf_dir)
            C._FAST = True
            ok_fast, _, _ = C.compare("q_agg_group", spark, con, sf_dir)
        finally:
            REGISTRY["q_agg_group"] = orig
        caught = (not ok_exact) and (not ok_fast)
        print(f"{'PASS' if caught else 'FAIL':5s} inject:{label:16s} "
              f"exact_caught={not ok_exact} fast_caught={not ok_fast}")
        if not caught:
            bad.append(f"inject:{label}")

    C._FAST = os.environ.get("ITWS_FAST_COMPARE") == "1"
    print(f"\n{'OK' if not bad else 'BROKEN'}: {len(bad)} disagreements")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
