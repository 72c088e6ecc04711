"""Determinism probe: run every query twice under different shuffle
partitioning and diff Spark against itself.

Why: float addition is not associative, so a double-sum's low bits
depend on partition/merge order. That is invisible — until a value
happens to sit within float-noise of a fixed-round boundary
(`common.r4`'s floor(x*1e4+0.5)), where run-to-run order variation
flips the 4th decimal and the oracle hash-check flakes (this is how
q_ts_rollup_cascade was caught; fixed with integer fixed-point
partials). This tool surfaces any query whose output depends on
partitioning at all: partition counts 32 vs 7 force different partial
orders, so a diff here = a latent boundary-sitter (or worse, a real
nondeterminism bug like an un-tiebroken LIMIT).

Usage: python tools/determinism.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.registry import REGISTRY, _load_all_modules
from iceberg_twist_spark.session import get_spark
from tools.check import _canon


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    _load_all_modules()
    # streaming harness queries replay micro-batches; their output is
    # batch-dependent by design and checked rows-only — skip here
    targets = [
        n for n in (names or sorted(REGISTRY))
        if REGISTRY[n].oracle is not None
    ]
    spark = get_spark("determinism-probe")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name in targets:
        outs = []
        for parts in ("32", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            df = REGISTRY[name].builder(spark, sf_dir)
            outs.append(_canon([tuple(r) for r in df.collect()], df.columns))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        if outs[0] != outs[1]:
            diffs = [
                (i, a, b) for i, (a, b) in enumerate(zip(*outs)) if a != b
            ][:3]
            print(f"FAIL  {name:28s} partition-sensitive, first diffs: {diffs}")
            failures.append(name)
        else:
            print(f"PASS  {name:28s} ({len(outs[0])} rows)")
    print(f"\n{len(targets) - len(failures)}/{len(targets)} deterministic")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
