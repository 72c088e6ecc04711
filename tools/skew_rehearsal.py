"""Skewed-twin rehearsal — makes the skew story measured, not claimed.

gen_sf.py's default twin draws every foreign key uniformly, so AQE
skew-join splitting — the mechanism PERF.md leans on for skewed LSH
buckets and hot fact keys — never actually fires in this repo's tests
(round-3 VERDICT item 3). This tool:

1. generates (once) a zipf-skewed twin (``gen_sf.py --skew zipf``):
   hottest order/part/supp/user key takes ~7-9% of ALL rows, and ~30%
   of documents collapse into ONE near-dup group (one hot MinHash/
   SimHash band bucket);
2. runs the skew-sensitive query family through the full oracle
   harness (tools/check.py) on that twin — hash-match under skew is
   the correctness half;
3. proves AQE skew handling ENGAGES: a forced sort-merge join of
   lineitem⋈orders on the hot key, with the skew thresholds scaled to
   local data volume (256 MB defaults can never trigger on a ~100 MB
   fixture; a real cluster hits them at real volumes), must show
   ``skew=true`` / a skewed AQEShuffleRead in the executed plan, and
   the split must multiply the hot partition into many tasks.

Usage: python tools/skew_rehearsal.py [TWIN_DIR] [SF]
       (defaults: /root/repo/.localdata/sf1skew, 1.0)
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# user_id / banded-dedup / hot-fact-key sensitive queries: the set whose
# plans would break first if skew broke them.
SKEW_FAMILY = [
    "q_join_salted",
    "q_llm_minhash_dedup",
    "q_llm_simhash",
    "q_llm_ngram_jaccard",
    "q_llm_dup_clusters",
    "q_llm_dedup_survivor",
    "q_ts_zscore",
    "q_win_ntile",
    "q_tpch_q18",
    "q_agg_group",
    "q_stream_queue_ttl",
    "q_stream_session",
]


def ensure_twin(twin: str, sf: float) -> None:
    if os.path.isdir(os.path.join(twin, "lineitem.parquet")):
        print(f"# twin exists: {twin}")
        return
    print(f"# generating skewed twin at {twin} (sf={sf}) ...")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_sf.py"),
         twin, str(sf), "--skew", "zipf"],
        check=True,
    )


def run_checks(twin: str) -> bool:
    print(f"# oracle harness over the skew family at {twin}")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"), twin]
        + SKEW_FAMILY,
    )
    return r.returncode == 0


def prove_skew_split(twin: str) -> bool:
    """Force the hot-key SMJ and assert AQE splits the skewed partition."""
    from pyspark.sql import functions as F

    from iceberg_twist_spark.session import get_spark

    spark = get_spark("skew-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # Local-volume scaling of the cluster defaults (256 MB / 64 MB):
    # same mechanism, thresholds the fixture can reach.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    # no broadcast escape hatch: the point is the shuffled-join path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(os.path.join(twin, "lineitem.parquet"))
        orders = spark.read.parquet(os.path.join(twin, "orders.parquet"))
        hot = (
            li.groupBy("l_orderkey").count().orderBy(F.desc("count")).limit(1).collect()
        )[0]
        frac = hot["count"] / li.count()
        print(f"# hottest l_orderkey={hot['l_orderkey']} holds "
              f"{hot['count']} rows ({frac:.1%} of lineitem)")
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
            F.sum(F.col("l_extendedprice") * F.col("o_totalprice")).alias("x"),
            F.count("*").alias("n"),
        )
        joined.collect()  # AQE finalizes the plan only after execution
        plan = joined._jdf.queryExecution().executedPlan().toString()
        has_skew = ("skew=true" in plan) or ("skewed" in plan)
        marker = [ln.strip() for ln in plan.splitlines() if "skew" in ln.lower()][:4]
        for ln in marker:
            print(f"#   {ln[:150]}")
        print(f"# AQE skew split engaged: {has_skew}")
        return has_skew and frac > 0.05
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")


def main() -> int:
    twin = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".localdata", "sf1skew")
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    ensure_twin(twin, sf)
    split_ok = prove_skew_split(twin)
    checks_ok = run_checks(twin)
    print(f"# RESULT: checks={'PASS' if checks_ok else 'FAIL'} "
          f"skew-split={'ENGAGED' if split_ok else 'NOT ENGAGED'}")
    return 0 if (checks_ok and split_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
