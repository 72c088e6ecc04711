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
# plans would break first if skew broke them. Checked at the FULL sf1
# twin — the hot pair-emitting dedup queries produce ~10-14M candidate
# pairs there and still hash-match (measured r4: minhash 9.7M pairs
# 34 s, simhash 13.9M 41 s, jaccard 11.9M 35 s).
SKEW_FAMILY = [
    "q_join_salted",
    "q_llm_minhash_dedup",
    "q_llm_minhash_verified",
    "q_llm_simhash",
    "q_llm_ngram_jaccard",
    "q_ts_zscore",
    "q_win_ntile",
    "q_tpch_q18",
    "q_agg_group",
    "q_stream_queue_ttl",
    "q_stream_session",
    # r4 layout/co-occurrence additions: the bucketed join's hot
    # l_orderkey lands in one bucket (buckets don't split — the test
    # is that correctness holds and the agg stays two-phase), and the
    # common-neighbor degree cap is exactly the hub-part guard the
    # zipf twin stresses
    "q_join_bucketed",
    "q_scan_dpp",
    "q_graph_common_neighbors",
    "q_llm_collapse_runs",
    "q_dq_checks",  # FK-orphan anti join under hot-key skew
    "q_mv_incremental",
    "q_source_pyds",
    "q_stream_pyds",
    "q_sample_bernoulli",
    "q_frames_mapinpandas",
    # r5: boilerplate digests are the canonical hot key (one banner
    # block in a third of a zipf crawl); lang counts are skewed by
    # fixture construction
    "q_llm_line_dedup",
    "q_llm_mixture_sample",
    # r8: the two-phase window family (bounded-enum partition keys are
    # exactly what a zipf source/lang distribution stresses — one hot
    # enum value holding most rows) and the index lifecycle whose
    # banded joins ride the same hot 30% near-dup component
    "q_llm_token_budget",
    "q_llm_pack_greedy",
    "q_llm_quality_gate",
    "q_llm_shuffle_shards",
    "q_llm_minhash_index_query",
    "q_stream_index_append",
]

# Cluster-RESOLUTION queries: verified at the FULL sf1 twin since r5.
# (r4 had to pin these to the sf0.1 twin: the old recursive-CTE oracle
# materialized the mega-component's transitive closure — quadratic —
# and was killed past 29 GB. The oracle now mirrors the engine's
# min-label + pointer-jumping rounds as unrolled MATERIALIZED CTEs
# (llm/clusters.py _cc_label_sql), linear per round, and completes the
# sf1 zipf mega-component in ~140 s; measured r5: 3/3 hash-match,
# dup_clusters 15,706 clustered docs / max cluster 4,878.)
SKEW_FAMILY_CLUSTERS = [
    "q_llm_dup_clusters",
    "q_llm_dedup_survivor",
    "q_llm_semdedup",
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


def run_checks(twin: str, names: list[str]) -> bool:
    print(f"# oracle harness over {len(names)} skew-family queries at {twin}")
    env = dict(os.environ)
    # the hot dedup queries emit ~10M pair rows at sf1skew — engage the
    # vectorized multiset-hash comparator explicitly rather than
    # depending on the caller's shell (the exact _canon path took
    # 15+ min / 23 GB per such query before it existed)
    env["ITWS_FAST_COMPARE"] = "1"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"), twin] + names,
        env=env,
    )
    return r.returncode == 0


def prove_skew_split(twin: str) -> bool:
    """Force the hot-key SMJ and assert AQE splits the skewed partition."""
    from pyspark.sql import functions as F

    from iceberg_twist_spark.session import get_spark

    spark = get_spark("skew-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # Local-volume scaling of the cluster defaults (256 MB / 64 MB):
    # same mechanism, thresholds the fixture can reach. 256 shuffle
    # partitions ≈ a cluster-sized map: the hot key then holds ~8× the
    # median partition (at the session default 32, 6M/32 rows ≈ the hot
    # key itself, so nothing is relatively skewed — skew is a ratio).
    spark.conf.set("spark.sql.shuffle.partitions", "256")
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
        # no aggregate downstream: OptimizeSkewedJoin declines a split
        # whose extra partitions would force an additional shuffle for a
        # downstream distribution requirement, so the probe consumes the
        # join output directly — the shape a write-out job has. Executing
        # THIS DataFrame's own QueryExecution (not .write, which plans a
        # fresh one) finalizes the adaptive plan we then inspect.
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        qe = joined._jdf.queryExecution()
        qe.executedPlan().execute().count()
        plan = qe.executedPlan().toString()
        import re as _re

        has_skew = ("skew=true" in plan) or bool(_re.search(r"\bskewed\b", plan))
        marker = [
            ln.strip()
            for ln in plan.splitlines()
            if "skew=true" in ln or _re.search(r"\bskewed\b", ln)
        ][:4]
        for ln in marker:
            print(f"#   {ln[:170]}")
        print(f"# AQE skew split engaged: {has_skew}")
        # zipf hottest-key share at n_ord=1.5M is (1/n)^(1/4) ≈ 2.9% —
        # ~43,000× the uniform per-key share; 1% is the "really skewed"
        # sanity floor, not the expected value
        return has_skew and frac > 0.01
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
    checks_ok = run_checks(twin, SKEW_FAMILY)
    cluster_ok = run_checks(twin, SKEW_FAMILY_CLUSTERS)
    print(f"# RESULT: checks={'PASS' if checks_ok else 'FAIL'} "
          f"clusters={'PASS' if cluster_ok else 'FAIL'} "
          f"skew-split={'ENGAGED' if split_ok else 'NOT ENGAGED'}")
    return 0 if (checks_ok and cluster_ok and split_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
