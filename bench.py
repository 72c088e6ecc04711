"""Headline benchmark (driver contract: BENCH_r{N}.json).

Runs the headline queries from BASELINE.md §2 at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed to completed collect (action-inclusive, plan +
execute). A short warm-up action first so JVM/codegen startup isn't
billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_twist_spark.registry import REGISTRY, _load_all_modules
from iceberg_twist_spark.session import get_spark

# BASELINE.md §2 headline set: flagship agg, join-heavy star join,
# window suite, kNN over embeddings, plus the LLM dedup pipeline.
HEADLINE = (
    "q_agg_group",
    "q_join_multiway",
    "q_win_rank",
    "q_win_running",
    "q_win_lag",
    "q_topk",
    "q_llm_cosine_topk",
    "q_llm_knn_join",
    "q_llm_exact_dedup",
    "q_stream_tumble",
    # TPC-H power-style headliners: flagship agg, 6-way star join,
    # widest join graph, and the semi-join-heavy large-volume query.
    "q_tpch_q01",
    "q_tpch_q05",
    "q_tpch_q09",
    "q_tpch_q18",
    # breadth headliners: corpus hygiene (broadcast n-gram join),
    # iterative graph (3 join+agg rounds), single-pass profile,
    # MinHash banding dedup.
    "q_llm_decontaminate",
    "q_graph_pagerank",
    "q_profile_table",
    "q_llm_minhash_dedup",
    # round-2 additions: warehouse modeling (SCD2 history, bucketed
    # interval-overlap join), sequence-pattern window, LSH ANN pairs
    "q_scd2_build",
    "q_join_interval_overlap",
    "q_seq_pattern",
    "q_llm_ann_lsh",
)

# Queries whose result set is large: execute via the noop sink so the
# timing measures engine throughput, not Py4J row serialization of a
# 600k-row collect to the Python driver.
_NOOP_SINK = frozenset(
    {"q_join_multiway", "q_win_rank", "q_win_running", "q_win_lag", "q_llm_exact_dedup"}
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0)
    _load_all_modules()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: touch the JVM, parquet footers, and codegen paths once
    REGISTRY["q_agg_group"].builder(spark, sf_dir).collect()

    # Each query runs 2-3 times and reports the best time. Local-mode
    # fixed overhead (JVM scheduling, GC, sandbox load spikes) swings
    # single cold runs by ±0.3-1.5 s with no code change — larger than
    # many queries' entire runtime — so warm best-of-N keeps
    # run-to-run variance within ~±20% and regressions visible above
    # the noise floor. A third run happens only when the first two
    # disagree by >10% (sub-second queries mostly), so the suite stays
    # ~2× one pass.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        per_run: list[float] = []
        n = "?"
        for attempt in range(3):
            t0 = time.perf_counter()
            df = REGISTRY[name].builder(spark, sf_dir)
            if name in _NOOP_SINK:
                df.write.format("noop").mode("overwrite").save()
                n = "noop"
            else:
                n = len(df.collect())
            per_run.append(time.perf_counter() - t0)
            if attempt >= 1:
                best, second = sorted(per_run)[:2]
                if second - best <= 0.10 * best:
                    break
        timings[name] = round(min(per_run), 3)
        print(
            f"# {name}: {timings[name]:.3f}s best-of-{len(per_run)} "
            f"(runs={[round(t, 3) for t in per_run]}, {n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # 2 warm runs, plus a 3rd only when the first two
                # disagree by >10% — label the policy, not one case
                "timing": "adaptive-best-of-2-3-warm",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
