"""Corpus-scale benchmark for the LLM-pipeline family (PERF.md corpus
section).

The driver fixtures and the sf1/sf10 twins size documents/embeddings
SUBLINEARLY (≤5k docs / ≤2k vectors — tools/gen_sf.py module doc), so
until round 6 the dedup/ANN/text operators had never been measured
beyond toy corpus size while the relational half had an sf10 curve
(r5 verdict gap). This tool runs the corpus headliners against a
``--corpus``-generated twin (default .localdata/corpus100 = 1M docs /
100k vectors) with the same warm best-of-N timing and per-query
AppStatusStore shuffle accounting as bench.py, and enforces calibrated
shuffle-write ceilings so a scale regression (a lost band bound, an
accidental all-pairs) fails loudly.

Usage: python tools/corpus_bench.py [corpus_dir]
Generate the twin first:
    python tools/gen_sf.py /root/repo/.localdata/corpus100 0.1 --corpus 100
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _stage_metrics  # noqa: E402
from iceberg_twist_spark.registry import REGISTRY, _load_all_modules  # noqa: E402
from iceberg_twist_spark.session import get_spark  # noqa: E402

# The corpus headliners: every dedup tier, the three ANN index
# families plus the IVF-PQ composition, corpus hygiene, and the
# composed end-to-end pipeline.
CORPUS_HEADLINE = (
    "q_llm_exact_dedup",
    "q_llm_minhash_dedup",
    "q_llm_minhash_verified",
    "q_llm_simhash",
    "q_llm_line_dedup",
    "q_llm_semdedup_capped",
    "q_llm_ann_ivf_indexed",
    "q_llm_ann_pq",
    "q_llm_ann_pq_indexed",
    "q_llm_ann_ivfpq",
    "q_llm_ann_ivfpq_indexed",
    "q_llm_decontaminate",
    "q_llm_corpus_pipeline",
    "q_llm_token_count",
    "q_llm_langid",
    # r7: the multimodal family at corpus scale — 1M binary blobs
    # derived per-row from the documents table (decode + banded
    # Hamming dedup + frame explode have never run beyond the 500-row
    # fixture; the banded Hamming join is the quadratic-risk analog
    # of SimHash, the defect class the r6 rehearsal caught)
    "q_mm_phash_dedup",
    "q_mm_png_decode",
    "q_mm_frame_sample",
    # r8: the r7 sampling/hygiene family — hash-checked at sf1/sf1skew
    # but never measured at 1M docs (r7 verdict item 5).
    # split_leakage_safe inherits the whole CC chain's cost;
    # semantic_decontam is the broadcast-eval-set × corpus product;
    # bpe_train checkpoints the token streams across N rounds.
    "q_llm_token_budget",
    "q_llm_mixture_temperature",
    "q_llm_semantic_decontam",
    "q_llm_split_leakage_safe",
    "q_llm_bpe_train",
)

# Large result sets execute via the noop sink so timing measures engine
# throughput, not Py4J serialization of a 1M-row collect.
_NOOP_SINK = frozenset(
    {
        "q_llm_exact_dedup",
        "q_llm_line_dedup",
        "q_llm_token_count",
        "q_llm_langid",
        "q_llm_simhash",
        "q_mm_phash_dedup",
        "q_mm_png_decode",
        "q_mm_frame_sample",
        "q_llm_semantic_decontam",
        "q_llm_split_leakage_safe",
    }
)

# Shuffle-write ceilings at corpus100 (1M docs / 100k vectors),
# calibrated r6 (measured → ~2.5× headroom). The load-bearing claims:
# dedup tiers shuffle DIGESTS/SIGNATURES (MBs), never the ~700 MB
# corpus — except line_dedup's single designed corpus rewrite; the ANN
# indexes shuffle codes and constant tables, never float vectors.
CORPUS_CEILING = {
    "q_llm_exact_dedup": 150_000_000,     # 57 MB — sha digests + ids
    "q_llm_minhash_dedup": 500_000_000,   # 186 MB — banded signatures
    # verified tier = banding + exact-verify joins; the verify moves
    # each doc's shingle ARRAY once per side — linear in corpus bytes,
    # the designed cost of exactness on top of LSH.
    "q_llm_minhash_verified": 3_000_000_000,
    "q_llm_simhash": 200_000_000,         # 64 MB — 8 rotations × ids
    "q_llm_line_dedup": 2_500_000_000,    # 0.94 GB — the one corpus rewrite
    # semdedup moves each VECTOR (not a code) to its (cluster, sub_bucket)
    # once per join side — 2× vector mass, LINEAR in corpus (110 MB
    # measured at 100k × 64-dim). Pair mass stays capped; it's the
    # vectors that must co-locate for the exact within-bucket cosine.
    "q_llm_semdedup_capped": 300_000_000,
    "q_llm_ann_ivf_indexed": 30_000_000,  # 9.2 MB — assignment pairs once
    "q_llm_ann_pq": 200_000_000,          # 66 MB — |vecs|×M code rows
    # indexed ANN: training/encoding live in the offline build, so the
    # query's only shuffle is the per-vector ADC partial aggregate
    "q_llm_ann_pq_indexed": 80_000_000,   # 27.6 MB measured r7
    "q_llm_ann_ivfpq": 300_000_000,       # 98 MB — codes + cluster means
    "q_llm_ann_ivfpq_indexed": 80_000_000,  # 27.5 MB measured r7
    "q_llm_decontaminate": 200_000_000,   # 60 MB — doc-gram hits
    # The pipeline's pair tier is the verified LSH join (above) plus
    # the CC rounds and the gate/pack windows over the kept corpus —
    # every term linear in corpus bytes (1.6 GB measured at 1M docs).
    # The previous 200 MB ceiling predates the r6 switch from the
    # digest-only exact-index pair source that could not finish at 1M.
    "q_llm_corpus_pipeline": 4_000_000_000,
    "q_llm_token_count": 5_000_000,       # 1.2 MB — per-doc counts
    "q_llm_langid": 120_000_000,          # 39 MB — per-doc votes
    # multimodal (r7 calibration): phash dedup shuffles the 4-band
    # fingerprint rows on both join sides — fingerprints, never blobs;
    # the decode/frame queries are pure per-row pipelines (no shuffle,
    # ceilings are noise floors)
    "q_mm_phash_dedup": 500_000_000,  # 184.5 MB measured r7
    "q_mm_png_decode": 50_000_000,
    "q_mm_frame_sample": 50_000_000,
    # r8 measured → ceilings (~2.5× headroom): token_budget moves each
    # doc's (source, tokens, h, bucket) row through the two-phase
    # window exchange once — ids and counts, never text (54.8 MB);
    # mixture_temperature shuffles only the per-lang count partials
    # (23 KB); semantic_decontam the per-vector max-sim partials
    # against the broadcast eval set (26.6 MB); split_leakage_safe
    # inherits the CC chain + one doc-keyed join (2.35 GB —
    # corpus_pipeline's bound without the gate/pack tail); bpe_train's
    # per-round shuffle is the distinct-pair count + the checkpointed
    # token streams' exchange (173.8 MB over 3 rounds), the corpus
    # rewrite itself is a zero-shuffle projection.
    "q_llm_token_budget": 140_000_000,
    "q_llm_mixture_temperature": 1_000_000,
    "q_llm_semantic_decontam": 70_000_000,
    "q_llm_split_leakage_safe": 6_000_000_000,
    "q_llm_bpe_train": 450_000_000,
}


def main() -> int:
    corpus_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/corpus100"
    )
    if not os.path.isdir(corpus_dir):
        print(f"corpus twin missing: {corpus_dir} — generate it first", file=sys.stderr)
        return 2
    _load_all_modules()
    spark = get_spark("corpus-bench")
    spark.sparkContext.setLogLevel("ERROR")
    n_docs = spark.read.parquet(f"{corpus_dir}/documents.parquet").count()
    n_vecs = spark.read.parquet(f"{corpus_dir}/embeddings.parquet").count()

    timings: dict[str, float] = {}
    shuffle: dict[str, dict[str, int]] = {}
    violations: dict[str, str] = {}
    seen: set = set()
    REGISTRY["q_llm_token_count"].builder(spark, corpus_dir).count()  # warm-up
    _stage_metrics(spark, seen)
    import gc

    for name in CORPUS_HEADLINE:
        # Release prior queries' localCheckpoint RDD blocks before the
        # next headliner: checkpointed blocks are freed by the
        # ContextCleaner only after the Python DataFrame refs die, and
        # at corpus scale the deferred cleanup accumulated enough GB-
        # sized shingle/code blocks to OOM the shared 8g JVM late in
        # the suite (r7). A deployment runs each query in its own job;
        # the collect here only makes the shared-session harness match
        # that isolation.
        gc.collect()
        per_run: list[float] = []
        for attempt in range(2):
            t0 = time.perf_counter()
            df = REGISTRY[name].builder(spark, corpus_dir)
            if name in _NOOP_SINK:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            per_run.append(time.perf_counter() - t0)
            r, w, p = _stage_metrics(spark, seen)
            shuffle[name] = {"read": r, "write": w, "peak_mem": p}
        timings[name] = round(min(per_run), 3)
        ceil = CORPUS_CEILING.get(name)
        if ceil is not None and shuffle[name]["write"] > ceil:
            violations[name] = (
                f"shuffle write {shuffle[name]['write']} > ceiling {ceil}"
            )
        print(
            f"# {name}: {timings[name]:.3f}s "
            f"(runs={[round(t, 3) for t in per_run]}, "
            f"shufW={shuffle[name]['write']:,})",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "corpus_suite_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "n_docs": n_docs,
                "n_vectors": n_vecs,
                "queries": timings,
                "shuffle": {k: v["write"] for k, v in shuffle.items()},
                "violations": violations,
            }
        )
    )
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
