"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a
``QuerySpec``: a name, a DataFrame builder ``(spark, sf_dir) -> DF``,
and (when the semantics are deterministic and ANSI-SQL-expressible) a
DuckDB oracle SQL string the driver hash-checks against.

Conventions (FIXTURES.md determinism rules):
- every float aggregate is rounded to 4 decimals inside BOTH the
  Spark builder and the oracle SQL;
- every computed column is aliased identically on both sides (the
  driver sorts columns by name before hashing);
- temporal outputs are formatted to strings identically on both
  sides ('yyyy-MM-dd HH:mm:ss' ↔ '%Y-%m-%d %H:%M:%S');
- every ORDER BY + LIMIT carries a unique tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    # For sketch/approximate queries where the estimator legitimately
    # differs from DuckDB's: SQL computing the EXACT reference values
    # (same column names, same group keys) plus a relative-error bound.
    # The local harness asserts every numeric cell is within
    # ``approx_rtol`` of the exact answer, so "rows-only" stops meaning
    # "value-unchecked" for the approx family.
    approx_oracle: str | None = None
    approx_rtol: float = 0.05
    # Unique-key columns an approx query's rows are aligned on before
    # the ε-band compare. Required whenever approx_oracle is set — the
    # harness must never sort on the estimates themselves (an estimate
    # crossing the exact value would misalign rows).
    approx_keys: tuple[str, ...] = ()
    # Streaming equivalence: a BATCH builder producing the semantically
    # identical result on the same staged data. When set (and no SQL
    # oracle exists), the harness runs the streaming job to completion
    # AND the batch twin, then hash-compares the two — "rows-only"
    # becomes "stream≡batch" for every stateful job whose semantics a
    # batch plan can express.
    batch_twin: Builder | None = None


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    approx_oracle: str | None = None,
    approx_rtol: float = 0.05,
    approx_keys: tuple[str, ...] = (),
    batch_twin: Builder | None = None,
):
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        if approx_oracle is not None and not approx_keys:
            raise ValueError(
                f"{name}: approx_oracle requires approx_keys (unique key "
                "columns to align rows on — estimates must not be sort keys)"
            )
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            tags=tags,
            approx_oracle=approx_oracle,
            approx_rtol=approx_rtol,
            approx_keys=approx_keys,
            batch_twin=batch_twin,
        )
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import iceberg_twist_spark.operators.scans  # noqa: F401
    import iceberg_twist_spark.operators.filters  # noqa: F401
    import iceberg_twist_spark.operators.joins  # noqa: F401
    import iceberg_twist_spark.operators.aggregates  # noqa: F401
    import iceberg_twist_spark.operators.windows  # noqa: F401
    import iceberg_twist_spark.operators.sorts  # noqa: F401
    import iceberg_twist_spark.operators.setops  # noqa: F401
    import iceberg_twist_spark.operators.subqueries  # noqa: F401
    import iceberg_twist_spark.operators.tpch  # noqa: F401
    import iceberg_twist_spark.operators.sampling  # noqa: F401
    import iceberg_twist_spark.operators.rangejoin  # noqa: F401
    import iceberg_twist_spark.operators.timeseries  # noqa: F401
    import iceberg_twist_spark.operators.reshape  # noqa: F401
    import iceberg_twist_spark.operators.funnels  # noqa: F401
    import iceberg_twist_spark.operators.fuzzy  # noqa: F401
    import iceberg_twist_spark.operators.sketches  # noqa: F401
    import iceberg_twist_spark.operators.skew  # noqa: F401
    import iceberg_twist_spark.operators.warehouse  # noqa: F401
    import iceberg_twist_spark.functions.strings  # noqa: F401
    import iceberg_twist_spark.functions.dates  # noqa: F401
    import iceberg_twist_spark.functions.math_fns  # noqa: F401
    import iceberg_twist_spark.functions.arrays  # noqa: F401
    import iceberg_twist_spark.functions.maps_json  # noqa: F401
    import iceberg_twist_spark.functions.binary_fns  # noqa: F401
    import iceberg_twist_spark.ingest.frames  # noqa: F401
    import iceberg_twist_spark.streaming.windows  # noqa: F401
    import iceberg_twist_spark.streaming.jobs  # noqa: F401
    import iceberg_twist_spark.streaming.tws  # noqa: F401
    import iceberg_twist_spark.streaming.live  # noqa: F401
    import iceberg_twist_spark.llm.dedup  # noqa: F401
    import iceberg_twist_spark.llm.similarity  # noqa: F401
    import iceberg_twist_spark.llm.textstats  # noqa: F401
    import iceberg_twist_spark.llm.prep  # noqa: F401
    import iceberg_twist_spark.llm.clusters  # noqa: F401
    import iceberg_twist_spark.llm.decontam  # noqa: F401
    import iceberg_twist_spark.llm.corpus_pipeline  # noqa: F401
    import iceberg_twist_spark.llm.index_lifecycle  # noqa: F401
    import iceberg_twist_spark.operators.anomaly  # noqa: F401
    import iceberg_twist_spark.operators.cdc  # noqa: F401
    import iceberg_twist_spark.operators.profiling  # noqa: F401
    import iceberg_twist_spark.operators.geo  # noqa: F401
    import iceberg_twist_spark.operators.graph  # noqa: F401
    import iceberg_twist_spark.operators.modern_sql  # noqa: F401
    import iceberg_twist_spark.udfs  # noqa: F401
    import iceberg_twist_spark.multimodal  # noqa: F401
    import iceberg_twist_spark.sources.connectors  # noqa: F401
    import iceberg_twist_spark.sources.layouts  # noqa: F401
    import iceberg_twist_spark.sources.serial_source  # noqa: F401
    import iceberg_twist_spark.sources.snapshots  # noqa: F401
    import iceberg_twist_spark.sources.snapshot_stream  # noqa: F401
    import iceberg_twist_spark.pipeline  # noqa: F401


# The driver truncates its per-round correctness record to the first
# ~50 entries of queries() in ITERATION order. After r9 every one of
# the 274 registered ids has been driver-witnessed at least once, so
# the rotation rule flips from "surface the never-witnessed tail" to
# STALENESS ORDER: (1) the explicit REVERIFY_FIRST head — this round's
# NEW ids plus ids whose PLAN changed after their last driver check —
# then (2) any never-witnessed id alphabetically (normally none), then
# (3) every witnessed id ordered by ascending last-witnessed round
# (WITNESS_VINTAGE below, regenerated each round from the
# CORRECTNESS_r*.json union), alphabetical within a round. The 50-id
# driver window therefore always re-verifies the ids whose last check
# is OLDEST instead of re-treading recent rounds.
REVERIFY_FIRST = (
    # plan changed in r11 (r10-advice fixes): eq-delete key columns
    # now resolve STRICTLY by field id in read()/read_changelog(), the
    # snapshot-tail stream derives offsets by walking the committed
    # parent chain (staged/orphan ids skipped), and decode_frame_hex
    # regained prefix-decode tolerance for over-length frames
    "q_iceberg_mor_delete",
    "q_iceberg_mor_pos_delete",
    "q_iceberg_changelog",
    "q_stream_snapshot_tail",
    "q_udf_scalar_pandas",
    # plan changed in r11: the lakehouse sink is now exactly-once
    # under checkpoint restart (batch id stamped into the commit
    # summary; replayed ids skipped)
    "q_stream_iceberg_sink",
    # new in r11
    "q_iceberg_partition_transform",
    "q_stream_changelog_tail",
    "q_iceberg_merge_full_sync",
    # plan changed in r11 (optimization round): the PQ/IVF argmin
    # assignments are Arrow-batched numpy kernels (bit-identical
    # arithmetic; Exchange count halved across the family) and the
    # Lloyd codebook is checkpointed instead of recomputed per
    # consumer
    "q_llm_ann_pq",
    "q_llm_ann_pq_indexed",
    "q_llm_ann_ivf",
    "q_llm_ann_ivf_indexed",
    "q_llm_ann_ivfpq",
    "q_llm_ann_ivfpq_indexed",
    "q_llm_semdedup",
    "q_llm_semdedup_capped",
    # plan changed in r11 but omitted from this block (r11 advice):
    # the all-pairs cosine / decontam / kmeans argmin machinery moved
    # to the same Arrow kernels, and corpus_pipeline checkpoints its
    # gate-stage frame — none were driver-witnessed at sf0.1 yet
    "q_llm_cosine_pairs",
    "q_llm_semantic_decontam",
    "q_ml_kmeans_step",
    "q_ml_kmeans_train",
    "q_llm_corpus_pipeline",
    # plan changed in r12 (optimization round 2): LSH bucket + pair
    # cosine and the SemDeDup pair cosines are Arrow kernels, the
    # profile is two-phase long-form NDV, the MOR queries dropped
    # their in-plan equivalence asserts (pytest-pinned; their ids
    # already head this list from the r11 block), and pagerank's
    # per-iteration checkpoints are lazy
    "q_llm_ann_lsh",
    "q_llm_ann_recall",
    "q_profile_table",
    "q_graph_pagerank",
    # plan changed in r12: the PNG IDAT Adler-32 is a closed-form
    # byte-array fold instead of a per-byte struct fold
    "q_mm_png_decode",
)

WITNESS_VINTAGE: dict[int, tuple[str, ...]] = {
    4: (
        "q_filter_eq", "q_filter_in", "q_filter_like", "q_filter_null",
        "q_filter_range", "q_frames_mapinpandas", "q_funnel_3step",
        "q_fuzzy_join", "q_geo_bbox", "q_geo_nearest_station",
        "q_geo_track_length", "q_graph_common_neighbors",
    ),
    5: (
        "q_impute_mean", "q_join_anti", "q_join_asof", "q_join_bloom_prune",
        "q_join_broadcast", "q_join_bucketed", "q_join_cross",
        "q_join_full", "q_join_inner", "q_join_interval_overlap",
        "q_join_left", "q_join_multiway", "q_join_nullsafe", "q_join_range",
        "q_join_salted", "q_join_semi", "q_join_theta", "q_json_extract",
        "q_json_variant", "q_lateral_topk", "q_layout_zorder",
        "q_llm_ann_ivf", "q_llm_ann_ivf_indexed", "q_llm_ann_lsh",
        "q_llm_ann_mrl", "q_llm_ann_pq", "q_llm_ann_recall",
        "q_llm_bpe_apply", "q_llm_bpe_pairs", "q_llm_chunk_text",
        "q_llm_collapse_runs", "q_llm_corpus_pipeline",
        "q_llm_cosine_pairs", "q_llm_cosine_topk", "q_llm_decontaminate",
        "q_llm_dedup_survivor", "q_llm_exact_dedup", "q_llm_fingerprint",
        "q_llm_hybrid_search", "q_llm_knn_join", "q_llm_langid",
        "q_llm_line_dedup", "q_llm_mixture_sample", "q_llm_neg_sample",
        "q_llm_pii_scrub",
    ),
    6: (
        "q_graph_triangles", "q_llm_ann_ivfpq", "q_llm_pack_greedy",
        "q_llm_quality_gate", "q_llm_rep_ngrams", "q_llm_semdedup",
        "q_llm_semdedup_capped", "q_llm_simhash", "q_llm_split_assign",
        "q_llm_text_quality", "q_llm_text_stats", "q_llm_tfidf_topk",
        "q_llm_token_count", "q_llm_unigram_logprob", "q_llm_vocab_oov",
        "q_llm_winnow_fp", "q_map_funcs", "q_map_hof", "q_math_funcs",
        "q_ml_kmeans_step", "q_ml_kmeans_train", "q_mm_audio_energy",
        "q_mm_byte_features", "q_mm_frame_sample", "q_mm_metadata",
        "q_mm_phash", "q_mm_png_decode", "q_mm_png_filters",
        "q_mm_ppm_decode", "q_mm_resize", "q_mm_wav_stats",
        "q_mv_incremental", "q_profile_skew", "q_profile_table",
        "q_project_arith", "q_project_conditional", "q_retention_cohort",
        "q_sample_bernoulli", "q_sample_group_k", "q_sample_hash",
        "q_sample_stratified", "q_sample_systematic", "q_sample_weighted",
        "q_tpch_q12", "q_ts_rollup_cascade", "q_ts_sessionize",
        "q_vec_quantize",
    ),
    7: (
        "q_graph_pagerank", "q_llm_ann_ivfpq_indexed",
        "q_llm_ann_pq_indexed", "q_llm_dup_clusters", "q_llm_minhash_dedup",
        "q_llm_minhash_verified", "q_llm_mixture_temperature",
        "q_llm_ngram_jaccard", "q_llm_semantic_decontam",
        "q_llm_split_leakage_safe", "q_mm_phash_dedup", "q_scalar_try",
        "q_scan_binary", "q_scan_dpp", "q_scan_parquet",
        "q_scan_projection", "q_scd2_build", "q_schema_evolution",
        "q_seq_pattern", "q_set_except", "q_set_intersect", "q_set_union",
        "q_sink_partitioned", "q_sketch_bloom", "q_sketch_countmin",
        "q_sketch_hll_merge", "q_sort_multi", "q_source_binaryfile",
        "q_source_bz2_split", "q_source_csv_roundtrip",
        "q_source_gzip_text", "q_source_json_roundtrip",
        "q_source_orc_roundtrip", "q_source_pyds", "q_source_xml_roundtrip",
        "q_str_funcs", "q_str_hex", "q_str_mask", "q_str_regexp",
        "q_str_split", "q_stream_pyds", "q_stream_queue_ttl",
        "q_stream_rate_frames",
    ),
    8: (
        "q_llm_ivf_index_append", "q_llm_minhash_index_append",
        "q_llm_minhash_index_query", "q_llm_pq_index_append",
        "q_llm_shuffle_shards", "q_llm_token_budget", "q_str_extract_all",
        "q_stream_index_append", "q_stream_session", "q_stream_slide",
        "q_stream_tumble", "q_stream_vec_index_append",
        "q_subq_corr_scalar", "q_subq_exists", "q_subq_in",
        "q_subq_not_exists", "q_subq_scalar", "q_telemetry_pipeline",
        "q_topk", "q_tpch_q01", "q_tpch_q02", "q_tpch_q03", "q_tpch_q04",
        "q_tpch_q05", "q_tpch_q06", "q_tpch_q07", "q_tpch_q08",
        "q_tpch_q09", "q_tpch_q10", "q_tpch_q11", "q_tpch_q13",
        "q_tpch_q14", "q_tpch_q15", "q_tpch_q16", "q_tpch_q17",
        "q_tpch_q18", "q_tpch_q19", "q_tpch_q20", "q_tpch_q21",
        "q_tpch_q22", "q_ts_drift", "q_ts_ffill", "q_ts_gapfill",
        "q_ts_gaps",
    ),
    9: (
        "q_agg_approx_distinct", "q_agg_approx_percentile",
        "q_agg_argextrema", "q_agg_collect", "q_agg_corr_matrix",
        "q_agg_cube", "q_agg_distinct", "q_agg_entropy", "q_llm_bpe_train",
        "q_llm_ivf_index_remove", "q_llm_minhash_index_remove",
        "q_llm_pq_index_remove", "q_stream_dedup_watermark",
        "q_stream_enrich_join", "q_stream_late_drop", "q_stream_observe",
        "q_stream_stream_join", "q_stream_throttle", "q_stream_upsert_sink",
        "q_ts_interp", "q_ts_islands", "q_ts_ohlc", "q_ts_rolling",
        "q_ts_trend", "q_ts_zscore", "q_udaf_grouped",
        "q_udf_scalar_pandas", "q_udtf_apply", "q_udtf_chunk", "q_unpivot",
        "q_vec_centroid", "q_win_cum_distinct", "q_win_cume_dist",
        "q_win_first_last", "q_win_lag", "q_win_ntile", "q_win_range_frame",
        "q_win_rank", "q_win_rownum", "q_win_running", "q_win_share",
        "q_win_topk_group", "q_winsorize",
    ),
    10: (
        "q_agg_global", "q_agg_group", "q_agg_grouping_sets",
        "q_agg_histogram", "q_agg_histogram_eqdepth", "q_agg_mode",
        "q_agg_percentile", "q_agg_pivot", "q_agg_rollup", "q_agg_sla",
        "q_agg_stats", "q_agg_weighted", "q_array_funcs", "q_array_hof",
        "q_bitops", "q_cdc_upsert", "q_chunk_payload", "q_cte_recursive",
        "q_cte_top_supplier", "q_date_diff", "q_date_funcs", "q_distinct",
        "q_dq_checks", "q_event_transitions", "q_iceberg_branch_write",
        "q_iceberg_changelog", "q_iceberg_compact",
        "q_iceberg_compact_sorted", "q_iceberg_expire", "q_iceberg_history",
        "q_iceberg_incremental", "q_iceberg_merge",
        "q_iceberg_merge_conditional", "q_iceberg_mor_delete",
        "q_iceberg_mor_pos_delete", "q_iceberg_orphan",
        "q_iceberg_partition_evolution", "q_iceberg_partitions_meta",
        "q_iceberg_prune", "q_iceberg_rollback", "q_iceberg_roundtrip",
        "q_iceberg_schema_evolution", "q_iceberg_schema_rename",
        "q_iceberg_tag", "q_iceberg_time_travel",
        "q_iceberg_time_travel_ts", "q_iceberg_update", "q_iceberg_wap",
        "q_stream_iceberg_sink", "q_stream_snapshot_tail",
    ),
}

# Union of every driver-witnessed id across CORRECTNESS_r01..r09 —
# 274 of 274 registered ids as of round 9 (VERDICT r9 "Counts" line).
DRIVER_CHECKED = frozenset(
    n for ids in WITNESS_VINTAGE.values() for n in ids
)

_LAST_WITNESSED = {
    n: r for r, ids in WITNESS_VINTAGE.items() for n in ids
}


def _rotated_names() -> list[str]:
    s = sorted(REGISTRY)
    first = [n for n in REVERIFY_FIRST if n in REGISTRY]
    taken = set(first)
    fresh = [n for n in s if n not in DRIVER_CHECKED and n not in taken]
    rest = sorted(
        (n for n in s if n in DRIVER_CHECKED and n not in taken),
        key=lambda n: (_LAST_WITNESSED[n], n),
    )
    return first + fresh + rest


def all_queries() -> dict[str, Builder]:
    _load_all_modules()
    return {name: REGISTRY[name].builder for name in _rotated_names()}


def all_oracles() -> dict[str, str]:
    _load_all_modules()
    return {
        name: REGISTRY[name].oracle
        for name in _rotated_names()
        if REGISTRY[name].oracle is not None
    }
