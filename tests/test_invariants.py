"""Analytic invariants of the newer operator families, checked on the
sf0.001 fixture — complementary to the oracle-differential tests
(which pin exact values): these pin relationships that must hold for
ANY input, so they catch semantic regressions the fixtures might mask.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.registry import REGISTRY, _load_all_modules

_load_all_modules()


def _run(name, spark, sf_dir):
    return REGISTRY[name].builder(spark, sf_dir)


def test_histogram_bins_partition_the_table(spark, sf_dir):
    from pyspark.sql import functions as F

    hist = _run("q_agg_histogram", spark, sf_dir)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert hist.agg(F.sum("n")).first()[0] == li.count()
    rows = hist.collect()
    assert sorted(r.bin_id for r in rows) == list(range(len(rows)))
    for r in rows:
        assert r.bin_min <= r.bin_max


def test_pagerank_mass_conserved(spark, sf_dir):
    from pyspark.sql import functions as F

    pr = _run("q_graph_pagerank", spark, sf_dir)
    total = pr.agg(F.sum("pr_rank")).first()[0]
    # bidirectional graph, no dangling nodes → total mass stays 1
    assert abs(total - 1.0) < 1e-3
    assert pr.filter(F.col("pr_rank") <= 0).count() == 0


def test_transitions_count_events_minus_chain_starts(spark, sf_dir):
    from pyspark.sql import functions as F

    tr = _run("q_event_transitions", spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert tr.agg(F.sum("n")).first()[0] == n_events - n_users


def test_winsorize_tightens_the_mean_spread(spark, sf_dir):
    rows = _run("q_winsorize", spark, sf_dir).collect()
    for r in rows:
        # clipping 5% tails can only pull the mean toward the median,
        # and clip counts stay within the tail mass (±1 row rounding)
        assert r.n_clip_lo <= r.n * 0.05 + 1
        assert r.n_clip_hi <= r.n * 0.05 + 1


def test_quality_gate_keeps_half_per_language(spark, sf_dir):
    from pyspark.sql import functions as F

    kept = (
        _run("q_llm_quality_gate", spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("k"))
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for r in kept.collect():
        n = totals[r.lang]
        # percent_rank ≤ 0.5 keeps ceil((n-1)/2)+1-ish rows; allow ±1
        assert abs(r.k - (n + 1) // 2) <= 1


def test_shuffle_shards_is_a_permutation(spark, sf_dir):
    from pyspark.sql import functions as F

    sh = _run("q_llm_shuffle_shards", spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sh.count() == docs.count()
    assert sh.select("doc_id").distinct().count() == docs.count()
    # positions within each shard are 1..k with no holes
    per_shard = sh.groupBy("shard").agg(
        F.count("*").alias("k"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    for r in per_shard.collect():
        assert (r.mn, r.mx) == (1, r.k)


def test_impute_mean_fills_every_hole(spark, sf_dir):
    from pyspark.sql import functions as F

    imp = _run("q_impute_mean", spark, sf_dir)
    assert imp.filter(F.col("value_imputed").isNull()).count() == 0
    holes = imp.filter(F.col("was_null"))
    assert holes.count() > 0  # the injection actually produced holes


def test_cdc_upsert_key_uniqueness_and_version_rule(spark, sf_dir):
    from pyspark.sql import functions as F

    out = _run("q_cdc_upsert", spark, sf_dir)
    assert out.count() == out.select("o_orderkey").distinct().count()
    # every key ≡0 mod 3 in the base range must carry the update version
    stale = out.filter(
        (F.col("o_orderkey") % 3 == 0)
        & (F.col("o_orderkey") < 10_000_000)
        & (F.col("version") != 2)
    )
    assert stale.count() == 0


def test_decontaminate_flags_are_consistent(spark, sf_dir):
    from pyspark.sql import functions as F

    d = _run("q_llm_decontaminate", spark, sf_dir)
    bad = d.filter(
        (F.col("is_contaminated") & (F.col("n_contam") == 0))
        | (~F.col("is_contaminated") & (F.col("n_contam") > 0))
        | (F.col("n_contam") > F.col("n_grams"))
    )
    assert bad.count() == 0
    # benchmark docs themselves are excluded from the corpus side
    assert d.filter(F.col("doc_id") % 50 == 0).count() == 0


def test_nearest_station_distances_minimal(spark, sf_dir):
    from pyspark.sql import functions as F

    near = _run("q_geo_nearest_station", spark, sf_dir)
    # one row per event, distance non-negative
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert near.count() == ev.count()
    assert near.filter(F.col("dist_km") < 0).count() == 0


def test_stream_upsert_sink_accumulates_every_event(spark, sf_dir):
    from pyspark.sql import functions as F

    out = _run("q_stream_upsert_sink", spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # one row per sensor; counts accumulate across micro-batches to
    # exactly the stream's event total
    assert out.count() == ev.select("user_id").distinct().count()
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()
