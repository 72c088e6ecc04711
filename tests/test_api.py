"""Engine façade tests — the public API a reference user would adopt."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.api import Engine


def _engine(spark, sf_dir):
    return Engine(spark, sf_dir)


def test_table_sql_and_run_agree(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    n_api = eng.table("lineitem").count()
    n_sql = eng.sql("SELECT count(*) AS c FROM lineitem").collect()[0].c
    assert n_api == n_sql > 0
    assert "q_agg_group" in Engine.operators()
    assert eng.run("q_agg_group").count() == 6


def test_exact_dedup_keeps_one_per_hash(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    docs = eng.table("documents")
    deduped = Engine.exact_dedup(docs, "text", "doc_id")
    hashes = deduped.selectExpr("sha2(lower(trim(text)), 256) AS h")
    assert hashes.count() == hashes.distinct().count()


def test_exact_dedup_removes_synthetic_dups(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "  hello world "), (3, "unique")],
        "doc_id long, text string",
    )
    kept = Engine.exact_dedup(df, "text", "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]  # keeper = min id


def test_cosine_topk_probe(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    emb = eng.table("embeddings")
    probe = [float(x) for x in emb.first().embedding]
    top = Engine.cosine_topk(emb, "embedding", probe, k=3).collect()
    assert len(top) == 3
    # the probe itself is in the corpus → top hit is itself with cos≈1
    assert abs(top[0].cos_sim - 1.0) < 1e-9


def test_unknown_table_raises(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    try:
        eng.table("nope")
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "nope" in str(e)


def test_snapshot_table_via_engine(spark, sf_dir):
    import tempfile

    from iceberg_twist_spark.api import Engine

    eng = Engine(spark, sf_dir)
    tbl = eng.snapshot_table(tempfile.mkdtemp(prefix="itws_api_snap_"))
    orders = eng.table("orders").select("o_orderkey", "o_orderstatus")
    tbl.create(orders.filter("o_orderkey % 2 = 0"))
    tbl.append(orders.filter("o_orderkey % 2 = 1"))
    assert tbl.read().count() == orders.count()
    assert tbl.read(snapshot_id=1).count() == orders.filter("o_orderkey % 2 = 0").count()


def test_scd2_helper_matches_registered_query(spark, sf_dir):
    from pyspark.sql import functions as F

    from iceberg_twist_spark.api import Engine
    from iceberg_twist_spark.registry import REGISTRY

    eng = Engine(spark, sf_dir)
    events = eng.table("events")
    generic = Engine.scd2(events, "user_id", "event_type", "ts")
    registered = REGISTRY["q_scd2_build"].builder(spark, sf_dir)
    # same number of versions; same count of open (current) rows
    assert generic.count() == registered.count()
    assert (
        generic.filter("is_current").count()
        == registered.filter("is_current = 1").count()
    )


def test_match_sequence_helper(spark, sf_dir):
    from iceberg_twist_spark.api import Engine
    from iceberg_twist_spark.registry import REGISTRY

    eng = Engine(spark, sf_dir)
    events = eng.table("events")
    hits = Engine.match_sequence(
        events, "user_id", "event_type", "ts",
        ["view", "click", "purchase"], within_seconds=86_400,
    )
    total = REGISTRY["q_seq_pattern"].builder(spark, sf_dir).agg(
        {"n_matches": "sum"}
    ).collect()[0][0]
    assert hits.count() == (total or 0)


def test_semdedup_helper_matches_registered(spark, sf_dir):
    from pyspark.sql import functions as F

    from iceberg_twist_spark.api import Engine
    from iceberg_twist_spark.registry import REGISTRY

    eng = Engine(spark, sf_dir)
    emb = eng.table("embeddings")
    generic = Engine.semdedup(emb, "embedding", "vec_id")
    registered = REGISTRY["q_llm_semdedup"].builder(spark, sf_dir)
    # centroid choice is the same (vec_id < 16 == smallest 16 keys),
    # so keep/drop decisions must be identical
    assert (
        generic.filter(~F.col("is_kept")).count()
        == registered.filter("NOT is_kept").count()
    )
    assert generic.count() == registered.count()


def test_perceptual_hash_helper(spark, sf_dir):
    from iceberg_twist_spark.api import Engine
    from iceberg_twist_spark.multimodal import build_phash_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = build_phash_media(docs)
    ph = Engine.perceptual_hash(media, "media", "doc_id")
    assert ph.columns == ["doc_id", "h1", "h2"]
    assert ph.count() == docs.count()
