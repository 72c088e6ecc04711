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
