"""End-to-end corpus build as ONE declarative plan.

A user of this engine builds a training corpus in stages: near-dup
survivorship → per-language quality gate → overlap chunking → token
packing. Each stage exists as an independent oracle-checked operator;
this module composes them into a single query so the whole build is
one Catalyst plan — stage boundaries are just subplans, and the
optimizer is free to pipeline filters into the dedup scan, prune
columns across stages, and plan every join/window once.

The oracle is composed the same way, by chaining the stage oracles as
CTEs — so the entire pipeline, not just its pieces, is hash-checked
against DuckDB.

Scale notes: no stage materializes unless Spark chooses to; the
pipeline is exactly the sum of its stages' shapes (each documented in
its own module) with no extra shuffles introduced by composition —
the gate's window and the packer's window both key on ``lang``, so
AQE reuses that exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import r4
from iceberg_twist_spark.llm.clusters import _SURVIVOR_ORACLE, q_llm_dedup_survivor
from iceberg_twist_spark.llm.prep import PACK_BUDGET
from iceberg_twist_spark.registry import register

_PIPELINE_ORACLE = f"""
WITH survivors AS (
    SELECT doc_id FROM ({_SURVIVOR_ORACLE}) s WHERE s.is_kept
),
kept AS (
    SELECT d.doc_id, d.lang, d.text,
           floor((d.n_chars * 1.0 / len(string_split(d.text, ' '))) * 10000 + 0.5)
               / 10000 AS score
    FROM documents d JOIN survivors USING (doc_id)
),
gated AS (
    SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               floor(percent_rank() OVER (
                   PARTITION BY lang ORDER BY score DESC, doc_id
               ) * 10000 + 0.5) / 10000 AS pr
        FROM kept
    ) WHERE pr <= 0.5
),
packed AS (
    SELECT lang, doc_id,
           len(string_split(text, ' ')) AS tokens,
           sum(len(string_split(text, ' '))) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_tokens
    FROM gated
)
SELECT lang,
       CAST(floor((cum_tokens - 1) / {PACK_BUDGET}) AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(tokens) AS BIGINT) AS bin_tokens
FROM packed
GROUP BY 1, 2
"""


@register("q_llm_corpus_pipeline", oracle=_PIPELINE_ORACLE, tags=("llm", "dedup", "chunk"))
def q_llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus build, composed: dedup survivors → top-half quality gate
    per language → token packing into ~4096-token bins. Returns the
    per-bin manifest (the thing a training run actually consumes).

    One plan end to end: the survivor set (itself candidates →
    connected components → quality survivorship) semi-joins the
    corpus, the gate re-ranks within language, and the packer
    running-sums per language. Both the gate's percent_rank and the
    packer's running sum use the two-phase bucketed form
    (operators/windows.py) — ``lang`` is a bounded enum, so the naive
    per-lang windows would each serialize a language's whole corpus
    through one task at 100 TB (explain-audit invariant (e)). The
    bucketing min/max rows are 1-row broadcasts, so composition stays
    one Catalyst plan with no driver collect.
    """
    from iceberg_twist_spark.operators.windows import (
        attach_range_bucket,
        two_phase_cumsum,
        two_phase_percent_rank,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    survivors = (
        q_llm_dedup_survivor(spark, sf_dir).filter(F.col("is_kept")).select("doc_id")
    )
    kept = docs.join(survivors, "doc_id", "left_semi").select(
        "doc_id", "lang", "text",
        r4(F.col("n_chars") * F.lit(1.0) / F.size(F.split("text", " "))).alias("score"),
    ).localCheckpoint(eager=False)  # feeds the gate's min/max AND the
    # rank/pack main path — without this the survivor semi-join chain
    # (everything past band_pairs' own checkpoint) re-executes for the
    # 1-row bucketing bounds
    gb = attach_range_bucket(kept, "score", descending=True)
    gated = (
        two_phase_percent_rank(gb, ["lang"], [F.desc("score"), F.asc("doc_id")], "pr")
        .withColumn("pr", r4(F.col("pr")))
        .filter(F.col("pr") <= 0.5)
        .select("doc_id", "lang", "text")
    )
    toks = gated.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("tokens")
    ).localCheckpoint(eager=False)  # three consumers read the gated
    # corpus (the packer's bucket-bounds 1-row agg, its per-bucket
    # offsets agg, and the main running-sum path) — without this the
    # whole gate stage (two windows + the survivor join) re-executes
    # once per consumer (r11)
    pb = attach_range_bucket(toks, "doc_id")
    packed = two_phase_cumsum(pb, ["lang"], ["doc_id"], "tokens", "cum_tokens")
    return (
        packed.groupBy(
            "lang",
            F.floor((F.col("cum_tokens") - 1) / PACK_BUDGET).cast("long").alias("bin_id"),
        )
        .agg(
            F.count("*").cast("long").alias("docs"),
            F.sum("tokens").cast("long").alias("bin_tokens"),
        )
    )
