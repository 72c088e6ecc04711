"""Corpus hygiene for training-data pipelines — benchmark
decontamination, within-document repetition signals, TF-IDF keyword
extraction, and a per-language quality-percentile gate.

These are the standard filters a 100 TB pretraining corpus passes
through after dedup (llm/dedup.py) and before packing (llm/prep.py).
They generalize the reference's content-scan/filter surface
(`iceberg-twist/main.py:86,92` — byte scans and per-frame content
metrics) from telemetry frames to documents.

Scale notes:
- Decontamination joins the corpus' n-gram inverted index against the
  benchmark n-gram set. The benchmark side is tiny by construction
  (eval sets are MBs, not TBs) → broadcast hash join; cost is one
  narrow shingle explode plus one map-side join, no O(n²) anywhere.
- Repetition stats shuffle (doc_id, gram) then doc_id — both keyed by
  doc, so partial aggregation bounds shuffle volume by the distinct
  gram mass, never the corpus crossed with itself.
- TF-IDF's document-frequency table is |vocab| rows; it broadcasts to
  the term-frequency side. The corpus-size scalar is computed in-plan
  (broadcast one-row aggregate), not collected to the driver.
- The quality gate is one window per language partition — languages
  are a natural high-cardinality-enough partitioning at corpus scale,
  and the score ordering carries a doc_id tiebreak so ranks are total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_r4, r4, spread
from iceberg_twist_spark.llm.dedup import shingle_docs, word_shingles
from iceberg_twist_spark.registry import register

# Benchmark membership is a deterministic key split of the fixture:
# every 50th document plays the role of the held-out eval set.
DECONTAM_K = 3  # n-gram width for contamination matching

def _duck_grams(k: int) -> str:
    """DuckDB CTE producing one (doc_id, gram) row per word k-gram."""
    return f"""
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
    SELECT doc_id, array_to_string(words[i:i + {k - 1}], ' ') AS gram
    FROM w, LATERAL (
        SELECT unnest(generate_series(1, len(words) - {k - 1})) AS i
    ) t
    WHERE len(words) >= {k}
)
"""

_DECONTAM_ORACLE = f"""
WITH {_duck_grams(DECONTAM_K)},
bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
cg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 50 <> 0)
SELECT cg.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(bg.gram) AS BIGINT) AS n_contam,
       count(bg.gram) > 0 AS is_contaminated
FROM cg LEFT JOIN bg USING (gram)
GROUP BY cg.doc_id
"""


@register("q_llm_decontaminate", oracle=_DECONTAM_ORACLE, tags=("llm", "text", "dedup"))
def q_llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word 3-gram with the (deterministic) benchmark subset.

    The benchmark n-gram set is broadcast; the corpus side streams
    through a map-side join — the shape that holds when the corpus is
    100 TB and the eval set is a few MB.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    bench_grams = (
        shingle_docs(docs.filter(F.col("doc_id") % 50 == 0), DECONTAM_K)
        .select(F.col("sh").alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus_grams = shingle_docs(
        docs.filter(F.col("doc_id") % 50 != 0), DECONTAM_K
    ).withColumnRenamed("sh", "gram")
    marked = corpus_grams.join(F.broadcast(bench_grams), "gram", "left")
    return marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.count("hit").cast("long").alias("n_contam"),
        (F.count("hit") > 0).alias("is_contaminated"),
    )


_REP_ORACLE = f"""
WITH {_duck_grams(2)},
c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS n_distinct,
       {duck_r4('1.0 - count(*) * 1.0 / sum(cnt)')} AS dup_ratio,
       {duck_r4('max(cnt) * 1.0 / sum(cnt)')} AS top_frac
FROM c GROUP BY doc_id
"""


@register("q_llm_rep_ngrams", oracle=_REP_ORACLE, tags=("llm", "text"))
def q_llm_rep_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (Gopher-style quality
    filters): duplicate-bigram ratio and most-frequent-bigram mass.

    Two keyed shuffles — (doc_id, gram) then doc_id — with map-side
    partial counts; shuffle volume is bounded by distinct gram mass.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    w = F.col("__words")
    exploded = (
        spread(docs, "doc_id")
        .withColumn("__words", F.split("text", " "))
        .filter(F.size(w) >= 2)
        .select("doc_id", F.explode(word_shingles(w, 2)).alias("gram"))
    )
    per_gram = exploded.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        F.count("*").cast("long").alias("n_distinct"),
        r4(F.lit(1.0) - F.count("*") * F.lit(1.0) / F.sum("cnt")).alias("dup_ratio"),
        r4(F.max("cnt") * F.lit(1.0) / F.sum("cnt")).alias("top_frac"),
    )


TFIDF_TOPK = 3

_TFIDF_ORACLE = f"""
WITH tf AS (
    SELECT doc_id, w.word, count(*) AS tf
    FROM documents, LATERAL unnest(string_split(text, ' ')) AS w(word)
    GROUP BY 1, 2
),
df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.word, tf.tf, df.df,
           {duck_r4('tf.tf * ln(n.n_docs * 1.0 / df.df)')} AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
)
SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, word
    ) AS rnk
    FROM scored
) WHERE rnk <= {TFIDF_TOPK}
"""


@register("q_llm_tfidf_topk", oracle=_TFIDF_ORACLE, tags=("llm", "text"))
def q_llm_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document.

    The document-frequency table (|vocab| rows) and the corpus-size
    scalar (one row) both broadcast onto the term-frequency side; the
    per-doc top-k ranks on the *rounded* score (identical on the
    oracle side) with a word tiebreak, so ordering is total and
    engine-independent. WindowGroupLimit prunes to k rows map-side.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    tf = (
        spread(docs, "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        # the word→df table is vocabulary-sized (sublinear but unbounded
        # in corpus size) — no forced broadcast; AQE decides.
        tf.join(df, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf", r4(F.col("tf") * F.log(F.col("n_docs") * F.lit(1.0) / F.col("df")))
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOPK)
        .select(
            "doc_id", "word",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "tfidf",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


_GATE_ORACLE = f"""
WITH scored AS (
    SELECT doc_id, lang,
           {duck_r4("n_chars * 1.0 / len(string_split(text, ' '))")} AS score
    FROM documents
),
ranked AS (
    SELECT doc_id, lang, score,
           {duck_r4('percent_rank() OVER (PARTITION BY lang ORDER BY score DESC, doc_id)')} AS pr
    FROM scored
)
SELECT doc_id, lang, score, pr FROM ranked WHERE pr <= 0.5
"""


@register("q_llm_quality_gate", oracle=_GATE_ORACLE, tags=("llm", "text", "filter"))
def q_llm_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-percentile gate: keep the top half of each
    language by mean-word-length score (percent_rank ≤ 0.5).

    Percentile cutoffs per language are how real pipelines normalize
    quality thresholds across languages with different score
    distributions. Rank ordering carries a doc_id tiebreak (a UNIQUE
    total order, so percent_rank ≡ (row_number−1)/(n−1)) and the
    filter applies to the *rounded* rank so the boundary is
    engine-independent. ``lang`` is a bounded enum, so the naive
    per-lang window would sort a language's whole corpus in ONE task
    at 100 TB — the rank is two-phased instead (score-range-bucketed
    parallel windows + broadcast offsets; explain-audit invariant (e)).
    """
    from iceberg_twist_spark.operators.windows import (
        attach_range_bucket,
        two_phase_percent_rank,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    score = r4(F.col("n_chars") * F.lit(1.0) / F.size(F.split("text", " ")))
    scored = docs.select("doc_id", "lang", score.alias("score"))
    b = attach_range_bucket(scored, "score", descending=True)
    ranked = two_phase_percent_rank(
        b, ["lang"], [F.desc("score"), F.asc("doc_id")], "pr"
    )
    return (
        ranked.withColumn("pr", r4(F.col("pr")))
        .filter(F.col("pr") <= 0.5)
        .select("doc_id", "lang", "score", "pr")
    )
