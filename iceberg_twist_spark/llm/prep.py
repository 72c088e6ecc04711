"""Training-corpus preparation — chunking, split assignment, packing.

The operators a 100 TB text pipeline runs between "cleaned documents"
and "training batches": slice documents into overlapping fixed-width
chunks, assign deterministic train/val/test splits, and pack
variable-length documents into fixed token budgets. They generalize
the reference's chunker (≤6.4 kB message slices, ``sendImuChunk`` —
`iceberg-twist/notes.org:25-26`, SURVEY.md A33) and its content-hash
tracing (`iceberg-twist/main.py:92`) from telemetry frames to corpus
documents.

Scale notes: chunking is a narrow per-row ``sequence``+``explode`` —
no shuffle, output proportional to corpus size; split assignment is a
pure hash of the key (same property as operators/sampling.py: stable
under any partitioning, so a re-run on a different cluster yields the
same split); packing shuffles once on the grouping key and computes
bins with a single running-sum window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import r4
from iceberg_twist_spark.registry import register

CHUNK_WIDTH = 200
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks

_CHUNK_ORACLE = f"""
WITH idx AS (
    SELECT doc_id, text,
           unnest(generate_series(
               0, CAST(floor((length(text) - 1) / {CHUNK_STRIDE}) AS BIGINT)
           )) AS chunk_id
    FROM documents
    WHERE length(text) > 0 AND doc_id % 50 = 0
)
SELECT doc_id, chunk_id,
       substr(text, CAST(chunk_id * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_WIDTH}) AS chunk,
       length(substr(text, CAST(chunk_id * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_WIDTH}))
           AS chunk_len
FROM idx
"""


@register("q_llm_chunk_text", oracle=_CHUNK_ORACLE, tags=("llm", "text", "chunk"))
def q_llm_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunks (width 200, stride 150).

    One row per (doc, chunk): chunk i covers characters
    ``[i*stride, i*stride + width)``, so consecutive chunks share
    ``width - stride`` characters of context — the standard RAG/
    pretraining chunking shape. Restricted to every 50th doc to keep
    the checked result compact; the operator itself is unrestricted.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.filter((F.length("text") > 0) & (F.col("doc_id") % 50 == 0))
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor((F.length("text") - 1) / CHUNK_STRIDE),
                )
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.expr(
                f"substring(text, CAST(chunk_id * {CHUNK_STRIDE} + 1 AS INT),"
                f" {CHUNK_WIDTH})"
            ).alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )


# Split thresholds on the first md5 byte: 0x00-0xcb train (~80%),
# 0xcc-0xe5 val (~10%), 0xe6-0xff test (~10%).
_SPLIT_CASE = (
    "CASE WHEN substr(md5(cast(doc_id AS varchar)), 1, 2) < 'cc' THEN 'train' "
    "WHEN substr(md5(cast(doc_id AS varchar)), 1, 2) < 'e6' THEN 'val' "
    "ELSE 'test' END"
)

_SPLIT_ORACLE = f"""
SELECT {_SPLIT_CASE} AS split,
       count(*) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
"""


@register("q_llm_split_assign", oracle=_SPLIT_ORACLE, tags=("llm", "sample"))
def q_llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content hash.

    The split is a pure function of ``doc_id`` — reproducible on any
    engine or cluster layout, and stable as the corpus grows (existing
    docs never change split when new ones arrive, unlike row-number
    splits). Returns per-split doc and char counts.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("docs"), F.sum("n_chars").alias("total_chars"))
    )


PACK_BUDGET = 4096  # tokens per packed training sequence

_PACK_ORACLE = f"""
WITH toks AS (
    SELECT lang, doc_id, len(string_split(text, ' ')) AS tokens
    FROM documents
), cum AS (
    SELECT lang, doc_id, tokens,
           sum(tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_tokens
    FROM toks
)
SELECT lang,
       CAST(floor((cum_tokens - 1) / {PACK_BUDGET}) AS BIGINT) AS bin_id,
       count(*) AS docs,
       CAST(sum(tokens) AS BIGINT) AS bin_tokens
FROM cum
GROUP BY lang, bin_id
"""


@register("q_llm_pack_greedy", oracle=_PACK_ORACLE, tags=("llm", "text", "chunk"))
def q_llm_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~4096-token bins per language.

    Contiguous-fill packing: documents stream in key order and a bin
    closes when the running token count crosses the budget —
    ``bin = floor((cumsum - 1) / budget)``. No iterative driver loop,
    and — since ``lang`` is a bounded enum — no per-language serial
    sort either: the running sum is the two-phase
    ``two_phase_cumsum`` shape (doc_id range-bucketed parallel
    windows + broadcast cumulative offsets; explain-audit invariant
    (e) forbids the naive single-window form over raw fact rows).
    Returns per-bin document counts and token totals.
    """
    from iceberg_twist_spark.operators.windows import (
        attach_range_bucket,
        two_phase_cumsum,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("tokens")
    )
    b = attach_range_bucket(toks, "doc_id")
    return (
        two_phase_cumsum(b, ["lang"], ["doc_id"], "tokens", "cum_tokens")
        .withColumn(
            "bin_id", F.floor((F.col("cum_tokens") - 1) / PACK_BUDGET).cast("long")
        )
        .groupBy("lang", "bin_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("tokens").cast("long").alias("bin_tokens"),
        )
    )


_SHUFFLE_ORACLE = """
WITH keyed AS (
    SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR) || ':42') AS shuffle_key
    FROM documents
)
SELECT doc_id, shuffle_key,
       ascii(substr(shuffle_key, 1, 1)) AS shard,
       CAST(row_number() OVER (
           PARTITION BY ascii(substr(shuffle_key, 1, 1))
           ORDER BY shuffle_key, doc_id
       ) AS BIGINT) AS pos
FROM keyed
"""


@register("q_llm_shuffle_shards", oracle=_SHUFFLE_ORACLE, tags=("llm", "sample", "sort"))
def q_llm_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: md5(doc_id, seed) keys
    every document, the key's first hex digit assigns one of 16
    shards, and position-within-shard is a rank over the key.

    This is the standard seeded corpus shuffle (epoch order must be
    reproducible across re-runs and cluster sizes — same property as
    the hash sampling suite). Training order is (shard, pos), and each
    shard can be written/read as an independent file group. 16 shards
    is a FORMAT constant, not a parallelism knob — at 100 TB a
    per-shard serial rank is 1/16th of a single-reducer, still one
    task sorting terabytes — so pos is the two-phase row_number
    (operators/windows.py): the key's NEXT two hex chars range-bucket
    each shard into 256 contiguous slices of the (shuffle_key, doc_id)
    order, ranks run per (shard, bucket) in parallel, and the
    ≤ 16×256-row count frame broadcasts back as offsets. Exactly the
    q_llm_token_budget shape (explain-audit invariant (e) flags the
    naive form via the 'shard' enum entry).
    """
    from iceberg_twist_spark.operators.windows import two_phase_row_number

    docs = load_tables(spark, sf_dir)["documents"]
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))).alias(
            "shuffle_key"
        ),
    ).withColumn("shard", F.ascii(F.substring("shuffle_key", 1, 1)))
    b = keyed.withColumn(
        "__bucket",
        F.conv(F.substring("shuffle_key", 2, 2), 16, 10).cast("int"),
    )
    return two_phase_row_number(
        b, ["shard"], ["shuffle_key", "doc_id"], "pos"
    ).select("doc_id", "shuffle_key", "shard", "pos")


NEG_K = 3

_NEG_ORACLE = f"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
neg AS (
    SELECT d.doc_id, t.i AS neg_slot,
           (d.doc_id + 1 + (d.doc_id * 7 + t.i * 13) % (n.n_docs - 1))
               % n.n_docs AS neg_id
    FROM documents d
    CROSS JOIN n
    CROSS JOIN (SELECT unnest(generate_series(1, {NEG_K})) AS i) t
)
SELECT neg.doc_id, CAST(neg.neg_slot AS BIGINT) AS neg_slot, neg.neg_id,
       d2.lang AS neg_lang
FROM neg JOIN documents d2 ON neg.neg_id = d2.doc_id
"""


@register("q_llm_neg_sample", oracle=_NEG_ORACLE, tags=("llm", "sample"))
def q_llm_neg_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: 3
    negatives per document via modular-arithmetic offsets that can
    never resolve to the anchor itself (offset ∈ [1, N-1]); each
    negative joins back to its metadata. A pure row-local computation
    plus one equi join — no shuffle grows with k, and identical
    samples on any engine or cluster size (same reproducibility
    property as the hash sampling suite).
    """
    docs = load_tables(spark, sf_dir)["documents"]
    n = docs.agg(F.count("*").alias("n_docs"))
    slots = F.explode(F.sequence(F.lit(1), F.lit(NEG_K))).alias("neg_slot")
    neg = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "n_docs", slots)
        .select(
            "doc_id",
            F.col("neg_slot").cast("long").alias("neg_slot"),
            (
                (F.col("doc_id") + 1 + (F.col("doc_id") * 7 + F.col("neg_slot") * 13)
                 % (F.col("n_docs") - 1)) % F.col("n_docs")
            ).alias("neg_id"),
        )
    )
    meta = docs.select(F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang"))
    return neg.join(meta, "neg_id").select("doc_id", "neg_slot", "neg_id", "neg_lang")


# ------------------------------------------------- mixture reweighting
# Corpus mixture control: large pretraining corpora are REBALANCED
# across sources/languages before training (upsampling rare languages,
# downsampling the crawl-dominant one). Modeled here as deterministic
# hash-sampling each language down to the rarest language's count:
# acceptance rate r_l = min_count / count_l, accept iff the document's
# md5-derived uniform in [0,1) is < r_l. The decision is a pure
# function of doc_id — partition-layout-invariant, reproducible on any
# engine, and stable under corpus growth for the surviving docs.
# Scale shape: one tiny per-language count aggregate (map-side
# combined), the rate table broadcast (bounded by the language-set
# cardinality — an enum, not a data volume), and one scan with a
# per-row hash compare; no data-volume shuffle at all.

_MIX_FRAC = (
    "(CAST(('0x' || substr(md5('mix-' || CAST(doc_id AS VARCHAR)), 1, 6)) "
    "AS BIGINT) / 16777216.0)"
)

_MIXTURE_ORACLE = f"""
WITH counts AS (
  SELECT lang, count(*) AS n_total FROM documents GROUP BY lang
), rates AS (
  SELECT lang, n_total,
         (SELECT min(n_total) FROM counts) / CAST(n_total AS DOUBLE) AS rate
  FROM counts
)
SELECT d.lang,
       CAST(max(r.n_total) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN {_MIX_FRAC} < r.rate THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       floor(max(r.rate) * 10000 + 0.5) / 10000 AS rate
FROM documents d JOIN rates r USING (lang)
GROUP BY d.lang
"""


@register("q_llm_mixture_sample", oracle=_MIXTURE_ORACLE, tags=("llm", "sample"))
def q_llm_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture rebalancing: downsample every language to the
    rarest language's document count with a deterministic hash gate.

    Returns per-language (n_total, n_kept, rate). n_kept ≈ min-lang
    count with binomial jitter — the acceptance is per-document
    hash < rate, not exact-k, because exact-k needs a global sort while
    the hash gate is embarrassingly parallel (the same trade CCNet
    makes). The rate table is broadcast: its size is the language-set
    cardinality, fixed even at 100 TB.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    min_row = counts.agg(F.min("n_total").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_row)).select(
        "lang",
        "n_total",
        (F.col("min_n") / F.col("n_total").cast("double")).alias("rate"),
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix-"), F.col("doc_id").cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        / 16777216.0
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.max("n_total").cast("long").alias("n_total"),
            F.sum((frac < F.col("rate")).cast("int")).cast("long").alias("n_kept"),
            r4(F.max("rate")).alias("rate"),
        )
    )


# ----------------------------------------- temperature mixture sampling
# The standard multilingual data-mixing method (UNIMAX / mT5-style
# sampling temperature): post-sample counts ∝ n_l^(1/T), flattening
# the language distribution without collapsing it to the rarest
# language's count. Keep-rate r_l = (n_min / n_l)^(1 - 1/T): rarest
# language kept whole, hot languages downsampled, T→∞ degenerates to
# q_llm_mixture_sample's equal counts and T=1 keeps everything. Fixed
# at T = 2 — the exponent becomes 1/2 and the rate is sqrt(n_min/n_l):
# IEEE sqrt is CORRECTLY ROUNDED on every platform (libm pow is not),
# so the rate doubles are bit-identical across engines and the hash
# gate stays exactly verifiable — T=2 is the exactly-portable point of
# the temperature family.

_MIXT_FRAC = (
    "(CAST(('0x' || substr(md5('mixt-' || CAST(doc_id AS VARCHAR)), 1, 6)) "
    "AS BIGINT) / 16777216.0)"
)

_MIXTURE_T_ORACLE = f"""
WITH counts AS (
  SELECT lang, count(*) AS n_total FROM documents GROUP BY lang
), rates AS (
  SELECT lang, n_total,
         sqrt((SELECT min(n_total) FROM counts) / CAST(n_total AS DOUBLE))
             AS rate
  FROM counts
)
SELECT d.lang,
       CAST(max(r.n_total) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN {_MIXT_FRAC} < r.rate THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       floor(max(r.rate) * 10000 + 0.5) / 10000 AS rate
FROM documents d JOIN rates r USING (lang)
GROUP BY d.lang
"""


@register("q_llm_mixture_temperature", oracle=_MIXTURE_T_ORACLE, tags=("llm", "sample"))
def q_llm_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (T=2) language-mixture sampling: keep-rate
    sqrt(n_min/n_l) per language — post-sample counts ∝ sqrt(n_l),
    the standard flatten-without-equalizing mix. Same deterministic
    per-document hash gate and broadcast rate table as
    q_llm_mixture_sample (language-set cardinality, fixed at 100 TB);
    see the module comment for why T=2 is the exactly-portable
    temperature."""
    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    min_row = counts.agg(F.min("n_total").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_row)).select(
        "lang",
        "n_total",
        F.sqrt(F.col("min_n") / F.col("n_total").cast("double")).alias("rate"),
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mixt-"), F.col("doc_id").cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        / 16777216.0
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.max("n_total").cast("long").alias("n_total"),
            F.sum((frac < F.col("rate")).cast("int")).cast("long").alias("n_kept"),
            r4(F.max("rate")).alias("rate"),
        )
    )


# ------------------------------------------- per-source token budgets
# The third mixing primitive after rarest-count and temperature
# sampling: a TOKEN budget per source — "take at most B tokens from
# each domain", the way pretraining mixes are actually specced (token
# counts, not document counts). Documents are admitted in a
# deterministic hash order (stable as the corpus grows — a new doc
# never evicts an already-admitted one unless it hashes earlier), and
# a source stops admitting once its cumulative token count passes the
# budget. One window per source; the corpus moves once.

SOURCE_TOKEN_BUDGET = 1_500


_BUDGET_ORACLE = f"""
WITH toks AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS tokens,
         md5('budget-' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), cum AS (
  SELECT source, doc_id, tokens,
         sum(tokens) OVER (
             PARTITION BY source ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM toks
)
SELECT source,
       CAST(count(*) AS BIGINT) AS docs_total,
       CAST(sum(CASE WHEN c <= {SOURCE_TOKEN_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_kept,
       CAST(sum(CASE WHEN c <= {SOURCE_TOKEN_BUDGET} THEN tokens ELSE 0 END) AS BIGINT)
           AS tokens_kept
FROM cum
GROUP BY source
"""


# Hex-prefix bucket count for the two-phase running sum below: 2 hex
# chars → 256 parallel sort buckets per source. At 100 TB raise to 3–4
# chars (4096/65536 buckets); the offsets frame stays |sources|×buckets
# rows — broadcast-sized either way.
_BUDGET_BUCKET_HEX = 2


@register("q_llm_token_budget", oracle=_BUDGET_ORACLE, tags=("llm", "sample", "window"))
def q_llm_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget admission: keep each source's documents
    in deterministic hash order until the cumulative whitespace-token
    count passes SOURCE_TOKEN_BUDGET; report per-source totals. The
    admission order is a pure function of doc_id, so the kept set is
    reproducible on any cluster layout and stable under corpus growth.

    The running sum is TWO-PHASE (the ``_global_rank`` shape,
    operators/windows.py): a naive
    ``Window.partitionBy(source).orderBy(h)`` funnels every document
    of a source through ONE task's sort — with a handful of sources
    that is a single-reducer in disguise at 100 TB. Instead the md5
    admission key's first ``_BUDGET_BUCKET_HEX`` hex chars range-bucket
    each source into 256 contiguous slices of the (h, doc_id) order
    (the hex prefix is monotone in the string order of h, so bucket k's
    rows all precede bucket k+1's); per-(source, bucket) running sums
    run in parallel, and the ≤ |sources|×256-row per-bucket totals
    re-enter as broadcast cumulative offsets. global cumsum =
    bucket offset + local running sum — hash-identical to the serial
    window, no per-source serial sort anywhere."""
    from iceberg_twist_spark.operators.windows import two_phase_cumsum

    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("tokens"),
        F.md5(F.concat(F.lit("budget-"), F.col("doc_id").cast("string"))).alias("h"),
    ).withColumn(
        "__bucket",
        F.conv(F.substring("h", 1, _BUDGET_BUCKET_HEX), 16, 10).cast("int"),
    )
    cum = two_phase_cumsum(toks, ["source"], ["h", "doc_id"], "tokens", "c")
    kept = F.col("c") <= SOURCE_TOKEN_BUDGET
    return (
        cum.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("docs_total"),
            F.sum(kept.cast("int")).cast("long").alias("docs_kept"),
            F.sum(F.when(kept, F.col("tokens")).otherwise(0)).cast("long").alias("tokens_kept"),
        )
    )
