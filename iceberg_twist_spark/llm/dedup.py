"""Deduplication family for training-data pipelines (NS mandate).

Four tiers, each with the scalable plan shape:

- exact: sha256 of normalized text, one hash-shuffle group-by. The
  100 TB plan: dedup never compares documents, only 32-byte digests.
- n-gram Jaccard: shingle inverted index + self-join on shingle →
  candidate pairs (NEVER the O(n²) crossJoin) → exact Jaccard.
- MinHash + LSH: deterministic md5-derived permutations → per-doc
  signature → banded bucket join. Constant-size signatures make the
  candidate join independent of document length.
- SimHash: 32-bit sign-aggregated word-hash fingerprint, banded for
  candidate generation; Hamming distance via bit_count(xor).

Everything is JVM expressions (higher-order functions + hashes) — no
Python in any of these paths. Round 3 moved the MinHash/SimHash hash
primitive from xxhash64 to md5: DuckDB computes the identical
signatures, so the whole near-dup family is hash-checked against
full oracles (measured ~1.4× signature cost — the price of
cross-engine verifiability, still far under the bench baseline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import r4, spread
from iceberg_twist_spark.registry import register

_EXACT_ORACLE = """
SELECT sha256(lower(trim(text))) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY sha256(lower(trim(text)))
"""


@register("q_llm_exact_dedup", oracle=_EXACT_ORACLE, tags=("llm", "dedup"))
def q_llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on sha256(normalized text); the keeper is
    min(doc_id) so the choice is deterministic (dropDuplicates picks an
    arbitrary row — never acceptable under a hash check)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.withColumn("text_hash", F.sha2(F.lower(F.trim("text")), 256))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingle_docs(docs: DataFrame, k: int = 3) -> DataFrame:
    """Distinct k-word shingles per document: (doc_id, sh).

    JVM-side: split → sliding k-gram via transform(sequence) →
    array_distinct → explode. Documents shorter than k words are
    dropped (no shingle is well-defined). The source is spread() first:
    shingle construction is the CPU-heavy step, and an
    under-partitioned scan (few/single-row-group files) would
    otherwise serialize it.
    """
    words = F.split("text", " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return (
        spread(docs, "doc_id").filter(n >= k)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("sh"))
    )


_JACCARD_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS sh
  FROM (SELECT doc_id, words, unnest(range(1, len(words) - 1)) AS i FROM w)
),
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       floor((c * 1.0 / (ca.n + cb.n - c)) * 10000 + 0.5) / 10000 AS jaccard
FROM common
JOIN counts ca ON common.doc_a = ca.doc_id
JOIN counts cb ON common.doc_b = cb.doc_id
WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.2
"""


@register("q_llm_ngram_jaccard", oracle=_JACCARD_ORACLE, tags=("llm", "dedup"))
def q_llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.2 via shingle inverted
    index — candidate pairs come from a join on shingle, so cost scales
    with shared-shingle mass, not |docs|²."""
    docs = load_tables(spark, sf_dir)["documents"]
    sh = shingle_docs(docs, 3).cache()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", r4(jac).alias("jaccard"))
    )


N_MINHASH = 16
LSH_BANDS = 4  # 4 rows per band


MINHASH_HEX = 16  # hex chars per permutation value (64 bits)


def minhash_signatures(docs: DataFrame, k: int = 3, n_perm: int = N_MINHASH) -> DataFrame:
    """Deterministic MinHash signatures:
    perm_i(sh) = first 16 hex chars of md5(f"{i}:" + sh);
    signature[i] = lexicographic min over shingles (fixed-length hex ⇒
    string min == numeric min).

    md5 rather than xxhash64 so DuckDB computes the IDENTICAL
    signatures and the banding query carries a full hash oracle
    (round-3 upgrade from rows-only).

    Computed NARROWLY — the shingle array stays inside its row and each
    signature column is ``array_min(transform(shingles, md5…))`` — so
    there is no shingle explode and no groupBy shuffle at all: a
    document never leaves its partition to be signed.
    """
    words = F.split("text", " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    base = spread(docs, "doc_id").filter(n >= k).withColumn(
        "sh_arr", F.array_distinct(grams)
    )
    return base.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(
                    "sh_arr",
                    lambda s: F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), s)), 1, MINHASH_HEX
                    ),
                )
            ).alias(f"mh{i}")
            for i in range(n_perm)
        ],
    )


def _minhash_oracle(k: int = 3, n_perm: int = N_MINHASH, n_bands: int = LSH_BANDS) -> str:
    """DuckDB SQL producing the identical banded candidate pairs."""
    rpb = n_perm // n_bands
    sig_cols = ",\n           ".join(
        f"list_min(list_transform(shs, s -> substr(md5('{i}:' || s), 1, {MINHASH_HEX}))) AS mh{i}"
        for i in range(n_perm)
    )
    parts = []
    for b in range(n_bands):
        cols = " || ".join(f"mh{b * rpb + r}" for r in range(rpb))
        parts.append(
            f"SELECT doc_id, {b} AS band_idx, md5({cols}) AS band_hash FROM sig"
        )
    band_selects = "\n    UNION ALL\n    ".join(parts)
    gram = " || ' ' || ".join(f"w[i + {j + 1}]" for j in range(k))
    return f"""
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
    WHERE len(string_split(text, ' ')) >= {k}
), sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(0, len(w) - {k - 1}),
               i -> {gram})) AS shs
    FROM d
), sig AS (
    SELECT doc_id,
           {sig_cols}
    FROM sh
), bands AS (
    {band_selects}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
"""


@register("q_llm_minhash_dedup", oracle=_minhash_oracle(), tags=("llm", "dedup", "sketch"))
def q_llm_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs, hash-checked: md5-derived
    permutations give both engines the identical signatures, so the
    banding query compares against a full DuckDB derivation (round-3
    upgrade from rows-only).

    Banding: signature split into LSH_BANDS bands of 4 hashes; docs
    agreeing on any whole band become a candidate pair. At 100 TB the
    band bucket join replaces all-pairs comparison; skewed buckets
    (boilerplate text) are handled by AQE skew-join splitting.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    sig = minhash_signatures(docs)
    rows_per_band = N_MINHASH // LSH_BANDS
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat(
                            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                        )
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    # Lazy-materialize the (doc_id, band) rows before the self-join:
    # without it both join sides re-run the whole signature pipeline
    # (shingle + 16 hash permutations over every document — by far the
    # dominant cost; ~2× measured at sf0.1). The checkpoint is tiny
    # (|docs| × LSH_BANDS rows of 3 longs) and, like PageRank's
    # per-iteration checkpoints, keeps the join plan flat.
    bands = bands.localCheckpoint(eager=False)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash per document.

    Each distinct word hashes via md5; bit j of a word's hash is bit
    (j mod 4) of hex digit j//4 — derivable from the md5 STRING with
    substr/ascii arithmetic, so DuckDB computes the identical
    fingerprint and the query family is hash-checked (round-3 upgrade
    from the xxhash64 rows-only form). Bit j of the fingerprint is 1
    iff the sum of ±1 votes over the document's words is positive.
    Computed as explode → one hash aggregate with 32 vote columns —
    vectorized, one shuffle on doc_id, no Python.
    """
    w = (
        spread(docs, "doc_id")
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("word"),
        )
        .select("doc_id", F.md5("word").alias("hx"))
    )

    def bit(j: int):
        c = F.substring(F.col("hx"), j // 4 + 1, 1)
        v = F.when(c.between("0", "9"), F.ascii(c) - 48).otherwise(F.ascii(c) - 87)
        return F.shiftright(v, j % 4).bitwiseAND(F.lit(1))

    aggs = [
        F.sum(F.when(bit(j) == 1, 1).otherwise(-1)).alias(f"v{j}")
        for j in range(bits)
    ]
    votes = w.groupBy("doc_id").agg(*aggs)
    fingerprint = None
    for j in range(bits):
        term = (
            F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select("doc_id", fingerprint.alias("simhash"))


def _simhash_oracle(bits: int = 32, max_hamming: int = 3) -> str:
    """DuckDB SQL computing the identical SimHash pairs (all-pairs
    Hamming — the correctness baseline for the banded candidate join)."""
    digit = (
        "(CASE WHEN substr(hx, {d}, 1) BETWEEN '0' AND '9' "
        "THEN ascii(substr(hx, {d}, 1)) - 48 "
        "ELSE ascii(substr(hx, {d}, 1)) - 87 END)"
    )
    votes = ",\n           ".join(
        f"sum(CASE WHEN (({digit.format(d=j // 4 + 1)} >> {j % 4}) & 1) = 1 "
        f"THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN (CAST(1 AS BIGINT) << {j}) ELSE 0 END)"
        for j in range(bits)
    )
    return f"""
WITH w AS (
    SELECT doc_id, md5(unnest(list_distinct(string_split(text, ' ')))) AS hx
    FROM documents
), votes AS (
    SELECT doc_id,
           {votes}
    FROM w GROUP BY doc_id
), fp AS (
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


@register("q_llm_simhash", oracle=_simhash_oracle(), tags=("llm", "dedup", "sketch"))
def q_llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + near-dup pairs at Hamming distance ≤ 3.

    Candidates via 4 byte-band matches — pigeonhole-COMPLETE for
    distance ≤ 3 over 4 bands (the round-2 16-bit-half banding missed
    (1,2)-split pairs; caught when the all-pairs oracle landed) — then
    exact Hamming verification. Hash-checked against the all-pairs
    DuckDB derivation of the same md5-digit fingerprints."""
    docs = load_tables(spark, sf_dir)["documents"]
    fp = simhash(docs).cache()
    bands = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[
                F.shiftright("simhash", 8 * k).bitwiseAND(F.lit(0xFF))
                for k in range(4)
            ])
        ).alias("band_idx", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    ).filter(F.col("hamming") <= 3)


# ----------------------------------------------------- line-level dedup
# Cross-corpus block-level ("line-level") deduplication — the C4 /
# CCNet / RefinedWeb boilerplate-removal stage: a block of text that
# recurs across MANY documents (nav bars, cookie banners, license
# footers) is removed from EVERY document, while within-document
# structure is preserved. The fixture's documents are single-line word
# streams, so "line" is modeled as a fixed-width word block — the
# block width is the operator's granularity knob, exactly like the
# line split is in CCNet (4 words here so the fixture's random text
# produces a realistic ~2-3% boilerplate rate for the check to bite
# on; a crawl pipeline would use actual lines).
#
# Scale shape (the reason this is NOT "explode and groupBy text"):
# the document-frequency pass shuffles (md5(block), doc_id) pairs —
# 32-B digests, never block text; the rewrite pass shuffles the corpus
# ONCE keyed by doc_id (unavoidable: the output IS a rewritten
# corpus, linear write amplification); the boilerplate table joins by
# digest. Boilerplate keys are the canonical skew case (one banner in
# 30% of a crawl) — AQE skew-join handles the hot digest, and the
# rewrite groupBy keys on doc_id, which stays uniform.

LINE_BLOCK_WORDS = 4
LINE_BOILERPLATE_DF = 3  # blocks in >= this many distinct docs are boilerplate

_LINE_DEDUP_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE length(text) > 0
), idx AS (
  SELECT doc_id, ws,
         unnest(generate_series(
             0, CAST(ceil(len(ws) / {LINE_BLOCK_WORDS}.0) AS BIGINT) - 1)) AS pos
  FROM w
), b AS (
  SELECT doc_id, pos,
         array_to_string(
             ws[pos * {LINE_BLOCK_WORDS} + 1 :
                least((pos + 1) * {LINE_BLOCK_WORDS}, len(ws))], ' ') AS block
  FROM idx
), bp AS (
  SELECT md5(block) AS bh FROM b
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= {LINE_BOILERPLATE_DF}
), f AS (
  SELECT b.doc_id, b.pos, b.block, (bp.bh IS NOT NULL) AS is_bp
  FROM b LEFT JOIN bp ON md5(b.block) = bp.bh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       md5(coalesce(
           string_agg(CASE WHEN NOT is_bp THEN block END, ' ' ORDER BY pos),
           '')) AS cleaned_md5
FROM f GROUP BY doc_id
"""


@register("q_llm_line_dedup", oracle=_LINE_DEDUP_ORACLE, tags=("llm", "text", "dedup"))
def q_llm_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus block-level dedup: blocks of {LINE_BLOCK_WORDS}
    words that appear in >= LINE_BOILERPLATE_DF distinct documents are
    boilerplate and are removed from every document; each document is
    rewritten from its surviving blocks in order (the rewritten text is
    hash-checked via md5).

    Three-stage plan, each stage's shuffle bounded by design: (1) the
    document-frequency aggregate shuffles only (digest, doc_id); (2)
    the boilerplate membership join is digest-keyed (AQE splits the
    hot banner digests); (3) the rewrite groupBy(doc_id) shuffles the
    corpus once — the linear, unavoidable cost of producing a
    rewritten corpus. Generalizes the reference's content-hash frame
    tracing (`iceberg-twist/main.py:92`) from frames to corpus blocks.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    b = (
        spread(docs.filter(F.length("text") > 0), "doc_id")
        .select("doc_id", F.split("text", " ").alias("ws"))
        .select(
            "doc_id",
            F.expr(
                f"""explode(transform(
                        sequence(0, cast(ceil(size(ws) / {LINE_BLOCK_WORDS}.0) as int) - 1),
                        i -> struct(
                            cast(i as bigint) as pos,
                            array_join(slice(ws, i * {LINE_BLOCK_WORDS} + 1,
                                             {LINE_BLOCK_WORDS}), ' ') as block)))"""
            ).alias("s"),
        )
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.block").alias("block"))
        .withColumn("bh", F.md5("block"))
    )
    bp = (
        b.groupBy("bh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= LINE_BOILERPLATE_DF)
        .select("bh", F.lit(True).alias("is_bp"))
    )
    flagged = b.join(bp, "bh", "left").withColumn(
        "is_bp", F.coalesce("is_bp", F.lit(False))
    )
    surviving = F.filter(
        F.array_sort(F.collect_list(F.struct("pos", "block", "is_bp"))),
        lambda s: ~s["is_bp"],
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.col("is_bp").cast("int")).cast("long").alias("n_boilerplate"),
        F.md5(
            F.array_join(F.transform(surviving, lambda s: s["block"]), " ")
        ).alias("cleaned_md5"),
    )
