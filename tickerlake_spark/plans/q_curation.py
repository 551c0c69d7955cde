"""Corpus-curation queries: the remaining large-scale training-data
pipeline stages — boilerplate span removal, domain mixture resampling,
model-based quality scoring, and fixed-token-budget shard packing.

These complement the dedup/ANN/text-analysis families in ``q_llm.py``:
together they cover the standard curation chain (RefinedWeb/CCNet-style
line dedup -> quality classifier -> temperature-weighted domain mixing ->
shard packing for the training loader).

Scale notes (the plans are shaped for 100 TB, not just the test SF):
- q121 never shuffles document text by content: only (doc_id, pos, md5)
  triples move through the frequency shuffle; the reconstruction joins a
  tiny bad-position table back to the doc-partitioned corpus.
- q122's per-source rate table is a broadcast of a tiny aggregate; the
  fact table is touched by exactly one map-side-combined groupBy.
- q123 is pure JVM expression work — zero shuffles, zero UDFs.
- q124 computes a corpus-wide running token total WITHOUT a global sort:
  two-level distributed prefix-sum (per-bucket window + broadcast bucket
  offsets); the only single-partition window runs over the 64-row bucket
  summary. The oracle is the straightforward single-window formulation.

Determinism across engines:
- selection uses a Knuth multiplicative hash of doc_id
  (``((doc_id mod 2^31) * 2654435761) mod 2^32`` — the mod-2^31 reduction
  keeps the product inside BIGINT at any corpus size) instead of engine
  RNG — both
  engines evaluate it exactly in BIGINT arithmetic;
- u = h / 2^32 is an exact double (numerator < 2^53, power-of-two
  divisor), so threshold comparisons agree bit-for-bit;
- all integer sums in the oracles are CAST to BIGINT (DuckDB widens to
  HUGEINT, which pandas renders as float64 and breaks the driver hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round
from tickerlake_spark.plans.catalog import load_table, register

# Exactly 8 words so it forms one whole chunk under the 8-word chunking.
_BOILER = "subscribe now to our daily newsletter for updates"

_BOILER_CORPUS_SQL = f"""
corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN '{_BOILER} ' || text ELSE text END AS text
  FROM documents
)"""


def _boiler_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a shared 8-word boilerplate header prepended to every
    7th doc — the repeated span q121 must find and strip."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit(_BOILER + " "), F.col("text"))
        ).otherwise(F.col("text")),
    )


@register(
    "q121_line_dedup",
    doc="RefinedWeb/CCNet-style repeated-span removal: chunk each doc into "
    "8-word spans, count span frequency corpus-wide (by md5 — only 32-byte "
    "hashes shuffle, never text), drop spans occurring >= 3 times, and "
    "reassemble the surviving text in order. The boilerplate header "
    "injected on every 7th doc is exactly what gets stripped.",
    oracle=f"""
WITH {_BOILER_CORPUS_SQL},
chunked AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM corpus
),
spans AS (
  SELECT doc_id,
         i AS pos,
         array_to_string(words[8*i+1 : 8*i+8], ' ') AS chunk
  FROM chunked, unnest(range(0, CAST(ceil(len(words) / 8.0) AS BIGINT))) AS u(i)
),
freq AS (
  SELECT md5(chunk) AS chunk_md5, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM spans GROUP BY md5(chunk)
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN f.cnt >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       coalesce(
         string_agg(s.chunk, ' ' ORDER BY s.pos) FILTER (WHERE f.cnt < 3),
         '') AS kept_text
FROM spans s JOIN freq f ON md5(s.chunk) = f.chunk_md5
GROUP BY s.doc_id
""",
)
def q121_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.curation import strip_repeated_spans

    return strip_repeated_spans(
        _boiler_corpus(spark, sf_dir), span_words=8, min_freq=3
    )


@register(
    "q122_domain_mixture_sample",
    doc="Temperature-weighted domain mixing (LLaMA/Pile-style): per-source "
    "sampling rates r_s = min(1, T * w_s / tokens_s) with "
    "w_s proportional to tokens_s^0.5 and T = 30% of the corpus token "
    "budget; doc selection by multiplicative-hash threshold, not RNG. The "
    "rate table is a broadcast of a tiny aggregate; the fact table sees one "
    "map-side-combined groupBy.",
    oracle="""
WITH tok AS (
  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
src AS (
  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens
  FROM tok GROUP BY source
),
tot AS (
  SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
         SUM(sqrt(CAST(src_tokens AS DOUBLE))) AS denom
  FROM src
),
rate AS (
  SELECT source, src_tokens,
         LEAST(1.0,
           0.3 * total_tokens * sqrt(CAST(src_tokens AS DOUBLE)) / denom
             / src_tokens) AS r
  FROM src, tot
),
sel AS (
  SELECT t.source, t.n_tok, r.r,
         ((CAST(t.doc_id AS BIGINT) % 2147483648) * 2654435761 % 4294967296)
           / 4294967296.0 AS u
  FROM tok t JOIN rate r USING (source)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN u < r THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       round(MIN(r) + 5e-9, 6) AS sample_rate,
       CAST(SUM(CASE WHEN u < r THEN n_tok ELSE 0 END) AS BIGINT)
         AS tokens_selected
FROM sel
GROUP BY source
""",
)
def q122_domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.curation import mixture_rates, selector_u

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    rate = mixture_rates(docs, alpha=0.5, budget_frac=0.3)
    sel = tok.join(F.broadcast(rate), "source").withColumn("u", selector_u())
    return sel.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("u") < F.col("r"), 1).otherwise(0)).alias("n_selected"),
        stable_round(F.min("r"), 6).alias("sample_rate"),
        F.sum(F.when(F.col("u") < F.col("r"), F.col("n_tok")).otherwise(0)).alias(
            "tokens_selected"
        ),
    )


# single source of truth for the classifier's lexicon: the operator's list,
# so the oracle SQL below can never drift from the Spark-side weights
from tickerlake_spark.operators.curation import STOPWORDS_QUALITY as _STOPWORDS


@register(
    "q123_quality_classifier",
    doc="Model-based quality scoring (fastText-style linear classifier "
    "with fixed published weights): stopword ratio, type-token ratio, "
    "log-length, and mean word length through a sigmoid. Pure JVM "
    "expression work — zero shuffles, zero UDFs; at 100 TB this is a "
    "map-only pass that rides whole-stage codegen.",
    oracle=f"""
WITH feats AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(len(list_filter(string_split(text, ' '),
              w -> list_contains({_STOPWORDS!r}, w))) AS BIGINT) AS n_stop,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
         CAST(length(text) AS BIGINT) AS n_char
  FROM documents
),
scored AS (
  SELECT doc_id, n_tok,
         -2.0 + 0.9 * ln(1 + n_tok)
              + 1.5 * (CAST(n_stop AS DOUBLE) / n_tok)
              + 2.0 * (CAST(n_uniq AS DOUBLE) / n_tok)
              - 0.1 * (CAST(n_char - n_tok + 1 AS DOUBLE) / n_tok) AS z
  FROM feats
)
SELECT doc_id, n_tok,
       round(1.0 / (1.0 + exp(-z)) + 5e-9, 6) AS quality_score,
       1.0 / (1.0 + exp(-z)) >= 0.5 AS keep
FROM scored
""",
)
def q123_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.curation import quality_score

    scored = quality_score(load_table(spark, sf_dir, "documents"), threshold=0.5)
    return scored.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        stable_round(F.col("quality_z"), 6).alias("quality_score"),
        "keep",
    )


_SHARD_BUDGET = 2000  # tokens per training shard
_N_BUCKETS_SHIFT = 26  # h in [0, 2^32) >> 26 -> 64 range-ordered buckets


@register(
    "q124_shard_assignment",
    doc="Fixed-token-budget shard packing for a training loader: "
    "deterministically shuffle docs by multiplicative hash, then assign "
    "each doc to the shard its running token offset falls in. Computed as "
    "a two-level distributed prefix-sum — per-bucket window cumsum plus "
    "broadcast bucket offsets — so there is NO global sort: the only "
    "single-partition window runs over the 64-row bucket summary. (The "
    "oracle is the naive single-window formulation.) At 100 TB, raise the "
    "bucket count by lowering the shift; the fact shuffles exactly once, "
    "on the bucket key.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         (CAST(doc_id AS BIGINT) % 2147483648) * 2654435761 % 4294967296 AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
runtot AS (
  SELECT doc_id, h, n_tok,
         CAST(SUM(n_tok) OVER (ORDER BY h, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_through
  FROM tok
)
SELECT doc_id, n_tok, tokens_through,
       (tokens_through - n_tok) // {_SHARD_BUDGET} AS shard_id
FROM runtot
""",
)
def q124_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.curation import assign_shards

    return assign_shards(
        load_table(spark, sf_dir, "documents"),
        shard_budget=_SHARD_BUDGET,
        bucket_shift=_N_BUCKETS_SHIFT,
    )


_H_SQL = "((CAST(doc_id AS BIGINT) % 2147483648) * 2654435761 % 4294967296)"


@register(
    "q125_weighted_sample",
    doc="Weighted sampling without replacement (Efraimidis-Spirakis A-ES): "
    "each doc gets key ln(u)/w with w = its token count and u the "
    "deterministic hash selector shifted off zero; the top-50 keys ARE a "
    "w-weighted sample. One scan + TakeOrderedAndProject — the "
    "distributed-reservoir plan (per-partition heaps, driver merge), no "
    "global sort, no RNG state. Oracle mirrors the key arithmetic; "
    "ranking is by the RAW key (output key rounded for display only).",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         ln(({_H_SQL} + 0.5) / 4294967296.0)
           / len(string_split(text, ' ')) AS k
  FROM documents
)
SELECT doc_id, n_tok, ROUND(k + 5e-9, 6) AS sample_key
FROM keyed
ORDER BY k DESC, doc_id ASC
LIMIT 50
""",
)
def q125_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.curation import selector_h

    n_tok = F.size(F.split("text", " ")).cast("long")
    # u shifted half a grid step off zero: doc_id 0 hashes to h=0, and
    # ln(0) is -Infinity — the shift keeps u in (0,1) exactly on both
    # engines ((h + 0.5)/2^32 is an exact double)
    u = (selector_h("doc_id").cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    keyed = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        n_tok.alias("n_tok"),
        (F.log(u) / n_tok).alias("k"),
    )
    return (
        keyed.orderBy(F.col("k").desc(), F.col("doc_id").asc())
        .limit(50)
        .select("doc_id", "n_tok", stable_round(F.col("k"), 6).alias("sample_key"))
    )


@register(
    "q126_train_split",
    doc="Deterministic train/val/test assignment (80/10/10 by the hash "
    "selector — stable across reruns, no RNG, documents never migrate "
    "between splits as the corpus grows) with per-(source, split) doc and "
    "token counts. Map-only assignment + one map-side-combined groupBy.",
    oracle=f"""
WITH assigned AS (
  SELECT source,
         CASE WHEN {_H_SQL} / 4294967296.0 < 0.8 THEN 'train'
              WHEN {_H_SQL} / 4294967296.0 < 0.9 THEN 'val'
              ELSE 'test' END AS split,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
)
SELECT source, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY source, split
""",
)
def q126_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.curation import selector_u

    u = selector_u("doc_id")
    assigned = load_table(spark, sf_dir, "documents").select(
        "source",
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias(
            "split"
        ),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    return assigned.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
