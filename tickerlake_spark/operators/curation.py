"""Corpus-curation operators: the row-level building blocks behind the
q121-q124 catalog queries, reusable as a pipeline.

Each function is a pure DataFrame -> DataFrame transform (no writes, no
collects beyond none at all) so they compose into ``run_curation`` — the
document-domain analog of the finance medallion in ``pipeline.py``:

    exact dedup -> near-dup dedup -> repeated-span strip -> quality
    score -> domain mixture sample -> shard assignment -> write

Scale notes are on each function; the common theme is that document TEXT
only ever shuffles by doc_id (or not at all) — frequency/selection state
moves as hashes, positions, and rates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "strip_repeated_spans",
    "mixture_rates",
    "mixture_select",
    "selector_h",
    "selector_u",
    "quality_score",
    "assign_shards",
]

STOPWORDS_QUALITY = ["the", "a", "of", "to", "and", "in", "is", "for"]


def strip_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 8,
    min_freq: int = 3,
) -> DataFrame:
    """RefinedWeb/CCNet-style repeated-span removal (q121's operator).

    Chunks each doc into ``span_words``-word spans, counts span frequency
    corpus-wide, drops spans occurring >= ``min_freq`` times, reassembles
    the survivors in order. Returns (id, n_chunks, n_removed, kept_text).

    Scale shape: only (doc_id, pos, md5) triples move through the
    frequency shuffle — 40 bytes/span regardless of span text; the
    bad-position table is tiny (dup spans only) and broadcasts back to the
    doc-partitioned corpus, so document text never re-shuffles.
    """
    w = span_words
    # Stage the tokenizer: split(text) referenced inside the per-chunk
    # lambda would re-split the full text once per chunk (HOFs get no CSE
    # through lambda bodies — the repo's measured 6x pitfall, see
    # dedup._with_shingles). Bind the words array first, then chunk from
    # the bound attribute: O(words) per doc, not O(words x chunks).
    worded = df.select(id_col, F.split(text_col, " ").alias("__words"))
    chunked = worded.select(
        id_col,
        F.expr(
            f"transform(sequence(0, int(ceil(size(__words) / {w}.0)) - 1),"
            f" i -> array_join(slice(__words, {w}*i + 1, {w}), ' '))"
        ).alias("chunks"),
    )
    spans = chunked.select(
        id_col, F.posexplode("chunks").alias("pos", "chunk")
    ).select(id_col, "pos", F.md5("chunk").alias("chunk_md5"))
    freq = spans.groupBy("chunk_md5").agg(F.count("*").alias("cnt"))
    bad = (
        spans.join(freq.filter(F.col("cnt") >= min_freq), "chunk_md5")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("bad_pos"))
    )
    return chunked.join(bad, id_col, "left").select(
        id_col,
        F.size("chunks").cast("long").alias("n_chunks"),
        F.coalesce(F.size("bad_pos"), F.lit(0)).cast("long").alias("n_removed"),
        F.array_join(
            F.filter(
                "chunks",
                lambda c, i: ~F.coalesce(
                    F.array_contains("bad_pos", i), F.lit(False)
                ),
            ),
            " ",
        ).alias("kept_text"),
    )


def _n_tok(text_col: str) -> Column:
    return F.size(F.split(text_col, " ")).cast("long")


def mixture_rates(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    alpha: float = 0.5,
    budget_frac: float = 0.3,
) -> DataFrame:
    """Per-source temperature sampling rates (q122's rate table):
    r_s = min(1, T * w_s / tokens_s), w_s ∝ tokens_s^alpha,
    T = budget_frac * total tokens. Returns (source, r) — a tiny frame
    meant to be broadcast back onto the corpus.
    """
    def temper(c: Column) -> Column:
        # alpha=0.5 uses sqrt, not pow(x, 0.5): JVM Math.pow is not
        # guaranteed bit-identical to sqrt, and the DuckDB oracle says sqrt
        if alpha == 0.5:
            return F.sqrt(c)
        return F.pow(c, F.lit(alpha))

    tok = df.select(source_col, _n_tok(text_col).alias("__n_tok"))
    src = tok.groupBy(source_col).agg(F.sum("__n_tok").alias("src_tokens"))
    tot = src.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.sum(temper(F.col("src_tokens").cast("double"))).alias("denom"),
    )
    return src.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(budget_frac)
            * F.col("total_tokens")
            * temper(F.col("src_tokens").cast("double"))
            / F.col("denom")
            / F.col("src_tokens"),
        ).alias("r"),
    )


def selector_h(id_col: str = "doc_id") -> Column:
    """Deterministic 32-bit Knuth multiplicative hash of the doc id, exact
    in BIGINT arithmetic on any engine (no RNG state — reruns and engines
    agree bit-for-bit).

    The id is reduced mod 2^31 BEFORE the multiply: (2^31-1) * 2654435761
    < 2^63, so the product never overflows BIGINT — Spark would silently
    wrap negative while DuckDB raises, diverging exactly at the >2 billion
    doc scale this module targets. For ids < 2^31 the reduction is the
    identity, so small-id values are unchanged. Ids 2^31 apart alias to
    the same selector — acceptable for sampling/sharding."""
    return (
        F.pmod(F.col(id_col).cast("long"), F.lit(2147483648).cast("long"))
        * F.lit(2654435761).cast("long")
        % F.lit(4294967296).cast("long")
    )


def selector_u(id_col: str = "doc_id") -> Column:
    """selector_h scaled to uniform-[0,1): exact double (numerator < 2^32,
    power-of-two divisor), so threshold compares agree across engines."""
    return selector_h(id_col) / F.lit(4294967296.0)


def mixture_select(
    df: DataFrame,
    rates: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``df`` selected by the broadcast rate table: keep doc where
    u(doc_id) < r_source. One broadcast join, zero wide shuffles."""
    return df.join(F.broadcast(rates), source_col).filter(
        selector_u(id_col) < F.col("r")
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Fixed-weight linear quality classifier (q123's operator): stopword
    ratio, type-token ratio, log-length, mean word length through a
    sigmoid. Adds (quality_z, keep) to the input columns. Pure JVM
    expression work — a map-only pass."""
    words = F.split(text_col, " ")
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS_QUALITY])
    n_tok = F.size(words).cast("long")
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_lit, w)))
    n_uniq = F.size(F.array_distinct(words))
    n_char = F.length(text_col).cast("long")
    z = (
        F.lit(-2.0)
        + F.lit(0.9) * F.log(F.lit(1) + n_tok)
        + F.lit(1.5) * (n_stop.cast("double") / n_tok)
        + F.lit(2.0) * (n_uniq.cast("double") / n_tok)
        - F.lit(0.1) * ((n_char - n_tok + 1).cast("double") / n_tok)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn("quality_z", score).withColumn(
        "keep", score >= F.lit(threshold)
    )


def assign_shards(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_budget: int = 2000,
    bucket_shift: int = 26,
) -> DataFrame:
    """Fixed-token-budget shard packing (q124's operator): docs are
    deterministically shuffled by multiplicative hash and each lands in the
    shard its running token offset falls in.

    Two-level distributed prefix-sum: per-bucket window cumsum (the fact
    shuffles ONCE, on the bucket key) plus an exclusive prefix over the
    2^(32-shift)-row bucket summary — the only single-partition window.
    No global sort ever touches the corpus. Returns
    (id, n_tok, tokens_through, shard_id).
    """
    tok = df.select(
        id_col,
        selector_h(id_col).alias("h"),
        _n_tok(text_col).alias("n_tok"),
    )
    bucketed = tok.withColumn("bucket", F.shiftright("h", bucket_shift))
    local = bucketed.withColumn(
        "local_cum",
        F.sum("n_tok").over(
            Window.partitionBy("bucket")
            .orderBy("h", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum("n_tok").alias("bucket_tokens"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("bucket_tokens").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .withColumn("tokens_through", F.col("offset") + F.col("local_cum"))
        .select(
            id_col,
            "n_tok",
            "tokens_through",
            F.expr(f"(tokens_through - n_tok) div {shard_budget}").alias(
                "shard_id"
            ),
        )
    )
