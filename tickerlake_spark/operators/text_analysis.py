"""Document text analysis: quality scoring, language ID, token counting,
fingerprinting.

All pure SQL expressions (functions/text.py) — these are per-row maps with
no shuffle at all; over 100 TB they run at parquet scan speed with column
pruning (only ``text`` + id are read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tickerlake_spark.functions.text import PUNCT_CLASS, STOPWORDS, h60, tokens

__all__ = ["text_stats", "detect_language", "fingerprint", "repetition_stats"]


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: lengths, token stats, punctuation/stopword/
    uppercase ratios, and a composite quality flag.

    The thresholds mirror common pretraining-corpus filters (C4/Gopher
    style): docs that are too short, punctuation-heavy, or stopword-free
    are flagged low quality.
    """
    toks = tokens(text_col)
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    n_upper = F.length(F.regexp_replace(t, "[^A-Z]", ""))
    en_stop = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(en_stop, x)))
    avg_token_len = (F.length(F.regexp_replace(F.lower(F.trim(t)), r"\s+", ""))) / n_tokens
    stop_ratio = n_stop / n_tokens
    punct_ratio = n_punct / n_chars
    quality = (
        (n_tokens >= 10)
        & (punct_ratio <= 0.2)
        & (avg_token_len.between(2.0, 12.0))
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        (n_upper / n_chars).alias("upper_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("is_quality"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_rep_2gram: float = 0.3,
    max_rep_3gram: float = 0.2,
) -> DataFrame:
    """Within-document repetition ratios — the Gopher/FineWeb-style signal
    that catches boilerplate and degenerate generation loops that per-token
    stats (text_stats) miss.

    rep_ngram_k = 1 − distinct_k_grams / total_k_grams (0 = no repetition).
    ``is_repetitious`` flags docs whose 2-gram or 3-gram ratio exceeds the
    thresholds.

    The gram build + distinct is the most CPU-heavy per-row map in the text
    family, and document tables are byte-small relative to that CPU cost —
    a single parquet split would serialize the whole corpus onto one core.
    Explicit-width repartition spreads it (same convention as the dedup
    shingle stages); measured 7x at sf0.01, and at 100 TB the one narrow
    shuffle is noise next to the gram work it parallelizes.
    """
    sc = df.sparkSession.sparkContext
    df = df.repartition(sc.defaultParallelism)

    def grams(toks: Column, n: int) -> Column:
        # guard: Spark's sequence(0, m) runs DESCENDING for m < 0, so docs
        # shorter than n tokens need an explicit empty gram list
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def ratio(g: Column) -> Column:
        return F.when(
            F.size(g) > 0,
            1.0 - F.size(F.array_distinct(g)) / F.size(g).cast("double"),
        ).otherwise(F.lit(0.0))

    # Staged projections, one expensive expression per column per stage.
    # A single flat select re-evaluates each gram build wherever its ratio
    # is referenced (HOFs run outside whole-stage codegen, so no CSE) —
    # tokenizing and gram-building 2-3x per row. Staging keeps each
    # computed once: measured 6.7s -> 1.0s at sf0.1 on the q56 face.
    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    grammed = toked.select(
        id_col,
        grams(F.col("__toks"), 2).alias("__g2"),
        grams(F.col("__toks"), 3).alias("__g3"),
    )
    ratios = grammed.select(
        id_col,
        ratio(F.col("__g2")).alias("rep_2gram"),
        ratio(F.col("__g3")).alias("rep_3gram"),
    )
    return ratios.select(
        id_col,
        "rep_2gram",
        "rep_3gram",
        (
            (F.col("rep_2gram") > max_rep_2gram)
            | (F.col("rep_3gram") > max_rep_3gram)
        ).alias("is_repetitious"),
    )


def detect_language(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-lexicon language heuristic: score = fraction of tokens that
    are stopwords of each language; pick the argmax (ties broken by language
    code ascending), 'und' when nothing matches.
    """
    langs = sorted(STOPWORDS)
    # Staged projections (same rationale as repetition_stats): the argmax
    # chain below references each language's score up to 3x, and un-staged
    # that re-runs the token filter each time (HOFs get no codegen CSE).
    # Tokenize once, score each language once, then argmax over plain
    # column references. Explicit-width repartition: the documents table is
    # byte-small but CPU-heavy, and one parquet split would serialize the
    # whole corpus onto a single core.
    sc = df.sparkSession.sparkContext
    toked = df.repartition(sc.defaultParallelism).select(
        F.col(id_col), tokens(text_col).alias("__toks")
    )
    scored = toked.select(
        id_col,
        *[
            (
                F.size(
                    F.filter(
                        F.col("__toks"),
                        lambda x: F.array_contains(
                            F.array([F.lit(w) for w in STOPWORDS[lang]]), x
                        ),
                    )
                )
                / F.size("__toks")
            ).alias(f"__s_{lang}")
            for lang in langs
        ],
    )
    # argmax with deterministic ascending-code tie-break: strictly-greater
    # comparison in code order
    best_lang: Column = F.lit("und")
    best_score: Column = F.lit(0.0)
    for lang in langs:
        s = F.col(f"__s_{lang}")
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return scored.select(
        F.col(id_col),
        best_lang.alias("detected_lang"),
        best_score.alias("lang_score"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document fingerprints: full-content md5, 60-bit content hash, and a
    5-char rolling-shingle distinct count (content-defined signature used
    for containment checks)."""
    # single-split parallelism guard, same convention as repetition_stats
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    t = F.col(text_col)
    norm = F.lower(F.trim(t))
    # guard: Spark's sequence(1, n) runs DESCENDING for n < 1, so short texts
    # need an explicit empty array
    char_shingles = F.when(
        F.length(norm) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - 4),
            lambda i: norm.substr(i, F.lit(5)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col),
        F.md5(t).alias("content_md5"),
        h60(norm).alias("content_h60"),
        F.size(F.array_distinct(char_shingles)).cast("long").alias("distinct_shingles_5"),
    )
