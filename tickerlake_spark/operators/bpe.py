"""BPE tokenizer training (Sennrich et al. 2016), Spark-first.

The tokenizer-training precursor the LM-data pipeline needs beyond q128's
frequency vocabulary: learn ``n_merges`` byte-pair merges from the corpus.

Architecture (the part that matters at 100 TB): the CORPUS is touched
exactly once — one tokenize + word-count aggregation. Training then runs
entirely on the distinct-word table (vocabulary-sized, orders of magnitude
smaller, but kept distributed — web-scale corpora have 1e8+ distinct
words). Each merge iteration is:

1. explode adjacent symbol pairs weighted by word frequency,
2. one hash agg summing pair frequencies (map-side combined),
3. a 1-row argmax collect (freq desc, pair asc — deterministic tie-break),
4. a map-side fold rewriting each word's symbol array, greedy
   left-to-right non-overlapping — the standard BPE apply step — as a
   JVM-side ``aggregate`` higher-order function (no Python UDF),
5. ``localCheckpoint`` to truncate the per-iteration lineage.

Driver state is the merge list (n_merges 2-tuples) — the k-means-centroid
bounded-collect contract. Correctness is pinned against a pure-Python
reference implementation in ``tests/test_llm_operators.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_frequencies", "bpe_train", "merge_pair_expr", "bpe_segment"]

END = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-scale pass."""
    from tickerlake_spark.functions.text import tokens

    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def merge_pair_expr(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) into
    ``a||b`` within a symbol array — pure JVM fold, no Python."""
    merged = a + b
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    return words.select(
        "word",
        "freq",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))).alias("syms"),
    )


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 20
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merges; returns [(left, right, pair_freq), ...]
    in merge order. Stops early if no adjacent pair remains."""
    vocab = _initial_symbols(word_frequencies(df, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> struct(s AS a, element_at(syms, i + 2) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        top = (
            pairs.orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        vocab = vocab.withColumn(
            "syms", merge_pair_expr(F.col("syms"), a, b)
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    word_col: str = "word",
    out_col: str = "syms",
) -> DataFrame:
    """Apply a learned merge list to words: chars+END, then each merge in
    order — n sequential JVM folds, map-side only (the encode path)."""
    syms = F.concat(F.split(F.col(word_col), ""), F.array(F.lit(END)))
    out = df.withColumn(out_col, syms)
    for a, b, _n in merges:
        out = out.withColumn(out_col, merge_pair_expr(F.col(out_col), a, b))
    return out
