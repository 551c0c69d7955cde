"""Bloom-filter semi-join reduction — runtime filter pushdown, explicit.

The 100 TB join problem: a fact-side shuffle carries every row to the
join, even when the dim side's key set would reject most of them. Spark's
AQE can inject a runtime bloom filter (``spark.sql.optimizer.runtime
.bloomFilter.enabled``), but only when cost heuristics fire and with
engine-internal hash functions no oracle can replay. This operator makes
the reduction explicit and deterministic:

1. ``bloom_words``  — aggregate the dim side's join keys into an m-bit
   filter stored as ``m/32`` 32-bit words (held in BIGINTs so the bit
   arithmetic is sign-safe in every engine): k row-salted h60 hashes per
   key, ``bit_or`` of the corresponding word masks. Distributed, one hash
   agg; the result is at most ``m/32`` rows.
2. ``bloom_literal`` — collect those words into a dense Python list
   (bounded: m = 2^16 bits -> 2048 longs; the k-means-centroid bounded-
   collect contract). For much larger m, keep the words as a broadcast
   join instead of a literal.
3. ``bloom_might_contain`` — a pure map-side JVM expression testing the k
   bits against the literal array: the fact scan drops non-matching rows
   BEFORE any exchange, which is the entire point. No Python, no shuffle,
   whole-stage codegen.

False positives pass the bloom and are eliminated by the real join that
follows — so correctness never depends on the filter; only the shuffled
row count does. FP rate ~ (1 - e^(-k*n/m))^k; m=2^16, k=4 holds < 2.4%
to n=4096 keys.

Cross-engine verifiable: every quantity (positions, words, membership) is
h60 + integer bit arithmetic — a DuckDB oracle reproduces the filter
decisions bit-for-bit (see q147's oracle SQL).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_words",
    "bloom_literal",
    "bloom_might_contain",
    "bloom_prune",
]

WORD_BITS = 32  # 32 bits per word keeps every shift below any sign bit


def _mask(pos: Column) -> Column:
    """``1L << (pos % 32)`` — via call_function because the Python
    shiftleft wrapper only accepts a literal shift amount."""
    return F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        F.pmod(pos, F.lit(WORD_BITS)).cast("int"),
    )


def _positions(key: Column, j: int, m_bits: int) -> Column:
    from tickerlake_spark.functions.text import h60

    return F.pmod(
        h60(F.concat(F.lit(str(j)), F.lit(":"), key.cast("string"))),
        F.lit(m_bits),
    )


def bloom_words(
    dim: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 4
) -> DataFrame:
    """Sparse (wi, word) bloom words over the dim side's distinct keys —
    one explode(k) + distinct + ``bit_or`` hash agg, fully distributed."""
    pos = (
        dim.select(
            F.explode(
                F.array(
                    *[
                        _positions(F.col(key_col), j, m_bits)
                        for j in range(k)
                    ]
                )
            ).alias("p")
        )
        .distinct()
    )
    return pos.groupBy(
        (F.col("p") / WORD_BITS).cast("int").alias("wi")
    ).agg(F.bit_or(_mask(F.col("p"))).alias("word"))


def bloom_literal(
    dim: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 4
) -> list[int]:
    """Dense word list of length m_bits/32 (absent words are 0)."""
    dense = [0] * (m_bits // WORD_BITS)
    for row in bloom_words(dim, key_col, m_bits, k).collect():
        dense[row["wi"]] = int(row["word"])
    return dense


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int = 1 << 16, k: int = 4
) -> Column:
    """Map-side membership test: AND over the k salted bit probes."""
    arr = F.lit(words)
    conds = []
    for j in range(k):
        p = _positions(key, j, m_bits)
        word = F.element_at(arr, (p / WORD_BITS).cast("int") + F.lit(1))
        conds.append(word.bitwiseAND(_mask(p)) != 0)
    return reduce(lambda a, b: a & b, conds)


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """The production path: filter the fact scan by the dim side's bloom
    before any shuffle. Follow with the real join — the bloom only
    reduces shuffled volume, never decides membership."""
    words = bloom_literal(dim, dim_key, m_bits, k)
    return fact.filter(bloom_might_contain(F.col(key_col), words, m_bits, k))
