"""Fuzzy string join: segment-blocked candidate generation + edit-distance
verify (entity resolution / record linkage).

The naive fuzzy join is O(|L| x |R|) levenshtein calls — dead at any scale.
This module implements the PassJoin blocking idea (Li, Deng, Feng 2011):
split every string into ``k+1`` contiguous segments; by pigeonhole, two
strings within edit distance ``k`` under SUBSTITUTION-ONLY edits (equal
lengths, positions preserved) must agree EXACTLY on at least one segment at
the same position. Candidates are then an equi-join on
(segment_index, length, segment_text) — linear in the postings — and only
candidates pay the levenshtein verify.

Recall contract: exact for substitution-only distance <= k (the dominant
dirty-data mode for fixed-format keys: typos in ids, OCR digit flips).
General insert/delete support needs shifted segment probes (the full
PassJoin); documented as the extension point rather than implemented —
every downstream user here joins fixed-format keys.

Scale posture: the segment equi-join shuffles (id, seg) postings only
(k+1 rows per record); skew lives in low-entropy segments (constant
prefixes), so block on DISCRIMINATIVE columns — the same rule every ER
system documents. No all-pairs product anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["segment_postings", "fuzzy_substitution_join"]


def segment_postings(
    df: DataFrame, col: str, id_col: str, k: int = 2
) -> DataFrame:
    """(id, seg_i, length, seg) — k+1 equal-split segments per string.

    Boundaries are ``floor(L * i / (k+1))`` so any length splits cleanly;
    length rides in the join key because substitution-only candidates must
    have equal lengths.
    """
    s = k + 1
    segs = [
        F.struct(
            F.lit(i).alias("seg_i"),
            F.expr(
                f"substring({col}, "
                f"cast(floor(length({col}) * {i} / {s}) + 1 as int), "
                f"cast(floor(length({col}) * {i + 1} / {s}) "
                f"- floor(length({col}) * {i} / {s}) as int))"
            ).alias("seg"),
        )
        for i in range(s)
    ]
    return df.select(
        F.col(id_col).alias("id"),
        F.length(col).alias("len"),
        F.explode(F.array(*segs)).alias("sg"),
    ).select("id", "len", F.col("sg.seg_i").alias("seg_i"), F.col("sg.seg").alias("seg"))


def fuzzy_substitution_join(
    left: DataFrame,
    right: DataFrame,
    col: str,
    left_id: str,
    right_id: str,
    k: int = 2,
) -> DataFrame:
    """(left_id, right_id, distance): pairs within levenshtein distance
    ``k``, exact recall for substitution-only edits.

    Plan: two segment-posting projections -> equi-join on
    (seg_i, len, seg) -> distinct candidate pairs (ids only) -> fetch the
    two strings -> levenshtein verify. The verify set is the only place
    full strings pair up.
    """
    lp = segment_postings(left.select(left_id, col), col, left_id, k)
    rp = segment_postings(right.select(right_id, col), col, right_id, k)
    cand = (
        lp.alias("a")
        .join(
            rp.alias("b"),
            (F.col("a.seg_i") == F.col("b.seg_i"))
            & (F.col("a.len") == F.col("b.len"))
            & (F.col("a.seg") == F.col("b.seg")),
        )
        .select(F.col("a.id").alias("__lid"), F.col("b.id").alias("__rid"))
        .distinct()
    )
    ls = left.select(F.col(left_id).alias("__lid"), F.col(col).alias("__ltxt"))
    rs = right.select(F.col(right_id).alias("__rid"), F.col(col).alias("__rtxt"))
    return (
        cand.join(ls, "__lid")
        .join(rs, "__rid")
        .withColumn("distance", F.levenshtein("__ltxt", "__rtxt"))
        .filter(F.col("distance") <= k)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("distance").cast("long").alias("distance"),
        )
    )
