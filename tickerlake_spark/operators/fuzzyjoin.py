"""Fuzzy string join: segment-blocked candidate generation + edit-distance
verify (entity resolution / record linkage).

The naive fuzzy join is O(|L| x |R|) levenshtein calls — dead at any scale.
Two candidate-generation strategies, both exact-recall for
SUBSTITUTION-ONLY edits (the dominant dirty-data mode for fixed-format
keys: typos in ids, OCR digit flips), both equi-joins on a blocking key —
linear in the postings, no all-pairs product anywhere — with only
candidates paying the levenshtein verify:

- ``strategy="segments"`` — PassJoin (Li, Deng, Feng 2011): split every
  string into ``k+1`` contiguous segments; by pigeonhole, two strings
  within substitution distance ``k`` agree exactly on >= 1 segment at the
  same position. Cheapest postings (k+1 rows/record), but a LOW-ENTROPY
  segment (a constant prefix — zero-padded ids at scale) is shared by the
  whole population and its bucket join goes quadratic. Measured: fine at
  15k keys, OOM at 150k (tools/bench_scale.py, round 4).
- ``strategy="masks"`` — symmetric-mask blocking (the SymSpell /
  delete-neighborhood idea adapted to substitutions): emit the string
  with every k-subset of positions replaced by a sentinel; two
  equal-length strings are within Hamming distance k IFF they share a
  k-mask variant. C(L, k) postings per record (36 for L=9, k=2), but a
  bucket's size is the count of strings agreeing on ALL unmasked
  characters — constant regions mask out and the remaining entropy keeps
  buckets tame. The robust default for fixed-format keys.

General insert/delete support needs shifted segment probes (the full
PassJoin); documented as the extension point rather than implemented —
every downstream user here joins fixed-format keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["segment_postings", "mask_postings", "fuzzy_substitution_join"]


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


_SENTINEL = "\x01"


def mask_postings(df: DataFrame, col: str, id_col: str, k: int) -> DataFrame:
    """(id, len, seg_i=-1, seg) — every k-subset-masked variant of the
    string (positions replaced by a sentinel). Supports k in {1, 2}."""
    c = F.col(col)
    length = F.length(c)
    if k == 1:
        variants = F.transform(
            F.sequence(F.lit(1), length),
            lambda i: F.concat(
                c.substr(F.lit(1), i - 1), F.lit(_SENTINEL), c.substr(i + 1, length)
            ),
        )
    elif k == 2:
        # nested HOFs: for i < j, mask both; inner nulls filtered (sequence
        # is never built descending — j ranges the full length, guarded)
        variants = F.filter(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), length),
                    lambda i: F.transform(
                        F.sequence(F.lit(1), length),
                        lambda j: F.when(
                            j > i,
                            F.concat(
                                c.substr(F.lit(1), i - 1),
                                F.lit(_SENTINEL),
                                c.substr(i + 1, j - i - 1),
                                F.lit(_SENTINEL),
                                c.substr(j + 1, length),
                            ),
                        ),
                    ),
                )
            ),
            lambda x: x.isNotNull(),
        )
    else:
        raise ValueError(f"mask strategy supports k in (1, 2), got {k}")
    return df.select(
        F.col(id_col).alias("id"),
        length.alias("len"),
        F.lit(-1).alias("seg_i"),
        F.explode(variants).alias("seg"),
    )


def fuzzy_substitution_join(
    left: DataFrame,
    right: DataFrame,
    col: str,
    left_id: str,
    right_id: str,
    k: int = 2,
    strategy: str = "masks",
) -> DataFrame:
    """(left_id, right_id, distance): pairs within levenshtein distance
    ``k`` (``strategy="segments"``) or Hamming distance ``k``
    (``strategy="masks"`` — for equal lengths every Hamming<=k pair also
    has levenshtein<=k, so the verify filters only sentinel collisions);
    exact recall for substitution-only edits under both.

    Plan: two posting projections -> equi-join on (seg_i, len, seg) ->
    distinct candidate pairs (ids only) -> fetch the two strings ->
    levenshtein verify. The verify set is the only place full strings
    pair up.
    """
    if strategy == "segments":
        lp = segment_postings(left.select(left_id, col), col, left_id, k)
        rp = segment_postings(right.select(right_id, col), col, right_id, k)
    elif strategy == "masks":
        lp = mask_postings(left.select(left_id, col), col, left_id, k)
        rp = mask_postings(right.select(right_id, col), col, right_id, k)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
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
