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

- ``strategy="deletes"`` — delete-neighborhood blocking (SymSpell; Garbe
  2012): emit every variant reachable by deleting <= k characters. If
  ``levenshtein(a, b) <= k`` then aligning the edit script shows a common
  string reachable by <= k deletions from EACH side (a substitution is a
  delete on both sides; an insert/delete is a delete on one), so the
  variant sets intersect — exact recall for GENERAL edit distance,
  including length-changing insertions/deletions, not just
  substitutions. C(L, <=k) postings per record (46 for L=9, k=2),
  deduped with array_distinct; the verify is full levenshtein.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "segment_postings",
    "mask_postings",
    "delete_postings",
    "fuzzy_substitution_join",
    "fuzzy_best_match",
]


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
    string (positions replaced by a sentinel). Supports k in {1, 2}.

    Strings shorter than k positions can't host a full k-subset; they get
    the single fully-masked variant instead (all positions sentineled) —
    any two equal-length strings of length < k are trivially within
    Hamming distance k, and without this guard the HOF emits an empty
    variants array and F.explode silently DROPS the row (even exact
    duplicates would never pair up).
    """
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
    full_mask = F.array(F.expr(f"repeat(char(1), length({col}))"))
    variants = F.when(length < k, full_mask).otherwise(variants)
    return df.select(
        F.col(id_col).alias("id"),
        length.alias("len"),
        F.lit(-1).alias("seg_i"),
        F.explode(variants).alias("seg"),
    )


def delete_postings(df: DataFrame, col: str, id_col: str, k: int) -> DataFrame:
    """(id, len, seg_i=-2, seg) — every variant reachable by deleting at
    most ``k`` characters, deduped per record. Supports k in {1, 2}.

    This is the blocking side of the SymSpell delete-neighborhood:
    ``levenshtein(a, b) <= k`` implies the delete-variant sets of ``a``
    and ``b`` intersect (substitution = one delete on each side;
    insert/delete = one delete on one side), so an equi-join on the
    variant string has exact recall for GENERAL edit distance — no
    equal-length restriction. ``len`` carries the variant's own length
    (redundant with string equality; kept so all posting shapes share one
    join condition).
    """
    if k not in (1, 2):
        raise ValueError(f"deletes strategy supports k in (1, 2), got {k}")
    c = F.col(col)
    length = F.length(c)
    del1 = F.transform(
        F.sequence(F.lit(1), F.greatest(length, F.lit(1))),
        lambda i: F.concat(c.substr(F.lit(1), i - 1), c.substr(i + 1, length)),
    )
    variants = F.concat(F.array(c), del1)
    if k == 2:
        # delete positions i < j (positions in the ORIGINAL string); the
        # j > i guard nulls the lower triangle, filtered before explode
        del2 = F.filter(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(length, F.lit(1))),
                    lambda i: F.transform(
                        F.sequence(F.lit(1), F.greatest(length, F.lit(1))),
                        lambda j: F.when(
                            (j > i) & (j <= length),
                            F.concat(
                                c.substr(F.lit(1), i - 1),
                                c.substr(i + 1, j - i - 1),
                                c.substr(j + 1, length),
                            ),
                        ),
                    ),
                )
            ),
            lambda x: x.isNotNull(),
        )
        variants = F.concat(variants, del2)
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(variants)).alias("seg"),
    ).select("id", F.length("seg").alias("len"), F.lit(-2).alias("seg_i"), "seg")


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
    ``k``. Recall guarantee depends on the blocking strategy:
    ``"segments"`` and ``"masks"`` are exact for substitution-only edits
    (equal lengths — the dominant dirty-data mode for fixed-format keys);
    ``"deletes"`` is exact for GENERAL edit distance, including
    length-changing insertions and deletions (SymSpell delete
    neighborhood — see module docstring).

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
    elif strategy == "deletes":
        lp = delete_postings(left.select(left_id, col), col, left_id, k)
        rp = delete_postings(right.select(right_id, col), col, right_id, k)
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


def fuzzy_best_match(
    left: DataFrame,
    right: DataFrame,
    col: str,
    left_id: str,
    right_id: str,
    k: int = 2,
    strategy: str = "masks",
    staged: bool = True,
) -> DataFrame:
    """(left_id, right_id, distance): each left record's BEST match
    (min distance, then min right id) — the entity-resolution shape.

    Unlike ``fuzzy_substitution_join`` this never materializes the
    candidate-pair set: the strings ride in the postings (short fixed-
    format keys), the verify runs inside the join, and a single hash
    aggregation takes the per-left-id minimum with MAP-SIDE partial
    combine. Measured at the 10x bench: the pair-set distinct shuffled
    365M rows (62s); the fused min shuffles one partial row per
    (partition, left id) — the duplicate candidates that made distinct
    expensive are collapsed before they ever hit the wire.

    ``staged=True`` (default) escalates the radius: exact match first,
    then Hamming 1, then 2, ... — each stage runs only over the
    still-unmatched left records. A record whose best match sits at
    distance d never enumerates its (vastly larger) radius-k candidate
    ball: at the 10x bench, where every record has a distance-1 match,
    staging skipped the 554M-row Hamming-2 join entirely (81s -> ~10s).
    Identical results to the single-pass form — the first stage that
    finds a match holds the minimum distance by construction.
    """
    if staged and k > 0:
        remaining = left.select(left_id, col).localCheckpoint(eager=True)
        outs = []
        for d in range(0, k + 1):
            if d == 0:
                r_min = right.groupBy(col).agg(F.min(right_id).alias(right_id))
                m = remaining.join(r_min, col).select(
                    left_id, right_id, F.lit(0).cast("long").alias("distance")
                )
            else:
                m = fuzzy_best_match(
                    remaining, right, col, left_id, right_id,
                    k=d, strategy=strategy, staged=False,
                )
            m = m.localCheckpoint(eager=True)
            outs.append(m)
            if d < k:
                remaining = remaining.join(
                    m.select(left_id), left_id, "left_anti"
                ).localCheckpoint(eager=True)
                if remaining.isEmpty():
                    break
        out = outs[0]
        for m in outs[1:]:
            out = out.unionByName(m)
        return out

    post = {
        "masks": mask_postings,
        "segments": segment_postings,
        "deletes": delete_postings,
    }[strategy]
    # ride the string along in the postings for free by packing (id, text)
    # into a struct used AS the id — no join-back, no extra shuffle
    lpk = left.select(
        F.struct(F.col(left_id).alias("i"), F.col(col).alias("t")).alias("__p"),
        F.col(col),
    )
    rpk = right.select(
        F.struct(F.col(right_id).alias("i"), F.col(col).alias("t")).alias("__p"),
        F.col(col),
    )
    lp = post(lpk, col, "__p", k)
    rp = post(rpk, col, "__p", k)
    joined = (
        lp.alias("a")
        .join(
            rp.alias("b"),
            (F.col("a.seg_i") == F.col("b.seg_i"))
            & (F.col("a.len") == F.col("b.len"))
            & (F.col("a.seg") == F.col("b.seg")),
        )
        .select(
            F.col("a.id.i").alias("__lid"),
            F.col("b.id.i").alias("__rid"),
            F.levenshtein(F.col("a.id.t"), F.col("b.id.t")).alias("__d"),
        )
        .filter(F.col("__d") <= k)
    )
    best = joined.groupBy("__lid").agg(
        F.min(F.struct(F.col("__d"), F.col("__rid"))).alias("__best")
    )
    return best.select(
        F.col("__lid").alias(left_id),
        F.col("__best.__rid").alias(right_id),
        F.col("__best.__d").cast("long").alias("distance"),
    )
