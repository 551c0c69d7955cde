"""Product quantization (PQ) over embedding columns.

The reference has no vector compression; at 100 TB an embedding table
(64-1024 float dims per row) is usually the single largest asset in a
training-data lake, and PQ (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search") is the standard scale answer: split each vector
into ``m`` subspaces, k-means each subspace independently, and store one
small code per subspace — 64 dims of float64 (512 B) become 4 bytes at
m=4/k<=256, a ~128x shrink, while asymmetric-distance (ADC) scans rank
candidates without ever touching the original vectors.

Execution shape (everything map-side after training):

- training is one JOINT Lloyd's loop over all ``m`` subspaces (one scan +
  one k x dim shuffle per iteration; see ``pq_fit``) — the driver holds
  m x k x (dim/m) rounded doubles (bounded);
- encoding is ``m`` argmin folds against broadcast codebook literals — no
  shuffle, no join, whole-stage codegen;
- an ADC query computes its m x k distance table ON THE DRIVER (bounded),
  ships it as array literals, and scores every row with m array lookups
  plus m-1 additions — the scan reads ONLY the code columns, so a top-k
  over 100 TB of vectors touches a few bytes per row;
- exact re-rank (optional) joins the shortlist back to the vector table by
  id — candidates only, same discipline as the LSH/IVF paths in
  ``operators/similarity.py``.

Cross-engine determinism: codebooks inherit ``kmeans_fit``'s contract
(6dp-rounded centroids per iteration, index-order distance folds, cell-asc
tie-breaks), encoding uses the same ``_argmin_cell`` sequential fold the SQL
oracle's ``list_aggregate`` computes, and the driver-side distance table is
produced by the very same Python fold as ``clustering.nearest_cells`` — so
ADC scores are bit-comparable against a DuckDB unroll (see
``plans/q_lm.py::q127_pq_adc_ann``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tickerlake_spark.operators.clustering import _argmin_cell

__all__ = ["pq_fit", "pq_encode", "adc_distance", "seq_d2"]


def seq_d2(q: list[float], c: list[float]) -> float:
    """Driver-side squared L2 in the SAME sequential IEEE-double fold as the
    Spark/SQL assignment expressions (single copy shared with the ADC table
    builder; see ``clustering.nearest_cells`` for the rationale)."""
    s = 0.0
    for x, y in zip(q, c):
        s += (x - y) * (x - y)
    return s


def _sub(vec: Column, s: int, sub_dim: int) -> Column:
    """Subspace ``s`` of a vector column (1-based slice, like DuckDB's
    ``e[lo:hi]``)."""
    return F.slice(vec, s * sub_dim + 1, sub_dim)


def pq_fit(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "v",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> list[list[list[float]]]:
    """Train ``m`` per-subspace codebooks; returns ``codebooks[s][code]`` as
    rounded doubles. ``dim`` must be divisible by ``m``.

    The ``m`` k-means runs are independent (subspaces never interact), so
    they are fused into ONE joint Lloyd's loop: each iteration is a single
    job computing all ``m`` argmin assignments map-side and one
    ``(subspace, cell, pos)``-keyed mean update — one scan and one
    k x dim-sized shuffle per iteration instead of ``m`` of each. At 100 TB
    that is the difference between reading the training sample once or
    ``m`` times per iteration. Produces codebooks identical to training
    each subspace separately under ``kmeans_fit``'s determinism contract
    (rounded centroids each iteration, index-order folds, cell-asc ties,
    empty cells keep their previous codeword) — the q127/q130 oracles pin
    this equivalence against per-subspace SQL unrolls.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    from pyspark import StorageLevel

    from tickerlake_spark.functions.core import stable_round

    from tickerlake_spark.operators.clustering import _trainer_width

    base = df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    base = (
        base
        # same parallelism/persist rationale as kmeans_fit: pay the scan
        # once, keep the O(m x k x sub_dim) E-step off a 2-split file;
        # size-adaptive width (r12) so toy samples stop paying a full
        # cluster width of task overhead per Lloyd round
        .repartition(_trainer_width(base))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        init_rows = sorted(
            base.orderBy(F.col(id_col).asc()).limit(k).select(id_col, "v").collect(),
            key=lambda r: r[id_col],
        )
        codebooks: list[list[list[float]]] = [
            [list(r["v"][s * sub_dim : (s + 1) * sub_dim]) for r in init_rows]
            for s in range(m)
        ]
        for _ in range(iters):
            assigned = base
            for s in range(m):
                assigned = assigned.withColumn(
                    f"__c{s}", _argmin_cell(_sub(F.col("v"), s, sub_dim), codebooks[s])
                )
            cells = F.array(*[F.col(f"__c{s}") for s in range(m)])
            sub_ix = (F.col("gpos") / sub_dim).cast("int")
            ev = assigned.select(
                cells.alias("__cs"), F.posexplode("v").alias("gpos", "val")
            ).select(
                sub_ix.alias("sub"),
                F.element_at("__cs", sub_ix + 1).alias("cell"),
                (F.col("gpos") % sub_dim).alias("pos"),
                "val",
            )
            rows = (
                ev.groupBy("sub", "cell", "pos")
                .agg(stable_round(F.avg("val"), decimals).alias("val"))
                .collect()  # bounded: m x k x sub_dim rounded doubles
            )
            by: dict[tuple[int, int], dict[int, float]] = {}
            for r in rows:
                by.setdefault((r["sub"], r["cell"]), {})[r["pos"]] = r["val"]
            codebooks = [
                [
                    [by[(s, c)][p] for p in sorted(by[(s, c)])]
                    if (s, c) in by
                    else prev
                    for c, prev in enumerate(codebooks[s])
                ]
                for s in range(m)
            ]
        return codebooks
    finally:
        base.unpersist(blocking=False)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "v",
    code_prefix: str = "code_",
) -> DataFrame:
    """Append ``code_0..code_{m-1}`` int columns: per-subspace nearest-code
    argmin against broadcast codebook literals. Map-side only; at ingest
    time this is the materialization step that makes every later ADC scan
    read codes instead of vectors."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    out = df
    for s in range(m):
        out = out.withColumn(
            f"{code_prefix}{s}",
            _argmin_cell(_sub(F.col(vec_col), s, sub_dim), codebooks[s]).cast("int"),
        )
    return out


def adc_distance(
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    code_prefix: str = "code_",
) -> Column:
    """Asymmetric-distance expression: approx squared L2 from code columns.

    The m x k distance table is computed here on the driver (bounded) with
    the same sequential fold as the assignment expressions, then embedded as
    ``array<double>`` literals — each row costs m ``element_at`` lookups and
    m-1 additions, in subspace index order (left-associated, matching the
    oracle's ``dt0.d + dt1.d + ...``)."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    expr: Column | None = None
    for s in range(m):
        q_sub = query_vec[s * sub_dim : (s + 1) * sub_dim]
        table = [seq_d2(q_sub, c) for c in codebooks[s]]
        lookup = F.element_at(
            F.lit(table).cast("array<double>"), F.col(f"{code_prefix}{s}") + 1
        )
        expr = lookup if expr is None else expr + lookup
    assert expr is not None
    return expr
