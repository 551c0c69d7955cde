"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k against a query vector — the
  baseline. One broadcast of the query vector, one scan, one top-k. At
  100 TB this is a full scan but embarrassingly parallel; use it to ground-
  truth the approximate paths.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing — candidates share the
  query's sign-pattern bucket (optionally within Hamming radius 1), exact
  re-rank inside. Turns the scan into a partition-pruned lookup when the
  bucket column is materialized + the table is clustered by bucket.
- ``ivf_topk``: IVF-style two-stage search with hash-derived centroids:
  probe the nearest ``n_probe`` of ``n_cells`` coarse cells, exact re-rank
  within. The cell assignment is a deterministic expression, so the cell
  column can be precomputed at ingest and used as a partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tickerlake_spark.functions.text import MINHASH_PRIME
from tickerlake_spark.functions.vector import as_double_array, cosine_similarity

__all__ = ["brute_force_topk", "lsh_ann_topk", "ivf_topk", "hyperplane_bucket"]


def _plane_coef(plane: int | Column, dim: Column) -> Column:
    """Deterministic pseudo-random plane coefficient in [-0.5, 0.5):
    hash-derived, identical across engines/runs (no RNG state)."""
    from tickerlake_spark.functions.text import h60

    h = h60(F.concat_ws(":", F.lit("plane"), plane.cast("string"), dim.cast("string")))
    return (h % MINHASH_PRIME) / F.lit(float(MINHASH_PRIME)) - 0.5


def hyperplane_bucket(vec: Column, n_planes: int) -> Column:
    """Sign-pattern bucket id (long) of ``vec`` against ``n_planes``
    hash-derived hyperplanes. Plane loop unrolled in Python (shift amounts
    are literals)."""
    # closure factory, NOT a default arg (PySpark binds lambda params to
    # lambda variables by arity — a `p=p` default would become the index arg)
    def coef_at(p: int):
        return lambda i: _plane_coef(F.lit(p), i)

    out: Column = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(1), F.size(vec)), coef_at(p)),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        out = out + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine), ties broken by id ascending."""
    q = F.lit(query_vec).cast("array<double>")
    scored = df.select(
        F.col(id_col).alias("id"),
        cosine_similarity(as_double_array(vec_col), q).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("id").asc()).limit(k)


def lsh_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via hyperplane LSH bucket + exact re-rank.

    ``multiprobe`` also probes the n_planes buckets at Hamming distance 1
    from the query bucket (standard multi-probe LSH), trading k recall for
    n_planes+1 bucket lookups.
    """
    q = F.lit(query_vec).cast("array<double>")
    bucketed = df.select(
        F.col(id_col).alias("id"),
        as_double_array(vec_col).alias("__v"),
    ).withColumn("__bucket", hyperplane_bucket(F.col("__v"), n_planes))

    # same bucket expression, applied to the literal query vector
    q_bucket = hyperplane_bucket(q, n_planes)
    probes = [q_bucket]
    if multiprobe:
        probes += [q_bucket.bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), p)) for p in range(n_planes)]
    probe_set = F.array(*probes)
    cand = bucketed.filter(F.array_contains(probe_set, F.col("__bucket")))
    return (
        cand.select("id", cosine_similarity(F.col("__v"), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: assign vectors to the nearest of ``n_cells``
    hash-derived coarse centroids, probe the query's ``n_probe`` nearest
    cells, exact cosine re-rank inside them.

    With the cell id materialized as a partition/cluster key at ingest,
    the probe prunes (n_cells - n_probe)/n_cells of the data before any
    distance math — the 100 TB path.
    """
    dim = len(query_vec)

    def centroid(c: int) -> Column:
        return F.array(
            *[_plane_coef(F.lit(c * 1000 + 7), F.lit(i + 1)) for i in range(dim)]
        )

    def nearest_cells(vec: Column, n: int) -> Column:
        scored = F.array(
            *[
                F.struct(
                    (-cosine_similarity(vec, centroid(c))).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c in range(n_cells)
            ]
        )
        return F.slice(F.array_sort(scored), 1, n)

    assigned = df.select(
        F.col(id_col).alias("id"),
        as_double_array(vec_col).alias("__v"),
    ).withColumn("__cell", nearest_cells(F.col("__v"), 1)[0]["c"])

    q = F.lit(query_vec).cast("array<double>")
    probe_cells = F.transform(nearest_cells(q, n_probe), lambda s: s["c"])
    cand = assigned.filter(F.array_contains(probe_cells, F.col("__cell")))
    return (
        cand.select("id", cosine_similarity(F.col("__v"), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )
