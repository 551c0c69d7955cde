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


def _h60_py(s: str) -> int:
    """Python twin of functions.text.h60 (md5 prefix as 60-bit int)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _plane_coefs_py(plane: int, dim: int) -> list[float]:
    """Python twin of ``_plane_coef`` for dims 1..dim — BIT-IDENTICAL values
    (same md5 string, same IEEE-754 double ops), computed once at plan build.

    Why this exists: the expression form sits inside higher-order lambdas,
    which Catalyst does not constant-fold through — so the md5 ran again for
    EVERY (row, plane, dim) at execution (n_planes x dim md5 calls per row;
    measured 6x end-to-end on the LSH/IVF queries at sf0.1). Precomputing
    collapses each plane to one array<double> literal; the DuckDB oracle
    mirrors (which compute the same md5 arithmetic in SQL) keep matching
    because the values are exactly equal."""
    return [
        (_h60_py(f"plane:{plane}:{i}") % MINHASH_PRIME) / float(MINHASH_PRIME) - 0.5
        for i in range(1, dim + 1)
    ]


def hyperplane_bucket(
    vec: Column, n_planes: int, dim: int | None = None, plane_offset: int = 0
) -> Column:
    """Sign-pattern bucket id (long) of ``vec`` against ``n_planes``
    hash-derived hyperplanes. Plane loop unrolled in Python (shift amounts
    are literals). Pass ``dim`` when the vector width is known so plane
    coefficients become one literal array per plane instead of per-row md5
    evaluation (see ``_plane_coefs_py``). ``plane_offset`` selects an
    independent plane set (multi-table LSH: table t passes t*n_planes)."""
    # closure factory, NOT a default arg (PySpark binds lambda params to
    # lambda variables by arity — a `p=p` default would become the index arg)
    def coef_at(p: int):
        return lambda i: _plane_coef(F.lit(p), i)

    out: Column = F.lit(0).cast("long")
    for p in range(n_planes):
        if dim is None:
            coefs = F.transform(F.sequence(F.lit(1), F.size(vec)), coef_at(plane_offset + p))
        else:
            coefs = F.lit(_plane_coefs_py(plane_offset + p, dim))
        proj = F.aggregate(
            F.zip_with(vec, coefs, lambda x, c: x * c),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        out = out + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float] | DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine), ties broken by id ascending.

    ``query_vec`` is either a Python vector (external query — serving path)
    or a ONE-ROW DataFrame whose single column is the query vector
    (corpus-resident query). The DataFrame form keeps the whole computation
    one Spark job — a 1-row broadcast joined to the scan — instead of a
    driver ``collect`` job followed by a literal-vector plan (optimization
    r11, guide §5 "the driver should do almost no data work": the collect
    round-trip plus the second job's plan+schedule overhead measured ~0.3s
    of the bench query's ~0.7s; ``exp_q45_qvec_join.py``). The cosine fold
    is the same ``zip_with``/``aggregate`` over the same doubles either way,
    so scores are bitwise-identical (rows_identical gate in the experiment
    and ``tests/test_r11_optimizations.py``).

    One-row contract (ADVICE r11): the DataFrame form takes ``limit(1)`` on
    the query projection — a multi-row frame would otherwise cross-join
    every query row to every corpus row and silently corrupt the top-k
    with duplicate ids; the limit is free on the broadcast side and
    preserves scores. An EMPTY query frame yields an empty result (the old
    driver-``first()`` path raised instead) — callers that need the loud
    failure should assert non-emptiness before calling."""
    if isinstance(query_vec, DataFrame):
        qcol = query_vec.columns[0]
        # collision-free alias (ADVICE r11): a corpus column literally
        # named "__qv" would make the post-join reference ambiguous
        qv = "__qv"
        while qv in df.columns:
            qv += "_"
        # coalesce(1) first: GlobalLimit over a single partition needs no
        # single-partition Exchange (measured ~40ms cheaper on the bench
        # query than a bare limit(1))
        q_df = query_vec.select(as_double_array(qcol).alias(qv)).coalesce(1).limit(1)
        scored = df.crossJoin(F.broadcast(q_df)).select(
            F.col(id_col).alias("id"),
            cosine_similarity(as_double_array(vec_col), F.col(qv)).alias(
                "cosine"
            ),
        )
    else:
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
    n_tables: int = 1,
) -> DataFrame:
    """Approximate cosine top-k via hyperplane LSH bucket + exact re-rank.

    ``multiprobe`` also probes the n_planes buckets at Hamming distance 1
    from the query bucket (standard multi-probe LSH), trading k recall for
    n_planes+1 bucket lookups.

    ``n_tables`` is the OR-amplification knob (Indyk-Motwani): each table
    hashes with an INDEPENDENT plane set (planes t*n_planes..), a vector is
    a candidate if it collides with the query in ANY table, and the miss
    probability decays exponentially in the table count. This is how LSH
    recall scales on weakly-clustered corpora — more tables, not more
    probes; the candidate set stays the union of bucket lookups, never a
    scan.
    """
    dim = len(query_vec)
    q = F.lit(query_vec).cast("array<double>")
    base = df.select(
        F.col(id_col).alias("id"),
        as_double_array(vec_col).alias("__v"),
    )
    hit = None
    bucketed = base
    for t in range(n_tables):
        off = t * n_planes
        bcol = f"__bucket_{t}"
        bucketed = bucketed.withColumn(
            bcol,
            hyperplane_bucket(F.col("__v"), n_planes, dim=dim, plane_offset=off),
        )
        # same bucket expression, applied to the literal query vector
        q_bucket = hyperplane_bucket(q, n_planes, dim=dim, plane_offset=off)
        probes = [q_bucket]
        if multiprobe:
            probes += [
                q_bucket.bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), p))
                for p in range(n_planes)
            ]
        this = F.array_contains(F.array(*probes), F.col(bcol))
        hit = this if hit is None else (hit | this)
    cand = bucketed.filter(hit)
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

    Centroids are hash-derived (``_plane_coefs_py(c*1000+7, dim)``), unit-
    normalized ONCE at plan build, and embedded as one array<array<double>>
    literal: the per-row assignment is then argmax over n_cells plain dot
    products — no per-row md5, no per-row norm folds (|v| is constant
    across cells, |c_k| is baked into the unit centroid). The query's probe
    cells are computed driver-side in plain Python (same formula).
    """
    import math

    dim = len(query_vec)
    cents = []
    for c in range(n_cells):
        raw = _plane_coefs_py(c * 1000 + 7, dim)
        norm = math.sqrt(sum(x * x for x in raw))
        cents.append([x / norm for x in raw])

    cmat = F.array(*[F.lit(u) for u in cents])  # array<array<double>> literal

    def dot_fold(v: Column, u: Column) -> Column:
        return F.aggregate(
            F.zip_with(v, u, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )

    # argmax_k dot(v, u_k): min over (-dot, k) structs = first of array_sort
    scored = F.transform(
        cmat,
        lambda u, i: F.struct((-dot_fold(F.col("__v"), u)).alias("d"), i.alias("c")),
    )
    assigned = df.select(
        F.col(id_col).alias("id"),
        as_double_array(vec_col).alias("__v"),
    ).withColumn("__cell", F.array_min(scored)["c"])

    # probe cells: same argmax, driver-side over the literal query vector
    q_scores = sorted(
        (-sum(x * u for x, u in zip(query_vec, cu)), c) for c, cu in enumerate(cents)
    )
    probe_cells = [c for _, c in q_scores[:n_probe]]

    q = F.lit(query_vec).cast("array<double>")
    cand = assigned.filter(F.col("__cell").isin(probe_cells))
    return (
        cand.select("id", cosine_similarity(F.col("__v"), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )
