"""Distributed Lloyd's k-means over embedding columns.

The reference has no clustering, but a training-data pipeline at 100 TB needs
it twice: to TRAIN the coarse quantizer an IVF index probes (the hash-derived
centroids in ``operators/similarity.py`` are the untrained fallback), and for
SemDeDup-style semantic dedup (cluster, then pairwise-verify only within a
cluster — Abbas et al. 2023, arXiv:2303.09540).

Execution shape (the scalable one, identical to MLlib's KMeans loop):

- centroids live on the DRIVER as k x dim doubles (bounded, tiny) and enter
  each assignment as one ``array<array<double>>`` literal — broadcast by the
  plan, no join, no shuffle of the vector table;
- the assignment is a map-side argmin over k sequential-order dot folds
  (whole-stage codegen, no Python);
- the update is ``posexplode -> groupBy(cell, pos) -> avg``: the shuffle
  carries only k x dim x n_partitions partial sums (map-side combine), never
  vectors;
- per-iteration driver traffic is the k x dim rounded means — the same
  bounded-collect pattern as any iterative ML algorithm.

Cross-engine determinism (the oracle contract): every iteration's centroids
are rounded to ``decimals`` via ``stable_round`` on BOTH engines, so
assignment distances are computed from bit-identical inputs; distance folds
run in index order on both engines; argmin ties break on cell asc; an empty
cell keeps its previous centroid. Init is the embeddings of the k lowest ids
(pure data movement, no arithmetic — exactly replicable in SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round

__all__ = [
    "kmeans_fit",
    "assign_cells",
    "assign_cells_arrow",
    "semantic_dedup_flags",
    "write_ivf_index",
    "ivf_index_topk",
]


def _argmin_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid by squared L2; ties -> lowest index.

    ``array_min`` over (d2, cell) structs compares d2 first, then cell —
    the same total order as ``ORDER BY d2 ASC, cell ASC``.

    The centroids enter as a LITERAL array deliberately: a broadcast
    one-row parameter table (the r11 q45 trick) was re-measured r12 and is
    SLOWER here — the per-iteration broadcast-build job costs more than
    the literal-tree analysis it saves, and the argmin HOF is
    CodegenFallback (interpreted) so there is no per-iteration codegen to
    save (tools/experiments/exp_trainer_param.py: 1.98s literal vs 2.18s
    param for 3 k-means rounds at sf0.01, bit-identical centroids).
    """
    cmat = F.array(*[F.lit(c).cast("array<double>") for c in centroids])
    scored = F.transform(
        cmat,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("d2"),
            i.alias("cell"),
        ),
    )
    return F.array_min(scored)["cell"]


def _trainer_width(df: DataFrame) -> int:
    """Scale-adaptive partition count for the iterative-trainer persists
    (optimization r12, guide §2: derive partitioning from input size, not a
    constant tuned for either local mode or the cluster).

    The trainers used a fixed ``defaultParallelism``-way repartition, which
    schedules a full cluster width of tasks PER ITERATION even for a
    500-row embedding sample — at catalog scale the per-task scheduling
    overhead, not the O(k x dim) arithmetic, dominated every Lloyd's round
    (measured: 3 k-means iterations at sf0.01 took 2.49s at width 32 vs
    1.33s at width 1, identical centroids). Sizing by the plan's estimated
    bytes (~1 MiB per task floor) keeps toy inputs on a few tasks while
    any real corpus still saturates the cluster; an unknown/huge estimate
    falls back to full width — the safe direction at scale.
    """
    width = df.sparkSession.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # estimation failure -> keep full width
        return width
    return max(1, min(width, size // (1 << 20)))


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "v",
    cell_col: str = "cell",
) -> DataFrame:
    """Map-side nearest-centroid assignment (one k-means E-step).

    The unrolled-literal argmin is the oracle-exact path (sequential-order
    folds, bit-comparable against SQL engines) and is right for the small k
    of the cataloged queries. Its expression tree grows O(k x dim), so past
    ~64 cells codegen cost explodes — use ``assign_cells_arrow`` for
    IVF-scale k (hundreds to tens of thousands of cells).
    """
    return df.withColumn(cell_col, _argmin_cell(F.col(vec_col), centroids))


def assign_cells_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "v",
    cell_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid assignment as a vectorized Arrow kernel — the
    large-k path.

    Still map-side (mapInPandas adds no shuffle); each Arrow batch computes
    all pairwise squared-L2 distances with one BLAS-backed matmul
    (|v|^2 - 2 v.C^T + |c|^2), so per-row cost is a k x dim GEMM row instead
    of an O(k x dim) interpreted expression tree. numpy's pairwise float
    summation can differ from the sequential fold at ~1e-16, so argmin may
    flip ONLY on exact centroid-distance ties — use the literal path when
    bit-parity with a SQL oracle matters (small k); this path when k is
    IVF-sized.
    """
    import numpy as np

    other = [f.name for f in df.schema.fields]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{cell_col} int"]
    )
    cmat = np.asarray(centroids, dtype=np.float64)  # k x dim
    c_norms = (cmat * cmat).sum(axis=1)  # |c|^2, length k

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # n x dim
            # argmin_k |v - c_k|^2 == argmin_k (|c_k|^2 - 2 v.c_k); |v|^2
            # is constant per row. Ties break to the lowest cell (np argmin).
            scores = c_norms[None, :] - 2.0 * (v @ cmat.T)
            pdf = pdf[other].copy()
            pdf[cell_col] = scores.argmin(axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def _update_means(assigned: DataFrame, decimals: int) -> DataFrame:
    """M-step as a DataFrame: (cell, pos, val) per-coordinate rounded means.

    posexplode turns each vector into dim rows; the groupBy shuffle is
    k x dim keys with map-side partial aggregation — vector payloads never
    cross the wire.
    """
    ev = assigned.select("cell", F.posexplode("v").alias("pos", "val"))
    return ev.groupBy("cell", "pos").agg(
        stable_round(F.avg("val"), decimals).alias("val")
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "v",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's k-means; returns (final centroids, final (cell,pos,val) plan).

    The returned DataFrame is the LAST iteration's M-step still as a lazy
    plan (cells that lost all members in the final assignment are absent,
    mirroring the SQL oracle). ``centroids`` is the same data collected and
    list-assembled for downstream literal use (IVF probing, SemDeDup
    assignment).
    """
    base = df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    # iterative algorithm: pay the scan/decode once, not once per iteration
    # (MEMORY_AND_DISK so oversized partitions spill instead of OOM at scale).
    # Explicit repartition first: embedding tables are byte-small but the
    # E-step is O(k x dim) HOF math per row — a 2-split parquet file would
    # serialize every iteration onto 2 cores. The count is size-adaptive
    # (_trainer_width): full cluster width for real corpora, a handful of
    # tasks for toy samples, where per-iteration task scheduling was the
    # dominant cost (guide §2, measured −45% on the Lloyd loop at sf0.01).
    from pyspark import StorageLevel

    base = base.repartition(_trainer_width(base)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        init_rows = (
            base.orderBy(F.col(id_col).asc()).limit(k).select(id_col, "v").collect()
        )
        centroids = [list(r["v"]) for r in sorted(init_rows, key=lambda r: r[id_col])]

        update: DataFrame | None = None
        for _ in range(iters):
            assigned = assign_cells(base, centroids, vec_col="v")
            update = _update_means(assigned, decimals)
            rows = update.collect()  # bounded: k x dim rounded doubles
            by_cell: dict[int, dict[int, float]] = {}
            for r in rows:
                by_cell.setdefault(r["cell"], {})[r["pos"]] = r["val"]
            centroids = [
                [by_cell[c][p] for p in sorted(by_cell[c])] if c in by_cell else prev
                for c, prev in enumerate(centroids)
            ]
        assert update is not None
        return centroids, update
    finally:
        # lazily released; the returned plan recomputes from the scan if
        # evaluated after eviction — correctness is unaffected
        base.unpersist(blocking=False)


def semantic_dedup_flags(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    vec_col: str = "v",
    id_col: str = "vec_id",
    oversized_fraction: float | None = None,
    n_planes: int = 8,
    dim: int | None = None,
    pair_salt: int = 8,
) -> DataFrame:
    """SemDeDup: flag rows that have a LOWER-id near-duplicate
    (cosine >= threshold) in the SAME k-means cell.

    Returns (id, cell, is_dup). The pairwise verify is an equi-join on the
    cell key — per-cell work is |cell|^2, bounded by choosing k so cells stay
    small (at 100 TB: k grows with corpus size; the join stays an equi-join
    and never goes all-pairs). Cross-cell near-dups are missed by design —
    that is the SemDeDup recall trade.

    The returned plan reads a persisted (MEMORY_AND_DISK) assignment — the
    E-step result feeds four consumers; without the persist it would be
    recomputed per consumer. Spark evicts it LRU; it is released with the
    session.

    ``oversized_fraction``: the quadratic guard. A corpus topic that swamps
    one cell (say 30% of all rows) makes that cell's verify O((0.3n)^2) no
    matter how k was chosen. Cells holding more than this fraction of the
    corpus get a secondary hyperplane-LSH bucket appended to the join key:
    merely-similar mass splits across 2^n_planes buckets while near-dup
    pairs (cosine >= 0.98-ish) almost surely share every hyperplane sign
    and stay joinable. EXACT duplicates always share a bucket — run
    ``dedup.exact_dedup`` first so identical boilerplate never reaches this
    stage; that pre-pass, not bucketing, is what bounds identical-copy mass.

    ``pair_salt`` > 1: the within-cell pair join is triangle-replicated
    (same fragment-replicate plan as ``dedup._band_self_join``) so one
    cell's quadratic verify spreads across pair_salt^2 reducers instead of
    serializing on the single reducer that owns the cell key — with k cells
    and k << cores, the cell key alone leaves most of the cluster idle.

    The per-pair verify keeps the exact ``dot/(|a||b|)`` formulation the
    q116 oracle's ``list_cosine_similarity`` computes — NOT pre-normalized
    vectors, whose different rounding path could flip ``is_dup`` for a
    pair landing within ulps of the exact >= threshold compare. The norms
    themselves ARE precomputed once per row and carried through the join:
    sqrt of the same sum is the same double, and dot/(na*nb) performs the
    identical operations in the identical order as computing the norms
    per pair, so the result is bit-identical while the per-pair work
    drops from three array folds to one.
    """
    from tickerlake_spark.functions.vector import dot, l2_norm

    from pyspark import StorageLevel

    narrow = df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    assigned = (
        assign_cells(
            # E-step parallelism guard, same rationale as kmeans_fit
            # (size-adaptive width, r12)
            narrow.repartition(_trainer_width(narrow)),
            centroids,
            vec_col="v",
        )
        .select(F.col(id_col).alias("id"), "v", "cell")
        # the E-step (O(k x dim) argmin per row) feeds the size probe, both
        # self-join sides, and the final left join — pay it once
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    if oversized_fraction is not None:
        from tickerlake_spark.operators.similarity import hyperplane_bucket

        sizes = assigned.groupBy("cell").count()
        rows = sizes.collect()  # bounded: k rows
        total = sum(r["count"] for r in rows)
        hot = [
            r["cell"] for r in rows if r["count"] > total * oversized_fraction
        ]
        sub = (
            F.when(
                F.col("cell").isin(hot),
                hyperplane_bucket(F.col("v"), n_planes, dim=dim),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
        assigned = assigned.withColumn("subkey", sub)
    else:
        assigned = assigned.withColumn("subkey", F.lit(0).cast("long"))

    from tickerlake_spark.operators.dedup import (
        triangle_salt_cond,
        triangle_salt_sides,
    )

    width = df.sparkSession.sparkContext.defaultParallelism
    slim = assigned.select(
        "id", "cell", "subkey", "v", l2_norm(F.col("v")).alias("__nv")
    )
    if pair_salt > 1:
        # explicit-width repartition on the join keys: AQE coalesces
        # byte-small shuffles onto 1-2 tasks, serializing the quadratic
        # verify; an explicit count is exempt (same convention as
        # dedup._barrier), and partitioning on the join keys means the
        # join reuses these exchanges instead of adding its own
        a, b = triangle_salt_sides(slim, "id", pair_salt)
        a = a.repartition(width, "cell", "subkey", "__i", "__j").alias("a")
        b = b.repartition(width, "cell", "subkey", "__i", "__j").alias("b")
        salt_cond = triangle_salt_cond("a", "b")
    else:
        a, b = slim.alias("a"), slim.alias("b")
        salt_cond = F.lit(True)
    dup_ids = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.subkey") == F.col("b.subkey"))
            & salt_cond
            & (F.col("b.id") < F.col("a.id")),
        )
        .filter(
            dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.__nv") * F.col("b.__nv"))
            >= F.lit(threshold)
        )
        .select(F.col("a.id").alias("id"))
        .distinct()
    )
    return assigned.join(
        dup_ids.withColumn("__dup", F.lit(True)), "id", "left"
    ).select(
        "id", "cell", F.coalesce(F.col("__dup"), F.lit(False)).alias("is_dup")
    )


def nearest_cells(
    centroids: list[list[float]], query_vec: list[float], n_probe: int
) -> list[int]:
    """The ``n_probe`` nearest centroid indices to ``query_vec`` by squared
    L2, ties to the lowest index — driver-side, in the SAME sequential-fold
    float arithmetic as the Spark/SQL assignment expressions (the fold order
    is load-bearing for oracle parity; keep this the single copy)."""

    def d2(c: list[float]) -> float:
        s = 0.0
        for x, y in zip(query_vec, c):
            s += (x - y) * (x - y)
        return s

    return [c for _, c in sorted((d2(c), i) for i, c in enumerate(centroids))[:n_probe]]


def write_ivf_index(
    df: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "v",
    id_col: str = "vec_id",
) -> None:
    """Materialize an IVF index: vectors written Hive-partitioned by their
    nearest-centroid cell (``cell=<k>/`` directories).

    This is the difference between "IVF as a filter" and "IVF as an index":
    a probe that filters on ``cell`` prunes whole directories at PLANNING
    time, so at 100 TB a search reads n_probe/k of the files and zero bytes
    of the rest. Cell cardinality equals k (bounded), so the partition count
    stays sane; within a cell, files are plain parquet with the vector
    column intact for the exact re-rank.
    """
    from tickerlake_spark.storage.io import write_table

    base = df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    write_table(assign_cells(base, centroids, vec_col="v"), path, partition_by="cell")


def ivf_index_topk(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Probe a written IVF index: nearest ``n_probe`` cells to the query are
    computed driver-side against the SAME centroids the index was built
    with, the scan carries the cell filter as a partition predicate, and the
    exact cosine top-k re-ranks only the probed cells' rows.
    """
    from tickerlake_spark.functions.vector import cosine_similarity
    from tickerlake_spark.storage.io import read_table

    probes = nearest_cells(centroids, query_vec, n_probe)

    q = F.lit(query_vec).cast("array<double>")
    scanned = read_table(spark, path).filter(F.col("cell").isin(probes))
    return (
        scanned.select(
            F.col("vec_id").alias("id"),
            F.col("cell").cast("int").alias("cell"),
            cosine_similarity(F.col("v"), q).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )
