"""Optimized Product Quantization: learned rotation before PQ training.

Plain PQ (``operators/pq.py``) quantizes fixed coordinate slices, so its
error depends on how variance happens to fall across those slices — the
worst case is a few high-variance directions concentrated in one subspace
while others quantize noise. OPQ (Ge et al., "Optimized Product
Quantization for Approximate Nearest Neighbor Search", CVPR 2013) learns an
orthogonal rotation ``R`` first; this module implements the PARAMETRIC
variant: PCA the data, then assign principal directions to subspaces by
eigenvalue allocation (balancing the per-subspace variance product), which
captures most of the iterative variant's gain at the cost of ONE covariance
pass. The reference has no vector compression at all; this extends the PQ
scale story (see pq.py module docstring).

Execution shape at 100 TB:

- the covariance matrix is a per-partition Arrow/numpy partial
  (``mapInPandas`` emitting one dim x dim partial per batch — the
  sanctioned vectorized-kernel use, like the multimodal codecs), reduced on
  the driver: one scan, O(dim^2) driver state;
- the eigendecomposition and allocation run on the driver (dim x dim,
  bounded);
- rotation of the corpus is a numpy matmul per Arrow batch at index-build
  time; queries rotate on the driver (a dim-length matvec).

Distances are rotation-invariant (R orthogonal), so ADC over rotated codes
estimates the SAME metric; exact re-rank still happens against the original
vectors. Honesty note (pinned by the r9 bench run): on the ISOTROPIC
benchmark corpus (independent hash-seeded unit vectors) the covariance is
~spherical and the rotation is a no-op by construction — OPQ's gain exists
exactly where real embedding models put it: anisotropic spectra. The unit
test builds such a spectrum and pins the error reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "covariance_matrix",
    "eigenvalue_allocation",
    "opq_rotation",
    "rotate_vectors",
    "rotate_query",
    "opq_pq_fit",
]


def covariance_matrix(df: DataFrame, dim: int, vec_col: str = "v"):
    """Centered covariance of a vector column as a numpy (dim, dim) array.

    One scan: each Arrow batch contributes (n, Σx, Σ x xᵀ) — numpy matmul
    per batch, three numbers + two bounded arrays per partial — reduced on
    the driver. Deterministic given a deterministic input partitioning up
    to float-sum order of the partials (the consumer is a rotation, not an
    oracle-checked value).
    """
    import numpy as np

    vec = vec_col

    def _partials(batches):
        # accumulate across the partition's batches, yield ONE partial per
        # partition: the driver collect stays O(partitions x dim^2), not
        # O(corpus / batch_size) (r9 review finding)
        import numpy as _np
        import pandas as _pd

        n_acc = 0
        s_acc = None
        o_acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = _np.stack(pdf[vec].to_numpy())
            n_acc += int(x.shape[0])
            s_b = x.sum(axis=0)
            o_b = x.T @ x
            s_acc = s_b if s_acc is None else s_acc + s_b
            o_acc = o_b if o_acc is None else o_acc + o_b
        if n_acc:
            yield _pd.DataFrame(
                {
                    "n": [n_acc],
                    "s": [s_acc.tolist()],
                    "o": [o_acc.reshape(-1).tolist()],
                }
            )

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec))
        .mapInPandas(_partials, "n long, s array<double>, o array<double>")
        .collect()
    )
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("covariance needs at least 2 vectors")
    s = np.zeros(dim)
    o = np.zeros((dim, dim))
    for r in rows:
        s += np.asarray(r["s"])
        o += np.asarray(r["o"]).reshape(dim, dim)
    mean = s / n
    return (o - n * np.outer(mean, mean)) / (n - 1)


def eigenvalue_allocation(eigvals, eigvecs, m: int):
    """Parametric-OPQ rotation from a PCA: greedily deal the principal
    directions (variance-descending) to the subspace with the smallest
    current log-variance product (capacity dim/m each), then stack the
    buckets as the rows of R — subspace ``s`` of ``R @ x`` is rows
    [s*sub_dim, (s+1)*sub_dim). Balancing the per-subspace variance
    PRODUCT is the paper's independence-time allocation criterion."""
    import numpy as np

    dim = len(eigvals)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    order = np.argsort(eigvals)[::-1]
    buckets: list[list[int]] = [[] for _ in range(m)]
    logsum = [0.0] * m
    for idx in order:
        open_b = [b for b in range(m) if len(buckets[b]) < sub_dim]
        b = min(open_b, key=lambda bb: (logsum[bb], bb))
        buckets[b].append(int(idx))
        logsum[b] += float(np.log(max(eigvals[idx], 1e-12)))
    rows = [eigvecs[:, i] for b in buckets for i in b]
    return np.stack(rows)


def opq_rotation(df: DataFrame, dim: int, m: int, vec_col: str = "v"):
    """Learn the parametric-OPQ rotation for ``df``'s vector column;
    returns a numpy (dim, dim) orthogonal matrix."""
    import numpy as np

    cov = covariance_matrix(df, dim, vec_col=vec_col)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending, orthonormal columns
    return eigenvalue_allocation(eigvals, eigvecs, m)


def rotate_vectors(
    df: DataFrame, rotation, vec_col: str = "v", out_col: str | None = None
) -> DataFrame:
    """Replace (or add) the vector column with ``R @ v`` — one numpy matmul
    per Arrow batch, all other columns passed through. Index-build-time
    cost; serving scans read the codes built from the rotated vectors."""
    out = out_col or vec_col
    r_list = [[float(x) for x in row] for row in rotation]
    in_cols = df.columns
    out_cols = in_cols if out in in_cols else [*in_cols, out]
    # dtypes taken AFTER the vec cast, so the passthrough vector column is
    # declared as the array<double> the select actually produces
    casted = df.select(
        *[
            F.col(c).cast("array<double>").alias(c) if c == vec_col else F.col(c)
            for c in in_cols
        ]
    )
    dtypes = dict(casted.dtypes)
    schema = ", ".join(
        f"{c} array<double>" if c == out else f"{c} {dtypes[c]}"
        for c in out_cols
    )

    def _rot(batches):
        import numpy as _np

        rm = _np.asarray(r_list)
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf):
                x = _np.stack(pdf[vec_col].to_numpy())
                pdf[out] = list((x @ rm.T).tolist())
            elif out not in pdf.columns:
                # empty batch must still carry every declared column
                pdf[out] = []
            yield pdf[list(out_cols)]

    return casted.mapInPandas(_rot, schema)


def rotate_query(rotation, qv: list[float]) -> list[float]:
    """Driver-side query rotation (dim-length matvec)."""
    import numpy as np

    return [float(x) for x in (np.asarray(rotation) @ np.asarray(qv))]


def opq_pq_fit(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "v",
    id_col: str = "vec_id",
):
    """(rotation, codebooks): learn R, then train PQ on the rotated
    vectors. Encode with ``pq_encode(rotate_vectors(df, R), codebooks)``;
    ADC-query with ``adc_distance(codebooks, rotate_query(R, qv))``."""
    from tickerlake_spark.operators.pq import pq_fit

    rot = opq_rotation(df, dim, m, vec_col=vec_col)
    rotated = rotate_vectors(
        df.select(id_col, vec_col), rot, vec_col=vec_col
    )
    books = pq_fit(
        rotated, dim=dim, m=m, k=k, iters=iters, vec_col=vec_col, id_col=id_col
    )
    return rot, books
