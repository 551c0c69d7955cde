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
    "opq_pq_fit_iterative",
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


def _procrustes_correlation(
    df: DataFrame, rotation, codebooks, dim: int, vec_col: str = "v"
):
    """M = Σ x̃ᵢ xᵢᵀ over the corpus, where x̃ = decode(encode(R·x)) in the
    ROTATED domain — the dim x dim moment the Procrustes R-update needs.
    One scan: each Arrow batch rotates, encodes (vectorized argmin per
    subspace), decodes from the broadcast codebooks, and contributes one
    numpy partial per partition."""
    import numpy as np

    r_list = [[float(v) for v in row] for row in rotation]
    books = [[[float(v) for v in c] for c in sub] for sub in codebooks]
    m = len(books)
    sub_dim = dim // m
    vec = vec_col

    def _partials(batches):
        import numpy as _np
        import pandas as _pd

        rm = _np.asarray(r_list)
        cbs = [_np.asarray(b) for b in books]  # each (k, sub_dim)
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = _np.stack(pdf[vec].to_numpy())  # (n, dim) original domain
            rx = x @ rm.T  # rotated
            xh = _np.empty_like(rx)
            for s in range(m):
                lo, hi = s * sub_dim, (s + 1) * sub_dim
                sub = rx[:, lo:hi]  # (n, sub_dim)
                # squared L2 to every codeword: (n, k)
                d2 = ((sub[:, None, :] - cbs[s][None, :, :]) ** 2).sum(axis=2)
                xh[:, lo:hi] = cbs[s][_np.argmin(d2, axis=1)]
            part = xh.T @ x  # (dim, dim): Σ x̃ xᵀ
            acc = part if acc is None else acc + part
        if acc is not None:
            yield _pd.DataFrame({"p": [acc.reshape(-1).tolist()]})

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec))
        .mapInPandas(_partials, "p array<double>")
        .collect()
    )
    out = np.zeros((dim, dim))
    for r in rows:
        out += np.asarray(r["p"]).reshape(dim, dim)
    return out


def opq_pq_fit_iterative(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    opq_iters: int = 3,
    vec_col: str = "v",
    id_col: str = "vec_id",
):
    """Non-parametric OPQ (Ge et al. 2013, Alg. 2): alternate PQ training
    in the current rotated domain with an orthogonal-Procrustes rotation
    update R = U·Vᵀ from SVD(Σ x̃ xᵀ). Initialized from the parametric
    rotation (the paper's recommended warm start). Per outer iteration:
    one PQ fit (``iters`` Lloyd rounds, JVM path) + one correlation scan
    (Arrow/numpy partials) + a dim x dim driver SVD — every driver object
    stays O(dim² + m·k·dim/m). Returns (rotation, codebooks); serving is
    identical to ``opq_pq_fit``'s contract."""
    import numpy as np

    from tickerlake_spark.operators.pq import pq_fit

    base = df.select(id_col, vec_col)
    rot = opq_rotation(df, dim, m, vec_col=vec_col)
    books = None
    for _ in range(max(1, opq_iters)):
        rotated = rotate_vectors(base, rot, vec_col=vec_col)
        books = pq_fit(
            rotated, dim=dim, m=m, k=k, iters=iters,
            vec_col=vec_col, id_col=id_col,
        )
        corr = _procrustes_correlation(df, rot, books, dim, vec_col=vec_col)
        u, _s, vt = np.linalg.svd(corr)
        rot = u @ vt
    # codebooks must match the FINAL rotation: one last fit in its domain
    rotated = rotate_vectors(base, rot, vec_col=vec_col)
    books = pq_fit(
        rotated, dim=dim, m=m, k=k, iters=iters, vec_col=vec_col, id_col=id_col
    )
    return rot, books
