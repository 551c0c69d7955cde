"""OPQ (parametric: PCA + eigenvalue allocation) — rotation properties and
the anisotropic error reduction it exists for (VERDICT r8 item 8)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def _aniso_df(spark, n=240, dim=8, seed=7):
    """Synthetic anisotropic corpus: all variance lives in dims 0..3 (and
    is HIGHLY unequal), dims 4..7 are near-noise — adversarial for plain
    PQ's fixed slices (subspaces {0,1},{2,3} soak all the energy while
    {4,5},{6,7} quantize noise); eigenvalue allocation spreads the four
    strong directions one-per-subspace."""
    rng = np.random.default_rng(seed)
    scales = np.array([8.0, 5.0, 3.0, 2.0, 0.05, 0.04, 0.03, 0.02])
    x = rng.standard_normal((n, dim)) * scales
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, v array<double>"), x


def _reconstruct(codes_df, books, rotation=None, dim=8):
    """Per-row decode x_hat = concat(codebooks[s][code_s]) (rotated domain),
    mapped back to the original domain when a rotation is given."""
    m = len(books)
    out = {}
    for r in codes_df.collect():
        parts = []
        for s in range(m):
            parts.extend(books[s][r[f"code_{s}"]])
        xh = np.asarray(parts)
        if rotation is not None:
            xh = np.asarray(rotation).T @ xh
        out[r["vec_id"]] = xh
    return out


def test_rotation_is_orthogonal_and_distance_preserving(spark):
    from tickerlake_spark.operators.opq import (
        opq_rotation,
        rotate_query,
        rotate_vectors,
    )

    df, x = _aniso_df(spark)
    rot = opq_rotation(df, dim=8, m=4)
    assert np.allclose(rot @ rot.T, np.eye(8), atol=1e-8)

    rotated = {
        r["vec_id"]: np.asarray(r["v"])
        for r in rotate_vectors(df, rot).collect()
    }
    # pairwise distances survive the rotation
    a, b = rotated[0], rotated[1]
    want = np.linalg.norm(x[0] - x[1])
    assert np.linalg.norm(a - b) == pytest.approx(want, rel=1e-9)
    # query rotation matches corpus rotation
    assert rotate_query(rot, list(x[0])) == pytest.approx(list(rotated[0]))


def test_eigenvalue_allocation_balances_variance(spark):
    from tickerlake_spark.operators.opq import eigenvalue_allocation

    eigvals = np.array([0.02, 0.03, 0.04, 0.05, 4.0, 9.0, 25.0, 64.0])
    eigvecs = np.eye(8)
    r = eigenvalue_allocation(eigvals, eigvecs, m=4)
    # each 2-dim subspace must hold exactly ONE strong direction
    for s in range(4):
        rows = r[2 * s : 2 * s + 2]
        strong = sum(
            1 for row in rows if eigvals[int(np.argmax(np.abs(row)))] >= 4.0
        )
        assert strong == 1, f"subspace {s} got {strong} strong directions"


def test_opq_reduces_quantization_error_on_anisotropic_data(spark):
    from tickerlake_spark.operators.opq import opq_pq_fit, rotate_vectors
    from tickerlake_spark.operators.pq import pq_encode, pq_fit

    df, x = _aniso_df(spark)
    dim, m, k = 8, 4, 8

    pq_books = pq_fit(df, dim=dim, m=m, k=k, iters=3)
    pq_codes = pq_encode(df, pq_books).select(
        "vec_id", *[f"code_{s}" for s in range(m)]
    )
    pq_hat = _reconstruct(pq_codes, pq_books, dim=dim)

    rot, opq_books = opq_pq_fit(df, dim=dim, m=m, k=k, iters=3)
    opq_codes = pq_encode(rotate_vectors(df, rot), opq_books).select(
        "vec_id", *[f"code_{s}" for s in range(m)]
    )
    opq_hat = _reconstruct(opq_codes, opq_books, rotation=rot, dim=dim)

    def mse(hat):
        return float(
            np.mean([np.sum((x[i] - hat[i]) ** 2) for i in range(len(x))])
        )

    pq_mse, opq_mse = mse(pq_hat), mse(opq_hat)
    assert opq_mse < pq_mse * 0.8, (pq_mse, opq_mse)


def test_opq_adc_end_to_end(spark):
    """Rotated ADC serves the same metric: the OPQ shortlist's recall@5
    against exact L2 must beat plain PQ's on anisotropic data."""
    from tickerlake_spark.operators.opq import (
        opq_pq_fit,
        rotate_query,
        rotate_vectors,
    )
    from tickerlake_spark.operators.pq import adc_distance, pq_encode, pq_fit

    df, x = _aniso_df(spark, n=240)
    dim, m, k, topn = 8, 4, 8, 5

    pq_books = pq_fit(df, dim=dim, m=m, k=k, iters=3)
    pq_enc = pq_encode(df, pq_books).drop("v").cache()
    rot, opq_books = opq_pq_fit(df, dim=dim, m=m, k=k, iters=3)
    opq_enc = pq_encode(rotate_vectors(df, rot), opq_books).drop("v").cache()

    def shortlist(enc, books, qv, n):
        return [
            r["vec_id"]
            for r in enc.withColumn("d", adc_distance(books, qv))
            .orderBy(F.col("d").asc(), F.col("vec_id").asc())
            .limit(n)
            .collect()
        ]

    recalls = {"pq": 0.0, "opq": 0.0}
    qids = [3, 57, 111, 180]
    for qid in qids:
        qv = list(x[qid])
        d2 = np.sum((x - x[qid]) ** 2, axis=1)
        truth = set(np.argsort(d2)[:topn].tolist())
        recalls["pq"] += len(set(shortlist(pq_enc, pq_books, qv, topn)) & truth)
        recalls["opq"] += len(
            set(shortlist(opq_enc, opq_books, rotate_query(rot, qv), topn))
            & truth
        )
    pq_enc.unpersist()
    opq_enc.unpersist()
    assert recalls["opq"] >= recalls["pq"], recalls
    assert recalls["opq"] >= 0.5 * topn * len(qids)  # sane floor


def _clustered_df(spark, n=300, dim=8, seed=11):
    """Non-Gaussian fixture: 3 well-separated clusters whose means live in
    a NON-axis-aligned 2D plane, plus mild anisotropic noise. Covariance
    (all parametric OPQ sees) mixes cluster spread with noise, so the
    PCA allocation is not the distortion-optimal rotation — the Procrustes
    iterations can improve on it."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    means = np.stack([q[:, 0] * 10 + q[:, 1] * s for s in (-12.0, 0.0, 12.0)])
    labels = rng.integers(0, 3, size=n)
    noise = rng.standard_normal((n, dim)) * np.linspace(1.5, 0.1, dim)
    x = means[labels] + noise @ q.T
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, v array<double>"), x


def test_iterative_opq_not_worse_than_parametric(spark):
    """Non-parametric OPQ (Procrustes alternation) must keep the rotation
    orthogonal and never lose to its own parametric warm start (it can
    only refine the objective both share)."""
    from tickerlake_spark.operators.opq import (
        opq_pq_fit,
        opq_pq_fit_iterative,
        rotate_vectors,
    )
    from tickerlake_spark.operators.pq import pq_encode, pq_fit

    df, x = _clustered_df(spark)
    dim, m, k = 8, 4, 8

    def mse_for(rot, books):
        codes = pq_encode(rotate_vectors(df, rot), books).select(
            "vec_id", *[f"code_{s}" for s in range(m)]
        )
        hat = _reconstruct(codes, books, rotation=rot, dim=dim)
        return float(
            np.mean([np.sum((x[i] - hat[i]) ** 2) for i in range(len(x))])
        )

    prot, pbooks = opq_pq_fit(df, dim=dim, m=m, k=k, iters=3)
    irot, ibooks = opq_pq_fit_iterative(
        df, dim=dim, m=m, k=k, iters=3, opq_iters=3
    )
    assert np.allclose(irot @ irot.T, np.eye(dim), atol=1e-8)

    param_mse = mse_for(prot, pbooks)
    iter_mse = mse_for(irot, ibooks)
    # small slack: the final Lloyd fits are independently initialized
    assert iter_mse <= param_mse * 1.05, (param_mse, iter_mse)

    # and both must beat plain PQ on this fixture
    books0 = pq_fit(df, dim=dim, m=m, k=k, iters=3)
    codes0 = pq_encode(df, books0).select(
        "vec_id", *[f"code_{s}" for s in range(m)]
    )
    hat0 = _reconstruct(codes0, books0, dim=dim)
    pq_mse = float(
        np.mean([np.sum((x[i] - hat0[i]) ** 2) for i in range(len(x))])
    )
    assert iter_mse < pq_mse, (pq_mse, iter_mse)
