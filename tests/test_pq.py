"""Product-quantization operator properties (operators/pq.py).

The q127 catalog entry proves end-to-end oracle parity; these tests pin the
operator-level contracts on a tiny hand-checkable corpus: encoding really
picks the nearest codeword per subspace, the ADC expression really is the
sum of table lookups, and the encode plan is map-side (zero exchanges) —
the property that makes PQ ingest linear at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tickerlake_spark.operators.pq import adc_distance, pq_encode, pq_fit, seq_d2


def _toy(spark):
    # 8 vectors in 4-d: two tight clusters per 2-d subspace.
    rows = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [0.1, 0.0, 10.0, 10.1]),
        (2, [5.0, 5.0, 0.0, 0.0]),
        (3, [5.1, 5.0, 0.1, 0.0]),
        (4, [0.0, 0.1, 0.0, 0.1]),
        (5, [5.0, 5.1, 10.1, 10.0]),
        (6, [0.1, 0.1, 10.0, 10.0]),
        (7, [5.1, 5.1, 0.0, 0.1]),
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_pq_fit_shapes_and_encode_nearest(spark):
    df = _toy(spark)
    codebooks = pq_fit(df, dim=4, m=2, k=2, iters=2, vec_col="v")
    assert len(codebooks) == 2
    for cb in codebooks:
        assert len(cb) == 2 and all(len(c) == 2 for c in cb)

    enc = pq_encode(df, codebooks, vec_col="v").collect()
    assert dict(enc[0].asDict()).keys() >= {"code_0", "code_1"}
    for r in enc:
        v = r["v"]
        for s in range(2):
            sub = v[s * 2 : (s + 1) * 2]
            dists = [seq_d2(sub, c) for c in codebooks[s]]
            # nearest codeword, ties to the lowest index
            want = min(range(2), key=lambda i: (dists[i], i))
            assert r[f"code_{s}"] == want, (r["vec_id"], s, dists)


def test_adc_is_sum_of_table_lookups(spark):
    df = _toy(spark)
    codebooks = pq_fit(df, dim=4, m=2, k=2, iters=2, vec_col="v")
    q = [0.0, 0.0, 10.0, 10.0]
    enc = pq_encode(df, codebooks, vec_col="v")
    got = {
        r["vec_id"]: r["adc"]
        for r in enc.withColumn("adc", adc_distance(codebooks, q)).collect()
    }
    for r in enc.collect():
        want = sum(
            seq_d2(q[s * 2 : (s + 1) * 2], codebooks[s][r[f"code_{s}"]])
            for s in range(2)
        )
        assert math.isclose(got[r["vec_id"]], want, rel_tol=0, abs_tol=0.0), (
            r["vec_id"]
        )
    # the query's own cluster combination must rank first
    best = min(got, key=lambda k: (got[k], k))
    assert best in {0, 1, 6}  # members of the (low, high) cluster pair


def test_pq_encode_is_map_side_only(spark):
    """Encoding must add no exchange: codebooks enter as literals, the
    argmin folds are per-row expressions — the plan that keeps PQ ingest
    embarrassingly parallel."""
    df = _toy(spark)
    codebooks = pq_fit(df, dim=4, m=2, k=2, iters=1, vec_col="v")
    enc = pq_encode(df, codebooks, vec_col="v")
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_pq_recall_beats_chance_and_finds_self(spark, sf_dir):
    """Approximation quality on the real embeddings table: 12-bit codes
    (m=4, k=8) must place the query's own vector at rank 1 (its quantized
    distance is the minimum achievable for its code combination) and must
    recall a chance-dominating share of the exact top-10 — the synthetic
    embeddings are nearly isotropic (the hard case for PQ), so the floor is
    deliberately modest; chance recall at 10-of-500 is 0.02. Deterministic:
    these are fixed values, the floor just keeps the test robust to
    parameter retuning."""
    from tickerlake_spark.plans import QUERIES
    from tickerlake_spark.plans.catalog import _ensure_loaded

    _ensure_loaded()

    exact = [
        r["id"]
        for r in QUERIES["q45_ann_bruteforce"].fn(spark, sf_dir).collect()
    ][:10]
    pq = [r["id"] for r in QUERIES["q127_pq_adc_ann"].fn(spark, sf_dir).collect()]
    ivfpq = [r["id"] for r in QUERIES["q130_ivfpq_ann"].fn(spark, sf_dir).collect()]
    assert pq[0] == 0 and ivfpq[0] == 0  # self is always nearest
    assert len(set(exact) & set(pq)) / 10 >= 0.2
    assert len(set(exact) & set(ivfpq)) / 10 >= 0.2


def test_pq_compression_ratio_claim(spark):
    """4 int codes replace 64 doubles: the stored representation the ADC
    scan touches is two orders of magnitude smaller than the vectors."""
    df = _toy(spark)
    codebooks = pq_fit(df, dim=4, m=2, k=2, iters=1, vec_col="v")
    enc = pq_encode(df, codebooks, vec_col="v").drop("v")
    # code columns are int32-typed (k <= 256 fits a byte on disk after
    # parquet dictionary/bit-packing; the logical type stays int)
    assert [t for n, t in enc.dtypes if n.startswith("code_")] == ["int", "int"]
