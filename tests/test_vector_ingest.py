"""Streaming IVF-PQ ingestion (streaming/vector_ingest.py): stream-vs-batch
encode parity, replay idempotence, planning-time partition pruning on the
probe, and exact re-rank semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tickerlake_spark.storage.io import read_table
from tickerlake_spark.streaming.vector_ingest import (
    encode_vectors,
    ivfpq_index_topk,
    stream_vector_ingest,
    train_index_structure,
)

DIM = 64


@pytest.fixture(scope="module")
def structure(spark, sf_dir):
    """Frozen index structure trained once on the sf embeddings sample."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return train_index_structure(emb, dim=DIM)


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _index_rows(spark, path):
    return {
        r["id"]: (r["cell"], r["code_0"], r["code_1"], r["code_2"], r["code_3"])
        for r in read_table(spark, path).collect()
    }


def test_stream_ingest_matches_batch_encode(spark, emb, structure, tmp_path):
    gcent, codebooks = structure
    landing = str(tmp_path / "landing")
    # two landing files = at least one micro-batch each under availableNow
    emb.filter(F.col("vec_id") < 250).write.parquet(landing)
    emb.filter(F.col("vec_id") >= 250).write.mode("append").parquet(landing)

    index = str(tmp_path / "index")
    q = stream_vector_ingest(
        spark,
        spark.readStream.schema(emb.schema).parquet(landing),
        index,
        gcent,
        codebooks,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = _index_rows(spark, index)
    want = {
        r["id"]: (r["cell"], r["code_0"], r["code_1"], r["code_2"], r["code_3"])
        for r in encode_vectors(emb, gcent, codebooks).collect()
    }
    assert got == want
    # restarting with the same checkpoint and no new files ingests nothing
    n = read_table(spark, index).count()
    q2 = stream_vector_ingest(
        spark,
        spark.readStream.schema(emb.schema).parquet(landing),
        index,
        gcent,
        codebooks,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert read_table(spark, index).count() == n


def test_replayed_batch_is_idempotent(spark, emb, structure, tmp_path):
    """Re-writing the same ingest_batch (foreachBatch crash/retry) must
    leave the index row-identical: encoding is deterministic and the write
    only overwrites the batch's own (cell, ingest_batch) partitions."""
    from tickerlake_spark.storage.io import write_table

    gcent, codebooks = structure
    index = str(tmp_path / "index")
    batch = emb.filter(F.col("vec_id") < 100)
    for _ in range(2):
        write_table(
            encode_vectors(batch, gcent, codebooks).withColumn(
                "ingest_batch", F.lit(0)
            ),
            index,
            mode="overwrite",
            partition_by=["cell", "ingest_batch"],
            dynamic=True,
        )
    assert read_table(spark, index).count() == 100


def test_probe_prunes_partitions_and_matches_memory(spark, emb, structure, tmp_path):
    from tickerlake_spark.operators.clustering import nearest_cells
    from tickerlake_spark.operators.pq import adc_distance
    from tickerlake_spark.storage.io import write_table

    gcent, codebooks = structure
    index = str(tmp_path / "index")
    write_table(
        encode_vectors(emb, gcent, codebooks).withColumn("ingest_batch", F.lit(0)),
        index,
        mode="overwrite",
        partition_by=["cell", "ingest_batch"],
        dynamic=True,
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    top = ivfpq_index_topk(spark, index, gcent, codebooks, qvec, k=10, n_probe=2)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1].split("]")[0], (
        "probe filter did not prune index partitions:\n" + plan
    )

    # memory-side reference: same encode + same per-probe ADC scoring
    probes = nearest_cells(gcent, qvec, 2)
    encoded = encode_vectors(emb, gcent, codebooks).filter(F.col("cell").isin(probes))
    raw = None
    for p in probes:
        qr = [qvec[j] - gcent[p][j] for j in range(DIM)]
        b = adc_distance(codebooks, qr)
        raw = F.when(F.col("cell") == p, b) if raw is None else raw.when(F.col("cell") == p, b)
    want = [
        r["id"]
        for r in encoded.withColumn("__adc", raw)
        .orderBy(F.col("__adc").asc(), F.col("id").asc())
        .limit(10)
        .collect()
    ]
    assert [r["id"] for r in top.collect()] == want


def test_rerank_returns_exact_distances(spark, emb, structure, tmp_path):
    from tickerlake_spark.storage.io import write_table

    gcent, codebooks = structure
    index = str(tmp_path / "index")
    write_table(
        encode_vectors(emb, gcent, codebooks).withColumn("ingest_batch", F.lit(0)),
        index,
        mode="overwrite",
        partition_by=["cell", "ingest_batch"],
        dynamic=True,
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    rows = ivfpq_index_topk(
        spark, index, gcent, codebooks, qvec, k=5, n_probe=2, rerank=50
    ).collect()
    assert rows[0]["id"] == 0 and rows[0]["d2"] == pytest.approx(0.0, abs=1e-12)
    d2s = [r["d2"] for r in rows]
    assert d2s == sorted(d2s)


def test_horizon_compaction_on_vector_index(spark, emb, structure, tmp_path):
    """compact_ingest_partitions works on the cell=-partitioned vector index
    too: probes and ADC results are unchanged, aged batches fold into -1."""
    import os

    from tickerlake_spark.storage.io import write_table
    from tickerlake_spark.storage.maintenance import compact_ingest_partitions

    gcent, codebooks = structure
    index = str(tmp_path / "index")
    halves = [emb.filter(F.col("vec_id") % 2 == i) for i in range(2)]
    for i, h in enumerate(halves):
        write_table(
            encode_vectors(h, gcent, codebooks).withColumn(
                "ingest_batch", F.lit(i)
            ),
            index,
            mode="overwrite",
            partition_by=["cell", "ingest_batch"],
            dynamic=True,
        )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    before = [
        (r["id"], r["cell"])
        for r in ivfpq_index_topk(spark, index, gcent, codebooks, qvec, k=10).collect()
    ]
    stats = compact_ingest_partitions(spark, index, horizon_batch=2)
    assert stats["rows"] == emb.count()
    after = [
        (r["id"], r["cell"])
        for r in ivfpq_index_topk(spark, index, gcent, codebooks, qvec, k=10).collect()
    ]
    assert after == before
    batches = {
        d.split("=")[1]
        for _r, dirs, _f in os.walk(index)
        for d in dirs
        if d.startswith("ingest_batch=")
    }
    assert batches == {"-1"}
