"""Continuous vector ingestion into a queryable IVF-PQ index.

The batch ANN suite (``operators/similarity.py``, ``operators/pq.py``,
``operators/clustering.py``) builds indexes from a corpus that already
exists. An embedding pipeline instead receives vectors continuously (every
newly-embedded document batch) and must keep the index queryable without
rebuilding it. This module implements the standard production shape:

- the index STRUCTURE is frozen offline — coarse centroids and PQ
  codebooks trained once on a sample (``kmeans_fit`` + ``pq_fit``; retrain
  is a rebuild, as in every IVF system);
- per arriving micro-batch, encoding is entirely map-side: assign each
  vector to its nearest coarse cell, subtract that centroid, PQ-encode the
  residual against broadcast codebook literals — no shuffle, no state, so
  ingest throughput scales with executors;
- encoded rows land Hive-partitioned by ``(cell, ingest_batch)`` with
  dynamic partition overwrite: a replayed micro-batch (foreachBatch
  crash/retry) overwrites exactly its own partitions — encoding is
  deterministic, so replay is byte-idempotent without a transaction log;
- a query probes ``n_probe`` cells: the cell filter prunes whole
  partition directories at planning time, ADC scores the survivors from
  their code columns alone, and an optional exact re-rank touches the
  stored vectors of the ADC shortlist only.

At 100 TB: the hot query path reads (id, codes) from n_probe/k of the
files — a few bytes per candidate row; the vector column is only read by
the final re-rank over ``rerank`` candidates. Compact each cell's small
ingest files periodically (``storage/maintenance.py``); cells are the
compaction unit, so compaction never rewrites the whole index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickerlake_spark.operators.clustering import assign_cells, nearest_cells
from tickerlake_spark.operators.pq import adc_distance, pq_encode, seq_d2
from tickerlake_spark.storage.io import read_table, write_table

__all__ = [
    "encode_vectors",
    "stream_vector_ingest",
    "ivfpq_index_topk",
    "train_index_structure",
]


def encode_vectors(
    df: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell, code_0..code_{m-1}, v): the stored index row for each
    input vector. Residual PQ encoding (v minus its coarse centroid),
    everything map-side against broadcast literals."""
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cmat = F.array(*[F.lit(c).cast("array<double>") for c in coarse_centroids])
    res = assign_cells(base, coarse_centroids, vec_col="v", cell_col="cell").withColumn(
        "r",
        F.zip_with("v", F.element_at(cmat, F.col("cell") + 1), lambda x, y: x - y),
    )
    return pq_encode(res, codebooks, vec_col="r").drop("r")


def stream_vector_ingest(
    spark: SparkSession,
    stream_df: DataFrame,
    index_path: str,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """foreachBatch sink: encode each micro-batch and land it in the index,
    partitioned ``cell=<c>/ingest_batch=<b>``. Exactly-once on replay via
    dynamic partition overwrite of the batch's own partitions."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        encoded = encode_vectors(
            batch_df, coarse_centroids, codebooks, vec_col=vec_col, id_col=id_col
        )
        write_table(
            encoded.withColumn("ingest_batch", F.lit(int(batch_id))),
            index_path,
            mode="overwrite",
            partition_by=["cell", "ingest_batch"],
            dynamic=True,
        )

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ivfpq_index_topk(
    spark: SparkSession,
    index_path: str,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    rerank: int | None = None,
) -> DataFrame:
    """Probe a written IVF-PQ index.

    The ``cell IN probes`` filter is a partition predicate — planning-time
    directory pruning, same mechanism as ``clustering.ivf_index_topk``. ADC
    tables are computed driver-side per probed cell (the query residual
    differs per cell) and scored via array-literal lookups over the code
    columns. ``rerank=N``: exact squared-L2 re-rank of the top-N ADC
    candidates using the stored vectors (reads the vector column for N
    rows only); returns exact distances then."""
    dim = len(query_vec)
    probes = nearest_cells(coarse_centroids, query_vec, n_probe)

    scanned = read_table(spark, index_path).filter(F.col("cell").isin(probes))
    raw = None
    for p in probes:
        qr = [query_vec[j] - coarse_centroids[p][j] for j in range(dim)]
        branch = adc_distance(codebooks, qr)
        raw = (
            F.when(F.col("cell") == p, branch)
            if raw is None
            else raw.when(F.col("cell") == p, branch)
        )
    scored = scanned.withColumn("__adc", raw)

    if rerank is None:
        return (
            scored.orderBy(F.col("__adc").asc(), F.col("id").asc())
            .limit(k)
            .select(
                "id",
                F.col("cell").cast("int").alias("cell"),
                F.col("__adc").alias("adc_d2"),
            )
        )

    shortlist = scored.orderBy(F.col("__adc").asc(), F.col("id").asc()).limit(rerank)
    q = F.lit(query_vec).cast("array<double>")
    exact = F.aggregate(
        F.zip_with("v", q, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        shortlist.withColumn("__d2", exact)
        .orderBy(F.col("__d2").asc(), F.col("id").asc())
        .limit(k)
        .select(
            "id",
            F.col("cell").cast("int").alias("cell"),
            F.col("__d2").alias("d2"),
        )
    )


def train_index_structure(
    sample: DataFrame,
    dim: int,
    coarse_k: int = 8,
    m: int = 4,
    pq_k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """One-stop offline training: coarse centroids on the sample, PQ
    codebooks on the sample's residuals — the frozen structure every later
    ingest batch encodes against. Uses ``seq_d2``-compatible arithmetic
    throughout (see q130's oracle for the exact contract)."""
    from tickerlake_spark.operators.clustering import kmeans_fit
    from tickerlake_spark.operators.pq import pq_fit

    gcent, _ = kmeans_fit(sample, k=coarse_k, iters=iters, vec_col=vec_col, id_col=id_col)
    base = sample.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cmat = F.array(*[F.lit(c).cast("array<double>") for c in gcent])
    res = assign_cells(base, gcent, vec_col="v", cell_col="cell").withColumn(
        "r",
        F.zip_with("v", F.element_at(cmat, F.col("cell") + 1), lambda x, y: x - y),
    )
    codebooks = pq_fit(res, dim=dim, m=m, k=pq_k, iters=iters, vec_col="r", id_col="__id")
    return gcent, codebooks
