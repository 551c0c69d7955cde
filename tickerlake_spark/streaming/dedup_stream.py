"""Continuous-crawl near-duplicate dedup: stream of documents vs a
persisted MinHash signature store.

The batch-mode dedup suite (``operators/dedup.py``) answers "which pairs in
this corpus are near-dups". An ingestion pipeline asks a different
question per arriving batch: "which of these NEW docs duplicate anything
already kept?" — and must answer it without re-tokenizing the historical
corpus. This module implements that incremental shape:

- the signature store (``signature_table`` schema: doc_id, shingles,
  signature) is the ONLY historical state touched — ~40 bytes/doc of
  signature + the shingle arrays for verification, never the corpus text;
- per batch, candidates come from an equi-join of the new batch's band
  keys against the store's band keys (plus an in-batch self-join), so work
  scales with the batch and its bucket matches, not the corpus;
- survivors' signatures are appended to the store, making the operation a
  fold over batches: replaying N batches through the stream equals one
  batch-mode dedup pass with keep-first-arrival semantics (gated by
  ``test_stream_dedup_matches_batch_keep_first``).

At 100 TB store scale, write the store bucketed on doc_id
(``storage/bucketed.py``) and compact periodically; the band join reads
only (doc_id, band, key) projections of it, so column pruning keeps the
per-batch scan at signature width.

Semantics: keep-FIRST-arrival, greedy. A new doc is dropped if it
verifies (exact shingle Jaccard >= threshold) against any stored survivor
or any lower-id doc of its own batch. This is the standard crawl-dedup
policy (the first crawled copy wins); transitive near-dup clusters are the
batch suite's job (``operators/graph.py`` connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickerlake_spark.operators.dedup import band_keys, signature_table
from tickerlake_spark.storage.io import read_table, table_exists, write_table

__all__ = ["dedup_batch_against_store", "stream_dedup_documents"]


def _verified_dup_ids(
    new_sigs: DataFrame,
    against: DataFrame,
    bands: int,
    num_hashes: int,
    threshold: float,
    in_batch: bool,
) -> DataFrame:
    """doc_ids in ``new_sigs`` that verify as near-dups of ``against``.

    ``in_batch=True`` restricts to matches against LOWER-id docs of the
    same batch (drop the later arrival; the earlier one may itself die —
    near-dup chains collapse to their first member, which is what a crawl
    wants); ``False`` means any match kills the new doc (the store holds
    only previously-kept survivors).
    """
    nb = band_keys(new_sigs, bands, num_hashes).alias("n")
    ab = band_keys(against, bands, num_hashes).alias("s")
    cond = (F.col("n.band") == F.col("s.band")) & (F.col("n.key") == F.col("s.key"))
    if in_batch:
        cond = cond & (F.col("s.doc_id") < F.col("n.doc_id"))
    cand = (
        nb.join(ab, cond)
        .select(
            F.col("n.doc_id").alias("new_id"), F.col("s.doc_id").alias("old_id")
        )
        .dropDuplicates(["new_id", "old_id"])
    )
    pairs = cand.join(
        new_sigs.select(
            F.col("doc_id").alias("new_id"), F.col("shingles").alias("__sn")
        ),
        "new_id",
    ).join(
        against.select(
            F.col("doc_id").alias("old_id"), F.col("shingles").alias("__so")
        ),
        "old_id",
    )
    jacc = F.size(F.array_intersect("__sn", "__so")) / F.size(
        F.array_union("__sn", "__so")
    )
    return (
        pairs.filter(jacc >= threshold)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )


def dedup_batch_against_store(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.6,
    batch_id: int | None = None,
) -> DataFrame:
    """One incremental dedup step: writes the surviving signatures to the
    store at ``store_path`` and returns the surviving rows of ``batch_df``.

    Pure batch logic so it is unit-testable and reusable; the streaming
    wrapper calls this per micro-batch. The batch is deduped in two
    passes sharing one signature computation:
      1. vs the persisted store (any match drops the new doc),
      2. vs lower-id in-batch survivors (keep-first within the batch).

    ``batch_id=None``: signatures are plainly appended (one-shot use).
    ``batch_id=N`` (the streaming path): signatures land in an
    ``ingest_batch=N`` Hive partition via dynamic partition overwrite, and
    the store read EXCLUDES partition N — so a replayed micro-batch
    recomputes against exactly the pre-batch store state and overwrites
    only its own partition: exactly-once without a transaction log.
    """
    from pyspark import StorageLevel

    new_sigs = signature_table(
        batch_df, text_col, id_col, shingle_n, num_hashes
    ).persist(StorageLevel.MEMORY_AND_DISK)

    dead = None
    if table_exists(store_path):
        store = read_table(spark, store_path)
        if batch_id is not None and "ingest_batch" in store.columns:
            store = store.filter(F.col("ingest_batch") != batch_id)
        store = store.select("doc_id", "shingles", "signature")
        dead = _verified_dup_ids(
            new_sigs, store, bands, num_hashes, jaccard_threshold, in_batch=False
        )
    in_batch_dead = _verified_dup_ids(
        new_sigs, new_sigs, bands, num_hashes, jaccard_threshold, in_batch=True
    )
    dead = in_batch_dead if dead is None else dead.unionByName(in_batch_dead)
    # Materialize the dead set while new_sigs is still cached: both the
    # store write and the survivors the caller executes later depend on it.
    dead = dead.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    dead.count()

    surviving_sigs = new_sigs.join(dead, "doc_id", "left_anti")
    if batch_id is None:
        write_table(surviving_sigs, store_path, mode="append")
        # signature_table's output id column is always named doc_id;
        # rename to the caller's id column for the survivor anti-join
        survivors = batch_df.join(
            dead.withColumnRenamed("doc_id", id_col), on=id_col, how="left_anti"
        )
        # one-shot mode: the caller materializes `survivors` at a time of
        # its choosing, so the dead cache must outlive this call; it is
        # released lazily (LRU / session end), same policy as the other
        # operator-internal persists
        new_sigs.unpersist()
        return survivors
    write_table(
        surviving_sigs.withColumn("ingest_batch", F.lit(int(batch_id))),
        store_path,
        mode="overwrite",
        partition_by="ingest_batch",
        dynamic=True,
    )
    # Streaming mode: derive survivors from the just-written partition
    # instead of the cached plans — the store read-back depends on neither
    # new_sigs nor dead, so both caches can be dropped NOW. Without this a
    # long-running stream pins one dead-set cache per micro-batch.
    kept_ids = (
        read_table(spark, store_path)
        .filter(F.col("ingest_batch") == int(batch_id))
        .select(F.col("doc_id").alias(id_col))
    )
    # Docs shorter than the shingle width have no signature and therefore
    # never enter the store — they cannot be near-dup-checked and always
    # survive. The predicate mirrors _with_shingles' emptiness filter.
    from tickerlake_spark.functions.text import tokens

    too_short = batch_df.filter(F.size(tokens(text_col)) < shingle_n)
    survivors = batch_df.join(kept_ids, on=id_col, how="left_semi").unionByName(
        too_short
    )
    new_sigs.unpersist()
    dead.unpersist()
    return survivors


def stream_dedup_documents(
    spark: SparkSession,
    stream_df: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_dir: str,
    **dedup_kwargs,
):
    """Streaming wrapper: foreachBatch incremental dedup.

    ``stream_df`` is a streaming DataFrame of documents (e.g. a file
    source over a landing directory). Each micro-batch is deduped against
    the persisted signature store and its survivors written to
    ``out_path``. Exactly-once on replay: both the store and the output
    are Hive-partitioned by ``ingest_batch`` and written with dynamic
    partition overwrite, and the store read excludes the current batch's
    partition — a replayed batch_id recomputes against the pre-batch
    state and overwrites only its own partitions (see
    ``dedup_batch_against_store``).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        survivors = dedup_batch_against_store(
            spark, batch_df, store_path, batch_id=batch_id, **dedup_kwargs
        )
        write_table(
            survivors.withColumn("ingest_batch", F.lit(int(batch_id))),
            out_path,
            mode="overwrite",
            partition_by="ingest_batch",
            dynamic=True,
        )

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
