"""Incremental inverted-index maintenance + BM25 query over the index.

The catalog's lexical ranking (q67/q131) tokenizes the corpus per query —
right for one-shot analytics, wrong for a serving index at 100 TB. This
module is the lexical mirror of ``streaming/vector_ingest.py``: documents
stream in, the index (postings + doc lengths + corpus stats) is maintained
incrementally, and queries read the index, never the text.

Layout (all plain parquet tables under ``index_root``):

- ``postings/``  (term, doc_id, f) — one row per distinct (doc, term),
  Hive-partitioned by ``term_bucket = h60(term) mod N_BUCKETS`` and
  ``ingest_batch``. A query's terms map to a handful of buckets, so the
  scan prunes whole directories at planning time; within a bucket,
  parquet min/max on ``term`` plus dictionary pages prune row groups.
- ``doclens/``  (doc_id, dl), partitioned by ``ingest_batch`` — the BM25
  length normalization; the corpus stats (N, avgdl) are one aggregate
  over it, small enough to compute per query (or cache).

Incremental semantics: documents are tokenized ONCE, at ingest. Batches
are independent appends — a replayed micro-batch overwrites exactly its
own ``ingest_batch`` partitions (dynamic partition overwrite; tokenization
is deterministic, so replay is byte-idempotent). Folding N batches yields
an index identical to indexing the concatenated corpus in one pass, and
``bm25_query`` over it returns the same scores as the per-query
tokenization path (``plans/q_datapipe.py::bm25_scores``) — gated by
``tests/test_search_index.py``.

Document updates: re-ingesting a doc_id in a later batch leaves the old
batch's postings/doclens rows in place; ``bm25_query`` resolves this
latest-``ingest_batch``-wins per doc_id, so queries see only the newest
version. The resolution window is the compaction horizon: once
``compact_ingest_partitions`` folds both versions into the ``-1`` history
partition the batch ids that disambiguate them are gone — compact only
below the offset where updates are settled, or route updates through a
keyed MERGE (``storage/upsert.py``) instead of re-ingest.

At 100 TB: per-batch work is tokenize + one (doc, term) hash agg — linear,
no history touched. Query work is |terms| bucket-pruned postings scans +
two broadcast scalars. Compact each term_bucket's small ingest files
periodically; buckets are the compaction unit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickerlake_spark.functions.text import h60, tokens
from tickerlake_spark.storage.io import read_table, write_table

__all__ = ["index_batch", "stream_index_documents", "bm25_query", "compact_index"]

N_BUCKETS = 64


def _h60_py(s: str) -> int:
    """Driver-side twin of ``functions.text.h60`` (md5 hex prefix, 60-bit
    non-negative int) — exact-match parity is pinned by
    ``tests/test_search_index.py::test_h60_py_matches_spark``."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _postings_and_doclens(
    batch_df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    tok = batch_df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("t")
    ).filter(F.size("t") > 0)
    doclens = tok.select("doc_id", F.size("t").alias("dl"))
    postings = (
        tok.select("doc_id", F.explode("t").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("f"))
        .withColumn("term_bucket", F.pmod(h60(F.col("term")), F.lit(N_BUCKETS)))
    )
    return postings, doclens


def index_batch(
    batch_df: DataFrame,
    index_root: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Tokenize one document batch and land its postings + doc lengths,
    each under its own ``ingest_batch`` partition (replay-idempotent)."""
    postings, doclens = _postings_and_doclens(batch_df, text_col, id_col)
    write_table(
        postings.withColumn("ingest_batch", F.lit(int(batch_id))),
        os.path.join(index_root, "postings"),
        mode="overwrite",
        partition_by=["term_bucket", "ingest_batch"],
        dynamic=True,
    )
    write_table(
        doclens.withColumn("ingest_batch", F.lit(int(batch_id))),
        os.path.join(index_root, "doclens"),
        mode="overwrite",
        partition_by="ingest_batch",
        dynamic=True,
    )


def stream_index_documents(
    spark: SparkSession,
    stream_df: DataFrame,
    index_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch wrapper over ``index_batch``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        index_batch(batch_df, index_root, batch_id, text_col, id_col)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_index(spark: SparkSession, index_root: str, horizon_batch: int) -> dict:
    """Fold aged batches of BOTH index tables at the SAME horizon.

    The index is one unit: ``bm25_query``'s latest-wins resolution joins
    postings to doclens on the winning ``ingest_batch``, which only stays
    aligned if the two tables are compacted together — compacting just one
    would leave e.g. postings at ``-1`` while doclens still says ``0`` and
    silently drop those documents from results. Always use this entry
    point, not per-table ``compact_ingest_partitions``."""
    from tickerlake_spark.storage.maintenance import compact_ingest_partitions

    return {
        "postings": compact_ingest_partitions(
            spark, os.path.join(index_root, "postings"), horizon_batch
        ),
        "doclens": compact_ingest_partitions(
            spark, os.path.join(index_root, "doclens"), horizon_batch
        ),
    }


def bm25_query(
    spark: SparkSession,
    index_root: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topn: int = 50,
) -> DataFrame:
    """(doc_id, bm25): top-``topn`` documents for ``terms`` computed from
    the index alone — same formula (and same float arithmetic) as
    ``plans/q_datapipe.py::bm25_scores``, but the postings scan carries a
    ``term_bucket`` partition filter + a ``term`` predicate instead of
    re-tokenizing the corpus. Buckets are hashed DRIVER-SIDE (the same
    md5-prefix arithmetic as ``functions.text.h60``) so the query is a
    single Spark job — no createDataFrame+collect warm-up. Re-ingested
    documents resolve latest-``ingest_batch``-wins (see module doc)."""
    buckets = sorted({_h60_py(t) % N_BUCKETS for t in terms})
    postings = (
        read_table(spark, os.path.join(index_root, "postings"))
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(*terms))
    )
    # Latest-wins doc resolution: one pass over doclens picks each doc's
    # winning batch + its dl; postings join on (doc_id, winning batch)
    # BEFORE document frequencies so stale versions never inflate df.
    doclens = (
        read_table(spark, os.path.join(index_root, "doclens"))
        .groupBy("doc_id")
        .agg(
            F.expr("max_by(dl, ingest_batch)").alias("dl"),
            F.max("ingest_batch").alias("win_batch"),
        )
    )
    stats = doclens.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    live = postings.join(
        doclens,
        (postings["doc_id"] == doclens["doc_id"])
        & (postings["ingest_batch"] == doclens["win_batch"]),
    ).select(postings["doc_id"], "term", "f", "dl")
    dfreq = live.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    part = (
        F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("f") * (k1 + 1.0))
        / (F.col("f") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        live.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("part", part)
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(topn)
        .select("doc_id", F.col("score").alias("bm25"))
    )
