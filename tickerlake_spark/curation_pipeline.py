"""End-to-end corpus curation: the document-domain medallion.

``pipeline.py`` orchestrates the reference's finance chain
(bronze -> silver -> gold); this module is its analog for the training-data
side of the engine — the standard curation chain a 100 TB pretraining
pipeline runs, composed entirely from the operators the catalog queries
check one-by-one (q40/q41/q78/q79, q121-q124):

    1. exact dedup           (content-hash keep-min-id;      q40)
    2. near-dup dedup        (MinHash-LSH pairs -> connected
                              components -> keep canonical;  q41/q78/q79)
    3. repeated-span strip   (corpus-frequency boilerplate;  q121)
    4. quality filter        (fixed-weight classifier;       q123)
    5. domain mixture sample (temperature resampling;        q122)
    6. shard packing         (token-budget prefix-sum;       q124)

Each stage writes its survivors under ``data_root`` so the chain is
restartable and auditable; ``run_curation`` returns per-stage row counts
(the numbers a curation report quotes). Every stage is a pure DataFrame
plan — no driver-side loops over data, no Python UDFs; stage 2's
connected-components is the O(log diameter) pointer-doubling loop from
``operators/graph.py``, the only iterative piece.

Scale notes: stage order is deliberate. Exact dedup first removes identical
mass for ~one hash shuffle so the quadratic-ish near-dup stage never sees
it; span stripping runs before quality scoring because boilerplate inflates
quality features; mixture sampling runs late so rates reflect the cleaned
corpus; shard packing is last because it fixes the physical training
layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickerlake_spark.operators.curation import (
    assign_shards,
    mixture_rates,
    mixture_select,
    quality_score,
    strip_repeated_spans,
)
from tickerlake_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from tickerlake_spark.operators.graph import connected_components
from tickerlake_spark.storage.io import read_table, write_table

__all__ = ["run_curation"]


def _near_dup_survivors(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_threshold: float,
    cache_out: list | None = None,
) -> DataFrame:
    """Drop every doc whose near-dup component canonical (min id) is not
    itself — q79's keep rule, over q41 pairs + q78 components.

    ``cache_out`` forwards to ``minhash_lsh_pairs`` so the caller can
    unpersist the signature cache once the survivors are materialized."""
    pairs = minhash_lsh_pairs(
        docs, text_col, id_col, jaccard_threshold=jaccard_threshold,
        cache_out=cache_out,
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    data_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    jaccard_threshold: float = 0.6,
    span_words: int = 8,
    span_min_freq: int = 3,
    quality_threshold: float = 0.5,
    alpha: float = 0.5,
    budget_frac: float = 0.3,
    shard_budget: int = 2000,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.98,
    semantic_k: int = 8,
) -> dict[str, int]:
    """Run the curation chain; returns per-stage surviving row counts.
    Writes ``exact_dedup/ near_dedup/ stripped/ quality/ sampled/ shards/``
    parquet tables under ``data_root`` (shards partitioned by ``shard_id``
    — the layout a training loader reads).

    Pass ``embeddings`` — (id_col, embedding array) — to also run the
    SemDeDup semantic stage (Abbas et al. 2023) after the lexical near-dup
    pass: k-means-cluster the embeddings, drop docs with a lower-id
    cosine >= ``semantic_threshold`` neighbor in the same cell. Lexical
    dedup catches copies and templates; the semantic stage catches
    paraphrases and translations those miss."""
    stats: dict[str, int] = {"input": docs.count()}

    s1 = exact_dedup(docs, text_col, id_col)
    write_table(s1, os.path.join(data_root, "exact_dedup"))
    s1 = read_table(spark, os.path.join(data_root, "exact_dedup"))
    stats["exact_dedup"] = s1.count()

    dedup_caches: list = []
    s2 = _near_dup_survivors(
        s1, text_col, id_col, jaccard_threshold, cache_out=dedup_caches
    )
    if embeddings is not None:
        from tickerlake_spark.operators.clustering import (
            kmeans_fit,
            semantic_dedup_flags,
        )

        surviving_emb = embeddings.join(s2.select(id_col), id_col, "left_semi")
        centroids, _ = kmeans_fit(
            surviving_emb, k=semantic_k, vec_col="embedding", id_col=id_col
        )
        flags = semantic_dedup_flags(
            surviving_emb,
            centroids,
            threshold=semantic_threshold,
            vec_col="embedding",
            id_col=id_col,
        )
        sem_dead = flags.filter(F.col("is_dup")).select(
            F.col("id").alias(id_col)
        )
        s2 = s2.join(sem_dead, id_col, "left_anti")
    write_table(s2, os.path.join(data_root, "near_dedup"))
    # the near-dedup output is on disk: release the signature cache now
    # instead of pinning it for the rest of the (long) curation session
    for cached in dedup_caches:
        cached.unpersist()
    s2 = read_table(spark, os.path.join(data_root, "near_dedup"))
    stats["near_dedup"] = s2.count()

    stripped = strip_repeated_spans(
        s2, text_col, id_col, span_words=span_words, min_freq=span_min_freq
    )
    s3 = (
        s2.drop(text_col)
        .join(
            stripped.select(id_col, F.col("kept_text").alias(text_col)),
            id_col,
        )
        .filter(F.length(text_col) > 0)
    )
    write_table(s3, os.path.join(data_root, "stripped"))
    s3 = read_table(spark, os.path.join(data_root, "stripped"))
    stats["stripped"] = s3.count()

    s4 = (
        quality_score(s3, text_col, id_col, threshold=quality_threshold)
        .filter(F.col("keep"))
        .drop("keep")
    )
    write_table(s4, os.path.join(data_root, "quality"))
    s4 = read_table(spark, os.path.join(data_root, "quality"))
    stats["quality"] = s4.count()

    rates = mixture_rates(s4, text_col, source_col, alpha, budget_frac)
    s5 = mixture_select(s4, rates, source_col, id_col)
    write_table(s5, os.path.join(data_root, "sampled"))
    s5 = read_table(spark, os.path.join(data_root, "sampled"))
    stats["sampled"] = s5.count()

    shards = assign_shards(
        s5, text_col, id_col, shard_budget=shard_budget
    ).select(id_col, "shard_id")
    final = s5.join(shards, id_col)
    write_table(
        final, os.path.join(data_root, "shards"), partition_by="shard_id"
    )
    stats["shards"] = read_table(spark, os.path.join(data_root, "shards")).count()
    stats["n_shards"] = (
        read_table(spark, os.path.join(data_root, "shards"))
        .select("shard_id")
        .distinct()
        .count()
    )
    return stats
