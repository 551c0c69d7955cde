"""Incremental inverted index (streaming/search_index.py): folding batches
equals one-pass indexing, index-side BM25 equals the per-query tokenization
path, replays are idempotent, and query scans prune term buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tickerlake_spark.storage.io import read_table
from tickerlake_spark.streaming.search_index import (
    bm25_query,
    compact_index,
    index_batch,
    stream_index_documents,
)

TERMS = ["spark", "table", "query"]


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _fold_two_batches(docs, index_root):
    index_batch(docs.filter(F.col("doc_id") % 2 == 0), index_root, 0)
    index_batch(docs.filter(F.col("doc_id") % 2 == 1), index_root, 1)


def test_index_bm25_matches_per_query_tokenization(spark, docs, sf_dir, tmp_path):
    """BM25 from the folded index == bm25_scores re-tokenizing the corpus
    (same formula, same floats at 6dp), top-50 identical."""
    from tickerlake_spark.functions.core import stable_round
    from tickerlake_spark.plans.q_datapipe import bm25_scores

    index_root = str(tmp_path / "idx")
    _fold_two_batches(docs, index_root)

    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_query(spark, index_root, TERMS, topn=50)
        .select("doc_id", stable_round(F.col("bm25"), 6).alias("bm25"))
        .collect()
    }
    want = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(50)
        .select("doc_id", stable_round(F.col("score"), 6).alias("bm25"))
        .collect()
    }
    assert got == want and len(got) == 50


def test_replayed_batch_is_idempotent(spark, docs, tmp_path):
    import os

    index_root = str(tmp_path / "idx")
    _fold_two_batches(docs, index_root)
    n_post = read_table(spark, os.path.join(index_root, "postings")).count()
    n_len = read_table(spark, os.path.join(index_root, "doclens")).count()
    # crash/retry of batch 1
    index_batch(docs.filter(F.col("doc_id") % 2 == 1), index_root, 1)
    assert read_table(spark, os.path.join(index_root, "postings")).count() == n_post
    assert read_table(spark, os.path.join(index_root, "doclens")).count() == n_len


def test_query_scan_prunes_term_buckets(spark, docs, tmp_path):
    index_root = str(tmp_path / "idx")
    _fold_two_batches(docs, index_root)
    plan = (
        bm25_query(spark, index_root, TERMS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "term_bucket" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "query did not prune postings partitions:\n" + plan


def test_streaming_wrapper_builds_same_index(spark, docs, tmp_path):
    import os

    landing = str(tmp_path / "landing")
    docs.filter(F.col("doc_id") < 250).write.parquet(landing)
    docs.filter(F.col("doc_id") >= 250).write.mode("append").parquet(landing)

    index_root = str(tmp_path / "idx_stream")
    q = stream_index_documents(
        spark,
        spark.readStream.schema(docs.schema).parquet(landing),
        index_root,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    ref_root = str(tmp_path / "idx_ref")
    index_batch(docs, ref_root, 0)
    got = {
        (r["term"], r["doc_id"], r["f"])
        for r in read_table(spark, os.path.join(index_root, "postings")).collect()
    }
    want = {
        (r["term"], r["doc_id"], r["f"])
        for r in read_table(spark, os.path.join(ref_root, "postings")).collect()
    }
    assert got == want


def test_horizon_compaction_preserves_queries_and_replay(spark, docs, tmp_path):
    """compact_ingest_partitions folds batches below the checkpoint horizon
    into ingest_batch=-1 per term bucket: query results are unchanged, the
    aged batch dirs are gone, pruning layout survives, and a replay of a
    live (>= horizon) batch is still idempotent."""
    import os

    from tickerlake_spark.functions.core import stable_round
    from tickerlake_spark.storage.maintenance import compact_ingest_partitions

    index_root = str(tmp_path / "idx")
    post_root = os.path.join(index_root, "postings")
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, b in enumerate(thirds):
        index_batch(b, index_root, i)

    def top50():
        return [
            (r["doc_id"], r["bm25"])
            for r in bm25_query(spark, index_root, TERMS, topn=50)
            .select("doc_id", stable_round(F.col("bm25"), 6).alias("bm25"))
            .collect()
        ]

    before = sorted(top50())
    n_before = read_table(spark, post_root).count()

    stats = compact_index(spark, index_root, horizon_batch=2)["postings"]
    assert stats["rows"] > 0 and stats["files_after"] < stats["files_before"]
    assert sorted(top50()) == before
    assert read_table(spark, post_root).count() == n_before
    batches = {
        d.split("=")[1]
        for r, dirs, _f in os.walk(post_root)
        for d in dirs
        if d.startswith("ingest_batch=")
    }
    assert batches == {"-1", "2"}

    # recompaction with the same horizon is a no-op
    again = compact_index(spark, index_root, horizon_batch=2)["postings"]
    assert again["rows"] == 0
    # a replayed LIVE batch still overwrites only its own partitions
    index_batch(thirds[2], index_root, 2)
    assert read_table(spark, post_root).count() == n_before
    assert sorted(top50()) == before
    # folding the now-aged batch 2 in merges with the existing history
    final = compact_index(spark, index_root, horizon_batch=3)["postings"]
    assert final["rows"] > 0
    assert sorted(top50()) == before


def test_h60_py_matches_spark(spark):
    """Driver-side bucket hashing must be bit-identical to the Spark-side
    h60 (the index writer's partitioner) — else queries scan wrong buckets."""
    from tickerlake_spark.functions.text import h60
    from tickerlake_spark.streaming.search_index import _h60_py

    words = ["spark", "table", "query", "", "a", "Straße", "naïve", "日本語", "x" * 500]
    got = {
        r["t"]: r["h"]
        for r in spark.createDataFrame([(w,) for w in words], "t string")
        .select("t", h60(F.col("t")).alias("h"))
        .collect()
    }
    for w in words:
        assert _h60_py(w) == got[w], w


def test_reingested_doc_resolves_latest_wins(spark, docs, tmp_path):
    """Re-ingesting updated documents in a later batch: bm25_query must score
    against ONLY the newest version of each doc (stale postings excluded from
    tf, df, dl, and corpus stats) — identical to an index built fresh from
    the post-update corpus."""
    import os

    from tickerlake_spark.functions.core import stable_round

    updated = docs.filter(F.col("doc_id") < 40).withColumn(
        "text", F.concat(F.lit("spark spark revised edition "), F.col("text"))
    )

    index_root = str(tmp_path / "idx")
    index_batch(docs, index_root, 0)
    index_batch(updated, index_root, 1)  # batch-1 re-ingest of doc_id < 40

    ref_root = str(tmp_path / "ref")
    current = docs.filter(F.col("doc_id") >= 40).unionByName(updated)
    index_batch(current, ref_root, 0)

    def top50(root):
        return [
            (r["doc_id"], r["bm25"])
            for r in bm25_query(spark, root, TERMS, topn=50)
            .select("doc_id", stable_round(F.col("bm25"), 6).alias("bm25"))
            .collect()
        ]

    assert sorted(top50(index_root)) == sorted(top50(ref_root))


def _top50(spark, index_root):
    from tickerlake_spark.functions.core import stable_round

    return sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_query(spark, index_root, TERMS, topn=50)
        .select("doc_id", stable_round(F.col("bm25"), 6).alias("bm25"))
        .collect()
    )


def _batch_layout(post_root):
    import os

    return {
        d.split("=")[1]
        for _r, dirs, _f in os.walk(post_root)
        for d in dirs
        if d.startswith("ingest_batch=")
    }


def _no_markers(post_root):
    import os

    return not [
        f
        for _r, _d, fs in os.walk(post_root)
        for f in fs
        if f == "_compact_marker.json"
    ]


def _crash_setup(spark, docs, tmp_path):
    import os

    index_root = str(tmp_path / "idx")
    post_root = os.path.join(index_root, "postings")
    for i in range(3):
        index_batch(docs.filter(F.col("doc_id") % 3 == i), index_root, i)
    before = _top50(spark, index_root)
    n_before = read_table(spark, post_root).count()
    return index_root, post_root, before, n_before


def test_compaction_crash_between_rename_and_delete_is_repaired(
    spark, docs, tmp_path, monkeypatch
):
    """Kill the compactor right after a bucket's new -1 history lands but
    before its aged dirs are deleted (the r3-ADVICE permanent-duplication
    window): the marker makes the re-run repair instead of double-folding."""
    import shutil as _shutil

    from tickerlake_spark.storage import maintenance

    index_root, post_root, before, n_before = _crash_setup(spark, docs, tmp_path)

    real_rmtree = _shutil.rmtree
    fired = {"v": False}

    def exploding_rmtree(p, *a, **k):
        sp = str(p)
        if (
            not fired["v"]
            and sp.startswith(post_root)
            and "__hist_" not in sp
            and "ingest_batch=" in sp
            and "ingest_batch=-1" not in sp
        ):
            fired["v"] = True
            raise RuntimeError("simulated crash mid-swap")
        return real_rmtree(p, *a, **k)

    # the deletes run through the FS protocol now (LocalFS.rmtree wraps
    # shutil.rmtree), so the crash hook goes on the fs module — patching
    # a vestigial maintenance.shutil stopped working when that unused
    # import was removed (r10 nit)
    from tickerlake_spark.storage import fs as fs_mod

    monkeypatch.setattr(fs_mod.shutil, "rmtree", exploding_rmtree)
    with pytest.raises(RuntimeError):
        maintenance.compact_ingest_partitions(spark, post_root, horizon_batch=2)
    monkeypatch.setattr(fs_mod.shutil, "rmtree", real_rmtree)
    assert fired["v"]

    maintenance.compact_ingest_partitions(spark, post_root, horizon_batch=2)
    compact_index(spark, index_root, horizon_batch=2)  # align doclens
    assert read_table(spark, post_root).count() == n_before
    assert _top50(spark, index_root) == before
    assert _batch_layout(post_root) == {"-1", "2"}
    assert _no_markers(post_root)
    # and converged: a further run folds nothing
    assert (
        maintenance.compact_ingest_partitions(spark, post_root, horizon_batch=2)["rows"]
        == 0
    )


def test_compaction_crash_before_rename_is_repaired(spark, docs, tmp_path, monkeypatch):
    """Kill the compactor after the marker is written but before the bucket's
    new -1 dir is renamed in: the re-run's repair completes the rename from
    the staged dir, then deletes the aged dirs."""
    import os as _os

    from tickerlake_spark.storage import maintenance

    index_root, post_root, before, n_before = _crash_setup(spark, docs, tmp_path)

    real_rename = _os.rename
    fired = {"v": False}

    def exploding_rename(src, dst, *a, **k):
        if not fired["v"] and "__hist_" in str(src) and str(dst).startswith(post_root):
            fired["v"] = True
            raise RuntimeError("simulated crash pre-rename")
        return real_rename(src, dst, *a, **k)

    monkeypatch.setattr(maintenance.os, "rename", exploding_rename)
    with pytest.raises(RuntimeError):
        maintenance.compact_ingest_partitions(spark, post_root, horizon_batch=2)
    monkeypatch.setattr(maintenance.os, "rename", real_rename)
    assert fired["v"]

    compact_index(spark, index_root, horizon_batch=2)
    assert read_table(spark, post_root).count() == n_before
    assert _top50(spark, index_root) == before
    assert _batch_layout(post_root) == {"-1", "2"}
    assert _no_markers(post_root)
