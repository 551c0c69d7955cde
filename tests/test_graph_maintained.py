"""Maintained purchase-graph edge table (VERDICT r6 item 5).

Pins: incremental upserts of purchase batches converge to the one-shot
batch build's exact edge set; replays are no-ops; the streaming maintainer
matches batch; and PageRank over the prebuilt table equals PageRank over
freshly-built edges (the serving contract that makes the table useful).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _purchases(spark, rows):
    return spark.createDataFrame(rows, "o_custkey long, l_suppkey long")


ROWS = [
    (1, 10), (1, 11), (2, 10), (3, 12), (4, 13), (4, 10),
    (5, 14), (1, 10),  # duplicate purchase -> one edge
]


def test_incremental_upserts_match_one_shot_build(spark, tmp_path):
    from tickerlake_spark.operators.graph import read_edges, upsert_edges
    from tickerlake_spark.streaming.graph_maintain import purchase_pairs

    path = str(tmp_path / "edges")
    for lo, hi in ((0, 3), (3, 6), (6, 8)):
        upsert_edges(spark, path, purchase_pairs(_purchases(spark, ROWS[lo:hi])))
    got = sorted(map(tuple, read_edges(spark, path).collect()))
    want = sorted(
        map(
            tuple,
            purchase_pairs(_purchases(spark, ROWS))
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionByName(
                purchase_pairs(_purchases(spark, ROWS)).select(
                    F.col("b").alias("src"), F.col("a").alias("dst")
                )
            )
            .distinct()
            .collect(),
        )
    )
    assert got == want
    # layout: src-hash buckets, no root-level files
    assert any(d.startswith("sb=") for d in os.listdir(path))
    assert not any(f.endswith(".parquet") for f in os.listdir(path))


def test_replayed_batch_is_a_noop(spark, tmp_path):
    from tickerlake_spark.operators.graph import read_edges, upsert_edges
    from tickerlake_spark.streaming.graph_maintain import purchase_pairs

    path = str(tmp_path / "edges")
    upsert_edges(spark, path, purchase_pairs(_purchases(spark, ROWS)))
    before = sorted(map(tuple, read_edges(spark, path).collect()))
    upsert_edges(spark, path, purchase_pairs(_purchases(spark, ROWS[3:6])))
    assert sorted(map(tuple, read_edges(spark, path).collect())) == before


def test_stream_matches_batch_edges(spark, tmp_path):
    from tickerlake_spark.operators.graph import read_edges, upsert_edges
    from tickerlake_spark.streaming.graph_maintain import (
        purchase_pairs,
        stream_purchases_to_edges,
    )

    src_dir = str(tmp_path / "purchases")
    os.makedirs(src_dir)
    for i, (lo, hi) in enumerate(((0, 3), (3, 6), (6, 8))):
        _purchases(spark, ROWS[lo:hi]).coalesce(1).write.parquet(
            os.path.join(src_dir, f"chunk={i}")
        )
    stream_path = str(tmp_path / "edges_stream")
    q = stream_purchases_to_edges(
        spark,
        src_dir,
        stream_path,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    batch_path = str(tmp_path / "edges_batch")
    upsert_edges(spark, batch_path, purchase_pairs(_purchases(spark, ROWS)))
    assert sorted(map(tuple, read_edges(spark, stream_path).collect())) == sorted(
        map(tuple, read_edges(spark, batch_path).collect())
    )


def test_pagerank_over_maintained_table_matches_fresh(spark, tmp_path):
    from tickerlake_spark.operators.graph import pagerank, read_edges, upsert_edges
    from tickerlake_spark.streaming.graph_maintain import purchase_pairs

    path = str(tmp_path / "edges")
    upsert_edges(spark, path, purchase_pairs(_purchases(spark, ROWS)))
    pairs = purchase_pairs(_purchases(spark, ROWS))
    fresh = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    got = sorted(
        map(tuple, pagerank(read_edges(spark, path), iters=3, normalize=True).collect())
    )
    want = sorted(map(tuple, pagerank(fresh, iters=3, normalize=True).collect()))
    assert got == want


def test_int_keyed_graph_gives_identical_scores(spark):
    """The int-encoded purchase graph (the deployment layout the 10x proof
    benches) is isomorphic to the tagged-string one: PageRank scores match
    exactly and the label decode restores the string node names."""
    from pyspark.sql import functions as F

    from tickerlake_spark.operators.graph import pagerank
    from tickerlake_spark.streaming.graph_maintain import (
        decode_purchase_node,
        purchase_pairs,
        purchase_pairs_int,
    )

    pur = _purchases(spark, ROWS)

    def sym(pairs):
        return pairs.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))

    str_ranks = pagerank(sym(purchase_pairs(pur)), iters=4, normalize=True)
    int_ranks = pagerank(sym(purchase_pairs_int(pur)), iters=4, normalize=True).select(
        decode_purchase_node(F.col("node")).alias("node"), "score"
    )
    assert sorted(map(tuple, str_ranks.select("node", "score").collect())) == sorted(
        map(tuple, int_ranks.collect())
    )


def test_reversed_orientation_does_not_double_store(spark, tmp_path):
    """ADVICE r7: a non-bipartite caller feeding both orientations of the
    same undirected edge must merge to ONE stored row (least/greatest
    canonicalization in upsert_edges)."""
    from tickerlake_spark.operators.graph import read_edges, upsert_edges

    path = str(tmp_path / "edges")
    fwd = spark.createDataFrame([("n1", "n2"), ("n3", "n4")], "a string, b string")
    rev = fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    upsert_edges(spark, path, fwd)
    upsert_edges(spark, path, rev)
    stored = spark.read.parquet(path).select("src", "dst").collect()
    assert sorted(map(tuple, stored)) == [("n1", "n2"), ("n3", "n4")]
    # and the served symmetrized view has exactly both directions once
    served = sorted(map(tuple, read_edges(spark, path).collect()))
    assert served == [
        ("n1", "n2"), ("n2", "n1"), ("n3", "n4"), ("n4", "n3"),
    ]


def test_mixed_orientation_within_one_batch(spark, tmp_path):
    from tickerlake_spark.operators.graph import upsert_edges

    path = str(tmp_path / "edges")
    both = spark.createDataFrame(
        [("n1", "n2"), ("n2", "n1"), ("n2", "n1")], "a string, b string"
    )
    upsert_edges(spark, path, both)
    assert spark.read.parquet(path).count() == 1


def test_legacy_noncanonical_table_detected(spark, tmp_path):
    """ADVICE r8: upserting into an edge table written by a
    pre-canonicalization build (reversed rows, no layout marker) must raise
    with a rebuild instruction instead of silently accumulating duplicates;
    a clean legacy table is verified once and marked."""
    import os

    import pytest

    from tickerlake_spark.operators.graph import (
        _EDGE_LAYOUT_MARKER,
        upsert_edges,
    )

    # dirty legacy table: stored rows violate src <= dst
    dirty = str(tmp_path / "dirty")
    legacy = spark.createDataFrame(
        [("n9", "n1", 3), ("n2", "n5", 3)], "src string, dst string, sb int"
    )
    legacy.write.partitionBy("sb").parquet(dirty)
    batch = spark.createDataFrame([("n1", "n2")], "a string, b string")
    with pytest.raises(ValueError, match="Rebuild"):
        upsert_edges(spark, dirty, batch)

    # clean legacy table (canonical rows, marker missing): verified once,
    # marker installed, upsert proceeds
    clean = str(tmp_path / "clean")
    spark.createDataFrame(
        [("n1", "n9", 3)], "src string, dst string, sb int"
    ).write.partitionBy("sb").parquet(clean)
    assert not os.path.exists(os.path.join(clean, _EDGE_LAYOUT_MARKER))
    upsert_edges(spark, clean, batch)
    assert os.path.exists(os.path.join(clean, _EDGE_LAYOUT_MARKER))
    # marker present -> later upserts skip the verification scan
    upsert_edges(spark, clean, batch)


def test_marker_written_on_fresh_table(spark, tmp_path):
    import os

    from tickerlake_spark.operators.graph import (
        _EDGE_LAYOUT_MARKER,
        upsert_edges,
    )

    path = str(tmp_path / "edges")
    upsert_edges(
        spark, path, spark.createDataFrame([("n1", "n2")], "a string, b string")
    )
    assert os.path.exists(os.path.join(path, _EDGE_LAYOUT_MARKER))
    # the marker is '_'-prefixed: Spark's reader must still scan cleanly
    assert spark.read.parquet(path).count() == 1
