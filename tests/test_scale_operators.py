"""Tests for the scale-posture modules: SQL views, bucketed tables,
skew-salted joins, and the offline validation harness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# sql.py — SQL-queryable surface


def test_testdata_views_run_oracle_sql_verbatim(spark, sf_dir, duck):
    """Registering the testdata views makes catalog oracle SQL runnable
    through spark.sql too — same names, same tables, both engines agree."""
    from tickerlake_spark.sql import register_testdata_views

    names = register_testdata_views(spark, sf_dir)
    assert {"lineitem", "orders", "region"} <= set(names)
    sql = (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )
    got = [(r["o_orderstatus"], r["n"]) for r in spark.sql(sql).collect()]
    want = duck.execute(sql).fetchall()
    assert got == [tuple(w) for w in want]


def test_catalog_views_layer_naming(spark, tmp_path):
    from tickerlake_spark.sql import register_catalog_views
    from tickerlake_spark.storage import Catalog, write_table

    cat = Catalog(root=str(tmp_path))
    df = spark.range(5).select(F.col("id").alias("ticker"))
    write_table(df, cat.silver("ticker_metadata"))
    names = register_catalog_views(spark, cat)
    assert names == ["silver_ticker_metadata"]
    assert spark.sql("SELECT COUNT(*) AS n FROM silver_ticker_metadata").first()["n"] == 5


# --------------------------------------------------------------------------
# storage/bucketing.py — shuffle-free co-located joins


def test_bucketed_join_plans_zero_exchanges(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with NO
    Exchange in the final plan — the pre-shuffle happened at write time."""
    from tickerlake_spark.storage import write_bucketed

    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("o_flag")
    )
    items = spark.range(0, 4000).select(
        (F.col("id") % 1000).alias("o_orderkey"), F.col("id").alias("l_item")
    )
    write_bucketed(orders, "b_orders", str(tmp_path / "o"), 4, "o_orderkey")
    write_bucketed(items, "b_items", str(tmp_path / "i"), 4, "o_orderkey")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ so the assertion targets the shuffle, not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_items"), "o_orderkey")
        assert joined.count() == 4000
        plan = _final_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_attach_bucketed_restores_metadata(spark, tmp_path):
    """Bucket metadata is catalog state; attach_bucketed re-declares it over
    existing files and the shuffle-free plan comes back."""
    from tickerlake_spark.storage import attach_bucketed, write_bucketed

    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_bucketed(df, "b_tmp", str(tmp_path / "t"), 4, "k")
    spark.sql("DROP TABLE b_tmp")  # metadata gone, files remain

    attach_bucketed(spark, "b_tmp", str(tmp_path / "t"), 4, "k", "k BIGINT, v BIGINT")
    got = spark.table("b_tmp")
    assert got.count() == 100
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        self_join = spark.table("b_tmp").join(
            spark.table("b_tmp").select("k", F.col("v").alias("v2")), "k"
        )
        self_join.count()
        assert "Exchange" not in _final_plan(self_join)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_tmp")


# --------------------------------------------------------------------------
# operators/skew.py — salted join


def test_salted_join_matches_plain_join(spark, sf_dir):
    from tickerlake_spark.operators.skew import salted_join

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.col("l_suppkey").alias("s_suppkey"), "l_orderkey", "l_linenumber")
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    plain = li.join(sup, "s_suppkey").select("l_orderkey", "l_linenumber", "s_name")
    salted = salted_join(li, sup, on="s_suppkey", salt=8).select(
        "l_orderkey", "l_linenumber", "s_name"
    )
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_left_join_keeps_unmatched(spark):
    from tickerlake_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "c")], "k int, payload string"
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, attr string")
    out = salted_join(fact, dim, on="k", how="left", salt=4).orderBy("payload")
    rows = [(r["k"], r["payload"], r["attr"]) for r in out.collect()]
    assert rows == [(1, "a", "x"), (2, "b", "y"), (9, "c", None)]
    assert "__salt" not in out.columns


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must land in multiple salt sub-keys (the point)."""
    from tickerlake_spark.operators.skew import _SALT

    fact = spark.range(0, 1000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    salted = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(*fact.columns), F.lit(16)).cast("int")
    )
    n_subkeys = salted.select(_SALT).distinct().count()
    assert n_subkeys >= 12  # 1000 draws over 16 buckets: all ~always hit


# --------------------------------------------------------------------------
# validation.py — offline validation harness


def test_classify_date_counts_statuses(spark):
    from tickerlake_spark.validation import classify_date_counts

    rows = (
        [("2024-01-01",)] * 10
        + [("2024-01-02",)] * 10
        + [("2024-01-03",)] * 1  # below_min (<2) wins over low
        + [("2024-01-04",)] * 3  # low: < 50% of mean (6)
        + [("2024-01-05",)] * 30  # high: > 200% of mean
        + [("2024-01-06",)] * 0
    )
    df = spark.createDataFrame(rows, "date string").select(
        F.to_date("date").alias("date")
    )
    out = {
        r["date"].isoformat(): r["status"]
        for r in classify_date_counts(df, min_records=2).collect()
    }
    assert out == {
        "2024-01-01": "ok",
        "2024-01-02": "ok",
        "2024-01-03": "below_min",
        "2024-01-04": "low",
        "2024-01-05": "high",
    }


def test_split_adjustment_cross_validates(spark, sf_dir):
    """The engine's zero-shuffle fold and the reference-shaped join+product
    formulation must agree within $0.01 around every sampled split."""
    from tickerlake_spark.operators.splits import apply_splits
    from tickerlake_spark.plans.finance import stock_bars, stock_splits
    from tickerlake_spark.validation import validate_split_adjustment

    bars = stock_bars(spark, sf_dir)
    splits = stock_splits(spark, sf_dir)
    adjusted = apply_splits(bars, splits)
    report = validate_split_adjustment(bars, splits, adjusted)
    n = report.count()
    assert n > 0, "spot-checker sampled no bars — fixture too small?"
    bad = report.filter(~F.col("ok"))
    assert bad.count() == 0, bad.limit(5).collect()


def test_validation_detects_injected_drift(spark, sf_dir):
    """Sanity: a deliberately broken adjustment (off by $0.05) must fail."""
    from tickerlake_spark.operators.splits import apply_splits
    from tickerlake_spark.plans.finance import stock_bars, stock_splits
    from tickerlake_spark.validation import validate_split_adjustment

    bars = stock_bars(spark, sf_dir)
    splits = stock_splits(spark, sf_dir)
    broken = apply_splits(bars, splits).withColumn(
        "close", F.col("close") + F.lit(0.05)
    )
    report = validate_split_adjustment(bars, splits, broken)
    assert report.filter(~F.col("ok")).count() == report.count()


# --------------------------------------------------------------------------
# operators/rangejoin.py — bucketed range join


def test_range_join_matches_naive_theta_join(spark, sf_dir):
    from tickerlake_spark.operators.rangejoin import bucketed_range_join

    points = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    bands = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey",
        (F.col("s_acctbal") * 30).alias("lo"),
        (F.col("s_acctbal") * 30 + 4000).alias("hi"),
    )
    fast = bucketed_range_join(
        points, bands, "o_totalprice", "lo", "hi", bucket_width=3000.0
    ).select("o_orderkey", "s_suppkey")
    naive = (
        points.crossJoin(bands)
        .filter(
            (F.col("lo") <= F.col("o_totalprice"))
            & (F.col("o_totalprice") < F.col("hi"))
        )
        .select("o_orderkey", "s_suppkey")
    )
    assert fast.exceptAll(naive).isEmpty() and naive.exceptAll(fast).isEmpty()
    plan = _final_plan(fast)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_edges(spark):
    from tickerlake_spark.operators.rangejoin import bucketed_range_join

    points = spark.createDataFrame(
        [(1, 0.0), (2, 9.99), (3, 10.0), (4, -5.0)], "pid long, p double"
    )
    iv = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, -10.0, 0.0), (300, 5.0, 5.0)],
        "iid long, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(points, iv, "p", "lo", "hi", 4.0).collect()
    )
    # hi exclusive, lo inclusive; empty interval (300) matches nothing
    assert got == [(1, 100), (2, 100), (4, 200)]


def test_connected_components_chain_and_cliques(spark):
    from tickerlake_spark.operators.graph import (
        canonical_per_component,
        connected_components,
    )

    # a 6-node chain (diameter 5), a 3-clique, and a 2-node pair
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "src long, dst long",
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert {comp[i] for i in range(6)} == {0}
    assert {comp[i] for i in (10, 11, 12)} == {10}
    assert comp[20] == comp[21] == 20
    canon = {
        r.component: (r.n_members, r.keep_node)
        for r in canonical_per_component(connected_components(edges)).collect()
    }
    assert canon == {0: (6, 0), 10: (3, 10), 20: (2, 20)}


def test_connected_components_pointer_doubling_depth(spark):
    """A 33-node chain converges well under the diameter bound (O(log d))."""
    from tickerlake_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(32)], "src long, dst long"
    )
    comp = connected_components(edges, max_iter=10)
    assert comp.select("component").distinct().count() == 1


def test_approx_stats_within_error_bounds(spark, sf_dir):
    """q90's sketches must land within their configured error of the exact
    answers (HLL rsd=2% -> allow 6% = 3 sigma; KLL accuracy 1/10000 on rank
    -> compare quantile VALUES loosely via exact neighborhood)."""
    from tickerlake_spark.plans import QUERIES
    from tickerlake_spark.plans.catalog import _ensure_loaded, load_table
    from pyspark.sql import functions as F

    _ensure_loaded()
    approx = {r.event_type: r for r in QUERIES["q90_approx_stats"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("pcts"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) > 0
    for et, ex in exact.items():
        ap = approx[et]
        assert abs(ap.approx_users - ex.users) <= max(2, 0.06 * ex.users), et
        lo, hi = ev.filter(F.col("event_type") == et).agg(
            F.min("value"), F.max("value")
        ).first()
        spread = (hi - lo) or 1.0
        for got, want in zip((ap.approx_p50, ap.approx_p95), ex.pcts):
            assert abs(got - want) <= 0.05 * spread, (et, got, want)


def test_incremental_agg_merge_equals_full_recompute(spark, sf_dir):
    """Maintaining a rollup by merging per-batch partial states must equal
    aggregating all rows at once — across sum/count/min/max and a derived
    average, for every group."""
    import os

    from pyspark.sql import functions as F

    from tickerlake_spark.operators.incremental_agg import (
        aggregate_delta,
        merge_aggregates,
        with_ratio,
    )

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    keys = ["l_returnflag", "l_linestatus"]
    measures = {
        "total_qty": ("sum", "l_quantity"),
        "n_rows": ("count", "l_quantity"),
        "min_price": ("min", "l_extendedprice"),
        "max_price": ("max", "l_extendedprice"),
    }

    # three "daily" batches by orderkey residue
    state = None
    for r in range(3):
        batch = li.filter(F.col("l_orderkey") % 3 == r)
        state = merge_aggregates(
            state, aggregate_delta(batch, keys, measures), keys, measures
        )
    inc = with_ratio(state, "avg_qty", "total_qty", "n_rows")

    full = with_ratio(
        aggregate_delta(li, keys, measures), "avg_qty", "total_qty", "n_rows"
    )

    a = {tuple(r[k] for k in keys): r.asDict() for r in inc.collect()}
    b = {tuple(r[k] for k in keys): r.asDict() for r in full.collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert a[k]["n_rows"] == b[k]["n_rows"]
        assert abs(a[k]["total_qty"] - b[k]["total_qty"]) < 1e-6
        assert a[k]["min_price"] == b[k]["min_price"]
        assert a[k]["max_price"] == b[k]["max_price"]
        assert abs(a[k]["avg_qty"] - b[k]["avg_qty"]) < 1e-9


def test_incremental_agg_rejects_non_mergeable(spark, sf_dir):
    import os

    import pytest as _pytest

    from tickerlake_spark.operators.incremental_agg import aggregate_delta

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    with _pytest.raises(ValueError, match="non-mergeable"):
        aggregate_delta(li, ["l_returnflag"], {"med": ("median", "l_quantity")})


def test_hll_sketch_incremental_matches_full(spark, sf_dir, tmp_path):
    """Persisted HLL rollup (VERDICT r3 item 7): maintaining per-group
    sketches incrementally (3 deltas, merge + keyed upsert per refresh) must
    produce estimates BIT-IDENTICAL to a one-shot sketch over all rows —
    associative union means the incremental path can never drift — and land
    within HLL error of the exact distinct counts."""
    from pyspark.sql import functions as F

    from tickerlake_spark.operators.incremental_agg import (
        merge_distinct_sketches,
        sketch_distinct_delta,
        sketch_estimates,
    )
    from tickerlake_spark.plans.catalog import load_table
    from tickerlake_spark.storage import read_table, table_exists, upsert_table

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "distinct_rollup")
    for i in range(3):
        delta = sketch_distinct_delta(
            events.filter(F.col("event_id") % 3 == i), ["event_type"], "user_id"
        )
        if table_exists(path):
            merged = merge_distinct_sketches(
                read_table(spark, path), delta, ["event_type"]
            )
        else:
            merged = delta
        upsert_table(spark, path, merged, keys=["event_type"], validate_unique=False)

    inc = {
        r.event_type: r.approx_distinct
        for r in sketch_estimates(read_table(spark, path)).collect()
    }
    full = {
        r.event_type: r.approx_distinct
        for r in sketch_estimates(
            sketch_distinct_delta(events, ["event_type"], "user_id")
        ).collect()
    }
    assert inc == full and len(inc) > 0  # bit-identical merge

    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(inc[et] - n) <= max(2, 0.05 * n), (et, inc[et], n)


def test_kmv_sketch_exact_below_k_and_estimates_above(spark, sf_dir):
    """KMV (the cross-engine-verifiable distinct sketch behind q90/q133):
    exact when the group's cardinality < k; within ~3 sigma of
    1/sqrt(k-2) relative error when above k (exercised with a small k so
    the estimator branch actually runs — the test corpora sit below the
    production k=2048)."""
    from pyspark.sql import functions as F

    from tickerlake_spark.operators.incremental_agg import (
        kmv_delta,
        kmv_estimates,
    )
    from tickerlake_spark.plans.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    big_k = {
        r.event_type: r.approx_distinct
        for r in kmv_estimates(
            kmv_delta(events, ["event_type"], "user_id", k=100_000),
            ["event_type"],
            k=100_000,
        ).collect()
    }
    assert big_k == exact  # below k the sketch IS the distinct set

    small_k = 64
    est = {
        r.event_type: r.approx_distinct
        for r in kmv_estimates(
            kmv_delta(events, ["event_type"], "user_id", k=small_k),
            ["event_type"],
            k=small_k,
        ).collect()
    }
    for et, n in exact.items():
        if n >= small_k:  # estimator branch
            tol = 3.0 / (small_k - 2) ** 0.5  # 3 sigma ~ 38%
            assert abs(est[et] - n) <= max(2, tol * n), (et, est[et], n)


def test_kmv_incremental_merge_matches_one_shot(spark, sf_dir):
    """Maintaining the KMV sketch delta-by-delta (3 refreshes) must produce
    a sketch BIT-IDENTICAL to one-shot: the merge (union -> distinct ->
    re-rank <= k) is associative by construction. Note the rollup store
    must REPLACE a group's sketch rows on refresh (hashes fall out of the
    top-k as smaller ones arrive) — a per-(group, h) upsert would leave
    stale rows behind."""
    from pyspark.sql import functions as F

    from tickerlake_spark.operators.incremental_agg import kmv_delta, kmv_merge
    from tickerlake_spark.plans.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    k = 64  # small enough that ranks are truncated (the interesting case)
    stored = None
    for i in range(3):
        delta = kmv_delta(
            events.filter(F.col("event_id") % 3 == i), ["event_type"], "user_id", k=k
        )
        stored = (
            delta
            if stored is None
            else kmv_merge(stored, delta, ["event_type"], k=k)
        ).localCheckpoint(eager=True)

    inc = sorted(map(tuple, stored.collect()))
    full = sorted(
        map(tuple, kmv_delta(events, ["event_type"], "user_id", k=k).collect())
    )
    assert len(full) > 0 and inc == full


def test_pagerank_star_graph(spark):
    """Undirected star (hub + 4 leaves): ranks sum to ~1, hub dominates,
    leaves are symmetric-equal; normalize=True scales mean to 1."""
    from tickerlake_spark.operators.graph import pagerank

    pairs = [("h", f"l{i}") for i in range(4)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src string, dst string"
    )
    out = {r.node: (r.rank, r.score) for r in pagerank(edges, iters=10, normalize=True).collect()}
    ranks = {k: v[0] for k, v in out.items()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    leaf_ranks = {v for k, v in ranks.items() if k != "h"}
    assert len(leaf_ranks) == 1  # symmetry -> identical
    assert ranks["h"] > max(leaf_ranks) * 2
    assert abs(sum(v[1] for v in out.values()) / 5 - 1.0) < 1e-6  # mean score 1


def test_cms_never_underestimates_and_bounds_error(spark, sf_dir):
    """Count-Min point estimates must be >= the exact count for EVERY
    distinct item (the sketch's one-sided guarantee), and the worst
    overcount must respect the union bound for this deterministic hash
    family: depth=4 rows each over by < N/width w.h.p. -> allow 4x."""
    from tickerlake_spark.operators.cms import cms_delta, cms_point_estimates
    from tickerlake_spark.plans.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").cast("string").alias("item")
    )
    n_total = li.count()
    width = 256
    sketch = cms_delta(li, [], "item", depth=4, width=width)
    exact = li.groupBy("item").agg(F.count("*").cast("long").alias("exact_n"))
    est = cms_point_estimates(sketch, exact, "item", depth=4, width=width)
    rows = est.collect()
    assert rows, "no items"
    for r in rows:
        assert r.cms_count >= r.exact_n, (r.item, r.cms_count, r.exact_n)
        assert r.cms_count - r.exact_n <= 4 * n_total / width, (
            r.item,
            r.cms_count - r.exact_n,
        )


def test_cms_merge_matches_one_shot(spark, sf_dir):
    """Merging per-batch sketches must be cell-identical to sketching the
    concatenated input — the associativity the incremental rollup path
    depends on."""
    from tickerlake_spark.operators.cms import cms_delta, cms_merge
    from tickerlake_spark.plans.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = cms_delta(d.filter(F.col("doc_id") % 2 == 0), [], "text", width=128)
    b = cms_delta(d.filter(F.col("doc_id") % 2 == 1), [], "text", width=128)
    merged = {
        (r.r, r.c): r.n for r in cms_merge(a, b, []).collect()
    }
    oneshot = {
        (r.r, r.c): r.n for r in cms_delta(d, [], "text", width=128).collect()
    }
    assert merged == oneshot and len(oneshot) > 0


def test_bloom_has_no_false_negatives_and_prune_preserves_join(spark, sf_dir):
    """Every dim key must pass its own bloom (zero false negatives — the
    property that makes pre-shuffle pruning SAFE), and bloom_prune + join
    must return exactly the rows of the plain join."""
    from tickerlake_spark.operators.bloomjoin import (
        bloom_literal,
        bloom_might_contain,
        bloom_prune,
    )
    from tickerlake_spark.plans.catalog import load_table

    sup = load_table(spark, sf_dir, "supplier")
    dim = sup.filter(F.col("s_nationkey") <= 5).select("s_suppkey").distinct()
    words = bloom_literal(dim, "s_suppkey", m_bits=128, k=2)
    misses = dim.filter(
        ~bloom_might_contain(F.col("s_suppkey"), words, m_bits=128, k=2)
    ).count()
    assert misses == 0, "bloom false negative"

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    plain = li.join(dim, li["l_suppkey"] == dim["s_suppkey"]).drop("s_suppkey")
    pruned = bloom_prune(li, "l_suppkey", dim, "s_suppkey", m_bits=128, k=2)
    via_bloom = pruned.join(dim, pruned["l_suppkey"] == dim["s_suppkey"]).drop(
        "s_suppkey"
    )
    assert via_bloom.count() == plain.count()
    assert (
        via_bloom.exceptAll(plain).count() == 0
        and plain.exceptAll(via_bloom).count() == 0
    )


def test_bloom_fp_rate_bounded(spark, sf_dir):
    """At m=128/k=2 with ~19 inserted keys the theoretical FP rate is
    ~7%; assert the measured rate over the non-member keys stays under
    3x that — a deterministic property of this hash family + data."""
    from tickerlake_spark.operators.bloomjoin import (
        bloom_literal,
        bloom_might_contain,
    )
    from tickerlake_spark.plans.catalog import load_table

    sup = load_table(spark, sf_dir, "supplier")
    dim = sup.filter(F.col("s_nationkey") <= 5).select("s_suppkey").distinct()
    non = sup.filter(F.col("s_nationkey") > 5).select("s_suppkey").distinct()
    words = bloom_literal(dim, "s_suppkey", m_bits=128, k=2)
    n_non = non.count()
    fp = non.filter(
        bloom_might_contain(F.col("s_suppkey"), words, m_bits=128, k=2)
    ).count()
    assert n_non > 0 and fp / n_non < 0.21, (fp, n_non)


def test_kmv_audience_overlap_tracks_exact(spark, sf_dir):
    """q149's sketch-space union/intersection estimates must land within
    KMV error (~1/sqrt(k-2), k=512 -> allow 3 sigma ~ 13%) of the exact
    distinct-pair answers computed from raw history."""
    from tickerlake_spark.plans import QUERIES
    from tickerlake_spark.plans.catalog import _ensure_loaded, load_table

    _ensure_loaded()
    est = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q149_kmv_audience_overlap"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    users = {
        r.event_type: set(u.user_id for u in ev.filter(
            F.col("event_type") == r.event_type
        ).select("user_id").distinct().collect())
        for r in ev.select("event_type").distinct().collect()
    }
    assert len(est) > 0
    for (a, b), r in est.items():
        exact_union = len(users[a] | users[b])
        exact_inter = len(users[a] & users[b])
        assert abs(r.est_union - exact_union) <= max(3, 0.13 * exact_union), (
            a, b, r.est_union, exact_union,
        )
        # intersection error is relative to the UNION size (rho estimates
        # inter/union, so absolute error scales with the union)
        assert abs(r.est_intersection - exact_inter) <= max(
            3, 0.13 * exact_union
        ), (a, b, r.est_intersection, exact_inter)
