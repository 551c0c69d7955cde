"""Physical-plan quality gates — the 100 TB posture, asserted.

Correctness tests prove the operators compute the right answer at small SF;
these prove the *plans* are the ones that survive a 1000-executor scale-up:
filters reach the parquet scan, small dimensions broadcast instead of
shuffling the fact table, the split-adjustment path adds zero exchanges, and
no row-at-a-time Python evaluation appears anywhere in the hot path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tickerlake_spark.plans import QUERIES
from tickerlake_spark.plans.catalog import _ensure_loaded

_ensure_loaded()


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """q01's shipdate predicate must appear as a parquet PushedFilters, and
    the scan must prune to the projected columns (ReadSchema, not SELECT *)."""
    df = QUERIES["q01_pricing_summary"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_comment" not in read_schema, "scan reads columns the query never uses"


def test_dim_joins_broadcast_not_shuffle(spark, sf_dir):
    """Fact-to-dimension joins (customer/nation/region enrich) must be
    broadcast hash joins — shuffling the fact table on a dim key is the
    classic 100 TB failure mode."""
    for name in ("q04_join_left_enrich", "q05_local_supplier_volume"):
        plan = _physical_plan(QUERIES[name].fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"


def _exchanges(p: str) -> int:
    return sum(
        line.strip().lstrip("+-: ").startswith("Exchange")
        for line in p.splitlines()
    )


def test_split_adjust_never_shuffles_the_fact(spark, tmp_path):
    """apply_splits over a leaf parquet scan must plan exactly ONE shuffle —
    the tiny splits-dim groupBy that feeds the broadcast (~1e3 rows). With the
    fact as a leaf scan, any second exchange could only be a fact-table
    shuffle, the thing this formulation exists to avoid at 100 TB."""
    from tickerlake_spark.operators.splits import apply_splits

    bars = spark.createDataFrame(
        [("A", f"2024-01-{d:02d}", 10.0, 11.0, 9.0, 10.5, 1000, 10) for d in range(1, 9)],
        "ticker string, date string, open double, high double, low double, "
        "close double, volume long, transactions long",
    ).withColumn("date", F.to_date("date"))
    splits = spark.createDataFrame(
        [("A", "2024-01-05", 2.0, 1.0)],
        "ticker string, execution_date string, split_from double, split_to double",
    )
    bars.write.parquet(str(tmp_path / "bars"))
    splits.write.parquet(str(tmp_path / "splits"))

    adj = apply_splits(
        spark.read.parquet(str(tmp_path / "bars")),
        spark.read.parquet(str(tmp_path / "splits")),
    )
    plan = _physical_plan(adj)
    assert "BroadcastExchange" in plan, "splits dim must broadcast"
    assert _exchanges(plan) == 1, (
        "apply_splits must add no exchange beyond the splits-dim prep:\n" + plan
    )


def test_split_adjust_stage_cost_vs_bars_alone(spark, sf_dir):
    """q31 (bars + adjustment) may exceed q30 (bars alone) by at most the one
    splits-dim exchange; the fact lineage itself gains none."""
    bars_plan = _physical_plan(QUERIES["q30_stock_bars"].fn(spark, sf_dir))
    adj_plan = _physical_plan(QUERIES["q31_split_adjust"].fn(spark, sf_dir))
    assert _exchanges(adj_plan) <= _exchanges(bars_plan) + 1
    assert "BroadcastExchange" in adj_plan


@pytest.mark.slow
def test_no_python_eval_in_hot_paths(spark, sf_dir):
    """Every query except the deliberate Arrow/mapInPandas multimodal
    kernels must stay JVM-side: no BatchEvalPython (row-at-a-time UDF)
    anywhere, and ArrowEvalPython/MapInPandas only in q54/q55/q146 (the
    image codec paths — Python is the codec host there by design)."""
    allowed_arrow = {"q54_media_features", "q55_frame_sampling", "q146_png_roundtrip"}
    for name, spec in QUERIES.items():
        plan = _physical_plan(spec.fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
        if name not in allowed_arrow:
            assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, (
                f"{name}: unexpected Python boundary"
            )


def test_whole_stage_codegen_on_core_aggregation(spark, sf_dir):
    """The TPC-H Q1 shape must run inside whole-stage codegen spans. AQE only
    materializes the final plan (with codegen IDs) after execution, so run the
    query first and inspect the adaptive final plan."""
    df = QUERIES["q01_pricing_summary"].fn(spark, sf_dir)
    df.collect()
    plan = _physical_plan(df)
    assert "isFinalPlan=true" in plan
    # codegen'd operators carry a `*(stageId)` prefix in the plan string;
    # both the partial and final HashAggregate must be inside a span
    assert plan.count("*(") >= 2, "core aggregation not in whole-stage codegen:\n" + plan


@pytest.mark.parametrize("name", ["q34_indicators", "q35_vwap_signals"])
def test_finance_chain_single_fact_exchange(spark, sf_dir, name):
    """The whole finance chain (bars -> adjust -> windows) must shuffle the
    fact exactly once: the ticker-hash exchange. The only other allowed
    hash exchange is the tiny splits-dim groupBy feeding its broadcast."""
    plan = _physical_plan(QUERIES[name].fn(spark, sf_dir))
    n_hash = sum(
        "Exchange hashpartitioning" in line for line in plan.splitlines()
    )
    assert n_hash <= 2, f"{name}: fact shuffled more than once:\n{plan}"


@pytest.mark.parametrize("name", ["q03_shipping_priority", "q13_topk_sort"])
def test_topk_uses_take_ordered(spark, sf_dir, name):
    """Global sort + limit must plan as TakeOrderedAndProject (heap top-k,
    no full global sort/exchange of the entire result)."""
    plan = _physical_plan(QUERIES[name].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q75_predicates_all_push_to_scan(spark, sf_dir):
    """The Q6-shape query's shipdate/discount/quantity predicates must all
    reach the parquet reader as PushedFilters."""
    plan = _physical_plan(QUERIES["q75_revenue_filter_agg"].fn(spark, sf_dir))
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} predicate not pushed to scan"


def test_q80_centroid_join_is_broadcast(spark, sf_dir):
    """Nearest-centroid assignment must broadcast the k-row centroid table —
    the vector table itself must never shuffle for the assignment join."""
    plan = _physical_plan(QUERIES["q80_nearest_centroid"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q77_dimension_chains_broadcast(spark, sf_dir):
    """Q8-shape market share: both nation chains and region/supplier must be
    broadcast hash joins, never fact shuffles on dim keys."""
    plan = _physical_plan(QUERIES["q77_market_share"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4


def test_exists_shapes_lower_to_semi_anti_joins(spark, sf_dir):
    """EXISTS / NOT-IN must become (left-semi / left-anti) hash joins — never
    a pair-materializing inner join + distinct, which explodes at scale."""
    p93 = _physical_plan(QUERIES["q93_late_orders_exists"].fn(spark, sf_dir))
    assert "LeftSemi" in p93, "Q4 EXISTS must plan as a left-semi join:\n" + p93
    p101 = _physical_plan(QUERIES["q101_part_supplier_counts"].fn(spark, sf_dir))
    assert "LeftAnti" in p101, "Q16 NOT IN must plan as a left-anti join:\n" + p101
    assert "BroadcastHashJoin" in p101, "exclusion list must broadcast"


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    """q96's ORDER BY + LIMIT 20 must plan as TakeOrderedAndProject (per-
    partition heap + driver merge), not a full global sort of the agg."""
    plan = _physical_plan(QUERIES["q96_returned_items"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_shared_window_sort_in_rank_variants(spark, sf_dir):
    """q103 computes 5 window functions over 2 frames on the same
    (partition, order) — the plan must contain exactly ONE Window node,
    ONE Sort, and ONE Exchange: frames share the sorted partition pass."""
    plan = _physical_plan(QUERIES["q103_window_rank_variants"].fn(spark, sf_dir))
    n_windows = sum(
        line.strip().lstrip("+-: ").startswith("Window")
        for line in plan.splitlines()
    )
    assert n_windows == 1, "window frames did not merge into one pass:\n" + plan
    assert plan.count("Sort ") == 1, "more than one sort for a single window spec"
    assert _exchanges(plan) == 1, "rank variants must shuffle once (by nation)"


def test_vector_hofs_stay_jvm_side(spark, sf_dir):
    """q104's array folds must run in the JVM (HigherOrderFunction codegen),
    never as a Python UDF — covered generically by
    test_no_python_eval_in_hot_paths, asserted here with the positive:
    the optimized plan contains aggregate/transform lambda expressions."""
    df = QUERIES["q104_vector_hof_stats"].fn(spark, sf_dir)
    opt = _optimized_plan(df)
    assert "aggregate(" in opt and "transform(" in opt, opt


def test_line_dedup_text_never_shuffles(spark, sf_dir):
    """q121's frequency shuffle must carry only (doc_id, pos, md5) — the
    document text reaches a shuffle nowhere in the plan; the bad-position
    table and chunk-frequency table broadcast back to the doc-partitioned
    corpus."""
    plan = _physical_plan(QUERIES["q121_line_dedup"].fn(spark, sf_dir))
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line and "chunk#" not in line, (
                "document text entered a shuffle:\n" + line
            )


def test_shard_assignment_no_global_fact_sort(spark, sf_dir):
    """q124's running token total must be a two-level prefix-sum: the fact
    shuffles ONCE (on the bucket key) and the only SinglePartition exchange
    feeds the 64-row bucket-offset window, never the fact table."""
    plan = _physical_plan(QUERIES["q124_shard_assignment"].fn(spark, sf_dir))
    lines = plan.splitlines()
    single = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert len(single) == 1, plan
    # the SinglePartition exchange must sit above a bucket aggregate
    # (64 rows), not above a parquet scan of the fact
    below = "\n".join(lines[single[0] : single[0] + 3])
    assert "HashAggregate" in below or "hashpartitioning(bucket" in below, plan
    # bucket offsets join back by broadcast
    assert "BroadcastHashJoin" in plan, plan


def test_mixture_sample_rate_table_broadcasts(spark, sf_dir):
    """q122's per-source rate table is a tiny aggregate — it must reach the
    fact via BroadcastHashJoin, and the fact itself must see no shuffle
    before the final per-source aggregate."""
    plan = _physical_plan(QUERIES["q122_domain_mixture_sample"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_classifier_is_map_only(spark, sf_dir):
    """q123 is a pure per-row scoring pass: zero exchanges, one scan, the
    scoring arithmetic inside whole-stage codegen (rendered as `*(n)` in
    the plan string; the higher-order-function feature projection is the
    one non-codegen JVM stage, as Spark HOFs always are)."""
    plan = _physical_plan(QUERIES["q123_quality_classifier"].fn(spark, sf_dir))
    assert _exchanges(plan) == 0, plan
    assert "*(" in plan, plan


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """q125's top-50-by-key must plan as TakeOrderedAndProject (per-
    partition heap + driver merge — the distributed reservoir), never a
    global sort; and the scoring is a map-only pass (no exchange below the
    top-k)."""
    plan = _physical_plan(QUERIES["q125_weighted_sample"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert _exchanges(plan) == 0, plan


def test_hybrid_rrf_topk_is_take_ordered(spark, sf_dir):
    """q131's shortlists and final cut must plan as distributed top-k
    (TakeOrderedAndProject), never a global sort — the property that keeps
    hybrid retrieval safe when the candidate sets are corpus-sized."""
    plan = _physical_plan(QUERIES["q131_hybrid_rrf"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # local (per-partition) sorts feeding the shortlist join are fine; a
    # GLOBAL sort (printed as `Sort [...], true, 0`) is the scale-killer
    global_sorts = [
        ln for ln in plan.splitlines() if "Sort [" in ln and "], true," in ln
    ]
    assert not global_sorts, (
        "global sort leaked into the hybrid retrieval plan:\n" + plan
    )


def test_pq_encode_stage_adds_no_exchange(spark, sf_dir):
    """q127's scan->encode->score pipeline must shuffle nothing: codebooks
    and ADC tables enter as literals, the only plan breaks are the top-k."""
    plan = _physical_plan(QUERIES["q127_pq_adc_ann"].fn(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan, (
        "PQ scoring shuffled the vector table:\n" + plan
    )
    assert "TakeOrderedAndProject" in plan


def test_fuzzy_join_never_plans_a_cartesian(spark, sf_dir):
    """q134's candidate generation must be an equi-join on the segment key
    (shuffle or broadcast hash join) — never a nested-loop/cartesian over
    the two record sets, which is what a naive fuzzy join degrades to."""
    df = QUERIES["q134_fuzzy_entity_join"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_edits_no_cartesian(spark, sf_dir):
    """q145's delete-neighborhood candidate generation must stay an
    equi-join on the variant key — never a nested-loop/cartesian (what a
    naive general-edit-distance join degrades to)."""
    df = QUERIES["q145_fuzzy_join_edits"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_reuses_persisted_edges(spark, sf_dir):
    """The 5 iterations each reference the edge and degree tables; the
    (lazy, materialize=False) plan must read them from the persisted
    InMemory relation, not re-derive the lineitem-orders join per
    iteration."""
    from tickerlake_spark.operators.graph import pagerank
    from tickerlake_spark.plans.q_datapipe import purchase_graph_edges

    df = pagerank(
        purchase_graph_edges(spark, sf_dir),
        iters=5,
        normalize=True,
        materialize=False,
    )
    plan = _physical_plan(df)
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    # NOTE: no string-count assertions on the cached subtree — the
    # InMemoryRelation's printed child plan (which itself mentions the
    # source scans) renders differently depending on session cache state,
    # which made a count-based gate flaky across the full suite.
    assert "CartesianProduct" not in plan


def test_pagerank_unpersists_graph_cache(spark, sf_dir):
    """The default (materialized) call must not leak cached edge/degree
    blocks into a long-lived session (ADVICE r4): the only storage the call
    may add is the checkpointed rank vector itself."""
    from tickerlake_spark.operators.graph import pagerank
    from tickerlake_spark.plans.q_datapipe import purchase_graph_edges

    jsc = spark.sparkContext._jsc.sc()
    before = {i.id() for i in jsc.getRDDStorageInfo()}
    ranks = pagerank(purchase_graph_edges(spark, sf_dir), iters=2)
    added = [i for i in jsc.getRDDStorageInfo() if i.id() not in before]
    assert len(added) <= 1, (
        f"pagerank leaked {len(added)} cached RDDs: "
        f"{[i.name() for i in added]}"
    )
    assert ranks.count() > 0


def test_duplicate_spans_topk_is_take_ordered(spark, sf_dir):
    """q135's top-100 must lower to TakeOrderedAndProject (bounded per
    partition + merge), not a global sort of every duplicated span."""
    df = QUERIES["q135_duplicate_spans"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in _physical_plan(df)


def test_quality_constraints_single_fact_aggregation(spark, sf_dir):
    """q137 computes all conditional counts in ONE pass over lineitem: the
    plan may scan lineitem for the base agg and once more for the FK
    semi-join, but never once per constraint."""
    df = QUERIES["q137_quality_constraints"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert plan.count("lineitem.parquet") <= 2, (
        "per-constraint rescans of the fact table"
    )


def test_semantic_decontamination_broadcasts_benchmark(spark, sf_dir):
    """q142's benchmark side must broadcast (the tiny matrix travels to the
    train partitions); a shuffle of train vectors against it would be the
    wrong plan at any scale."""
    df = QUERIES["q142_semantic_decontamination"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_partition_fingerprints_are_one_aggregation(spark, sf_dir):
    """q143 is a single map-side-combined hash agg over the fact scan — no
    joins, no sorts before the final presentation order."""
    df = QUERIES["q143_partition_fingerprints"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    for op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert op not in plan, op
    assert "HashAggregate" in plan


def test_cms_probe_join_broadcasts_the_sketch(spark, sf_dir):
    """q147's point-estimate join must broadcast the bounded sketch
    (depth x width cells) — shuffling candidates against it would add a
    pointless exchange at 100 TB."""
    df = QUERIES["q147_cms_heavy_hitters"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_prune_is_map_side_only(spark, sf_dir):
    """bloom_prune's membership test must add ZERO exchanges over the fact
    scan — the filter runs inside the scan stage, which is the entire
    point of pre-shuffle semi-join reduction."""
    from tickerlake_spark.operators.bloomjoin import bloom_prune
    from tickerlake_spark.plans.catalog import load_table

    sup = load_table(spark, sf_dir, "supplier")
    dim = sup.filter(F.col("s_nationkey") <= 5).select("s_suppkey").distinct()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pruned = bloom_prune(li, "l_suppkey", dim, "s_suppkey", m_bits=128, k=2)
    assert _exchanges(_physical_plan(pruned)) == 0


def test_bloom_audit_join_broadcasts(spark, sf_dir):
    """q148's match-check join must broadcast the dim keys; the only
    shuffles are the final groupBy (+ orderBy range partitioning)."""
    df = QUERIES["q148_bloom_join_prune"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert _exchanges(plan) <= 2, plan


def test_kmv_overlap_plans_only_equi_joins(spark, sf_dir):
    """q149's pair fanout must never plan a nested-loop join: the pair dim
    is a bounded driver-built broadcast, so every join in the plan is an
    equi-join over sketch-sized data."""
    df = QUERIES["q149_kmv_audience_overlap"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_incremental_watermark_read_prunes_partitions(spark, tmp_path):
    """The incremental silver/gold reads filter a date-partitioned table on
    `date > watermark`; that predicate must land in the scan's
    PartitionFilters (directory-level pruning — O(delta) I/O), not merely
    PushedFilters (row-group stats, useless when rows arrive ticker-clustered
    so every row group's date min/max spans all of history)."""
    from tickerlake_spark.storage import write_table

    df = spark.createDataFrame(
        [(f"2024-01-{d:02d}", "A", float(d)) for d in range(1, 9)],
        "date string, ticker string, close double",
    ).withColumn("date", F.to_date("date"))
    path = str(tmp_path / "silver_daily")
    write_table(df, path, partition_by="date")

    filtered = spark.read.parquet(path).filter(F.col("date") > F.lit("2024-01-06").cast("date"))
    plan = _physical_plan(filtered)
    assert "PartitionFilters: [" in plan, f"scan has no PartitionFilters section:\n{plan}"
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "date" in pf and ">" in pf, f"watermark filter not in PartitionFilters: {pf}"
    # and the pruning is real: only the 2 matching date directories are read
    assert filtered.count() == 2
    files = {f for f in filtered.inputFiles()}
    assert all("date=" in f for f in files)


def test_silver_tables_are_date_partitioned(spark, tmp_path):
    """Pin the pipeline's storage layout: every silver table run_silver
    writes must be Hive-partitioned on date, so the watermark and horizon
    filters of the incremental paths prune at the directory level."""
    import os

    import tests.test_pipeline as tp
    from tickerlake_spark.pipeline import run_bronze, run_silver
    from tickerlake_spark.sources.calendar import trading_days
    from tickerlake_spark.storage import Catalog, Checkpoints

    days = trading_days(tp.D(2024, 1, 2), tp.D(2024, 1, 19))
    cat = Catalog(root=str(tmp_path / "lake"))
    cp = Checkpoints(str(tmp_path / "cp.json"))
    run_bronze(spark, tp._source(days), cat, cp, days[0], days[-1])
    assert run_silver(spark, cat, cp)["mode"] == "full"
    for table in (
        "daily_aggregates",
        "weekly_aggregates",
        "monthly_aggregates",
        "daily_indicators",
        "weekly_indicators",
        "monthly_indicators",
    ):
        entries = os.listdir(cat.silver(table))
        assert any(e.startswith("date=") for e in entries), (
            f"silver.{table} is not date-partitioned: {entries[:5]}"
        )


def test_cms_candidate_verify_plans_no_joins(spark, sf_dir):
    """q152's candidate pruning is a literal-sketch expression, not a join:
    the plan must contain ZERO joins, and the candidate filter must sit
    BELOW the exact-count aggregate so only plausibly-heavy tokens reach
    the shuffle (the whole point of candidate+verify)."""
    df = QUERIES["q152_cms_exact_heavy"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "Join" not in plan, plan
    # a Filter NODE evaluating the sketch probe (least over the depth rows)
    # must exist, and it must print deeper in the tree (plans print
    # top-down) than the first HashAggregate — i.e. candidates are pruned
    # before the count shuffle. (least( also appears in the final
    # projection, hence the node-level check.)
    filter_lines = [
        i
        for i, line in enumerate(plan.splitlines())
        if "Filter" in line and "least(" in line
    ]
    agg_line = next(
        i for i, line in enumerate(plan.splitlines()) if "HashAggregate" in line
    )
    assert filter_lines, plan
    assert max(filter_lines) > agg_line, plan


def test_mmr_selection_is_in_plan_not_driver(spark, sf_dir):
    """VERDICT r8 item 7: q138's greedy MMR selection must be a JVM fold
    inside the plan — a driver-side loop would surface as a LocalTableScan
    of pre-computed picks (spark.createDataFrame over collected rows)."""
    plan = _physical_plan(QUERIES["q138_mmr_rerank"].fn(spark, sf_dir))
    assert "LocalTableScan" not in plan, "q138 result assembled on the driver"
    # the embeddings scan is the plan's distributed leg
    assert "embeddings" in plan


# ---------------------------------------------------------------------------
# Lineage-overlap byte-parity invariant (VERDICT r9 item 3): the silver full
# rewrite's resample chains read the adjusted-bars LINEAGE while the daily
# write proceeds concurrently (COVERAGE.md "Concurrent full rebuilds"). The
# two compute paths are byte-equal ONLY because resample_ohlcv's aggregates
# are picked values (min_by/max_by/min/max) + INTEGER sums — both exact and
# order-insensitive. A float-typed order-sensitive aggregate (sum/avg over
# float/double) would diverge at the 1e-15 level between the two paths and
# break the parity silently. This guard walks the ACTUAL analyzed plan, so
# any edit inside resample_ohlcv is covered, however expressed.
# ---------------------------------------------------------------------------


def _iter_jtree(jnode):
    yield jnode
    it = jnode.children().iterator()
    while it.hasNext():
        yield from _iter_jtree(it.next())


def _order_sensitive_float_aggs(df) -> list[tuple[str, str]]:
    """(aggregate-class, result-type) for every order-sensitive aggregate
    over a float/double input in ``df``'s analyzed plan, plus First/Last
    over any type (nondeterministic without a pinned order)."""
    out = []
    for node in _iter_jtree(df._jdf.queryExecution().analyzed()):
        if node.getClass().getSimpleName() != "Aggregate":
            continue
        it = node.aggregateExpressions().iterator()
        while it.hasNext():
            for sub in _iter_jtree(it.next()):
                cls = sub.getClass().getSimpleName()
                if cls in ("First", "Last"):
                    out.append((cls, sub.dataType().simpleString()))
                elif cls in ("Sum", "Average") and sub.dataType().simpleString() in (
                    "float",
                    "double",
                ):
                    out.append((cls, sub.dataType().simpleString()))
    return out


def test_resample_has_no_order_sensitive_float_aggregates(spark):
    import datetime as dt

    from tickerlake_spark.operators.resample import resample_ohlcv

    # silver lineage schema: double prices, long volume/transactions
    daily = spark.createDataFrame(
        [("A", dt.date(2024, 1, 2), 1.0, 2.0, 0.5, 1.5, 100, 5)],
        "ticker string, date date, open double, high double, low double, "
        "close double, volume long, transactions long",
    )
    # the detector itself must trip on the failure mode it guards against
    # (e.g. a future VWAP column: sum over double)
    bad = daily.groupBy("ticker").agg(F.sum("close").alias("notional"))
    assert _order_sensitive_float_aggs(bad) == [("Sum", "double")]

    for period in ("week", "month"):
        got = _order_sensitive_float_aggs(resample_ohlcv(daily, period))
        assert got == [], (
            f"resample_ohlcv({period!r}) grew an order-sensitive float "
            f"aggregate {got} — this breaks the full-rewrite lineage-overlap "
            "byte parity (COVERAGE.md 'Concurrent full rebuilds'); either "
            "make the new column integer/exact or stop overlapping the "
            "daily write with the resample chains in pipeline.run_silver"
        )
