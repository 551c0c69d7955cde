"""Classic warehouse plan shapes, batch 3 (q93-q105): the remaining TPC-H
query archetypes adapted to the testdata schema (no partsupp / shipmode /
commitdate columns exist, so Q4/Q9/Q12/Q16/Q20 keep their PLAN SHAPE —
EXISTS-as-semi-join, multi-dim profit rollup, fact-fact conditional agg,
anti-joined distinct-count, nested decorrelated aggregates — on the columns
the tables do have), plus ranking-window variants (ntile / percent_rank /
cume_dist / first_value / last_value), higher-order array functions over the
embedding column, and GROUPING SETS.

Scale notes (100 TB posture):
- every dimension join (part, supplier, nation, region, the 1-row scalar
  aggregates) is an explicit ``F.broadcast`` — the fact table never shuffles
  for them;
- fact-fact joins (lineitem ⋈ orders) shuffle both sides once on the join
  key; at scale the bucketed-write path (storage/bucketing.py) removes even
  that Exchange;
- EXISTS / NOT EXISTS never materialize pairs: they lower to left-semi /
  left-anti hash joins with the theta residual evaluated stream-side;
- the window queries partition by nation/vec so state per task is bounded by
  the largest single group, not the table.

All outputs follow the catalog's cross-engine determinism rules: identical
aliases both sides, ``stable_round`` on float aggregates, explicit total
orders with tie-breakers on any top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round
from tickerlake_spark.plans.catalog import load_table, register

# ---------------------------------------------------------------------------
# TPC-H shapes Q4, Q7, Q9, Q10, Q12, Q13, Q14, Q15, Q16, Q20
# ---------------------------------------------------------------------------


@register(
    "q93_late_orders_exists",
    doc="TPC-H Q4 shape: order-priority checking. COUNT of 1996 orders per "
    "priority WHERE EXISTS a lineitem shipped >60 days after the order "
    "date. The correlated EXISTS lowers to a left-semi hash join on "
    "orderkey with the date theta as a stream-side residual — no pair "
    "materialization, no distinct needed.",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def q93_late_orders_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return (
        o96.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q94_nation_pair_volume",
    doc="TPC-H Q7 shape: volume shipping between two nations, both "
    "directions, by ship year. supplier->nation and customer->nation "
    "chains broadcast; the one real shuffle is lineitem ⋈ orders on "
    "orderkey, then a tiny (nation, nation, year) agg.",
    oracle="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       EXTRACT(year FROM l.l_shipdate) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-7, 4) AS volume
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
WHERE (ns.n_nationkey < 5 AND nc.n_nationkey >= 20)
   OR (ns.n_nationkey >= 20 AND nc.n_nationkey < 5)
GROUP BY ns.n_name, nc.n_name, EXTRACT(year FROM l.l_shipdate)
""",
)
def q94_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    ns = n.alias("ns")
    nc = n.alias("nc")
    pair = (
        (F.col("supp_natkey") < 5) & (F.col("cust_natkey") >= 20)
    ) | ((F.col("supp_natkey") >= 20) & (F.col("cust_natkey") < 5))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("ns.n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("nc.n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("ns.n_name").alias("supp_nation"),
            F.col("nc.n_name").alias("cust_nation"),
            F.col("ns.n_nationkey").alias("supp_natkey"),
            F.col("nc.n_nationkey").alias("cust_natkey"),
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(stable_round(F.sum("rev"), 4).alias("volume"))
    )


@register(
    "q95_profit_by_nation_year",
    doc="TPC-H Q9 shape: product-line profit rollup by supplier nation and "
    "year (no partsupp table in the testdata, so profit = discounted "
    "revenue). part filters to ~1/6 of the fact via a broadcast join; "
    "supplier->nation broadcasts; one (nation, year) agg shuffle.",
    oracle="""
SELECT n.n_name AS nation, EXTRACT(year FROM l.l_shipdate) AS o_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-7, 4) AS profit,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, EXTRACT(year FROM l.l_shipdate)
""",
)
def q95_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("profit"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q96_returned_items",
    doc="TPC-H Q10 shape: top-20 customers by lost revenue from returned "
    "items in one half-year. Fact-fact join on orderkey, customer/nation "
    "broadcast, then a TakeOrderedAndProject top-k (no global sort). "
    "Ordering key is the ROUNDED revenue with custkey tie-break so the "
    "cut line is cross-engine deterministic.",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-7, 4) AS revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q96_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q97_priority_line_counts",
    doc="TPC-H Q12 shape: fact-fact join (lineitem ⋈ orders) + conditional "
    "aggregation — lines shipped per quarter of 1997 split into "
    "high-priority (1-URGENT / 2-HIGH) vs low-priority order counts. "
    "The CASE runs map-side after the one orderkey shuffle; at scale the "
    "bucketed layout removes that Exchange too.",
    oracle="""
SELECT EXTRACT(quarter FROM l.l_shipdate) AS ship_quarter,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY EXTRACT(quarter FROM l.l_shipdate)
""",
)
def q97_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_shipdate")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.quarter("l_shipdate").cast("long").alias("ship_quarter"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q98_customer_order_distribution",
    doc="TPC-H Q13 shape: customer order-count distribution — a LEFT OUTER "
    "join (customers with zero orders must survive), a per-customer "
    "count, then a second aggregation over the counts. Two shuffles, "
    "each strictly smaller than the last.",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def q98_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q99_promo_revenue",
    doc="TPC-H Q14 shape: promotion revenue share — broadcast part join, "
    "conditional-sum / total-sum ratio, single scalar output row. The "
    "whole query is one map-side pass plus a 1-row exchange.",
    oracle="""
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-9, 6) AS promo_share,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
""",
)
def q99_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            stable_round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("promo_share"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q100_top_revenue_supplier",
    doc="TPC-H Q15 shape: the supplier(s) achieving MAX total revenue in a "
    "quarter — an aggregate, a 1-row scalar max over it, and an equality "
    "join back (broadcast). Revenue is rounded BEFORE the max/equality "
    "so the comparison is cross-engine exact.",
    oracle="""
WITH rev AS (
  SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)) + 5e-7, 4) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
""",
)
def q100_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        stable_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_rev"
        )
    )
    max_rev = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q101_part_supplier_counts",
    doc="TPC-H Q16 shape: distinct-supplier count per part attribute group, "
    "with a NOT-IN supplier exclusion list (negative account balance "
    "standing in for the reference's complaint filter). The NOT IN "
    "lowers to a broadcast left-anti join on the fact before the "
    "distinct agg.",
    oracle="""
SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
""",
)
def q101_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
              F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q102_excess_shipped_suppliers",
    doc="TPC-H Q20 shape: nested decorrelated aggregates — suppliers that "
    "shipped more than 25% of a widget part's total 1997 volume. Inner "
    "agg per (part, supplier), window total per part (no second scan), "
    "threshold filter, then DISTINCT suppliers join supplier ⋈ nation. "
    "The per-part total is a window over the already-aggregated pair "
    "table: the fact is scanned and shuffled exactly once.",
    oracle="""
WITH pair AS (
  SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS pair_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_partkey, l.l_suppkey
),
flagged AS (
  SELECT l_suppkey
  FROM (SELECT l_suppkey, pair_qty,
               SUM(pair_qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM pair)
  WHERE pair_qty > 0.25 * part_qty
)
SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM flagged)
""",
)
def q102_excess_shipped_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("pair_qty"))
    )
    w = Window.partitionBy("l_partkey")
    flagged = (
        pair.withColumn("part_qty", F.sum("pair_qty").over(w))
        .filter(F.col("pair_qty") > 0.25 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(flagged), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Ranking-window variants, higher-order array functions, GROUPING SETS
# ---------------------------------------------------------------------------


@register(
    "q103_window_rank_variants",
    doc="Ranking-window variants the D4 rebuild generalizes to: ntile "
    "quartiles, percent_rank, cume_dist, and first/last_value over an "
    "explicit full frame — all on one (nation, balance desc, custkey) "
    "total order, so every function shares a single window sort. State "
    "per task is bounded by the largest nation, not the table.",
    oracle="""
SELECT c_nationkey, c_custkey,
       CAST(ntile(4) OVER w AS BIGINT) AS balance_quartile,
       ROUND(percent_rank() OVER w + 5e-9, 6) AS pr,
       ROUND(cume_dist() OVER w + 5e-9, 6) AS cd,
       first_value(c_custkey) OVER w AS richest_custkey,
       last_value(c_custkey) OVER
         (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest_custkey
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
""",
)
def q103_window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("balance_quartile"),
        stable_round(F.percent_rank().over(w), 6).alias("pr"),
        stable_round(F.cume_dist().over(w), 6).alias("cd"),
        F.first("c_custkey").over(w).alias("richest_custkey"),
        F.last("c_custkey").over(w_full).alias("poorest_custkey"),
    )


@register(
    "q104_vector_hof_stats",
    doc="Higher-order array functions over the embedding column — the "
    "JVM-side scale path for vector feature extraction (no Python, no "
    "explode): per-vector dimension, L2 norm via fold, max |component|, "
    "mean component, positive-component count. Both engines fold the "
    "list sequentially in element order with a double accumulator, so "
    "the sums are deterministic cross-engine.",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       ROUND(sqrt(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) + 5e-9, 6) AS l2_norm,
       ROUND(list_aggregate(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE))), 'max') + 5e-9, 6) AS max_abs,
       ROUND(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE)), 'sum') / len(embedding) + 5e-9, 6) AS mean_val,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
""",
)
def q104_vector_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sum_sq = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    total = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        stable_round(F.sqrt(sum_sq), 6).alias("l2_norm"),
        stable_round(F.array_max(F.transform(vec, F.abs)), 6).alias("max_abs"),
        stable_round(total / F.size("embedding"), 6).alias("mean_val"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias(
            "n_positive"
        ),
    )


@register(
    "q108_view_purchase_attribution",
    doc="Interval self-join: each purchase matched to the views by the same "
    "user in the preceding hour (streaming/joins.py::attributed_purchases "
    "— the SAME function runs as a watermark-bounded stream-stream join; "
    "this batch mode is what the oracle checks). The join shuffles both "
    "sides once on user_id; the time bound is a stream-side residual.",
    oracle="""
SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
       p.event_id AS purchase_id, p.ts AS purchase_ts,
       p.value AS purchase_value
FROM events v
JOIN events p ON p.user_id = v.user_id
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
""",
)
def q108_view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.streaming.joins import attributed_purchases

    events = load_table(spark, sf_dir, "events")
    return attributed_purchases(events, max_delay="1 hour")


@register(
    "q106_advanced_stats",
    doc="Statistical aggregates with engine-identical definitions: Pearson "
    "correlation, sample/population covariance, sample stddev, population "
    "variance, and interpolated median, per returnflag. All are "
    "single-pass partial-aggregable (median uses a sort-based exact "
    "percentile — the bounded-memory scale path is q90's KLL sketch).",
    oracle="""
SELECT l_returnflag,
       ROUND(corr(l_extendedprice, l_quantity) + 5e-9, 6) AS corr_price_qty,
       ROUND(covar_samp(l_extendedprice, l_quantity) + 5e-9, 6) AS covar_s,
       ROUND(covar_pop(l_extendedprice, l_quantity) + 5e-9, 6) AS covar_p,
       ROUND(stddev_samp(l_extendedprice) + 5e-9, 6) AS sd_price,
       ROUND(var_pop(l_quantity) + 5e-9, 6) AS var_qty,
       ROUND(median(l_quantity) + 5e-9, 6) AS med_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def q106_advanced_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
        stable_round(F.covar_samp("l_extendedprice", "l_quantity"), 6).alias("covar_s"),
        stable_round(F.covar_pop("l_extendedprice", "l_quantity"), 6).alias("covar_p"),
        stable_round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
        stable_round(F.var_pop("l_quantity"), 6).alias("var_qty"),
        stable_round(F.median("l_quantity"), 6).alias("med_qty"),
    )


@register(
    "q107_string_functions",
    doc="String-function suite over documents — regexp extraction, split "
    "word count, edit distance, padding, translation, reversal, "
    "case-folding, position search. All JVM expressions inside one "
    "codegen span; zero shuffles (pure map).",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '([A-Z][a-z]+)', 1) AS first_cap,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
       CAST(levenshtein(lang, source) AS BIGINT) AS lang_source_dist,
       translate(lang, 'aeiou', '12345') AS lang_coded,
       reverse(lang) AS lang_rev,
       upper(source) AS source_upper,
       substr(text, 1, 20) AS head20,
       CAST(strpos(text, 'e') AS BIGINT) AS first_e_pos
FROM documents
""",
)
def q107_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Z][a-z]+)", 1).alias("first_cap"),
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.levenshtein("lang", "source").cast("long").alias("lang_source_dist"),
        F.translate("lang", "aeiou", "12345").alias("lang_coded"),
        F.reverse("lang").alias("lang_rev"),
        F.upper("source").alias("source_upper"),
        F.substring("text", 1, 20).alias("head20"),
        F.instr("text", "e").cast("long").alias("first_e_pos"),
    )


@register(
    "q110_array_functions",
    doc="Array manipulation suite over embeddings — element access, "
    "min/max, first-occurrence position, containment, sort-then-index. "
    "Scalar outputs only (cross-engine array-column comparison is "
    "representation-sensitive); all JVM expressions, zero shuffles.",
    oracle="""
SELECT vec_id,
       embedding[1] AS first_elem,
       list_min(embedding) AS min_elem,
       list_max(embedding) AS max_elem,
       CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax_pos,
       list_contains(embedding, list_min(embedding)) AS has_min,
       list_sort(embedding)[2] AS second_smallest
FROM embeddings
""",
)
def q110_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return e.select(
        "vec_id",
        F.element_at(v, 1).alias("first_elem"),
        F.array_min(v).alias("min_elem"),
        F.array_max(v).alias("max_elem"),
        F.array_position(v, F.array_max(v)).cast("long").alias("argmax_pos"),
        F.array_contains(v, F.array_min(v)).alias("has_min"),
        F.element_at(F.array_sort(v), 2).alias("second_smallest"),
    )


@register(
    "q111_posexplode_ordinal",
    doc="Lateral explode with ordinality (UNNEST WITH ORDINALITY): one "
    "(doc, position, token) row per token for low-id docs. The generator "
    "runs inside codegen after the scan filter; output volume is total "
    "postings, never materialized text copies.",
    oracle="""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents WHERE doc_id < 200
)
SELECT doc_id, UNNEST(range(0, len(t))) AS pos, UNNEST(t) AS token
FROM tok
""",
)
def q111_posexplode_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


@register(
    "q112_decimal_exact_money",
    doc="Exact decimal money arithmetic: prices cast to DECIMAL(18,4) at "
    "the scan, summed and multiplied WITHOUT floating error — the only "
    "aggregate family here that needs no stable_round, because both "
    "engines produce the identical exact value regardless of sum order. "
    "The scale path for financial ledgers where 1e-10 float drift is a "
    "reconciliation failure. (The final cast to double is presentation "
    "only — the aggregation itself is exact, so both engines emit the "
    "bit-identical nearest double with no stable_round nudge.)",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS gross,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS discount_amt,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q112_decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("double").alias("gross"),
        F.sum(price * disc).cast("double").alias("discount_amt"),
        F.count("*").alias("n"),
    )


@register(
    "q113_map_functions",
    doc="Map-typed aggregation state: per user, a map event_type -> count "
    "built with map_from_entries(collect_list(struct)), then scalar "
    "lookups (try_element_at: missing key -> null) and cardinality. Map "
    "columns never cross the output boundary (representation-sensitive); "
    "scalars only.",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
),
m AS (
  SELECT user_id, MAP(list(event_type), list(n)) AS mp FROM c GROUP BY user_id
)
SELECT user_id,
       mp['view'][1] AS n_view,
       mp['click'][1] AS n_click,
       mp['purchase'][1] AS n_purchase,
       CAST(cardinality(mp) AS BIGINT) AS n_types
FROM m
""",
)
def q113_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("mp")
    )
    return m.select(
        "user_id",
        F.try_element_at("mp", F.lit("view")).alias("n_view"),
        F.try_element_at("mp", F.lit("click")).alias("n_click"),
        F.try_element_at("mp", F.lit("purchase")).alias("n_purchase"),
        F.size("mp").cast("long").alias("n_types"),
    )


@register(
    "q114_range_frame_window",
    doc="Time-interval (RANGE) window frames — trailing 7-day value sum and "
    "event count per user, anchored on event time rather than row "
    "position (the ROWS frames elsewhere count rows; a RANGE frame is "
    "what a trailing-week metric actually means when events are "
    "irregular). Spark expresses the interval as rangeBetween over epoch "
    "seconds; state per task is one ordered pass per user partition.",
    oracle="""
SELECT event_id, user_id,
       ROUND(SUM(value) OVER w + 5e-7, 4) AS trailing_7d_value,
       COUNT(*) OVER w AS trailing_7d_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
""",
)
def q114_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # microsecond epoch: boundary inclusion matches DuckDB's microsecond
    # interval arithmetic exactly (second-truncation would misclassify
    # events landing within 1s of the 7-day edge)
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us)
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        stable_round(F.sum("value").over(w), 4).alias("trailing_7d_value"),
        F.count("*").over(w).alias("trailing_7d_events"),
    )


@register(
    "q105_grouping_sets",
    doc="GROUPING SETS — the general form of q25's ROLLUP: per "
    "(returnflag, linestatus) detail, per-returnflag subtotal, and grand "
    "total in ONE pass (Spark expands the sets before the hash agg; no "
    "re-scan per set). Grouping keys use an 'ALL' sentinel instead of "
    "grouping_id so both engines emit identical rows.",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity) + 5e-7, 4) AS total_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def q105_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count("*").alias("n"),
            stable_round(F.sum("l_quantity"), 4).alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "total_qty",
        )
    )
