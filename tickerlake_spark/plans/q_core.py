"""Core relational operator inventory (SURVEY §2.2-2.8) as oracle-checked queries.

Each query exercises one operator family from the reference on the driver's
TPC-H-ish tables. Reference citations point at the operator being re-expressed,
not at copied code.

Determinism rules (see catalog.py): computed doubles rounded to 6dp (or 4dp for
large-magnitude sums) on both sides; computed ints cast to long on both sides;
every top-k carries a full tie-break order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round
from tickerlake_spark.plans.catalog import load_table, register

# --------------------------------------------------------------------------
# Aggregations (A1-A11) + scan/filter pushdown (S1, P4-P8)
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    doc="TPC-H Q1 shape: filtered scan -> 2-key groupBy with sum/avg/count "
    "(A8/A9 family; predicate pushdown to parquet).",
    bench=True,
    oracle="""
SELECT
  l_returnflag, l_linestatus,
  ROUND(CAST(SUM(l_quantity) AS DOUBLE) + 5e-7, 4)                              AS sum_qty,
  ROUND(SUM(l_extendedprice) + 5e-7, 4)                                         AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)) + 5e-7, 4)                      AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 5e-7, 4)        AS sum_charge,
  ROUND(AVG(l_quantity) + 5e-9, 6)                                              AS avg_qty,
  ROUND(AVG(l_extendedprice) + 5e-9, 6)                                         AS avg_price,
  ROUND(AVG(l_discount) + 5e-9, 6)                                              AS avg_disc,
  COUNT(*)                                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 4).alias("sum_qty"),
            stable_round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            stable_round(F.sum(disc_price), 4).alias("sum_disc_price"),
            stable_round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            stable_round(F.avg("l_quantity"), 6).alias("avg_qty"),
            stable_round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            stable_round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q02_filter_project",
    doc="Projection + derived columns + conjunctive range/membership/null "
    "predicates (P1-P8) and CASE WHEN (P9). Row-level arithmetic is "
    "IEEE-deterministic, no rounding needed.",
    oracle="""
SELECT
  l_orderkey, l_linenumber, l_quantity, l_extendedprice,
  l_extendedprice * (1 - l_discount) AS revenue,
  CASE WHEN l_quantity > 45 THEN 'bulk'
       WHEN l_quantity > 20 THEN 'mid'
       ELSE 'small' END AS qty_band
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_quantity > 10
  AND l_returnflag IN ('N', 'R')
  AND l_extendedprice IS NOT NULL
""",
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.02, 0.08)
            & (F.col("l_quantity") > 10)
            & F.col("l_returnflag").isin("N", "R")
            & F.col("l_extendedprice").isNotNull()
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.when(F.col("l_quantity") > 45, "bulk")
            .when(F.col("l_quantity") > 20, "mid")
            .otherwise("small")
            .alias("qty_band"),
        )
    )


@register(
    "q03_shipping_priority",
    doc="TPC-H Q3 shape: 3-way join, filter both sides, grouped revenue, "
    "top-10 with total tie-break order (J-family + O-family).",
    bench=True,
    oracle="""
SELECT o.o_orderkey, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-7, 4) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate  > TIMESTAMP '1996-06-30'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "q04_join_left_enrich",
    doc="Left equi-join fact->dims with broadcast (J1 shape: orders enriched "
    "with customer + nation, small dims broadcast).",
    oracle="""
SELECT n.n_name AS nation, COUNT(*) AS order_cnt,
       ROUND(SUM(o.o_totalprice) + 5e-7, 4) AS total_value
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q04_join_left_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("order_cnt"),
            stable_round(F.sum("o_totalprice"), 4).alias("total_value"),
        )
    )


@register(
    "q05_local_supplier_volume",
    doc="TPC-H Q5 shape: 6-way snowflake join with an extra non-FK equality "
    "(c_nationkey = s_nationkey); dims broadcast, facts shuffle-join.",
    bench=True,
    oracle="""
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-7, 4) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey  = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey  = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('AMERICA', 'ASIA')
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n.n_name
""",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("AMERICA", "ASIA")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "q06_anti_join",
    doc="Anti-join: customers with no orders (J3, reference does this with "
    "Python set difference — here a distributed left_anti).",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q07_semi_join",
    doc="Semi-join: customers with at least one high-value order (J4; the "
    "reference's is_in membership filter at scale).",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
)
""",
)
def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q08_groupby_count_distinct",
    doc="Group-by counts + count-distinct (A1/A6/A7).",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS order_cnt,
       COUNT(DISTINCT o_custkey) AS customer_cnt,
       ROUND(AVG(o_totalprice) + 5e-9, 6) AS avg_price
FROM orders
GROUP BY o_orderpriority
""",
)
def q08_groupby_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_cnt"),
        F.countDistinct("o_custkey").alias("customer_cnt"),
        stable_round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


@register(
    "q09_distinct",
    doc="Distinct tuple values (A6).",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q09_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@register(
    "q10_quality_counts",
    doc="Null-count / conditional-count data-quality stats (A10/A11, the "
    "reference's utils/validation.py:16-139 anomaly counters as one agg).",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value_cnt,
       CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_cnt,
       CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt
FROM events
GROUP BY event_type
""",
)
def q10_quality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_value_cnt"),
        F.sum((F.col("value") < 0).cast("long")).alias("negative_cnt"),
        F.sum((F.col("value") > 50).cast("long")).alias("high_cnt"),
    )


@register(
    "q11_case_cast",
    doc="CASE WHEN + permissive casts + literal columns (P9/P10/P11).",
    oracle="""
SELECT p_partkey,
       CAST(p_size AS BIGINT) AS size_long,
       CAST(p_retailprice AS VARCHAR) AS price_str,
       CASE WHEN p_size >= 40 THEN 'XL' WHEN p_size >= 20 THEN 'M' ELSE 'S' END AS size_band,
       'catalog' AS src
FROM part
""",
)
def q11_case_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("long").alias("size_long"),
        F.col("p_retailprice").cast("string").alias("price_str"),
        F.when(F.col("p_size") >= 40, "XL")
        .when(F.col("p_size") >= 20, "M")
        .otherwise("S")
        .alias("size_band"),
        F.lit("catalog").alias("src"),
    )


@register(
    "q12_union_all",
    doc="Vertical concat of same-schema frames (U1) then re-aggregate.",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n
FROM (
  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 150000
  UNION ALL
  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
) u
GROUP BY o_orderstatus
""",
)
def q12_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 150000).select("o_orderkey", "o_orderstatus")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus"
    )
    return hi.unionByName(urgent).groupBy("o_orderstatus").agg(
        F.count("*").alias("n")
    )


@register(
    "q13_topk_sort",
    doc="Global sort + limit with a total order (O1/O2/O6). Raw column values "
    "are bit-identical across engines, so no rounding.",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 20
""",
)
def q13_topk_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(20)
    )


@register(
    "q14_date_buckets",
    doc="Scalar date functions (F2-F4): year/quarter/month extraction + "
    "Monday-anchored week truncation (the reference's weekly anchor, "
    "SURVEY §4.3.5).",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       date_trunc('week', o_orderdate) AS week_start,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice) + 5e-7, 4) AS total
FROM orders
GROUP BY 1, 2, 3
""",
)
def q14_date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_trunc("week", F.col("o_orderdate")).alias("week_start"),
    ).agg(
        F.count("*").alias("n"),
        stable_round(F.sum("o_totalprice"), 4).alias("total"),
    )


@register(
    "q15_row_math",
    doc="Row-wise scalar math (F5/F6/F7): arithmetic, abs, greatest/least, "
    "boolean algebra. IEEE-deterministic per row.",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
       ABS(l_discount - l_tax) AS disc_tax_gap,
       GREATEST(l_discount, l_tax) AS max_rate,
       LEAST(l_discount, l_tax) AS min_rate,
       (l_discount > 0.05 AND l_tax < 0.05) AS hi_disc_lo_tax
FROM lineitem
WHERE l_quantity <= 5
""",
)
def q15_row_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 5)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("disc_tax_gap"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        ((F.col("l_discount") > 0.05) & (F.col("l_tax") < 0.05)).alias(
            "hi_disc_lo_tax"
        ),
    )


# --------------------------------------------------------------------------
# Window functions (W1-W8 family) + ranked dedup (A5)
# --------------------------------------------------------------------------


@register(
    "q16_rank_windows",
    doc="Ranking windows (row_number/rank/dense_rank) — needed by the "
    "reference's keep-last dedup (A5) and best-pattern pick (D4).",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank()       OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
""",
)
def q16_rank_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "q17_lag_delta",
    doc="Lag-1 per partition (W2, the reference's prev_close) + delta.",
    oracle="""
SELECT user_id, event_id, value,
       lag(value, 1) OVER w AS prev_value,
       value - lag(value, 1) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
)
def q17_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("value", 1).over(w)
    return e.select(
        "user_id",
        "event_id",
        "value",
        prev.alias("prev_value"),
        (F.col("value") - prev).alias("delta"),
    )


@register(
    "q18_rolling_mean_strict",
    doc="Trailing 20-row mean, null until the window is full — the "
    "reference's SMA semantics (W1, Polars min_samples == window_size; "
    "SURVEY §4.3.1).",
    oracle="""
SELECT event_type, event_id,
       ROUND(CASE WHEN COUNT(value) OVER w = 20 THEN AVG(value) OVER w END + 5e-9, 6) AS sma_20
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
""",
)
def q18_rolling_mean_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.core import rolling_mean_strict

    e = load_table(spark, sf_dir, "events")
    sma = rolling_mean_strict("value", 20, ["event_type"], ["ts", "event_id"])
    return e.select(
        "event_type", "event_id", stable_round(sma, 6).alias("sma_20")
    )


@register(
    "q19_cumulative_vwap",
    doc="Cumulative Σ(p·v)/Σ(v) per (key, year) — the reference's YTD VWAP "
    "shape (W6/W8, gold/vwap_signals.py) on lineitem: price=extendedprice, "
    "volume=quantity, key=suppkey.",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       ROUND(SUM(l_extendedprice * l_quantity) OVER w / SUM(l_quantity) OVER w + 5e-9, 6)
         AS ytd_vwap,
       (l_extendedprice > SUM(l_extendedprice * l_quantity) OVER w / SUM(l_quantity) OVER w)
         AS above_vwap
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey, year(l_shipdate)
             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
                      l_extendedprice ASC, l_quantity ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q19_cumulative_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey", F.year("l_shipdate"))
        .orderBy(
            F.col("l_shipdate").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
            # the synthetic lineitem has duplicate (orderkey, linenumber)
            # pairs; include the summed columns so tied rows contribute
            # identically regardless of their relative order
            F.col("l_extendedprice").asc(),
            F.col("l_quantity").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    vwap = F.sum(F.col("l_extendedprice") * F.col("l_quantity")).over(w) / F.sum(
        "l_quantity"
    ).over(w)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        stable_round(vwap, 6).alias("ytd_vwap"),
        (F.col("l_extendedprice") > vwap).alias("above_vwap"),
    )


@register(
    "q20_dedup_keep_last",
    doc="Deterministic keep-last dedup on a subset key (A5, the reference's "
    "unique(subset=[...], keep='last') with explicit arrival order).",
    oracle="""
SELECT user_id, event_type, event_id, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
""",
)
def q20_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.dedup import dedup_keep_last

    e = load_table(spark, sf_dir, "events")
    return dedup_keep_last(
        e, keys=["user_id", "event_type"], order_by=["ts", "event_id"]
    ).select("user_id", "event_type", "event_id", "value")


@register(
    "q21_product_agg",
    doc="Product aggregate via exp(sum(log)) (A2, the reference's stacked "
    "split-factor product; SURVEY §4.3.2). Both engines compute the identical "
    "formulation.",
    oracle="""
SELECT l_orderkey,
       ROUND(EXP(SUM(LN(1 + l_tax))) + 5e-9, 6) AS tax_factor,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_orderkey
""",
)
def q21_product_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.core import product

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        stable_round(product(1 + F.col("l_tax")), 6).alias("tax_factor"),
        F.count("*").alias("n_lines"),
    )
