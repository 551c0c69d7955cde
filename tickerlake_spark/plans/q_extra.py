"""Coverage-completing + beyond-reference operator queries.

Fills the remaining SURVEY §2 rows (scalar stats A8/A9, sampling O5, date
formatting F3/F4) and adds Spark-first extensions the reference lacks:
as-of join, rollup/grouping-sets, pivot, top-k per group, approximate
distinct. Each shape is a building block large-scale pipelines reach for
constantly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round
from tickerlake_spark.plans.catalog import load_table, register


@register(
    "q22_scalar_stats",
    doc="Scalar min/max/avg/stddev/median per group (A8/A9 + spread stats; "
    "both engines use sample stddev and continuous-interpolation median).",
    oracle="""
SELECT l_returnflag,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       ROUND(AVG(l_extendedprice) + 5e-9, 6) AS avg_price,
       ROUND(STDDEV_SAMP(l_extendedprice) + 5e-9, 6) AS std_price,
       ROUND(quantile_cont(l_extendedprice, 0.5) + 5e-9, 6) AS median_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q22_scalar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        stable_round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        stable_round(F.stddev_samp("l_extendedprice"), 6).alias("std_price"),
        stable_round(
            F.percentile("l_extendedprice", F.lit(0.5)), 6
        ).alias("median_price"),
    )


@register(
    "q23_deterministic_sample",
    doc="Reproducible ~10% sample via hash-mod on the key (O5: the "
    "reference's unseeded shuffle sample made deterministic — the only "
    "sampling that is stable across engines, retries, and cluster sizes).",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
      % 100 < 10
""",
)
def q23_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.text import h60

    o = load_table(spark, sf_dir, "orders")
    return o.filter(h60(F.col("o_orderkey").cast("string")) % 100 < 10).select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "q24_asof_join",
    doc="As-of join (most recent 'click' at-or-before each 'error' per "
    "user) — union + last-non-null window formulation, one shuffle; the "
    "oracle uses DuckDB's native ASOF JOIN.",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click'
  ) WHERE rn = 1
),
errors AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'
)
SELECT e.user_id, e.ts, e.event_id,
       c.value AS last_click_value
FROM errors e ASOF LEFT JOIN clicks c
  ON e.user_id = c.user_id AND e.ts >= c.ts
""",
)
def q24_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.dedup import dedup_keep_last
    from tickerlake_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = dedup_keep_last(
        ev.filter(F.col("event_type") == "click"),
        keys=["user_id", "ts"],
        order_by=["event_id"],
    ).select("user_id", "ts", F.col("value"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        errors, clicks.withColumnRenamed("value", "last_click_value"),
        key_cols=["user_id"], ts_col="ts", value_cols=["last_click_value"],
    )
    return out.select("user_id", "ts", "event_id", "last_click_value")


@register(
    "q25_rollup",
    doc="ROLLUP aggregation with grouping-id (beyond the reference: "
    "subtotal/total rows in one pass).",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity) + 5e-7, 4) AS total_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q25_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").alias("n"),
        stable_round(F.sum("l_quantity"), 4).alias("total_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n", "total_qty")


@register(
    "q26_pivot",
    doc="Pivot (wide conditional aggregation): revenue by linestatus x "
    "returnflag columns.",
    oracle="""
SELECT l_linestatus,
       ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_extendedprice ELSE 0 END) + 5e-7, 4) AS rev_A,
       ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE 0 END) + 5e-7, 4) AS rev_N,
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END) + 5e-7, 4) AS rev_R
FROM lineitem
GROUP BY l_linestatus
""",
)
def q26_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_extendedprice"))
    )
    return out.select(
        "l_linestatus",
        stable_round(F.coalesce(F.col("A"), F.lit(0.0)), 4).alias("rev_A"),
        stable_round(F.coalesce(F.col("N"), F.lit(0.0)), 4).alias("rev_N"),
        stable_round(F.coalesce(F.col("R"), F.lit(0.0)), 4).alias("rev_R"),
    )


@register(
    "q27_topk_per_group",
    doc="Top-3 customers by account balance per nation (ranked-window "
    "limit — the per-group top-k the reference's D4 needs generalized).",
    oracle="""
SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
)
WHERE rn <= 3
""",
)
def q27_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


@register(
    "q28_date_format_parse",
    doc="Date formatting and re-parsing round-trip (F3/F4).",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS date_str,
       CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS reparsed,
       strftime(o_orderdate, '%Y/%m') AS month_label
FROM orders
""",
)
def q28_date_format_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd"), "yyyy-MM-dd").alias(
            "reparsed"
        ),
        F.date_format("o_orderdate", "yyyy/MM").alias("month_label"),
    )


@register(
    "q29_set_ops",
    doc="INTERSECT / EXCEPT set operations (U2 generalized beyond the "
    "reference's driver-side date set-diff): customers active in 1997 vs "
    "1998, tagged by which set they fall in.",
    oracle="""
WITH c97 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'),
     c98 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1999-01-01')
SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM c97 INTERSECT SELECT * FROM c98)
UNION ALL
SELECT o_custkey, 'only_1997' AS tag FROM (SELECT * FROM c97 EXCEPT SELECT * FROM c98)
UNION ALL
SELECT o_custkey, 'only_1998' AS tag FROM (SELECT * FROM c98 EXCEPT SELECT * FROM c97)
""",
)
def q29_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def actives(year: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("date"))
            )
            .select("o_custkey")
            .distinct()
        )

    c97, c98 = actives(1997), actives(1998)
    return (
        c97.intersect(c98).withColumn("tag", F.lit("both"))
        .unionByName(c97.exceptAll(c98).withColumn("tag", F.lit("only_1997")))
        .unionByName(c98.exceptAll(c97).withColumn("tag", F.lit("only_1998")))
    )


@register(
    "q63_salted_join_skew",
    doc="Skew-salted equi-join (operators/skew.py): the fact side salted 16 "
    "ways, the dim side replicated per salt — semantics identical to the "
    "plain join, which is exactly what the oracle checks. Beyond-reference "
    "scale operator for hot-key joins AQE can't pre-split.",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, s.s_name,
       ROUND(l.l_extendedprice * (1 - l.l_discount) + 5e-9, 6) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE l.l_shipdate >= DATE '1998-01-01'
""",
)
def q63_salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.skew import salted_join

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("date"))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "l_discount",
        )
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return salted_join(li, sup, on="s_suppkey", how="inner", salt=16).select(
        "l_orderkey",
        "l_linenumber",
        "s_name",
        stable_round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
        ).alias("revenue"),
    )


@register(
    "q64_date_count_anomalies",
    doc="Per-date record-count anomaly classification (validation.py, the "
    "reference's utils/validation.py:16-139 driver loop as one broadcast-"
    "mean plan).",
    oracle="""
WITH counts AS (SELECT o_orderdate AS date, COUNT(*) AS n FROM orders GROUP BY 1),
     m AS (SELECT AVG(n) AS mean_n FROM counts)
SELECT date, n, ROUND(mean_n + 5e-9, 6) AS mean_n,
       CASE WHEN n < 2 THEN 'below_min'
            WHEN n < 0.5 * mean_n THEN 'low'
            WHEN n > 2.0 * mean_n THEN 'high'
            ELSE 'ok' END AS status
FROM counts CROSS JOIN m
""",
)
def q64_date_count_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.validation import classify_date_counts

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("date")
    )
    df = classify_date_counts(o, min_records=2)
    return df.select(
        "date", "n", stable_round(F.col("mean_n"), 6).alias("mean_n"), "status"
    )


@register(
    "q65_range_join",
    doc="Point-in-interval range join (operators/rangejoin.py): bucketed "
    "equi-join + residual instead of the O(n*m) nested-loop a bare "
    "inequality join plans as. Irregular overlapping price bands derived "
    "from supplier; DuckDB's IEJoin is the oracle.",
    oracle="""
WITH bands AS (
  SELECT s_suppkey,
         s_acctbal * 30 AS lo,
         s_acctbal * 30 + 2000 + (s_suppkey % 7) * 500 AS hi
  FROM supplier
)
SELECT o.o_orderkey, b.s_suppkey, o.o_totalprice, b.lo, b.hi
FROM orders o JOIN bands b
  ON b.lo <= o.o_totalprice AND o.o_totalprice < b.hi
""",
)
def q65_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.rangejoin import bucketed_range_join

    points = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bands = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") * 30).alias("lo"),
        (F.col("s_acctbal") * 30 + 2000 + (F.col("s_suppkey") % 7) * 500).alias("hi"),
    )
    return bucketed_range_join(
        points, bands, "o_totalprice", "lo", "hi", bucket_width=2500.0
    ).select("o_orderkey", "s_suppkey", "o_totalprice", "lo", "hi")
