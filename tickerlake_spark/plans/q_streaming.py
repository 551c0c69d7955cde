"""Event-stream window queries (SURVEY §2.10 extension).

Batch-mode executions of the streaming window operators — identical
semantics to their streaming counterparts (same functions, see
streaming/windows.py), which makes them oracle-checkable: tumbling/sliding
windows via DuckDB time_bucket (both engines use midnight-aligned grids),
sessions via gaps-and-islands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round
from tickerlake_spark.plans.catalog import load_table, register
from tickerlake_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg


@register(
    "q60_tumbling_window",
    doc="Per-type hourly tumbling-window event counts/sums — "
    "Structured-Streaming window() in batch mode.",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value) + 5e-7, 4) AS total_value
FROM events
GROUP BY 1, 2, 3
""",
)
def q60_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tumbling_agg(load_table(spark, sf_dir, "events"), "1 hour")
    return out.select(
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        stable_round(F.col("total_value"), 4).alias("total_value"),
    )


@register(
    "q61_sliding_window",
    doc="1-hour windows sliding every 15 minutes (each event in 4 windows) — "
    "overlap explosion handled by Spark's window generator.",
    oracle="""
SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start,
       time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
         + INTERVAL '1 hour' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value) + 5e-7, 4) AS total_value
FROM events, unnest(range(0, 4)) AS t(k)
GROUP BY 1, 2, 3
""",
)
def q61_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sliding_agg(load_table(spark, sf_dir, "events"), "1 hour", "15 minutes")
    return out.select(
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        stable_round(F.col("total_value"), 4).alias("total_value"),
    )


@register(
    "q62_session_window",
    doc="Per-user session windows (30-minute gap): session_window() in "
    "batch; the oracle computes the same sessions via gaps-and-islands.",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
islands AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       user_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value) + 5e-7, 4) AS total_value
FROM islands
GROUP BY user_id, sid
""",
)
def q62_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = session_agg(load_table(spark, sf_dir, "events"), "30 minutes")
    return out.select(
        "session_start",
        "session_end",
        "user_id",
        "n_events",
        stable_round(F.col("total_value"), 4).alias("total_value"),
    )
