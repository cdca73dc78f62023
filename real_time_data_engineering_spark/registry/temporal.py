"""Temporal-join extension queries: as-of (point-in-time lookup) and
interval/range join (windowed event correlation).

The reference has no as-of/range joins (SURVEY.md §2.3) — these extend
the engine for point-in-time feature retrieval (the feature-store
pattern of pipelines/21-feast, generalized to event-time correctness)
and stream correlation. Both run as one-shuffle compositions, oracle-
checked against DuckDB window/non-equi formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import ts_str
from ..operators.asof import asof_join, interval_point_join
from ..sources.readers import load_table
from . import register

# ---------------------------------------------------------------------------
# q22 — as-of join: each event gets the user's most recent order at
# event time (point-in-time correct feature lookup; no future leakage).
# Tie-break at equal order date: largest o_orderkey. COALESCE guards
# keep dtypes non-null-stable on both engines (corpus: every event
# user has a prior order, asserted in tests).
# ---------------------------------------------------------------------------
_Q22_ORACLE = """
WITH cand AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
SELECT l.event_id, l.user_id, strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       COALESCE(c.o_orderkey, -1) AS last_orderkey,
       CAST(COALESCE(CAST(c.o_totalprice AS DECIMAL(12,2)), 0) AS DOUBLE) AS last_order_total
FROM events l
LEFT JOIN cand c ON c.event_id = l.event_id AND c.rn = 1
"""


@register("q22_asof_order", _Q22_ORACLE)
def q22_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join events→orders keyed on user (one shuffle)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", F.col("o_totalprice").cast("decimal(12,2)").alias("o_totalprice")
    )
    joined = asof_join(
        ev,
        orders,
        left_time="ts",
        right_time="o_orderdate",
        by=[("user_id", "o_custkey")],
        right_cols=["o_orderkey", "o_totalprice"],
        tie_col="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("ts_str"),
        F.coalesce("o_orderkey", F.lit(-1)).alias("last_orderkey"),
        F.coalesce("o_totalprice", F.lit(0).cast("decimal(12,2)")).cast("double").alias("last_order_total"),
    )


# ---------------------------------------------------------------------------
# q23 — interval/range join: for each purchase event, the count and
# (exact decimal) value of click events in the preceding 10 minutes,
# across all users — a pure non-equi time-range correlation with no
# equality key, executed as a bucketed equi-join (bucket = window span
# → ≤2 buckets per interval) instead of a nested-loop N·M scan.
# ---------------------------------------------------------------------------
_Q23_ORACLE = """
WITH p AS (
  SELECT event_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT ts AS c_ts, value FROM events WHERE event_type = 'click'
)
SELECT p.event_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       COUNT(c.c_ts) AS n_clicks,
       CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(12,2))), 0) AS DOUBLE) AS click_value
FROM p
LEFT JOIN c ON c.c_ts >= p.ts - INTERVAL 10 MINUTE AND c.c_ts < p.ts
GROUP BY 1, 2
"""


@register("q23_range_clicks", _Q23_ORACLE)
def q23_range_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join purchases←clicks over a 10-minute lookback."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "ts",
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("lo"),
        F.col("ts").alias("hi"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ts"), F.col("value").cast("decimal(12,2)").alias("c_value")
    )
    hits = interval_point_join(p, c, lo="lo", hi="hi", point_time="c_ts", bucket_seconds=600)
    agg = hits.groupBy("event_id").agg(
        F.count("*").alias("n_clicks"), F.sum("c_value").alias("click_value")
    )
    return (
        p.join(agg, "event_id", "left")
        .select(
            "event_id",
            ts_str("ts").alias("ts_str"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("click_value"), F.lit(0).cast("decimal(12,2)")).cast("double").alias("click_value"),
        )
    )
