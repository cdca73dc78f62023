"""Core analytic operator coverage (SURVEY.md §2) on the driver corpus.

Each query maps one or more reference operators onto the TPC-H-ish
tables per FIXTURES.md §F8: ``orders.o_orderdate`` is the event-time
axis, ``lineitem`` the fact, ``customer/nation/region`` the broadcast
dims, ``events`` the stream table. Reference citations sit on each
function; the paired DuckDB SQL is the machine-checked oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.parity import money, ratio, sum_money
from ..sources.readers import load_table
from . import register

# ---------------------------------------------------------------------------
# q1 — daily revenue rollup (reference A1 int_daily_summary.sql:10-34 and
# benchmark q1_daily_revenue.sql). groupBy date → count/sum/avg.
# ---------------------------------------------------------------------------
_Q1_ORACLE = """
SELECT CAST(o_orderdate AS DATE) AS order_date,
       COUNT(*) AS total_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           AS avg_revenue
FROM orders
GROUP BY 1
"""


@register("q1_daily_revenue", _Q1_ORACLE)
def q1_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup: the reference's headline benchmark query (A1)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.count("*").alias("total_orders"),
        sum_money("o_totalprice").alias("total_revenue"),
        ratio(F.sum(money("o_totalprice")), F.count("*")).alias("avg_revenue"),
    )


# ---------------------------------------------------------------------------
# q2 — top-10 by revenue through the dim chain (reference J1 2×-join
# enrichment fct_trips.sql:57-67 + T1 top-k q2_top_locations.sql:23-34).
# nation/region are broadcast dims; orders⋈customer shuffles on the key —
# at 100 TB that join is the big one, so it is NOT force-broadcast.
# ---------------------------------------------------------------------------
_Q2_ORACLE = """
SELECT n.n_name, r.r_name,
       COUNT(*) AS total_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
ORDER BY total_revenue DESC, n_name
LIMIT 10
"""


@register("q2_top_nations", _Q2_ORACLE)
def q2_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k zones analogue: joins through customer→nation→region."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("total_orders"), sum_money("o_totalprice").alias("total_revenue"))
        .orderBy(F.desc("total_revenue"), "n_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q3 — hourly demand heatmap (reference A2 int_hourly_patterns.sql:10-25 +
# P8 time dims; DOW-offset pitfall handled by emitting the day NAME, and
# is_weekend computed with each engine's native numbering).
# ---------------------------------------------------------------------------
_Q3_ORACLE = """
SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS event_hour,
       dayname(CAST(ts AS DATE)) AS day_name,
       (dayofweek(CAST(ts AS DATE)) IN (0, 6)) AS is_weekend,
       COUNT(*) AS total_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


@register("q3_hourly_demand", _Q3_ORACLE)
def q3_hourly_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup with day-name + weekend flag (A2/P8)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.hour("ts").cast("long").alias("event_hour"),
        F.date_format("ts", "EEEE").alias("day_name"),
        F.dayofweek("ts").isin(1, 7).alias("is_weekend"),
    ).agg(F.count("*").alias("total_events"), sum_money("value").alias("total_value"))


# ---------------------------------------------------------------------------
# q4 — percent-of-total breakdown (reference A7/W4
# q4_payment_breakdown.sql:25-37: count(*)*100.0/sum(count(*)) over ()).
# ---------------------------------------------------------------------------
_Q4_ORACLE = """
WITH b AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, n AS total_orders, total_revenue,
       CAST(100 * n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS pct_of_total
FROM b
"""


@register("q4_priority_share", _Q4_ORACLE)
def q4_priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payment-breakdown analogue: share of total via empty-frame window."""
    o = load_table(spark, sf_dir, "orders")
    b = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("total_orders"), sum_money("o_totalprice").alias("total_revenue")
    )
    w = Window.partitionBy()
    return b.select(
        "o_orderpriority",
        "total_orders",
        "total_revenue",
        ratio(F.lit(100) * F.col("total_orders"), F.sum("total_orders").over(w)).alias("pct_of_total"),
    )


# ---------------------------------------------------------------------------
# q5 — running total + day-over-day delta (reference W2/W3
# mart_daily_revenue.sql:34-37). Decimal running sum stays exact.
# ---------------------------------------------------------------------------
_Q5_ORACLE = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT order_date,
       CAST(rev AS DOUBLE) AS daily_revenue,
       CAST(SUM(rev) OVER (ORDER BY order_date
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue,
       CAST(rev - lag(rev) OVER (ORDER BY order_date) AS DOUBLE) AS revenue_delta
FROM d
"""


@register("q5_running_revenue", _Q5_ORACLE)
def q5_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue + lag delta over the date axis (W2/W3)."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.sum(money("o_totalprice")).alias("rev")
    )
    # Global window over the per-DAY aggregate (bounded: one row per
    # calendar day at any fact scale) — the expected WindowExec
    # "No Partition Defined"; partition by year + stitch at 100×
    # (implemented + equivalence-tested: operators/windows.py).
    w = Window.orderBy("order_date")
    return d.select(
        "order_date",
        F.col("rev").cast("double").alias("daily_revenue"),
        F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias("running_revenue"),
        (F.col("rev") - F.lag("rev").over(w)).cast("double").alias("revenue_delta"),
    )


@register(
    "q29_running_revenue_stitched",
    _Q5_ORACLE,
    doc="q5's running total + lag delta computed by the SCALE plan — "
    "partition-by-year windows + broadcast stitch (operators/windows.py) "
    "instead of one global WindowExec — against the SAME oracle, so the "
    "100x mitigation is value-checked, not just unit-tested.",
)
def q29_running_revenue_stitched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partition-and-stitch form of q5: identical values, but the
    corpus-scaled window pass is partitioned by year; the only global
    window runs over one row per year."""
    from ..operators.windows import stitched_lag, stitched_running_sum

    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.sum(money("o_totalprice")).alias("rev")
    )
    part = F.year("order_date")
    out = stitched_running_sum(d, "order_date", "rev", part, out_col="running_raw")
    out = stitched_lag(out, "order_date", "rev", part, out_col="prev_rev")
    return out.select(
        "order_date",
        F.col("rev").cast("double").alias("daily_revenue"),
        F.col("running_raw").cast("double").alias("running_revenue"),
        (F.col("rev") - F.col("prev_rev")).cast("double").alias("revenue_delta"),
    )


# ---------------------------------------------------------------------------
# q6 — mode() per group with explicit tie-break (reference A4
# mart_location_performance.sql:10-36; SURVEY flags tie nondeterminism, so
# BOTH sides use row_number ordered by (count DESC, value ASC)).
# ---------------------------------------------------------------------------
_Q6_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2
), r AS (
  SELECT user_id, event_type, cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_event_type, cnt AS mode_count FROM r WHERE rn = 1
"""


@register("q6_mode_per_user", _Q6_ORACLE)
def q6_mode_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode(): most frequent event_type per user (A4)."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), F.col("cnt").alias("mode_count"))
    )


# ---------------------------------------------------------------------------
# q7 — per-entity feature aggregates (reference A5
# feast/materialize_features.py:52-64: avg fare, avg distance, conditional
# tip %, trip count per location).
# ---------------------------------------------------------------------------
_Q7_ORACLE = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_value,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase_value,
       CAST(100 * COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS purchase_share_pct
FROM events
GROUP BY 1
"""


@register("q7_user_features", _Q7_ORACLE)
def q7_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store materialization: entity-keyed aggregates (A5)."""
    e = load_table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    n_purchases = F.count(F.when(is_purchase, 1))
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        ratio(F.sum(money("value")), F.count("*")).alias("avg_value"),
        n_purchases.alias("n_purchases"),
        F.sum(F.when(is_purchase, money("value"))).cast("double").alias("purchase_value"),
        ratio(F.lit(100) * n_purchases, F.count("*")).alias("purchase_share_pct"),
    )


# ---------------------------------------------------------------------------
# q8 — distinct counts (reference A8 validate.py:229-233: count(DISTINCT)
# vs count(*)). Exact here; approx_count_distinct is the 100 TB variant
# (see operators.rollups.approx_distinct_profile).
# ---------------------------------------------------------------------------
_Q8_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(COUNT(*) AS DOUBLE) / CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS events_per_user
FROM events
GROUP BY 1
"""


@register("q8_distinct_counts", _Q8_ORACLE)
def q8_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count reconciliation (A8)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        ratio(F.count("*"), F.countDistinct("user_id")).alias("events_per_user"),
    )


# ---------------------------------------------------------------------------
# q9 — z-score daily anomaly flags (reference A9
# anomaly_daily_trips.py:19-40). Stats built from exact integer sums; the
# identical double expression runs last on both engines.
# ---------------------------------------------------------------------------
_Q9_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt FROM events GROUP BY 1
), s AS (
  SELECT day, cnt,
         COUNT(*) OVER () AS n,
         CAST(SUM(cnt) OVER () AS BIGINT) AS sx,
         CAST(SUM(cnt * cnt) OVER () AS BIGINT) AS sx2
  FROM d
)
SELECT day, cnt AS daily_events,
       (CAST(cnt AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt(CAST(n * sx2 - sx * sx AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS z_score,
       abs((CAST(cnt AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt(CAST(n * sx2 - sx * sx AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))) > 2.0
           AS is_anomaly
FROM s
"""


@register("q9_daily_anomaly", _Q9_ORACLE)
def q9_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly flags over the daily series (A9), exact-stats form."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy()
    s = d.select(
        "day",
        "cnt",
        F.count("*").over(w).alias("n"),
        F.sum("cnt").over(w).alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("sx2"),
    )
    mean = F.col("sx").cast("double") / F.col("n").cast("double")
    std = F.sqrt(
        (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
        / (F.col("n") * (F.col("n") - F.lit(1))).cast("double")
    )
    z = (F.col("cnt").cast("double") - mean) / std
    return s.select(
        "day",
        F.col("cnt").alias("daily_events"),
        z.alias("z_score"),
        (F.abs(z) > F.lit(2.0)).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# q10 — generated date-spine dimension (reference dim_dates.sql:6-37 via
# dbt_utils.date_spine): one row per day over the orders range with
# calendar attributes.
# ---------------------------------------------------------------------------
_Q10_ORACLE = """
WITH r AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0, MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders
), spine AS (
  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS date_key
  FROM r
)
SELECT date_key,
       CAST(EXTRACT(year FROM date_key) AS BIGINT) AS year,
       CAST(EXTRACT(month FROM date_key) AS BIGINT) AS month,
       CAST(EXTRACT(day FROM date_key) AS BIGINT) AS day_of_month,
       dayname(date_key) AS day_name,
       monthname(date_key) AS month_name,
       (dayofweek(date_key) IN (0, 6)) AS is_weekend
FROM spine
"""


@register("q10_date_spine", _Q10_ORACLE)
def q10_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_dates: generated calendar over the data's date range (F3)."""
    o = load_table(spark, sf_dir, "orders")
    r = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"), F.max(F.to_date("o_orderdate")).alias("d1")
    )
    spine = r.select(F.explode(F.sequence("d0", "d1")).alias("date_key"))
    return spine.select(
        "date_key",
        F.year("date_key").cast("long").alias("year"),
        F.month("date_key").cast("long").alias("month"),
        F.dayofmonth("date_key").cast("long").alias("day_of_month"),
        F.date_format("date_key", "EEEE").alias("day_name"),
        F.date_format("date_key", "MMMM").alias("month_name"),
        F.dayofweek("date_key").isin(1, 7).alias("is_weekend"),
    )


# ---------------------------------------------------------------------------
# q11 — JSON extraction at the ingest boundary (reference §2.7 JSON
# surface: from_json / JSON_VALUE / ->> ; here get_json_object over the
# events.props payload).
# ---------------------------------------------------------------------------
_Q11_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_k
FROM events
GROUP BY 1
"""


@register("q11_json_extract", _Q11_ORACLE)
def q11_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONPath scalar extraction + rollup (§2.7 JSON surface)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        ratio(F.sum(k), F.count("*")).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# q12 — keep-latest dedup by natural key (reference W1 ROW_NUMBER dedup,
# flink/sql/06-silver.sql:42-58: partition by natural key, order by
# ingestion time DESC, keep rn=1; event_id DESC is the deterministic
# tie-break for equal timestamps).
# ---------------------------------------------------------------------------
_Q12_ORACLE = """
WITH r AS (
  SELECT event_id, user_id, event_type, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_id, user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS value
FROM r WHERE rn = 1
"""


@register("q12_dedup_latest", _Q12_ORACLE)
def q12_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-copy-wins dedup over a natural key (W1/ST5 batch form)."""
    from ..functions.parity import ts_str

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            ts_str("ts").alias("ts_str"),
            money("value").cast("double").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# q13 — the Silver contract on lineitem (reference P1 rename/cast, P2
# quality filter, P3 md5 surrogate key — stg_yellow_trips.sql:15-59).
# ---------------------------------------------------------------------------
_Q13_ORACLE = """
SELECT md5(concat_ws('|', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
                     CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR),
                     CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR))) AS line_id,
       l_orderkey AS order_key,
       l_partkey AS part_key,
       l_suppkey AS supp_key,
       CAST(l_linenumber AS INT) AS line_number,
       CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS quantity,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS extended_price,
       CAST(CAST(l_discount AS DECIMAL(12,2)) AS DOUBLE) AS discount,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS net_revenue,
       l_returnflag AS return_flag,
       l_linestatus AS line_status,
       CAST(l_shipdate AS DATE) AS ship_date,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year
FROM lineitem
WHERE l_quantity >= 0 AND l_extendedprice >= 0
  AND CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '2002-01-01'
"""


@register("q13_silver_lineitem", _Q13_ORACLE)
def q13_silver_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver projection: rename/cast/filter + md5 surrogate key (P1-P3)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = money("l_quantity")
    p = money("l_extendedprice")
    d = money("l_discount")
    return li.filter(
        (F.col("l_quantity") >= 0)
        & (F.col("l_extendedprice") >= 0)
        & (F.to_date("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("2002-01-01").cast("date"))
    ).select(
        F.md5(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                q.cast("string"),
                p.cast("string"),
            )
        ).alias("line_id"),
        F.col("l_orderkey").alias("order_key"),
        F.col("l_partkey").alias("part_key"),
        F.col("l_suppkey").alias("supp_key"),
        F.col("l_linenumber").cast("int").alias("line_number"),
        q.cast("double").alias("quantity"),
        p.cast("double").alias("extended_price"),
        d.cast("double").alias("discount"),
        (p * (F.lit(1) - d)).cast("double").alias("net_revenue"),
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_linestatus").alias("line_status"),
        F.to_date("l_shipdate").alias("ship_date"),
        F.year("l_shipdate").cast("long").alias("ship_year"),
    )


# ---------------------------------------------------------------------------
# q14 — referential-integrity anti-joins (reference J5: dbt relationships
# test compiles to exactly this shape; staging.yml:33-48).
# ---------------------------------------------------------------------------
_Q14_ORACLE = """
SELECT 'orders_without_customer' AS check_name,
       COUNT(*) AS n_orphans
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_without_order' AS check_name,
       COUNT(*) AS n_orphans
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
"""


@register("q14_referential_check", _Q14_ORACLE)
def q14_referential_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join orphan counts — the relationships test (J5)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    orphan_orders = o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        F.count("*").alias("n_orphans")
    ).select(F.lit("orders_without_customer").alias("check_name"), "n_orphans")
    orphan_lines = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
        F.count("*").alias("n_orphans")
    ).select(F.lit("lineitem_without_order").alias("check_name"), "n_orphans")
    return orphan_orders.unionByName(orphan_lines)


# ---------------------------------------------------------------------------
# q15 — top-k per group (guide's canonical OLAP pattern; generalizes the
# reference's T1 top-10 to a windowed per-group form).
# ---------------------------------------------------------------------------
_Q15_ORACLE = """
WITH r AS (
  SELECT p_brand, p_partkey, p_name,
         CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS retail_price,
         CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                 ORDER BY CAST(p_retailprice AS DECIMAL(12,2)) DESC,
                                          p_partkey ASC) AS BIGINT) AS price_rank
  FROM part
)
SELECT p_brand, p_partkey, p_name, retail_price, price_rank FROM r WHERE price_rank <= 3
"""


@register("q15_topk_per_brand", _Q15_ORACLE)
def q15_topk_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 priciest parts per brand via ranked window (T1 generalized)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc(money("p_retailprice")), F.asc("p_partkey"))
    return (
        p.withColumn("price_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("price_rank") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            "p_name",
            money("p_retailprice").cast("double").alias("retail_price"),
            "price_rank",
        )
    )


# ---------------------------------------------------------------------------
# q16 — agg-over-agg (reference A3 mart_hourly_demand.sql:9-26: group the
# hourly rows again by hour-of-day → days_observed / avg / total).
# ---------------------------------------------------------------------------
_Q16_ORACLE = """
WITH h AS (
  SELECT CAST(ts AS DATE) AS day, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS event_hour,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_hour,
       COUNT(*) AS days_observed,
       CAST(SUM(n) AS BIGINT) AS total_events,
       CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_events_per_day
FROM h GROUP BY 1
"""


@register("q16_hourly_demand_summary", _Q16_ORACLE)
def q16_hourly_demand_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-level aggregation over the hourly rollup (A3)."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").cast("long").alias("event_hour")
    ).agg(F.count("*").alias("n"))
    return h.groupBy("event_hour").agg(
        F.count("*").alias("days_observed"),
        F.sum("n").alias("total_events"),
        ratio(F.sum("n"), F.count("*")).alias("avg_events_per_day"),
    )


# ---------------------------------------------------------------------------
# q20 — multi-grain rollup via GROUPING SETS: the reference materializes
# each grain as its own dbt model (daily summary, hourly patterns, grand
# totals — SURVEY.md §2.4 "no grouping sets anywhere"); Spark computes
# all three grains in ONE pass over the fact (one shuffle, partial aggs
# shared), which is the idiomatic consolidation at scale.
# ---------------------------------------------------------------------------
_Q20_ORACLE = """
SELECT
    CASE WHEN GROUPING(o_orderpriority) = 0 THEN o_orderpriority ELSE NULL END AS priority,
    CASE WHEN GROUPING(m) = 0 THEN m ELSE NULL END AS order_month,
    CAST(GROUPING(o_orderpriority) * 2 + GROUPING(m) AS BIGINT) AS grain_id,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM (
  SELECT o_orderpriority, strftime(date_trunc('month', o_orderdate), '%Y-%m') AS m,
         o_totalprice
  FROM orders
)
GROUP BY GROUPING SETS ((o_orderpriority), (m), ())
"""


@register("q20_grouping_sets", _Q20_ORACLE)
def q20_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three aggregation grains (priority / month / grand total) in one
    GROUPING SETS pass — one scan + one shuffle instead of three models."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("m"),
        "o_totalprice",
    )
    g = o.groupingSets(
        [["o_orderpriority"], ["m"], []], "o_orderpriority", "m"
    ).agg(
        (F.grouping("o_orderpriority") * 2 + F.grouping("m")).cast("long").alias("grain_id"),
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )
    return g.select(
        F.when(F.col("grain_id").isin(0, 1), F.col("o_orderpriority")).alias("priority"),
        F.when(F.col("grain_id").isin(0, 2), F.col("m")).alias("order_month"),
        "grain_id",
        "n_orders",
        "revenue",
    )


@register(
    "q21_approx_distinct",
    None,
    doc="HLL++ approx distinct + approx quantiles — the 100 TB form of q8 "
    "(sketches shuffle O(1) state per group instead of the value set). "
    "Rows-only check: sketch internals differ across engines by design; "
    "the error bound vs exact q8 is property-tested in tests.",
)
def q21_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based reconciliation: approx_count_distinct (HLL++, rsd 2%)
    and percentile_approx over the same grouping as exact q8."""
    e = load_table(spark, sf_dir, "events")
    # Scalar quantile columns (not one array column): the driver's
    # canonicalizer hashes row values and arrays are unhashable — and
    # scalar columns diff per-quantile instead of all-or-nothing.
    # One aggregate pass either way: Catalyst collapses the three
    # percentile_approx calls into a single ObjectHashAggregate.
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
        F.percentile_approx("value", 0.99, 10000).alias("p99_approx"),
    )


# ---------------------------------------------------------------------------
# q27 — exact per-group quantiles (continuous/interpolated): Spark's
# holistic `percentile` matches DuckDB `quantile_cont` bit-for-bit —
# both interpolate at rank (n-1)·p over the sorted doubles. This is the
# correctness anchor for q21's percentile_approx: exact percentile
# shuffles the full value set per group, so at 100 TB the sketch is the
# plan and this query is what the sketch's error gate is measured
# against (tests/test_fuzzy_ops.py::test_approx_distinct_tracks_exact).
# ---------------------------------------------------------------------------

_Q27_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       quantile_cont(value, 0.99) AS p99
FROM events
GROUP BY 1
"""


@register("q27_group_quantiles", _Q27_ORACLE)
def q27_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p95/p99 of value per event_type."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


# ---------------------------------------------------------------------------
# q28 — trailing 7-day revenue window over the daily series: a RANGE
# frame keyed on the DATE AXIS, not row position. Distinct from q5's
# ROWS frames: gaps in the calendar shrink the window (a day with only
# 3 preceding days within a week averages over what exists), which a
# ROWS BETWEEN 6 PRECEDING frame gets wrong whenever dates are sparse.
# Both engines frame on an integer day index (days since epoch) so the
# RANGE arithmetic is exact; the trailing SUM stays decimal-exact and
# the average is the one final float64 divide.
# ---------------------------------------------------------------------------
_Q28_ORACLE = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_idx,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT order_date,
       CAST(rev AS DOUBLE) AS daily_revenue,
       CAST(SUM(rev) OVER w AS DOUBLE) AS trailing_7d_revenue,
       CAST(COUNT(*) OVER w AS BIGINT) AS days_in_window,
       CAST(SUM(rev) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE)
           AS trailing_7d_avg
FROM d
WINDOW w AS (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register(
    "q28_trailing_window",
    _Q28_ORACLE,
    doc="Trailing 7-day revenue via a RANGE frame on the date axis — "
    "the time-interval window-frame class (calendar gaps shrink the "
    "window; ROWS frames cannot express this). Exact decimal trailing "
    "sum, one float64 divide for the average.",
)
def q28_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing revenue sum/avg per day (RANGE frame, gap-aware)."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.to_date("o_orderdate").alias("order_date"),
        F.unix_date(F.to_date("o_orderdate")).alias("day_idx"),
    ).agg(F.sum(money("o_totalprice")).alias("rev"))
    # global RANGE window over the per-day aggregate (bounded rows; see
    # q5's note — partition by year + stitch at 100×,
    # operators/windows.py)
    w = Window.orderBy("day_idx").rangeBetween(-6, 0)
    return d.select(
        "order_date",
        F.col("rev").cast("double").alias("daily_revenue"),
        F.sum("rev").over(w).cast("double").alias("trailing_7d_revenue"),
        F.count("*").over(w).alias("days_in_window"),
        (F.sum("rev").over(w).cast("double") / F.count("*").over(w).cast("double")).alias(
            "trailing_7d_avg"
        ),
    )


# ---------------------------------------------------------------------------
# q30 — cohort retention matrix over events: cohort = user's first-seen
# day, activity counted by day offset 0..7. The canonical product-
# analytics rollup (generalizes reference A5's per-entity features to a
# cohort x time grid). Two user-keyed shuffles (first-seen + activity),
# both partial-aggregated map-side; the cohort-size join is a
# broadcast (one row per calendar day).
# ---------------------------------------------------------------------------
_Q30_ORACLE = """
WITH fs AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY 1
), size_ AS (
  SELECT cohort_date, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM fs GROUP BY 1
), act AS (
  SELECT f.cohort_date,
         CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
         CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
  FROM events e JOIN fs f USING (user_id)
  WHERE date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) BETWEEN 0 AND 7
  GROUP BY 1, 2
)
SELECT a.cohort_date, a.day_offset, a.n_active, s.cohort_size,
       CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention_rate
FROM act a JOIN size_ s USING (cohort_date)
"""


@register(
    "q30_cohort_retention",
    _Q30_ORACLE,
    doc="Cohort retention matrix: users grouped by first-seen day, "
    "distinct-active counts at day offsets 0..7, rate vs cohort size.",
)
def q30_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-day retention matrix keyed by first-seen cohort date."""
    ev = load_table(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    fs = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    size = fs.groupBy("cohort_date").agg(F.count("*").alias("cohort_size"))
    act = (
        ev.join(fs, "user_id")
        .withColumn("day_offset", F.datediff("d", "cohort_date").cast("long"))
        .filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_date", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return act.join(F.broadcast(size), "cohort_date").select(
        "cohort_date",
        "day_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double")).alias(
            "retention_rate"
        ),
    )


# ---------------------------------------------------------------------------
# q31 — ordered funnel (view -> click -> purchase): the sequence-match
# analytic (MATCH_RECOGNIZE / ClickHouse windowFunnel class). Stage
# timestamps resolve as nested conditional mins — first view, first
# click AFTER that view, first purchase AFTER that click — so each
# stage is one user-keyed conditional aggregation, three total, no
# self-join explosion. Epoch-micros comparisons; no timestamp output.
# ---------------------------------------------------------------------------
_CONVERT_WINDOW_US = 86_400_000_000  # each hop must convert within 24h

_Q31_ORACLE = f"""
WITH v AS (
  SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click'
    AND epoch_us(CAST(e.ts AS TIMESTAMP)) > v.t_view
    AND epoch_us(CAST(e.ts AS TIMESTAMP)) <= v.t_view + {_CONVERT_WINDOW_US}
  GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(CAST(e.ts AS TIMESTAMP)) > c.t_click
    AND epoch_us(CAST(e.ts AS TIMESTAMP)) <= c.t_click + {_CONVERT_WINDOW_US}
  GROUP BY 1
), staged AS (
  SELECT u.user_id,
         CASE WHEN p.user_id IS NOT NULL THEN 3
              WHEN c.user_id IS NOT NULL THEN 2
              WHEN v.user_id IS NOT NULL THEN 1
              ELSE 0 END AS stage
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN v ON v.user_id = u.user_id
  LEFT JOIN c ON c.user_id = u.user_id
  LEFT JOIN p ON p.user_id = u.user_id
)
SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users
FROM staged GROUP BY 1
"""


@register(
    "q31_funnel_stages",
    _Q31_ORACLE,
    doc="Ordered conversion funnel view->click->purchase as nested "
    "conditional mins — three user-keyed aggregations, no self-join "
    "explosion; the MATCH_RECOGNIZE/windowFunnel analytic.",
)
def q31_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Furthest-funnel-stage user counts (0=none .. 3=purchased)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("t").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("t") > F.col("t_view"))
            & (F.col("t") <= F.col("t_view") + F.lit(_CONVERT_WINDOW_US))
        )
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("t") > F.col("t_click"))
            & (F.col("t") <= F.col("t_click") + F.lit(_CONVERT_WINDOW_US))
        )
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    users = ev.select("user_id").distinct()
    staged = (
        users.join(v.select("user_id", F.lit(1).alias("_v")), "user_id", "left")
        .join(c.select("user_id", F.lit(1).alias("_c")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("_p")), "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("_p").isNotNull(), 3)
            .when(F.col("_c").isNotNull(), 2)
            .when(F.col("_v").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("stage"),
        )
    )
    return staged.groupBy("stage").agg(F.count("*").alias("n_users"))


# ---------------------------------------------------------------------------
# q32 — calendar gap fill + linear interpolation over the daily revenue
# series: spine left-join, forward fill (last non-null), and linear
# interpolation between the neighboring observed days. The time-series
# repair primitive (pandas `interpolate(method='time')` class) done as
# two IGNORE NULLS window passes — no self-join, no UDF. The window
# orders the PER-DAY aggregate (one row per calendar day — bounded; at
# 100x calendar length partition by year + stitch, operators/windows.py).
# ---------------------------------------------------------------------------
_Q32_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS date_key,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
), bounds AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0, MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders
), spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS date_key FROM bounds
), j AS (
  SELECT s.date_key, date_diff('day', DATE '1970-01-01', s.date_key) AS di, d.rev
  FROM spine s LEFT JOIN daily d USING (date_key)
), w AS (
  SELECT date_key, di, rev,
    LAST_VALUE(rev IGNORE NULLS) OVER (ORDER BY di ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    FIRST_VALUE(rev IGNORE NULLS) OVER (ORDER BY di ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    LAST_VALUE(CASE WHEN rev IS NOT NULL THEN di END IGNORE NULLS) OVER (ORDER BY di ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
    FIRST_VALUE(CASE WHEN rev IS NOT NULL THEN di END IGNORE NULLS) OVER (ORDER BY di ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
  FROM j
)
SELECT date_key, (rev IS NOT NULL) AS observed,
  COALESCE(rev, prev_v) AS rev_ffill,
  CASE WHEN rev IS NOT NULL THEN rev
       WHEN prev_v IS NULL OR next_v IS NULL THEN COALESCE(prev_v, next_v)
       ELSE prev_v + (next_v - prev_v) * (CAST(di - prev_d AS DOUBLE) / CAST(next_d - prev_d AS DOUBLE)) END AS rev_interp
FROM w
"""


@register(
    "q32_gap_fill_interpolation",
    _Q32_ORACLE,
    doc="Calendar gap fill over the daily revenue series: forward fill "
    "+ linear interpolation via two IGNORE NULLS window passes — no "
    "self-join, no UDF; identical double expression order on both "
    "engines.",
)
def q32_gap_fill_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue with calendar gaps forward-filled and interpolated."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("date_key")).agg(
        sum_money("o_totalprice").cast("double").alias("rev")
    )
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("date_key"))
    j = spine.join(daily, "date_key", "left").select(
        "date_key", F.unix_date("date_key").alias("di"), "rev"
    )
    # one row per calendar day — bounded global window (see header note)
    w_prev = Window.orderBy("di").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("di").rowsBetween(0, Window.unboundedFollowing)
    obs_di = F.when(F.col("rev").isNotNull(), F.col("di"))
    prev_v = F.last("rev", ignorenulls=True).over(w_prev)
    next_v = F.first("rev", ignorenulls=True).over(w_next)
    prev_d = F.last(obs_di, ignorenulls=True).over(w_prev)
    next_d = F.first(obs_di, ignorenulls=True).over(w_next)
    frac = (F.col("di") - prev_d).cast("double") / (next_d - prev_d).cast("double")
    return j.select(
        "date_key",
        F.col("rev").isNotNull().alias("observed"),
        F.coalesce("rev", prev_v).alias("rev_ffill"),
        F.when(F.col("rev").isNotNull(), F.col("rev"))
        .when(prev_v.isNull() | next_v.isNull(), F.coalesce(prev_v, next_v))
        .otherwise(prev_v + (next_v - prev_v) * frac)
        .alias("rev_interp"),
    )


# ---------------------------------------------------------------------------
# q33 — PIVOT: the hour x event_type count matrix via Spark's relational
# pivot with an EXPLICIT value list (never the two-pass distinct-scan
# inference — at 100 TB that first pass is a full shuffle just to learn
# the column names, and an unpinned value set breaks schema stability).
# Compiles to one hash aggregate with pivot projections — same plan
# class as the CASE-sum oracle spelling.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_Q33_ORACLE = """
SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS event_hour,
       {cols}
FROM events GROUP BY 1
""".format(
    cols=",\n       ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
        for t in _EVENT_TYPES
    )
)


@register(
    "q33_event_pivot",
    _Q33_ORACLE,
    doc="Relational PIVOT (hour x event_type count matrix) with a "
    "pinned value list — one aggregate pass, no distinct-scan "
    "inference, stable output schema.",
)
def q33_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-type count matrix via groupBy().pivot()."""
    e = load_table(spark, sf_dir, "events")
    out = (
        e.groupBy(F.hour("ts").cast("long").alias("event_hour"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    # pivot leaves absent cells NULL; the matrix semantics (and the
    # oracle's SUM(CASE)) say zero
    return out.select(
        "event_hour", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# q34 — set operators (T3 completes UNION; this adds INTERSECT/EXCEPT):
# behavioral cohorts at (user, day) grain. Both compile to aggregate-
# or-join plans on the pair key — one shuffle each, AQE-sized.
# ---------------------------------------------------------------------------
_Q34_ORACLE = """
WITH pd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'purchase'),
     cd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'click'),
     ed AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'error')
SELECT 'purchase_and_click_day' AS cohort, user_id, d AS day
FROM (SELECT * FROM pd INTERSECT SELECT * FROM cd)
UNION ALL
SELECT 'purchase_no_error_day' AS cohort, user_id, d AS day
FROM (SELECT * FROM pd EXCEPT SELECT * FROM ed)
"""


@register(
    "q34_behavior_set_ops",
    _Q34_ORACLE,
    doc="INTERSECT / EXCEPT cohorts at (user, day) grain — completes "
    "the §2.6 set-operator family beyond T3's UNION ALL.",
)
def q34_behavior_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase∩click and purchase∖error (user, day) cohorts."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    )

    def days(t: str) -> DataFrame:
        return e.filter(F.col("event_type") == t).select("user_id", "day").distinct()

    both = days("purchase").intersect(days("click"))
    clean = days("purchase").exceptAll(days("error"))
    return both.select(F.lit("purchase_and_click_day").alias("cohort"), "user_id", "day").unionByName(
        clean.select(F.lit("purchase_no_error_day").alias("cohort"), "user_id", "day")
    )


# ---------------------------------------------------------------------------
# q35 — skew-safe salted join under the value gate: brand revenue
# through operators/skew.salted_join (big fact salted, dim replicated
# x8). The salt is internal routing only, so the result is IDENTICAL
# to the plain join — this row makes the driver's hash compare prove
# it, beyond the unit equality test in tests/test_plans.py.
# ---------------------------------------------------------------------------
_Q35_ORACLE = """
SELECT p.p_brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
"""


@register(
    "q35_skew_salted_brand_revenue",
    _Q35_ORACLE,
    doc="Brand revenue through the explicit salted join (skew defense "
    "layer 2, for keys AQE can't split) — value-identical to the plain "
    "join by construction, proven by the oracle hash.",
)
def q35_skew_salted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side salted brand revenue rollup (salts=8)."""
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(li, p, "l_partkey", salts=8)
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_items"),
        sum_money("l_extendedprice").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q36 — VARIANT semi-structured path (Spark 4's parse_json/variant_get
# — the binary-encoded JSON type that replaces per-row string
# re-parsing; q11 keeps the classic get_json_object string path).
# At scale the variant parse happens once per row at ingest and every
# downstream extraction is a typed binary field read.
# ---------------------------------------------------------------------------
_Q36_ORACLE = """
SELECT event_type,
       CAST(COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY 1
"""


@register(
    "q36_variant_extract",
    _Q36_ORACLE,
    doc="Typed extraction through Spark 4's VARIANT type "
    "(parse_json once, variant_get as a typed binary field read) — "
    "the modern semi-structured path next to q11's string path.",
)
def q36_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats of props.k via parse_json/variant_get."""
    e = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return e.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# q37 — table profiling (the deequ/dbt-profiler class): one stats row
# per column — null count, exact distinct count, min/max normalized to
# DOUBLE (dates as epoch days; categorical columns report NULL bounds
# — cross-engine string rendering of numerics is not stable, numeric
# normalization is). Each column is an independent aggregate; Spark
# runs them as parallel jobs over one cached scan shape, and at 100 TB
# the exact distincts are the knob to swap for approx_count_distinct.
# ---------------------------------------------------------------------------
_Q37_ORACLE = """
SELECT 'o_orderkey' AS column_name,
       CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_orderkey) AS DOUBLE) AS min_val,
       CAST(MAX(o_orderkey) AS DOUBLE) AS max_val
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE) FROM orders
UNION ALL
SELECT 'o_orderdate', CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
       CAST(date_diff('day', DATE '1970-01-01', MIN(CAST(o_orderdate AS DATE))) AS DOUBLE),
       CAST(date_diff('day', DATE '1970-01-01', MAX(CAST(o_orderdate AS DATE))) AS DOUBLE) FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT), NULL, NULL FROM orders
"""


@register(
    "q37_table_profile",
    _Q37_ORACLE,
    doc="Column profiling (deequ class): nulls, exact distincts, "
    "numeric-normalized min/max per column — the pre-ingest audit "
    "every pipeline runs; swap exact distincts for HLL at 100 TB.",
)
def q37_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/distinct/min/max profile of the orders table's key columns."""
    o = load_table(spark, sf_dir, "orders")

    def prof(col: str, minmax: F.Column | None) -> DataFrame:
        return o.agg(
            F.lit(col).alias("column_name"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            (F.min(minmax) if minmax is not None else F.lit(None)).cast("double").alias("min_val"),
            (F.max(minmax) if minmax is not None else F.lit(None)).cast("double").alias("max_val"),
        )

    parts = [
        prof("o_orderkey", F.col("o_orderkey")),
        prof("o_totalprice", F.col("o_totalprice")),
        prof("o_orderdate", F.unix_date(F.to_date("o_orderdate"))),
        prof("o_orderpriority", None),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# q38 — UNPIVOT/melt: the inverse of q33's PIVOT. A wide per-month
# metric table (orders count / revenue / max price) melts into long
# (month, metric, value) form — the shape every metric store and
# plotting layer wants. Spark's DataFrame.unpivot is pure projection
# (narrow, zero shuffle beyond the feeding aggregate); the oracle is
# the classic 3-way UNION ALL a pre-UNPIVOT engine would write.
# All three metrics are exact (count / decimal-sum / decimal-max) cast
# to DOUBLE only at the melt, so the long `value` column hashes stably.
# ---------------------------------------------------------------------------
_Q38_ORACLE = """
WITH wide AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS revenue,
         MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS max_price
  FROM orders GROUP BY 1
)
SELECT month, 'n_orders' AS metric, CAST(n_orders AS DOUBLE) AS value FROM wide
UNION ALL
SELECT month, 'revenue', CAST(revenue AS DOUBLE) FROM wide
UNION ALL
SELECT month, 'max_price', CAST(max_price AS DOUBLE) FROM wide
"""


@register(
    "q38_metric_unpivot",
    _Q38_ORACLE,
    doc="UNPIVOT/melt (inverse of q33's PIVOT): wide per-month metrics "
    "to long (month, metric, value) form. Narrow projection over the "
    "feeding aggregate — one shuffle total, no row explosion cost "
    "beyond metrics x months.",
)
def q38_metric_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt a wide monthly metric table into long metric/value rows."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month")
    ).agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(money("o_totalprice")).cast("double").alias("revenue"),
        F.max(money("o_totalprice")).cast("double").alias("max_price"),
    )
    return wide.unpivot(
        ids=["month"],
        values=["n_orders", "revenue", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# q39 — snapshot diff / audit compare (the datacompy / Delta CHANGE
# audit class): two table versions, FULL OUTER JOIN on the key, rows
# classified added / removed / changed / unchanged. The two "versions"
# derive deterministically from orders itself (old drops orderkey%97==0
# and perturbs the price of orderkey%13==0 by +7.77; new drops
# orderkey%89==0) so the oracle can rebuild both sides bit-for-bit.
# One key-partitioned shuffle joins the versions; at 100 TB both sides
# bucket on the key and the join is shuffle-free.
# ---------------------------------------------------------------------------
_Q39_ORACLE = """
WITH old AS (
  SELECT o_orderkey,
         CAST(o_totalprice AS DECIMAL(12,2))
           + CASE WHEN o_orderkey % 13 = 0 THEN CAST(7.77 AS DECIMAL(12,2))
                  ELSE CAST(0 AS DECIMAL(12,2)) END AS price,
         o_orderpriority AS priority
  FROM orders WHERE o_orderkey % 97 <> 0
), new AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
         o_orderpriority AS priority
  FROM orders WHERE o_orderkey % 89 <> 0
)
SELECT CASE WHEN o.price IS NULL THEN 'added'
            WHEN n.price IS NULL THEN 'removed'
            WHEN o.price <> n.price OR o.priority <> n.priority THEN 'changed'
            ELSE 'unchanged' END AS status,
       COUNT(*) AS n_rows
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
GROUP BY 1
"""


@register(
    "q39_snapshot_diff",
    _Q39_ORACLE,
    doc="Snapshot diff (datacompy class): FULL OUTER JOIN two table "
    "versions on the key, classify added/removed/changed/unchanged. "
    "One key shuffle; bucket both versions on the key at 100 TB and "
    "the join co-locates.",
)
def q39_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-compare two derived snapshots of orders by primary key."""
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        (
            money("o_totalprice")
            + F.when(F.col("o_orderkey") % 13 == 0, F.lit("7.77").cast("decimal(12,2)"))
            .otherwise(F.lit("0").cast("decimal(12,2)"))
        ).alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    new = o.filter(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        money("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    j = old.alias("o").join(new.alias("n"), "o_orderkey", "full_outer")
    status = (
        F.when(F.col("o.price").isNull(), "added")
        .when(F.col("n.price").isNull(), "removed")
        .when(
            (F.col("o.price") != F.col("n.price"))
            | (F.col("o.priority") != F.col("n.priority")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return j.groupBy(status.alias("status")).agg(F.count("*").alias("n_rows"))


# ---------------------------------------------------------------------------
# q40 — time-weighted average (the timescaledb `time_weight` class):
# events arrive at irregular instants, so a plain AVG over-weights
# bursts. Each observation holds until the next one (LOCF weighting);
# TWA = sum(value * dt) / sum(dt) with dt = SECONDS to the next event
# of the same type. Second-grain dt is deliberate parity hygiene, not
# a shortcut: with µs weights the exact decimal numerator tops 2^53
# and the decimal→double cast itself rounds differently across engines
# (Spark's BigDecimal rounds once, DuckDB scales int128 then divides —
# double rounding). At second grain the numerator stays exactly
# double-representable at any plausible scale (span_s × avg_cents ≈
# 4e10 per type, scale-invariant), so the one final double division is
# bit-identical. Ordering still breaks ties at full µs precision.
# The lead() window partitions by event_type (5 groups here); at
# 100 TB partition by (type, day) and stitch the day boundaries — the
# q29 pattern.
# ---------------------------------------------------------------------------
_Q40_ORACLE = """
WITH seq AS (
  SELECT event_type, event_id, CAST(value AS DECIMAL(12,2)) AS v,
         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
), led AS (
  SELECT event_type, v, s,
         lead(s) OVER (PARTITION BY event_type ORDER BY us, event_id) AS next_s
  FROM seq
)
SELECT event_type,
       COUNT(*) AS n_intervals,
       SUM(next_s - s) AS total_dt_s,
       CAST(SUM(v * (next_s - s)) AS DOUBLE)
         / CAST(SUM(next_s - s) AS DOUBLE) AS time_weighted_avg
FROM led
WHERE next_s IS NOT NULL AND next_s > s
GROUP BY 1
"""


@register(
    "q40_time_weighted_avg",
    _Q40_ORACLE,
    doc="Time-weighted average per event_type (timescaledb time_weight "
    "class): LOCF interval weighting over irregular timestamps, exact "
    "decimal weighted sums at second grain (keeps the numerator inside "
    "double's 2^53 exact range — see the parity note above the oracle), "
    "one final double division. lead() window keyed on type; stitch by "
    "(type, day) at 100 TB (q29 pattern).",
)
def q40_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted mean of value per event_type (second grain)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    seq = ev.select(
        "event_type",
        "event_id",
        F.col("value").cast("decimal(12,2)").alias("v"),
        F.unix_micros("ts").alias("us"),
        F.expr("unix_micros(ts) div 1000000").alias("s"),
    ).withColumn("next_s", F.lead("s").over(w))
    return (
        seq.filter(F.col("next_s") > F.col("s"))
        .withColumn("dt", F.col("next_s") - F.col("s"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dt").alias("total_dt_s"),
            ratio(F.sum(F.col("v") * F.col("dt")), F.sum("dt")).alias("time_weighted_avg"),
        )
    )


# ---------------------------------------------------------------------------
# q43 — distribution bucketing via NTILE: customers ranked into spend
# deciles (the "top 10% of customers drive X% of revenue" query).
# ntile(10) over a fully deterministic order (spend DESC, custkey ASC —
# exact decimal spend, unique tie-break) assigns ceil/floor bucket
# sizes identically on both engines. The global window is over one row
# per CUSTOMER (already aggregated), and at 100 TB the decile cut
# points come from approx quantiles (q21's sketch) instead of a global
# sort — documented trade, exact form kept as the oracle-checked path.
# ---------------------------------------------------------------------------
_Q43_ORACLE = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
  FROM orders GROUP BY 1
), ranked AS (
  SELECT o_custkey, spend,
         ntile(10) OVER (ORDER BY spend DESC, o_custkey ASC) AS decile
  FROM spend
)
SELECT CAST(decile AS BIGINT) AS decile,
       COUNT(*) AS n_customers,
       CAST(MIN(spend) AS DOUBLE) AS min_spend,
       CAST(MAX(spend) AS DOUBLE) AS max_spend,
       CAST(SUM(spend) AS DOUBLE) AS total_spend
FROM ranked GROUP BY 1
"""


@register(
    "q43_spend_deciles",
    _Q43_ORACLE,
    doc="NTILE distribution bucketing: customer spend deciles with "
    "per-decile bounds and totals. Deterministic global order (spend "
    "DESC, custkey ASC); swap the global sort for sketch quantile cut "
    "points at 100 TB.",
)
def q43_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile table over per-customer total spend."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum(money("o_totalprice")).alias("spend"))
    w = Window.orderBy(F.col("spend").desc(), F.col("o_custkey").asc())
    ranked = spend.withColumn("decile", F.ntile(10).over(w))
    return ranked.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count("*").alias("n_customers"),
        F.min("spend").cast("double").alias("min_spend"),
        F.max("spend").cast("double").alias("max_spend"),
        F.sum("spend").cast("double").alias("total_spend"),
    )


def spend_decile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer decile by the EXACT plan (q43's NTILE) — the
    equivalence test's baseline side. (o_custkey, spend, decile)."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum(money("o_totalprice")).alias("spend"))
    w = Window.orderBy(F.col("spend").desc(), F.col("o_custkey").asc())
    return spend.withColumn("decile", F.ntile(10).over(w).cast("long"))


def spend_decile_assignment_sketch(
    spark: SparkSession, sf_dir: str, accuracy: int = 10_000
) -> DataFrame:
    """q43's SCALE plan: equi-depth decile assignment from
    `percentile_approx` cut points instead of one global NTILE sort.

    The exact form sorts every per-customer aggregate in a single
    window partition — bounded by customer count, but still ONE
    task's sort at 100×. This twin replaces it with (1) the same
    spend aggregate, (2) a Greenwald-Khanna sketch of the 9 interior
    decile boundaries — a partial-aggregable O(accuracy)-state fold,
    no global sort — and (3) a narrow per-row bucket lookup against
    the 9 broadcast-as-literal cut points. Cost at any scale: the
    groupBy shuffle q43 already pays + one sketch pass; no WindowExec.

    Semantics trade (why the exact form stays the oracle config):
    value-based cut points cannot split ties the way NTILE's unique
    (spend DESC, custkey ASC) order does, and the sketch's rank error
    is ≤ n/accuracy — so customers within sketch error of a boundary
    may land one decile off. The equivalence test
    (tests/test_analytics_twins.py) bounds the drift: every customer
    within ±1 decile, mismatches a small fraction, totals conserved.
    """
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum(money("o_totalprice")).alias("spend"))
    # 9 interior boundaries (p10..p90) from ONE sketch aggregate; the
    # scalar fetch is O(1) driver-side (the d24-cutoff pattern — a
    # broadcast-join of a literal would constant-fold into a BNLJ).
    cuts = spend.agg(
        F.percentile_approx(
            F.col("spend").cast("double"),
            F.array(*[F.lit(i / 10.0) for i in range(1, 10)]),
            F.lit(accuracy),
        ).alias("c")
    ).first()["c"]
    # NTILE orders spend DESC → decile 1 is the top tenth: a customer
    # whose spend exceeds j ascending cut points sits in decile 10 - j.
    cut_arr = F.array(*[F.lit(float(c)) for c in sorted(cuts)])
    above = F.aggregate(
        cut_arr,
        F.lit(0),
        lambda acc, c: acc
        + F.when(F.col("spend").cast("double") > c, F.lit(1)).otherwise(F.lit(0)),
    )
    return spend.withColumn("decile", (F.lit(10) - above).cast("long"))


@register(
    "q48_spend_deciles_sketch",
    None,  # approximate by construction: sketch cut points cannot split
    # ties like NTILE's unique order, so a value hash against the exact
    # oracle would flap on boundary rows. Evidence instead: the sf0.1
    # equivalence test (tests/test_windows.py — ±1 adjacent-decile
    # drift <2% of customers, conservation, no-WindowExec plan gate);
    # q43 keeps the exact NTILE form as the oracle-checked config.
    doc="q43's 100x plan: equi-depth spend deciles from percentile_approx "
    "cut points + a narrow bucket lookup — no global-sort WindowExec.",
)
def q43_spend_deciles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q43's output shape computed from the sketch assignment — the
    100× plan, drop-in for the exact NTILE form."""
    ranked = spend_decile_assignment_sketch(spark, sf_dir)
    return ranked.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.min("spend").cast("double").alias("min_spend"),
        F.max("spend").cast("double").alias("max_spend"),
        F.sum("spend").cast("double").alias("total_spend"),
    )


# ---------------------------------------------------------------------------
# q44 — clickstream transition matrix (first-order Markov): per user,
# events ordered by (ts, event_id); count each (event_type -> next)
# adjacent pair, then P(to | from) as the within-from share. One
# user-keyed window pass (narrow after the shuffle on user_id), one
# 25-row aggregate; the share uses the empty-frame window-sum pattern
# (q4) with one double division.
# ---------------------------------------------------------------------------
_Q44_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
           AS to_type
  FROM events
), pairs AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE) AS p_transition
FROM pairs
"""


@register(
    "q44_event_transitions",
    _Q44_ORACLE,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: adjacent-pair counts + conditional transition "
    "probabilities. One user-keyed window shuffle, bounded 25-row "
    "output aggregate.",
)
def q44_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(next event type | current) from per-user ordered sequences."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.col("event_type").alias("from_type"),
    ).withColumn("to_type", F.lead("from_type").over(w))
    pairs = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    share_w = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        ratio(F.col("n_transitions"), F.sum("n_transitions").over(share_w)).alias("p_transition"),
    )


# ---------------------------------------------------------------------------
# q41 — trailing distinct count (the COUNT(DISTINCT) OVER window class,
# which Spark's WindowExec does not support): 7-day trailing distinct
# active users per day. Instead of a window at all, each (day, user)
# observation is EXPLODED to the up-to-7 target days it stays visible
# for, then a plain countDistinct aggregate per target day — the
# contribution-explode formulation. That trades a bounded 7× row fan-
# out (window size, a constant) for a fully partial-aggregable shuffle
# keyed on day: no global window, no per-day set materialization, and
# it scales exactly like any groupBy at 100 TB. Target days are
# restricted to days that actually occur (a gap day has no "as of"
# row on either engine).
# ---------------------------------------------------------------------------
_Q41_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id FROM events
), days AS (
  SELECT DISTINCT day FROM du
), contrib AS (
  SELECT CAST(u.d AS DATE) AS target_day, du.user_id
  FROM du, unnest(generate_series(du.day, du.day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS u(d)
), trail AS (
  SELECT c.target_day AS day, COUNT(DISTINCT c.user_id) AS n_active_7d
  FROM contrib c JOIN days d ON d.day = c.target_day
  GROUP BY 1
), daily AS (
  SELECT day, COUNT(DISTINCT user_id) AS n_active_1d FROM du GROUP BY 1
)
SELECT t.day, d.n_active_1d, t.n_active_7d
FROM trail t JOIN daily d ON d.day = t.day
"""


@register(
    "q41_rolling_active_users",
    _Q41_ORACLE,
    doc="Trailing 7-day distinct active users per day — the "
    "COUNT(DISTINCT) OVER window class via contribution explode: "
    "bounded 7x fan-out into a plain partial-aggregable countDistinct "
    "keyed on day. No global window, no per-day set state.",
)
def q41_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct users via the contribution-explode plan."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("target_day"),
        "user_id",
    )
    trailing = (
        contrib.join(days.withColumnRenamed("day", "target_day"), "target_day")
        .groupBy(F.col("target_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("n_active_7d"))
    )
    daily = du.groupBy("day").agg(F.countDistinct("user_id").alias("n_active_1d"))
    return trailing.join(daily, "day").select("day", "n_active_1d", "n_active_7d")


# ---------------------------------------------------------------------------
# q42 — LEFT SEMI join: the EXISTS-subquery physical shape (J-family
# completion next to q14's anti-join). "Customers who made at least
# one purchase-typed event" — the semi join carries NO right-side
# columns and stops probing a key after the first match, so the
# build side is deduplicated purchase user ids (far smaller than the
# event stream). At 100 TB the distinct purchase-user relation is
# small enough to broadcast; the aggregate below it is the standard
# revenue rollup, so the whole plan is scan → broadcast-semi → agg.
# ---------------------------------------------------------------------------
_Q42_ORACLE = """
SELECT c.c_custkey, n.n_name,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE EXISTS (
  SELECT 1 FROM events e
  WHERE e.user_id = c.c_custkey AND e.event_type = 'purchase'
)
GROUP BY 1, 2
"""


@register(
    "q42_purchaser_semi_join",
    _Q42_ORACLE,
    doc="LEFT SEMI join (EXISTS shape): order revenue for customers "
    "with at least one purchase event. Build side = distinct purchase "
    "user ids (broadcastable at any scale); no right-side columns "
    "survive, completing the join family next to q14's anti-join.",
)
def q42_purchaser_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup restricted to purchase-active customers (semi join)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    purchasers = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("c_custkey")
    )
    active = c.join(F.broadcast(purchasers), "c_custkey", "left_semi")
    return (
        active.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(o, F.col("c_custkey") == o["o_custkey"])
        .groupBy("c_custkey", "n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q45 — equi-width histogram (the width_bucket / profiling class, the
# fixed-grid complement of q43's equi-depth deciles): order prices
# into 20 equal bins between the observed min/max. All bucketing is
# INTEGER arithmetic on cents — bin = ((v-min)*20) div (max-min),
# clamped to 19 — so bin ids and bin bounds hash exactly; the only
# doubles are the final /100.0 renders of exact cent values. The
# min/max pair is a SCALAR driver-side fetch (d24 precedent — a
# constant-key join would constant-fold into the banned nested-loop
# shape); the histogram itself is one partial-aggregable groupBy.
# ---------------------------------------------------------------------------
_Q45_ORACLE = """
WITH bounds AS (
  SELECT MIN(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS min_c,
         MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS max_c
  FROM orders
), binned AS (
  SELECT least(((CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                 - b.min_c) * 20) // greatest(b.max_c - b.min_c, 1), 19) AS bin,
         b.min_c, b.max_c
  FROM orders, bounds b
)
SELECT CAST(bin AS BIGINT) AS bin,
       COUNT(*) AS n_orders,
       CAST(min_c + (bin * greatest(max_c - min_c, 1)) // 20 AS DOUBLE) / 100.0 AS bin_lo,
       CAST(min_c + ((bin + 1) * greatest(max_c - min_c, 1)) // 20 AS DOUBLE) / 100.0 AS bin_hi
FROM binned
GROUP BY bin, min_c, max_c
"""


@register(
    "q45_price_histogram",
    _Q45_ORACLE,
    doc="Equi-width 20-bin price histogram (width_bucket class): "
    "integer cent arithmetic end to end, scalar min/max driver fetch, "
    "one partial-aggregable groupBy — the fixed-grid complement of "
    "q43's equi-depth deciles.",
)
def q45_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of order prices."""
    o = load_table(spark, sf_dir, "orders")
    cents = (money("o_totalprice") * 100).cast("long")
    row = o.agg(F.min(cents).alias("lo"), F.max(cents).alias("hi")).first()
    min_c, max_c = int(row.lo), int(row.hi)
    # degenerate single-price corpus: floor the span at 1 so the
    # integer bucketing never divides by zero (bin 0 holds everything)
    span = max(max_c - min_c, 1)
    binned = o.select(
        F.least(
            F.expr(f"((CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) - {min_c}) * 20) div {span}"),
            F.lit(19).cast("long"),
        ).alias("bin")
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_orders"),
        (F.lit(min_c) + F.expr(f"(bin * {span}) div 20")).cast("double").alias("_lo_c"),
        (F.lit(min_c) + F.expr(f"((bin + 1) * {span}) div 20")).cast("double").alias("_hi_c"),
    ).select(
        "bin",
        "n_orders",
        (F.col("_lo_c") / F.lit(100.0)).alias("bin_lo"),
        (F.col("_hi_c") / F.lit(100.0)).alias("bin_hi"),
    )


# ---------------------------------------------------------------------------
# q46 — two-sample Kolmogorov–Smirnov drift test (the deequ/evidently
# distribution-drift class): D = max |F_a(x) - F_b(x)| between the
# value distributions of purchase vs view events. Entirely exact
# integer arithmetic: per-cent-value counts, windowed cumulative
# counts, and the cross-multiplied numerator |cum_a·n_b - cum_b·n_a|
# (the common-denominator form — no per-row division ever happens);
# the reported D and its 5% critical value are single IEEE ops on
# exact operands. The CDF window is ordered over DISTINCT CENT VALUES
# — bounded by the value domain (<=|price grid|), not the row count,
# so the "global" window is a fixed-size relation at any corpus scale.
# ---------------------------------------------------------------------------
_Q46_ORACLE = """
WITH s AS (
  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('purchase', 'view')
), byval AS (
  SELECT v, SUM(is_a) AS a_at, SUM(1 - is_a) AS b_at FROM s GROUP BY 1
), cum AS (
  SELECT v,
         SUM(a_at) OVER (ORDER BY v) AS cum_a,
         SUM(b_at) OVER (ORDER BY v) AS cum_b,
         SUM(a_at) OVER () AS n_a,
         SUM(b_at) OVER () AS n_b
  FROM byval
)
SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num,
       CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
         / NULLIF(CAST(MAX(n_a) * MAX(n_b) AS DOUBLE), 0.0) AS ks_d,
       1.36 * sqrt(CAST(MAX(n_a) + MAX(n_b) AS DOUBLE)
                   / NULLIF(CAST(MAX(n_a) * MAX(n_b) AS DOUBLE), 0.0)) AS ks_crit,
       CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
         / NULLIF(CAST(MAX(n_a) * MAX(n_b) AS DOUBLE), 0.0)
         > 1.36 * sqrt(CAST(MAX(n_a) + MAX(n_b) AS DOUBLE)
                       / NULLIF(CAST(MAX(n_a) * MAX(n_b) AS DOUBLE), 0.0)) AS drift
FROM cum
"""


@register(
    "q46_ks_drift",
    _Q46_ORACLE,
    doc="Two-sample Kolmogorov-Smirnov drift test between purchase and "
    "view value distributions: exact integer CDFs in common-"
    "denominator form (no per-row division), CDF window bounded by the "
    "cent-value domain, 5% critical value + drift verdict.",
)
def q46_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS statistic + drift verdict between two event-type distributions."""
    from ..operators.quality import exact_ks_counts

    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("v")

    def counts(event_type: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .select(cents)
            .groupBy("v")
            .agg(F.count("*").alias("cnt"))
        )

    return exact_ks_counts(counts("purchase"), counts("view"))


# ---------------------------------------------------------------------------
# q47 — chi-square independence test (event_type × day-of-week
# contingency): the second classic distribution audit next to q46's
# KS — "is traffic mix independent of weekday". Parity engineering:
# every per-cell term (O·N − r·c)² / (N·r·c) is a deterministic IEEE
# double built from EXACT INTEGERS (counts and their products stay
# under 2^53 up to ~3e7 events; the 100 TB mitigation — decimal
# numerators — is documented here), and the cross-cell sum runs as a
# SORTED-ARRAY FOLD (sort_array(collect_list) + aggregate lambda /
# DuckDB list(ORDER BY) + list_reduce), so float addition happens in
# ONE defined order on both engines — never a partition-order-
# dependent SUM. Day-of-week is ((epoch_days + 4) mod 7) — pure
# integer arithmetic, immune to the engines' differing dayofweek()
# conventions. dof = (types-1)(dows-1); the 5% critical value 36.415
# applies to the full 5×7 grid (flag is NULL-safe on dof).
# ---------------------------------------------------------------------------
_Q47_ORACLE = """
WITH obs AS (
  SELECT event_type AS et,
         (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS dow,
         COUNT(*) AS o
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT SUM(o) AS n FROM obs
), rows_ AS (
  SELECT et, SUM(o) AS r FROM obs GROUP BY 1
), cols_ AS (
  SELECT dow, SUM(o) AS c FROM obs GROUP BY 1
), cells AS (
  SELECT obs.et, obs.dow,
         CAST(obs.o * t.n - r.r * c.c AS DOUBLE) * CAST(obs.o * t.n - r.r * c.c AS DOUBLE)
           / (CAST(t.n AS DOUBLE) * CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)) AS term
  FROM obs
  JOIN rows_ r ON r.et = obs.et
  JOIN cols_ c ON c.dow = obs.dow
  CROSS JOIN tot t
)
SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_events,
       CAST(((SELECT COUNT(*) FROM rows_) - 1)
            * ((SELECT COUNT(*) FROM cols_) - 1) AS BIGINT) AS dof,
       list_reduce(list(term ORDER BY et, dow), (a, b) -> a + b) AS chi2,
       CASE WHEN ((SELECT COUNT(*) FROM rows_) - 1)
                 * ((SELECT COUNT(*) FROM cols_) - 1) = 24
            THEN list_reduce(list(term ORDER BY et, dow), (a, b) -> a + b) > 36.415
            ELSE NULL END AS dependent
FROM cells
"""


@register(
    "q47_chi_square_independence",
    _Q47_ORACLE,
    doc="Chi-square independence test over the event_type x weekday "
    "contingency grid: per-cell terms from exact integer counts, "
    "cross-cell sum as a SORTED-ARRAY FOLD so float addition has one "
    "defined order on both engines; integer (epoch_days+4) mod 7 "
    "sidesteps dayofweek() convention drift.",
)
def q47_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-mix independence verdict (chi2, dof, 5% flag for 5x7)."""
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.select(
            F.col("event_type").alias("et"),
            ((F.expr("unix_micros(ts) div 86400000000") + 4) % 7).alias("dow"),
        )
        .groupBy("et", "dow")
        .agg(F.count("*").alias("o"))
    )
    w_all = Window.partitionBy()
    w_et = Window.partitionBy("et")
    w_dow = Window.partitionBy("dow")
    cells = obs.select(
        "et",
        "dow",
        F.col("o"),
        F.sum("o").over(w_all).alias("n"),
        F.sum("o").over(w_et).alias("r"),
        F.sum("o").over(w_dow).alias("c"),
    )
    num = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    term = (num * num) / (
        F.col("n").cast("double") * F.col("r").cast("double") * F.col("c").cast("double")
    )
    per_cell = cells.select(
        "et",
        "dow",
        "n",
        term.alias("term"),
        F.count("*").over(w_et).alias("_r_cells"),
    )
    agg = per_cell.agg(
        F.max("n").alias("n_events"),
        ((F.countDistinct("et") - 1) * (F.countDistinct("dow") - 1))
        .cast("long")
        .alias("dof"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("et", "dow", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2"),
    )
    return agg.select(
        "n_events",
        "dof",
        "chi2",
        F.when(F.col("dof") == 24, F.col("chi2") > F.lit(36.415)).alias("dependent"),
    )


# ---------------------------------------------------------------------------
# q49 — GDPR-style erasure through MERGE-ON-READ deletion vectors, as a
# value-oracled registered query (the manifest DV path was previously
# test-only). The documents table lands as a ManifestTable, then two
# stacked MOR deletes hit it — a lang erasure (touches every file) and
# an id-range retention purge (stats-scoped to the few doc_id-clustered
# files that admit it; overlapping rows exercise the DV union). No data
# file is rewritten: each delete stages one (file_path, row_index)
# sidecar and readers anti-join it away. The query returns the
# per-source accounting BOTH ways — the live post-delete counts AND the
# time-traveled pre-delete counts from the original snapshot — so the
# oracle value-checks the whole chain: write, stats blast-radius,
# stacked-DV read, time travel.
# ---------------------------------------------------------------------------
_Q49_ORACLE = """
WITH v0 AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_v0 FROM documents GROUP BY 1
),
live AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_live,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars_live
  FROM documents
  WHERE NOT (lang = 'zh') AND NOT (doc_id < 100)
  GROUP BY 1
)
SELECT v0.source, v0.n_docs_v0,
       COALESCE(l.n_docs_live, 0) AS n_docs_live,
       COALESCE(l.n_chars_live, 0) AS n_chars_live
FROM v0 LEFT JOIN live l ON l.source = v0.source
"""


@register(
    "q49_gdpr_delete_mor",
    _Q49_ORACLE,
    doc="Merge-on-read erasure chain value-checked end to end: manifest "
    "write, two stacked deletion-vector deletes (full-table lang "
    "erasure + stats-scoped id purge, overlapping rows), DV-applying "
    "live read, and a time-traveled read of the pre-delete snapshot.",
)
def q49_gdpr_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc accounting before and after two MOR deletes."""
    import os

    from ..operators.manifest import ManifestTable
    from . import work_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = os.path.join(work_dir("q49_dvdocs", sf_dir), "docs")
    t = ManifestTable(path)
    s0 = t.write(docs, mode="overwrite", cluster_by=["doc_id"], n_files=8)
    t.delete_where(spark, [("lang", "==", "zh")], merge_on_read=True)
    t.delete_where(spark, [("doc_id", "<", 100)], merge_on_read=True)
    # keep exactly this call's 3 snapshots (time travel to s0 must
    # survive), drop prior calls' versions + files — scratch stays
    # bounded at one table (the d42 convention)
    t.expire(keep_last=3)
    t.vacuum(older_than_s=0.0)
    live = t.read(spark).groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs_live"),
        F.sum("n_chars").cast("long").alias("n_chars_live"),
    )
    orig = t.read(spark, version=s0.version).groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs_v0")
    )
    return orig.join(live, "source", "left").select(
        "source",
        "n_docs_v0",
        F.coalesce("n_docs_live", F.lit(0).cast("long")).alias("n_docs_live"),
        F.coalesce("n_chars_live", F.lit(0).cast("long")).alias("n_chars_live"),
    )
