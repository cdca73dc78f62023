"""Gold layer: the reference's 16-model dbt DAG as DataFrame functions.

DAG shape (reference README.md:520-578 and SURVEY.md §3.2):

    silver → int_trip_metrics → fct_trips → marts
    seeds  → stg_* → dims;  dim_dates generated

Each model is a pure ``DataFrame → DataFrame`` function; plans.dag runs
them in topological order. Column semantics carry file:line citations
to the reference dbt models they re-express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Staging dims (stg_taxi_zones / stg_payment_types / stg_rate_codes —
# trivial snake_case projections of the seeds).
# ---------------------------------------------------------------------------


def stg_taxi_zones(zones_seed: DataFrame) -> DataFrame:
    return zones_seed.select(
        F.col("LocationID").alias("location_id"),
        F.col("Borough").alias("borough"),
        F.col("Zone").alias("zone"),
        F.col("service_zone"),
    )


def dim_locations(stg_zones: DataFrame) -> DataFrame:
    return stg_zones


def dim_payment_types(payment_seed: DataFrame) -> DataFrame:
    return payment_seed


def dim_rate_codes(rate_seed: DataFrame) -> DataFrame:
    return rate_seed


def dim_vendors(vendor_seed: DataFrame) -> DataFrame:
    return vendor_seed


def dim_dates(spark: SparkSession, start: str = "2024-01-01", end: str = "2024-01-31") -> DataFrame:
    """Generated date spine (dim_dates.sql:6-37; holidays Jan 1 / Jan 15)."""
    spine = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), interval 1 day)) AS date_key"
    )
    return spine.select(
        "date_key",
        F.year("date_key").alias("year"),
        F.month("date_key").alias("month"),
        F.dayofmonth("date_key").alias("day_of_month"),
        F.dayofweek("date_key").alias("day_of_week_num"),
        F.date_format("date_key", "EEEE").alias("day_of_week_name"),
        F.date_format("date_key", "MMMM").alias("month_name"),
        F.weekofyear("date_key").alias("week_of_year"),
        F.dayofweek("date_key").isin(1, 7).alias("is_weekend"),
        F.col("date_key").isin(F.lit("2024-01-01").cast("date"), F.lit("2024-01-15").cast("date")).alias("is_holiday"),
    )


# ---------------------------------------------------------------------------
# int_trip_metrics (int_trip_metrics.sql:25-77): P4 duration, P5 speed,
# P6 cost/mile, P7 tip %, P8 time dims, P9 plausibility filter.
# ---------------------------------------------------------------------------


def int_trip_metrics(silver: DataFrame) -> DataFrame:
    dur = (
        (F.unix_timestamp("dropoff_datetime") - F.unix_timestamp("pickup_datetime")) / 60
    ).cast("long")
    miles = F.col("trip_distance_miles")
    fare = F.col("fare_amount").cast("double")
    tip = F.col("tip_amount").cast("double")
    speed = F.when(dur > 0, F.round(miles / (dur / F.lit(60.0)), 2)).otherwise(F.lit(None))
    cost_per_mile = F.when(miles > 0, F.round(fare / miles, 2)).otherwise(F.lit(None))
    tip_pct = F.when(fare > 0, F.round(tip / fare * 100, 2)).otherwise(F.lit(None))
    enriched = silver.select(
        "*",
        dur.alias("trip_duration_minutes"),
        speed.alias("avg_speed_mph"),
        cost_per_mile.alias("cost_per_mile"),
        tip_pct.alias("tip_percentage"),
        F.hour("pickup_datetime").alias("pickup_hour"),
        F.date_format("pickup_datetime", "EEEE").alias("pickup_day_of_week"),
        F.dayofweek("pickup_datetime").isin(1, 7).alias("is_weekend"),
    )
    # P9 plausibility: 1..720 minutes; speed NULL or < 100 mph
    return enriched.filter(
        F.col("trip_duration_minutes").between(1, 720)
        & (F.col("avg_speed_mph").isNull() | (F.col("avg_speed_mph") < 100))
    )


# ---------------------------------------------------------------------------
# fct_trips (fct_trips.sql:57-71): 2× broadcast left join to the 265-row
# location dim; unknown ids keep NULL zone (unit-tested per reference).
# ---------------------------------------------------------------------------


def fct_trips(metrics: DataFrame, locations: DataFrame) -> DataFrame:
    pu = F.broadcast(
        locations.select(
            F.col("location_id").alias("_pu_id"),
            F.col("zone").alias("pickup_zone"),
            F.col("borough").alias("pickup_borough"),
        )
    )
    do = F.broadcast(
        locations.select(
            F.col("location_id").alias("_do_id"),
            F.col("zone").alias("dropoff_zone"),
            F.col("borough").alias("dropoff_borough"),
        )
    )
    return (
        metrics.join(pu, metrics.pickup_location_id == pu._pu_id, "left")
        .join(do, metrics.dropoff_location_id == do._do_id, "left")
        .drop("_pu_id", "_do_id")
    )


# ---------------------------------------------------------------------------
# int_daily_summary (int_daily_summary.sql:10-34)
# ---------------------------------------------------------------------------


def int_daily_summary(metrics: DataFrame) -> DataFrame:
    return metrics.groupBy("pickup_date", "pickup_day_of_week", "is_weekend").agg(
        F.count("*").alias("total_trips"),
        F.sum("passenger_count").alias("total_passengers"),
        F.round(F.avg("trip_distance_miles"), 2).alias("avg_trip_distance"),
        F.round(F.avg("trip_duration_minutes"), 2).alias("avg_trip_duration"),
        F.round(F.avg(F.col("fare_amount").cast("double")), 2).alias("avg_fare_amount"),
        F.round(F.avg(F.col("tip_amount").cast("double")), 2).alias("avg_tip_amount"),
        F.sum("fare_amount").cast("decimal(38,2)").alias("total_fare_amount"),
        F.sum("tip_amount").cast("decimal(38,2)").alias("total_tip_amount"),
        F.sum("total_amount").cast("decimal(38,2)").alias("total_revenue"),
        F.count(F.when(F.col("payment_type_id") == 1, 1)).alias("credit_card_trips"),
        F.count(F.when(F.col("payment_type_id") == 2, 1)).alias("cash_trips"),
    )


def int_hourly_patterns(metrics: DataFrame) -> DataFrame:
    """int_hourly_patterns.sql:10-25."""
    return metrics.groupBy("pickup_date", "pickup_hour", "pickup_day_of_week", "is_weekend").agg(
        F.count("*").alias("total_trips"),
        F.round(F.avg("trip_distance_miles"), 2).alias("avg_trip_distance"),
        F.round(F.avg(F.col("fare_amount").cast("double")), 2).alias("avg_fare_amount"),
        F.sum("total_amount").cast("decimal(38,2)").alias("total_revenue"),
    )


# ---------------------------------------------------------------------------
# marts (mart_daily_revenue.sql:34-42, mart_hourly_demand.sql:9-26,
# mart_location_performance.sql:10-36)
# ---------------------------------------------------------------------------


def mart_daily_revenue(daily: DataFrame, dates: DataFrame) -> DataFrame:
    # Intentionally-global window (WindowExec "No Partition Defined" is
    # expected): input is the ALREADY-AGGREGATED daily frame — one row
    # per calendar day, bounded at thousands of rows regardless of fact
    # volume, same single-stream running total as the reference SQL.
    # At a 100×-longer calendar, partition by year and stitch
    # (implemented: operators/windows.stitched_running_sum/_lag,
    # equivalence-tested against this exact formulation).
    w = Window.orderBy("date_key")
    joined = daily.join(F.broadcast(dates), daily.pickup_date == dates.date_key, "inner")
    return joined.select(
        "date_key",
        "day_of_week_name",
        "is_holiday",
        "total_trips",
        "total_passengers",
        "total_revenue",
        "avg_fare_amount",
        F.sum("total_revenue").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("running_total_revenue"),
        (F.col("total_revenue") - F.lag("total_revenue").over(w)).alias("revenue_change"),
    )


def mart_hourly_demand(hourly: DataFrame) -> DataFrame:
    return (
        hourly.groupBy("pickup_hour", "is_weekend")
        .agg(
            F.count("*").alias("days_observed"),
            F.round(F.avg("total_trips"), 2).alias("avg_trips"),
            F.sum("total_trips").alias("total_trips"),
        )
        .orderBy("is_weekend", "pickup_hour")
    )


def _mode(df: DataFrame, group_col: str, value_col: str, out_name: str) -> DataFrame:
    """Deterministic mode(): (count DESC, value ASC) — SURVEY A4's
    tie-break fix for cross-engine reproducibility."""
    counts = df.groupBy(group_col, value_col).agg(F.count("*").alias("_n"))
    w = Window.partitionBy(group_col).orderBy(F.desc("_n"), F.asc(value_col))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(group_col), F.col(value_col).alias(out_name))
    )


def mart_location_performance(fct: DataFrame) -> DataFrame:
    base = fct.filter(F.col("pickup_zone").isNotNull())
    agg = base.groupBy("pickup_zone", "pickup_borough").agg(
        F.count("*").alias("total_pickups"),
        F.round(F.avg(F.col("fare_amount").cast("double")), 2).alias("avg_fare"),
        F.round(F.avg("trip_distance_miles"), 2).alias("avg_distance"),
        F.round(F.avg("trip_duration_minutes"), 2).alias("avg_duration"),
        F.sum("total_amount").cast("decimal(38,2)").alias("total_revenue"),
    )
    top_do = _mode(base, "pickup_zone", "dropoff_zone", "most_common_dropoff")
    top_hr = _mode(base, "pickup_zone", "pickup_hour", "most_common_hour")
    return (
        agg.join(top_do, "pickup_zone", "left")
        .join(top_hr, "pickup_zone", "left")
        .orderBy(F.desc("total_pickups"))
    )


# ---------------------------------------------------------------------------
# anomaly_daily_trips (anomaly_daily_trips.py:19-40): z-score + IQR,
# composite OR flag — native columns, no pandas needed.
# ---------------------------------------------------------------------------


def anomaly_daily_trips(daily: DataFrame) -> DataFrame:
    # Global window over the per-day aggregate (bounded cardinality —
    # see mart_daily_revenue note); the z-score needs the whole-series
    # mean/stddev by definition.
    w = Window.partitionBy()
    stats = daily.select(
        "pickup_date",
        "total_trips",
        F.avg("total_trips").over(w).alias("_mean"),
        F.stddev("total_trips").over(w).alias("_std"),
        F.expr("percentile(total_trips, 0.25)").over(w).alias("_q1"),
        F.expr("percentile(total_trips, 0.75)").over(w).alias("_q3"),
    )
    z = (F.col("total_trips") - F.col("_mean")) / F.col("_std")
    iqr = F.col("_q3") - F.col("_q1")
    z_flag = F.abs(z) > 2
    iqr_flag = (F.col("total_trips") < F.col("_q1") - 1.5 * iqr) | (
        F.col("total_trips") > F.col("_q3") + 1.5 * iqr
    )
    return stats.select(
        "pickup_date",
        "total_trips",
        F.round(z, 4).alias("z_score"),
        z_flag.alias("is_anomaly_zscore"),
        iqr_flag.alias("is_anomaly_iqr"),
        (z_flag | iqr_flag).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# snap_locations: SCD Type-2 snapshot, dbt "check" strategy on
# (borough, zone, service_zone) (snap_locations.sql:13-26). Emulated
# MERGE: close changed rows, insert new versions. Delta-free.
# ---------------------------------------------------------------------------

SCD2_CHECK_COLS = ("borough", "zone", "service_zone")


def scd2_snapshot(
    current: DataFrame,
    snapshot: DataFrame | None,
    as_of: str,
    key_col: str = "location_id",
    check_cols: tuple[str, ...] = SCD2_CHECK_COLS,
) -> DataFrame:
    """Apply one SCD2 snapshot pass (dbt "check" strategy).

    ``snapshot`` is the existing history (or None on first run) with
    dbt_valid_from / dbt_valid_to columns; ``as_of`` stamps this run.
    Rows missing from the new load stay open (dbt's default — no
    hard-delete invalidation). Keyed and checked on ``key_col`` /
    ``check_cols`` so the same pass serves any dimension.
    """
    ts = F.lit(as_of).cast("timestamp")
    cur = current.select(
        key_col, *check_cols, ts.alias("dbt_valid_from"), F.lit(None).cast("timestamp").alias("dbt_valid_to")
    )
    if snapshot is None:
        return cur
    open_rows = snapshot.filter(F.col("dbt_valid_to").isNull())
    closed_rows = snapshot.filter(F.col("dbt_valid_to").isNotNull())
    check = [
        (F.coalesce(F.col(f"o.{c}"), F.lit("")) != F.coalesce(F.col(f"n.{c}"), F.lit(""))) for c in check_cols
    ]
    changed_pred = check[0]
    for p in check[1:]:
        changed_pred = changed_pred | p
    o, n = open_rows.alias("o"), cur.alias("n")
    joined = o.join(n, F.col(f"o.{key_col}") == F.col(f"n.{key_col}"), "left")
    # unchanged (or missing from new load): keep the open row as-is
    keep_open = joined.filter(F.col(f"n.{key_col}").isNull() | ~changed_pred).select("o.*")
    # changed: close the old version at as_of
    closed_now = joined.filter(F.col(f"n.{key_col}").isNotNull() & changed_pred).select(
        F.col(f"o.{key_col}"),
        *[F.col(f"o.{c}") for c in check_cols],
        F.col("o.dbt_valid_from"),
        ts.alias("dbt_valid_to"),
    )
    # changed or brand-new: open a fresh version
    new_versions = (
        n.join(o, F.col(f"n.{key_col}") == F.col(f"o.{key_col}"), "left")
        .filter(F.col(f"o.{key_col}").isNull() | changed_pred)
        .select("n.*")
    )
    return closed_rows.unionByName(keep_open).unionByName(closed_now).unionByName(new_versions)
