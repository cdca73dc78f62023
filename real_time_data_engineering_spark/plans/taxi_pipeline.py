"""The full taxi medallion pipeline wired as a DAG.

Reference DAG: README.md:520-578 / SURVEY.md §3.2. Materialization
policy mirrors dbt_project.yml:41-53 — staging/intermediate as views,
fct + marts as tables (partitioned where the reference partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import gold, silver
from ..sources import seeds
from .dag import DagRunner, Model


def build_runner(
    spark: SparkSession, raw_trips: DataFrame, warehouse_dir: str | None = None
) -> DagRunner:
    r = DagRunner(spark, warehouse_dir)
    r.add(Model("stg_yellow_trips", lambda b: silver.silver_transform(b["raw_trips"]), ("raw_trips",), "table", ("pickup_date",)))
    r.add(Model("stg_taxi_zones", lambda b: gold.stg_taxi_zones(seeds.taxi_zones(spark))))
    r.add(Model("dim_locations", lambda b: gold.dim_locations(b["stg_taxi_zones"]), ("stg_taxi_zones",)))
    r.add(Model("dim_payment_types", lambda b: gold.dim_payment_types(seeds.payment_type_lookup(spark))))
    r.add(Model("dim_rate_codes", lambda b: gold.dim_rate_codes(seeds.rate_code_lookup(spark))))
    r.add(Model("dim_vendors", lambda b: gold.dim_vendors(seeds.vendor_lookup(spark))))
    r.add(Model("dim_dates", lambda b: gold.dim_dates(spark)))
    r.add(Model("int_trip_metrics", lambda b: gold.int_trip_metrics(b["stg_yellow_trips"]), ("stg_yellow_trips",)))
    r.add(Model("fct_trips", lambda b: gold.fct_trips(b["int_trip_metrics"], b["dim_locations"]), ("int_trip_metrics", "dim_locations"), "table", ("pickup_date",)))
    r.add(Model("int_daily_summary", lambda b: gold.int_daily_summary(b["int_trip_metrics"]), ("int_trip_metrics",)))
    r.add(Model("int_hourly_patterns", lambda b: gold.int_hourly_patterns(b["int_trip_metrics"]), ("int_trip_metrics",)))
    r.add(Model("mart_daily_revenue", lambda b: gold.mart_daily_revenue(b["int_daily_summary"], b["dim_dates"]), ("int_daily_summary", "dim_dates"), "table"))
    r.add(Model("mart_hourly_demand", lambda b: gold.mart_hourly_demand(b["int_hourly_patterns"]), ("int_hourly_patterns",), "table"))
    r.add(Model("mart_location_performance", lambda b: gold.mart_location_performance(b["fct_trips"]), ("fct_trips",), "table"))
    r.add(Model("anomaly_daily_trips", lambda b: gold.anomaly_daily_trips(b["int_daily_summary"]), ("int_daily_summary",)))

    def _export(b: dict[str, DataFrame]) -> DataFrame:
        # S15: "external" materialization — parquet export that stays a
        # queryable view (export_daily_revenue.sql:13-42)
        df = b["mart_daily_revenue"]
        if warehouse_dir:
            df.write.mode("overwrite").parquet(f"{warehouse_dir}/exports/daily_revenue")
        return df

    r.add(Model("export_daily_revenue", _export, ("mart_daily_revenue",)))
    return r


def run_pipeline(
    spark: SparkSession, raw_trips: DataFrame, warehouse_dir: str | None = None
):
    runner = build_runner(spark, raw_trips, warehouse_dir)
    return runner.run({"raw_trips": raw_trips})


def run_incremental(
    spark: SparkSession,
    new_raw: DataFrame,
    warehouse_dir: str,
) -> list[str]:
    """Incremental fct maintenance: silver + metrics over the NEW batch
    only, then dynamic-partition-overwrite of exactly the pickup_dates
    it touches (dbt incremental `insert_overwrite`, the reference's
    fct_trips materialization strategy).

    Cost scales with the increment, not the table: a daily batch
    rewrites one date partition of fct_trips while every other
    partition's files stay byte-identical (asserted in
    tests/test_gold_pipeline.py). Marts downstream recompute from the
    maintained fct on their own cadence.
    """
    from ..operators.maintenance import incremental_overwrite
    from ..operators.silver import silver_transform
    from ..sources import seeds as _seeds

    metrics = gold.int_trip_metrics(silver_transform(new_raw))
    fct = gold.fct_trips(metrics, gold.dim_locations(gold.stg_taxi_zones(_seeds.taxi_zones(spark))))
    return incremental_overwrite(fct, f"{warehouse_dir}/fct_trips", "pickup_date")
