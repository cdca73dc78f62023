"""Full-pipeline run over synthetic dirty data + the reference's
invariant suite (FIXTURES.md §F7, validate.py + Soda checks) and the
dbt-style check accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_data_engineering_spark.checks import asserts as A
from real_time_data_engineering_spark.plans.taxi_pipeline import run_pipeline
from real_time_data_engineering_spark.testing.taxi_datagen import generate_raw_trips


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    raw = generate_raw_trips(spark, n_valid=2000)
    wh = str(tmp_path_factory.mktemp("warehouse"))
    return run_pipeline(spark, raw, warehouse_dir=wh).built


def test_rowcount_monotonicity(built):
    """validate.py:106-116 — count(stg) ≥ count(int) = count(fct)."""
    stg = built["stg_yellow_trips"].count()
    itm = built["int_trip_metrics"].count()
    fct = built["fct_trips"].count()
    assert stg >= itm
    assert itm == fct


def test_daily_rows_and_dims(built):
    """validate.py:119-134 — daily grain ≤ 31 rows; 265 unique zones."""
    daily = built["int_daily_summary"].count()
    assert 1 <= daily <= 31
    assert built["mart_daily_revenue"].count() == daily
    dim = built["dim_locations"]
    assert dim.count() == 265
    assert dim.select("location_id").distinct().count() == 265


def test_trip_id_unique(built):
    assert A.unique(built["stg_yellow_trips"], "trip_id", "silver").passed


def test_money_invariants(built):
    """silver_checks.yml:9-12 — min(fare) ≥ 0 after cleaning."""
    row = built["stg_yellow_trips"].agg(F.min("fare_amount").alias("m")).first()
    assert row["m"] >= 0


def test_idempotent_rebuild(spark, built, tmp_path):
    """validate.py:43-78 — rebuilding from the same input yields identical
    counts (3-run idempotency collapsed to 2 here)."""
    raw = generate_raw_trips(spark, n_valid=2000)
    again = run_pipeline(spark, raw, warehouse_dir=str(tmp_path / "wh2")).built
    for m in ("stg_yellow_trips", "fct_trips", "mart_daily_revenue"):
        assert built[m].count() == again[m].count()


def test_dbt_style_check_suite(built):
    """The 94-test analogue: generic + singular + contract + Soda metric
    checks (the shared full-DAG suite bench.py also runs), with
    dbt-style PASS/WARN/ERROR accounting — must have zero errors."""
    from real_time_data_engineering_spark.checks.taxi_suite import taxi_check_suite

    summary, flat = taxi_check_suite(built)
    errors = [r for r in flat if not r.passed and r.severity == "error"]
    assert not errors, f"{summary}: {[(r.name, r.detail) for r in errors]}"
    # the suite must exercise every check class, Soda metrics included
    assert any(r.name.startswith("metric:") for r in flat)
    assert any(r.name.startswith("contract:") for r in flat)


def test_contract_enforcement(built):
    """core.yml contracts: silver schema must match exactly."""
    from real_time_data_engineering_spark.schemas import SILVER_TRIP

    res = A.expect_schema(built["stg_yellow_trips"], SILVER_TRIP, "stg_yellow_trips")
    assert res.passed, res.detail


def test_anomaly_model_shape(built):
    an = built["anomaly_daily_trips"]
    assert an.count() == built["int_daily_summary"].count()
    assert set(an.columns) >= {"z_score", "is_anomaly_zscore", "is_anomaly_iqr", "is_anomaly"}


def test_mart_location_performance_modes(built):
    mlp = built["mart_location_performance"]
    row = mlp.first()
    assert row.most_common_dropoff is not None
    assert 0 <= row.most_common_hour <= 23


def test_incremental_fct_equals_full_recompute(spark, tmp_path):
    """run_incremental over day-partitioned batches must converge to the
    same fct_trips as one full run over the union — and each increment
    rewrites only its own pickup_date partitions."""
    import os

    from real_time_data_engineering_spark.operators.gold import (
        dim_locations,
        fct_trips,
        int_trip_metrics,
        stg_taxi_zones,
    )
    from real_time_data_engineering_spark.operators.silver import silver_transform
    from real_time_data_engineering_spark.plans.taxi_pipeline import run_incremental
    from real_time_data_engineering_spark.sources import seeds

    raw = generate_raw_trips(spark, n_valid=600).cache()
    days = [r[0] for r in
            silver_transform(raw).select("pickup_date").distinct().orderBy("pickup_date").collect()]
    assert len(days) >= 2
    split = days[len(days) // 2]
    wh = str(tmp_path / "wh")
    first = raw.filter(F.to_date("tpep_pickup_datetime") < F.lit(split))
    second = raw.filter(F.to_date("tpep_pickup_datetime") >= F.lit(split))

    run_incremental(spark, first, wh)
    d0 = f"{wh}/fct_trips/pickup_date={days[0]}"
    before = {f: os.path.getmtime(os.path.join(d0, f)) for f in os.listdir(d0)}
    touched = run_incremental(spark, second, wh)
    assert str(split) in touched and str(days[0]) not in touched
    after = {f: os.path.getmtime(os.path.join(d0, f)) for f in os.listdir(d0)}
    assert before == after  # first day's files untouched by the second increment

    got = spark.read.parquet(f"{wh}/fct_trips")
    want = fct_trips(
        int_trip_metrics(silver_transform(raw)),
        dim_locations(stg_taxi_zones(seeds.taxi_zones(spark))),
    )
    cols = sorted(set(got.columns) & set(want.columns))
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )
