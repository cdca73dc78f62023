"""Golden unit tests ported from the reference's dbt unit_tests fixtures
(FIXTURES.md §F6 — exact input rows → exact expected outputs)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from real_time_data_engineering_spark.operators import gold, silver
from real_time_data_engineering_spark.schemas import RAW_TRIP
from real_time_data_engineering_spark.sources import seeds


def _raw(spark, rows):
    return spark.createDataFrame(rows, RAW_TRIP)


def _row(
    pickup=dt.datetime(2024, 1, 8, 10, 0, 0),
    dropoff=dt.datetime(2024, 1, 8, 10, 30, 0),
    vendor=1,
    distance=10.0,
    fare=25.0,
    tip=5.0,
    total=31.5,
    pu=100,
    do=200,
    pay=1,
):
    return (
        vendor, pickup, dropoff, 2, distance, 1, "N", pu, do, pay,
        fare, 0.5, 0.5, tip, 0.0, 0.5, total, 0.0, 0.0,
    )


def test_rename_cast_golden_row(spark):
    """staging/_unit_tests.yml:2-34 — rename/cast/round contract."""
    out = silver.silver_transform(_raw(spark, [_row()])).collect()[0]
    assert out.vendor_id == 1
    assert out.trip_distance_miles == 10.0
    assert out.fare_amount == Decimal("25.00")
    assert out.tip_amount == Decimal("5.00")
    assert out.pickup_location_id == 100 and out.dropoff_location_id == 200
    assert out.payment_type_id == 1
    assert out.pickup_date == dt.date(2024, 1, 8)
    assert len(out.trip_id) == 32  # md5 hex


def test_filter_matrix(spark):
    """staging/_unit_tests.yml:36-101 — 1 valid + 5 dropped classes."""
    rows = [
        _row(),  # valid
        _row(pickup=None),
        _row(dropoff=None),
        _row(distance=-1.0),
        _row(fare=-5.0),
        _row(pickup=dt.datetime(2023, 12, 30, 10), dropoff=dt.datetime(2023, 12, 30, 11)),
        _row(pickup=dt.datetime(2024, 2, 2, 10), dropoff=dt.datetime(2024, 2, 2, 11)),
    ]
    out = silver.silver_transform(_raw(spark, rows))
    assert out.count() == 1


def test_metric_math_golden(spark):
    """intermediate/_unit_tests.yml:2-17 — 10 mi / 30 min ⇒ 20 mph,
    2.5 $/mi, 20 % tip, Monday, hour 10, weekend=false."""
    m = gold.int_trip_metrics(silver.silver_transform(_raw(spark, [_row()]))).collect()[0]
    assert m.trip_duration_minutes == 30
    assert m.avg_speed_mph == 20.0
    assert m.cost_per_mile == 2.5
    assert m.tip_percentage == 20.0
    assert m.pickup_day_of_week == "Monday"
    assert m.pickup_hour == 10
    assert m.is_weekend is False


@pytest.mark.parametrize(
    "day,name,weekend",
    [
        (dt.datetime(2024, 1, 8, 9), "Monday", False),
        (dt.datetime(2024, 1, 6, 9), "Saturday", True),
        (dt.datetime(2024, 1, 7, 9), "Sunday", True),
    ],
)
def test_weekend_flags(spark, day, name, weekend):
    """intermediate/_unit_tests.yml:19-41."""
    m = gold.int_trip_metrics(
        silver.silver_transform(_raw(spark, [_row(pickup=day, dropoff=day + dt.timedelta(minutes=30))]))
    ).collect()[0]
    assert m.pickup_day_of_week == name
    assert m.is_weekend is weekend


def test_impossible_trip_filter(spark):
    """intermediate/_unit_tests.yml:43-67 — zero-dur / too-long / too-fast dropped."""
    base = dt.datetime(2024, 1, 8, 10)
    rows = [
        _row(),  # valid: 30 min, 20 mph
        _row(pickup=base, dropoff=base),  # 0 min
        _row(pickup=base, dropoff=base + dt.timedelta(minutes=800)),  # > 720
        _row(pickup=base, dropoff=base + dt.timedelta(minutes=30), distance=60.0),  # 120 mph
    ]
    out = gold.int_trip_metrics(silver.silver_transform(_raw(spark, rows)))
    assert out.count() == 1


def test_div_by_zero_nulls(spark):
    """intermediate/_unit_tests.yml:69-87 — zero fare → NULL tip%, zero
    distance → NULL cost/mile."""
    rows = [_row(fare=0.0, tip=0.0, total=1.5), _row(distance=0.0)]
    out = gold.int_trip_metrics(silver.silver_transform(_raw(spark, rows))).collect()
    by_fare = {float(r.fare_amount): r for r in out}
    assert by_fare[0.0].tip_percentage is None
    assert by_fare[25.0].cost_per_mile is None


def test_left_join_null_enrichment(spark):
    """marts/core/_unit_tests.yml:2-33 — unknown location ids survive with
    NULL zone/borough."""
    rows = [_row(pu=1, do=999)]
    metrics = gold.int_trip_metrics(silver.silver_transform(_raw(spark, rows)))
    fct = gold.fct_trips(metrics, gold.stg_taxi_zones(seeds.taxi_zones(spark))).collect()[0]
    assert fct.pickup_zone == "Zone 001"
    assert fct.dropoff_zone is None and fct.dropoff_borough is None


def test_dedup_keeps_latest_ingestion(spark):
    """06-silver.sql:42-58 — same natural key, later ingestion_ts wins."""
    from real_time_data_engineering_spark.testing.taxi_datagen import RAW_WITH_INGEST

    r = _row()
    early = tuple([*r, dt.datetime(2024, 2, 1, 10)])
    late = tuple([*r, dt.datetime(2024, 2, 1, 11)])
    raw = spark.createDataFrame([early, late], RAW_WITH_INGEST)
    out = silver.silver_transform(raw)
    assert out.count() == 1


def test_surrogate_key_null_handling(spark):
    """P3 pitfall: NULL components hash as '' (dbt parity), so two rows
    differing only in a NULL vs non-NULL key column get different ids."""
    a = _row(vendor=None)
    b = _row(vendor=2)
    out = silver.silver_transform(_raw(spark, [a, b])).select("trip_id").collect()
    assert out[0].trip_id != out[1].trip_id


def test_scd2_snapshot_lifecycle(spark):
    """snap_locations.sql:13-26 — check strategy on borough/zone/service_zone."""
    zones0 = gold.stg_taxi_zones(seeds.taxi_zones(spark, n=5))
    snap1 = gold.scd2_snapshot(zones0, None, "2024-01-01 00:00:00")
    assert snap1.count() == 5
    assert snap1.filter(F.col("dbt_valid_to").isNotNull()).count() == 0

    # change zone 3's borough, add zone 6
    zones1 = zones0.withColumn(
        "borough", F.when(F.col("location_id") == 3, F.lit("Elsewhere")).otherwise(F.col("borough"))
    ).unionByName(
        spark.createDataFrame(
            [(6, "Queens", "Zone 006", "Boro Zone")],
            "location_id int, borough string, zone string, service_zone string",
        )
    )
    snap2 = gold.scd2_snapshot(zones1, snap1, "2024-01-02 00:00:00")
    assert snap2.count() == 7  # 5 original + 1 closed-replacement + 1 new
    closed = snap2.filter(F.col("dbt_valid_to").isNotNull()).collect()
    assert len(closed) == 1 and closed[0].location_id == 3
    open_3 = snap2.filter((F.col("location_id") == 3) & F.col("dbt_valid_to").isNull()).collect()
    assert open_3[0].borough == "Elsewhere"
    # idempotency: re-applying the same state changes nothing
    snap3 = gold.scd2_snapshot(zones1, snap2, "2024-01-03 00:00:00")
    assert snap3.count() == 7


def test_read_evolving_schema(spark, tmp_path):
    """Old files lacking a newer column read under the full contract:
    missing column -> default/typed NULL; extra on-disk column dropped;
    present columns cast to contract types."""
    from pyspark.sql import types as T

    from real_time_data_engineering_spark.sources.readers import read_evolving

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5, "drop-me")], "id long, name string, score double, extra string"
    ).write.mode("append").parquet(p)

    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("tier", T.IntegerType()),
        ]
    )
    out = read_evolving(spark, p, target, defaults={"tier": 0})
    assert [f.name for f in out.schema.fields] == ["id", "name", "score", "tier"]
    rows = {r.id: r for r in out.collect()}
    assert rows[1].score is None and rows[1].tier == 0
    assert rows[2].score == 9.5 and rows[2].tier == 0
    assert "extra" not in out.columns
