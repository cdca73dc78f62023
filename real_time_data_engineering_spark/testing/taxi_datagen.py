"""Deterministic synthetic taxi-trip generator (FIXTURES.md §F1).

Produces the raw event shape with every documented dirty-row class so
the silver/gold pipeline and checks library can be exercised without
the reference's NYC dataset. Seeded `random.Random` → identical output
across runs and machines.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import RAW_TRIP

RAW_WITH_INGEST = T.StructType(
    list(RAW_TRIP.fields) + [T.StructField("ingestion_ts", T.TimestampType())]
)

_JAN1 = dt.datetime(2024, 1, 1)


def generate_raw_trips(
    spark: SparkSession, n_valid: int = 2000, seed: int = 42
) -> DataFrame:
    """n_valid clean rows + one batch of each dirty class (F1 classes 1-6)."""
    rng = random.Random(seed)
    ingest = dt.datetime(2024, 2, 1, 12, 0, 0)
    rows: list[tuple] = []

    def money(x: float) -> float:
        return round(x, 2)

    def mk(pickup: dt.datetime, dur_min: float, dist: float, fare: float, tip: float,
           pu: int = None, do: int = None, vendor=None, pay=None, ing=ingest):
        drop = pickup + dt.timedelta(minutes=dur_min)
        extra, mta = money(rng.choice([0.0, 0.5, 1.0])), 0.5
        tolls = money(rng.choice([0.0, 0.0, 6.55]))
        surcharge = 1.0
        congestion = money(rng.choice([0.0, 2.5]))
        airport = money(rng.choice([0.0, 1.75]))
        total = money(fare + tip + extra + mta + tolls + surcharge + congestion + airport)
        return (
            vendor if vendor is not None else rng.choice([1, 2, 6]),
            pickup,
            drop,
            rng.randint(0, 6),
            dist,
            rng.choice([1, 2, 3, 4, 5, 6, 99]),
            rng.choice(["Y", "N", None]),
            pu if pu is not None else rng.randint(1, 265),
            do if do is not None else rng.randint(1, 265),
            pay if pay is not None else rng.randint(1, 6),
            money(fare), extra, mta, money(tip), tolls, surcharge, total, congestion, airport,
            ing,
        )

    for _ in range(n_valid):
        pickup = _JAN1 + dt.timedelta(minutes=rng.uniform(0, 30 * 24 * 60))
        dur = rng.uniform(2, 90)
        dist = round(rng.uniform(0.3, 25.0), 2)
        fare = money(3.0 + dist * rng.uniform(2.0, 4.0))
        tip = money(fare * rng.uniform(0, 0.35))
        rows.append(mk(pickup, dur, dist, fare, tip))

    # class 1: NULL timestamps
    base = mk(_JAN1 + dt.timedelta(days=3), 15, 2.0, 12.0, 2.0)
    rows.append(tuple([base[0], None, base[2], *base[3:]]))
    rows.append(tuple([base[0], base[1], None, *base[3:]]))
    # class 2: negative distance / fare
    rows.append(mk(_JAN1 + dt.timedelta(days=4), 15, -1.0, 10.0, 0.0))
    rows.append(mk(_JAN1 + dt.timedelta(days=4), 15, 2.0, -5.0, 0.0))
    # class 3: out-of-range dates (Dec 2023 / Feb 2024)
    rows.append(mk(dt.datetime(2023, 12, 30), 15, 2.0, 10.0, 1.0))
    rows.append(mk(dt.datetime(2024, 2, 2), 15, 2.0, 10.0, 1.0))
    # class 4: implausible durations (dropped at intermediate, kept in silver)
    rows.append(mk(_JAN1 + dt.timedelta(days=5), 0.2, 1.0, 5.0, 0.0))
    rows.append(mk(_JAN1 + dt.timedelta(days=5), 900, 5.0, 40.0, 0.0))
    # class 5: impossible speed (120 mph)
    rows.append(mk(_JAN1 + dt.timedelta(days=6), 30, 60.0, 100.0, 0.0))
    # class 6: exact natural-key duplicates, later ingestion_ts wins
    dup = mk(_JAN1 + dt.timedelta(days=7, hours=9), 20, 3.0, 15.0, 3.0, pu=10, do=20, vendor=1, pay=1)
    rows.append(dup)
    rows.append(tuple([*dup[:-1], ingest + dt.timedelta(hours=1)]))
    # class 7: unknown location ids → NULL zone after enrichment
    rows.append(mk(_JAN1 + dt.timedelta(days=8), 20, 3.0, 15.0, 3.0, pu=998, do=999))

    return spark.createDataFrame(rows, RAW_WITH_INGEST)
