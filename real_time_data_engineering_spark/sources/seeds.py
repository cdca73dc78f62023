"""Dimension seed data (reference: dbt seeds, FIXTURES.md §F2).

The reference ships these as CSV seeds (taxi_zone_lookup 265 rows,
payment/rate/vendor lookups); here they're generated deterministically
with the documented domains — same shape and key space, synthetic zone
names (we don't copy the reference's data files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import SEED_SCHEMAS

BOROUGHS = ("Manhattan", "Brooklyn", "Queens", "Bronx", "Staten Island", "EWR", "Unknown")

PAYMENT_TYPES = (
    (1, "Credit card"),
    (2, "Cash"),
    (3, "No charge"),
    (4, "Dispute"),
    (5, "Unknown"),
    (6, "Voided trip"),
)

RATE_CODES = (
    (1, "Standard rate"),
    (2, "JFK"),
    (3, "Newark"),
    (4, "Nassau or Westchester"),
    (5, "Negotiated fare"),
    (6, "Group ride"),
    (99, "Unknown"),
)

VENDORS = ((1, "Creative Mobile Technologies", "CMT"), (2, "VeriFone Inc.", "VFI"))

SERVICE_ZONES = ("Yellow Zone", "Boro Zone", "Airports", "EWR")


def taxi_zones(spark: SparkSession, n: int = 265) -> DataFrame:
    """265 zones, ids 1..265, boroughs cycled deterministically."""
    rows = [
        (
            i,
            BOROUGHS[i % len(BOROUGHS)],
            f"Zone {i:03d}",
            SERVICE_ZONES[i % len(SERVICE_ZONES)],
        )
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, SEED_SCHEMAS["taxi_zone_lookup"])


def payment_type_lookup(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(PAYMENT_TYPES), SEED_SCHEMAS["payment_type_lookup"])


def rate_code_lookup(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(RATE_CODES), SEED_SCHEMAS["rate_code_lookup"])


def vendor_lookup(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(VENDORS), SEED_SCHEMAS["vendor_lookup"])
