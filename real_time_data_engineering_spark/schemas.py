"""Explicit schemas — no inference in any production path.

Mirrors the reference's fixed-schema discipline (Avro/JSON-Schema canonical
taxi record, Flink DDLs, Spark StructTypes, dbt contracts with
``enforced: true``; reference shared/schemas/taxi_trip.avsc:7-25 and
shared/dbt-models/models/marts/core/core.yml:6-74).

Two families live here:
  * the taxi medallion record (raw → silver → gold contracts), and
  * the driver's TPC-H-ish test corpus tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Taxi record — raw wire schema (JSON events; CamelCase; ISO-8601 timestamps)
# Reference: shared/schemas/taxi_trip.json:7-27 (only the two timestamps are
# required), shared/data-generator/generator.py:52-57.
# ---------------------------------------------------------------------------
RAW_TRIP = T.StructType(
    [
        T.StructField("VendorID", T.LongType()),
        T.StructField("tpep_pickup_datetime", T.TimestampType()),
        T.StructField("tpep_dropoff_datetime", T.TimestampType()),
        T.StructField("passenger_count", T.LongType()),
        T.StructField("trip_distance", T.DoubleType()),
        T.StructField("RatecodeID", T.LongType()),
        T.StructField("store_and_fwd_flag", T.StringType()),
        T.StructField("PULocationID", T.LongType()),
        T.StructField("DOLocationID", T.LongType()),
        T.StructField("payment_type", T.LongType()),
        T.StructField("fare_amount", T.DoubleType()),
        T.StructField("extra", T.DoubleType()),
        T.StructField("mta_tax", T.DoubleType()),
        T.StructField("tip_amount", T.DoubleType()),
        T.StructField("tolls_amount", T.DoubleType()),
        T.StructField("improvement_surcharge", T.DoubleType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("congestion_surcharge", T.DoubleType()),
        T.StructField("Airport_fee", T.DoubleType()),
    ]
)

# JSON wire variant: timestamps arrive as ISO-8601 strings and are parsed
# with an explicit pattern (reference flink/sql/05-bronze.sql:47-48).
RAW_TRIP_WIRE = T.StructType(
    [
        T.StructField(f.name, T.StringType() if isinstance(f.dataType, T.TimestampType) else f.dataType)
        for f in RAW_TRIP.fields
    ]
)
TS_PATTERN = "yyyy-MM-dd'T'HH:mm:ss"

MONEY = T.DecimalType(10, 2)  # silver money contract (round 2, decimal(10,2))
MONEY_WIDE = T.DecimalType(38, 2)  # aggregate widening (duckdb hugeint analogue)

# Silver contract: renamed snake_case, typed, deduped, + surrogate key and
# partition column (reference stg_yellow_trips.sql:26-50, 06-silver.sql:10-40).
SILVER_TRIP = T.StructType(
    [
        T.StructField("trip_id", T.StringType(), False),
        T.StructField("vendor_id", T.IntegerType()),
        T.StructField("pickup_datetime", T.TimestampType(), False),
        T.StructField("dropoff_datetime", T.TimestampType(), False),
        T.StructField("passenger_count", T.IntegerType()),
        T.StructField("trip_distance_miles", T.DoubleType()),
        T.StructField("rate_code_id", T.IntegerType()),
        T.StructField("store_and_fwd_flag", T.StringType()),
        T.StructField("pickup_location_id", T.IntegerType()),
        T.StructField("dropoff_location_id", T.IntegerType()),
        T.StructField("payment_type_id", T.IntegerType()),
        T.StructField("fare_amount", MONEY),
        T.StructField("extra_amount", MONEY),
        T.StructField("mta_tax", MONEY),
        T.StructField("tip_amount", MONEY),
        T.StructField("tolls_amount", MONEY),
        T.StructField("improvement_surcharge", MONEY),
        T.StructField("total_amount", MONEY),
        T.StructField("congestion_surcharge", MONEY),
        T.StructField("airport_fee", MONEY),
        T.StructField("pickup_date", T.DateType(), False),
    ]
)

# Dimension seeds (reference nyc_taxi_dbt/seeds/*.csv + vendor_lookup).
SEED_SCHEMAS = {
    "taxi_zone_lookup": T.StructType(
        [
            T.StructField("LocationID", T.IntegerType(), False),
            T.StructField("Borough", T.StringType()),
            T.StructField("Zone", T.StringType()),
            T.StructField("service_zone", T.StringType()),
        ]
    ),
    "payment_type_lookup": T.StructType(
        [
            T.StructField("payment_type_id", T.IntegerType(), False),
            T.StructField("payment_type_name", T.StringType()),
        ]
    ),
    "rate_code_lookup": T.StructType(
        [
            T.StructField("rate_code_id", T.IntegerType(), False),
            T.StructField("rate_code_name", T.StringType()),
        ]
    ),
    "vendor_lookup": T.StructType(
        [
            T.StructField("vendor_id", T.IntegerType(), False),
            T.StructField("vendor_name", T.StringType()),
            T.StructField("vendor_abbr", T.StringType()),
        ]
    ),
}

# CDC: Debezium envelope over Kafka — before/after images, op code, epoch-µs
# timestamps (reference pipelines/12-cdc-debezium-pipeline/flink/sql/
# 06-silver-cdc.sql:9-20).
_CDC_IMAGE = T.StructType(
    [
        T.StructField(f.name, T.LongType() if isinstance(f.dataType, T.TimestampType) else f.dataType)
        for f in RAW_TRIP.fields
    ]
)
CDC_ENVELOPE = T.StructType(
    [
        T.StructField("before", _CDC_IMAGE),
        T.StructField("after", _CDC_IMAGE),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver test corpus (TPC-H-ish; TESTDATA.md). Explicit so streaming file
# sources (which require a schema) and contracts share one definition.
# ---------------------------------------------------------------------------
TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TESTDATA)
