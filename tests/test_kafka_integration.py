"""Broker-gated Kafka end-to-end smoke (see KAFKA.md for the launch
recipe). Skipped unless SPARK_GRAFT_KAFKA_BOOTSTRAP points at a broker
AND the spark-sql-kafka connector is on the classpath — the default
container has neither, so CI exercises the file-source twins instead
(tests/test_streaming.py).

Reference parity target: pipelines/02-kafka-spark-iceberg
bronze_ingest.py:121-129 (Kafka source → JSON parse → typed bronze).
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="no broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP (see KAFKA.md)"
)


def _has_kafka_connector(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_kafka_roundtrip_matches_direct_silver(spark, tmp_path):
    """produce(raw as JSON) → consume(availableNow) → parse_bronze →
    silver must equal silver computed directly from the same raw frame
    — the streaming==batch contract, now through a real broker."""
    from real_time_data_engineering_spark.operators.silver import silver_transform
    from real_time_data_engineering_spark.streaming import ingest as I
    from real_time_data_engineering_spark.testing.taxi_datagen import generate_raw_trips

    if not _has_kafka_connector(spark):
        pytest.skip("spark-sql-kafka connector not on classpath (see KAFKA.md)")

    topic = f"graft_smoke_{uuid.uuid4().hex[:8]}"
    raw = generate_raw_trips(spark, n_valid=200)

    I.write_kafka_batch(I.to_kafka_records(raw, "pu_location_id"), BOOTSTRAP, topic)

    consumed = (
        I.read_kafka_stream(spark, BOOTSTRAP, topic)
        .selectExpr("CAST(value AS STRING) AS value")
    )
    out_dir, ckpt = str(tmp_path / "bronze"), str(tmp_path / "ckpt")
    (
        consumed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    bronze, dead = I.parse_bronze(spark.read.parquet(out_dir))
    assert dead.count() == 0
    via_kafka = silver_transform(bronze)
    direct = silver_transform(I.parse_bronze(I.to_kafka_records(raw, "pu_location_id"))[0])
    assert via_kafka.count() == direct.count()
    a = {r.trip_id for r in via_kafka.select("trip_id").collect()}
    b = {r.trip_id for r in direct.select("trip_id").collect()}
    assert a == b
