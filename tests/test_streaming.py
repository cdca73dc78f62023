"""Structured-Streaming layer tests: file-source streams driven to
completion with availableNow / processAllAvailable (no Kafka broker in
the container; the value-column path is identical either way).

Core assertion throughout: streaming result == batch result over the
same rows (Spark's micro-batch contract, and the reference's
"MV contents equal batch recompute" contract for ST6)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


from real_time_data_engineering_spark.sources.readers import load_table
from real_time_data_engineering_spark.streaming import ingest as si

from conftest import SF_DIR


@pytest.fixture(scope="module")
def json_events_dir(spark, tmp_path_factory):
    """A directory of JSON taxi events incl. malformed rows (DLQ food)."""
    d = tmp_path_factory.mktemp("events_json")
    good = {
        "VendorID": 1,
        "tpep_pickup_datetime": "2024-01-08T10:00:00",
        "tpep_dropoff_datetime": "2024-01-08T10:30:00",
        "passenger_count": 2,
        "trip_distance": 10.0,
        "RatecodeID": 1,
        "store_and_fwd_flag": "N",
        "PULocationID": 100,
        "DOLocationID": 200,
        "payment_type": 1,
        "fare_amount": 25.0,
        "extra": 0.5,
        "mta_tax": 0.5,
        "tip_amount": 5.0,
        "tolls_amount": 0.0,
        "improvement_surcharge": 0.5,
        "total_amount": 31.5,
        "congestion_surcharge": 0.0,
        "Airport_fee": 0.0,
    }
    lines = []
    for i in range(50):
        row = dict(good)
        row["PULocationID"] = 1 + (i % 10)
        row["tpep_pickup_datetime"] = f"2024-01-{8 + i % 3:02d}T10:{i % 60:02d}:00"
        row["tpep_dropoff_datetime"] = f"2024-01-{8 + i % 3:02d}T10:{(i % 60):02d}:30"
        lines.append(json.dumps(row))
    lines.append("this is not json at all {{{")
    lines.append(json.dumps({"foo": "bar"}))  # parseable but no timestamps
    (d / "batch0.txt").write_text("\n".join(lines))
    return str(d)


def test_bronze_silver_dlq_fanout(spark, json_events_dir, tmp_path):
    """ST2/ST4/ST8: one availableNow stream → bronze + silver + DLQ files."""
    source = si.read_file_stream(
        spark, json_events_dir, T.StructType([T.StructField("value", T.StringType())]), fmt="text"
    ).withColumnRenamed("text", "value")
    paths = {k: str(tmp_path / k) for k in ("bronze", "silver", "dlq", "ckpt")}
    si.run_bronze_to_silver(
        spark, source, paths["bronze"], paths["silver"], paths["dlq"], paths["ckpt"]
    )
    bronze = spark.read.parquet(paths["bronze"])
    silver = spark.read.parquet(paths["silver"])
    dlq = spark.read.parquet(paths["dlq"])
    assert bronze.count() == 50
    assert dlq.count() == 2
    assert dlq.filter(F.col("error_class") == "unparseable_event").count() == 2
    # silver applied the same batch transform: typed, keyed, partitioned
    assert silver.count() == 50
    assert "trip_id" in silver.columns
    assert silver.select("pickup_date").distinct().count() == 3
    # exactly-once replay: re-running with the same checkpoint adds nothing
    source2 = si.read_file_stream(
        spark, json_events_dir, T.StructType([T.StructField("value", T.StringType())]), fmt="text"
    ).withColumnRenamed("text", "value")
    si.run_bronze_to_silver(
        spark, source2, paths["bronze"], paths["silver"], paths["dlq"], paths["ckpt"]
    )
    assert spark.read.parquet(paths["bronze"]).count() == 50
    assert spark.read.parquet(paths["dlq"]).count() == 2


def test_streaming_hourly_rollup_equals_batch(spark):
    """ST6/A6: the streaming tumbling rollup over the events corpus must
    equal the batch computation of the same aggregation."""
    batch_events = load_table(spark, SF_DIR, "events")
    # File-stream the events parquet (ts arrives as int64 nanos under the
    # session conf; normalize exactly like the batch reader).
    stream = si.read_events_stream(spark, SF_DIR)
    agg = si.hourly_rollup_stream(stream)
    q = agg.writeStream.format("memory").queryName("hourly_mv").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    got = {
        (r.hour_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM hourly_mv").collect()
    }
    # batch twin: same aggregation expressed on the batch frame
    batch = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "total_value")
    )
    want = {(r.hour_start, r.event_type): (r.n_events, r.total_value) for r in batch.collect()}
    assert got == want


def test_streaming_sliding_rollup_equals_batch(spark):
    """Hopping-window variant of ST6/A6: the watermarked sliding rollup
    (1h window, 15min slide) must equal q25's batch computation —
    every event in exactly 4 overlapping windows."""
    from real_time_data_engineering_spark.registry import all_specs

    stream = si.read_events_stream(spark, SF_DIR)
    agg = si.hourly_rollup_stream(stream, slide="15 minutes")
    q = agg.writeStream.format("memory").queryName("sliding_mv").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    got = {
        (F_ts(r.hour_start), r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM sliding_mv").collect()
    }
    batch = all_specs()["q25_sliding_rollup"].spark(spark, SF_DIR)
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value) for r in batch.collect()
    }
    assert got == want


def F_ts(dt):
    return dt.strftime("%Y-%m-%d %H:%M:%S")


def test_stream_dedup_within_watermark(spark, tmp_path):
    """ST5: duplicate natural keys inside the watermark collapse to one."""
    import real_time_data_engineering_spark.testing.taxi_datagen as dg

    raw = dg.generate_raw_trips(spark, n_valid=200)
    src_dir = str(tmp_path / "raw")
    raw.write.parquet(src_dir)
    stream = spark.readStream.schema(dg.RAW_WITH_INGEST).parquet(src_dir)
    deduped = si.stream_dedup(stream, watermark="1 hour")
    q = deduped.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM dedup_out")
    from real_time_data_engineering_spark.operators.silver import NATURAL_KEY

    assert out.groupBy(*NATURAL_KEY).count().filter(F.col("count") > 1).count() == 0
    # the injected duplicate pair collapsed
    assert out.count() < raw.count()


def test_cdc_parser_golden(spark):
    """ST7 golden rows: c/u/r kept with after-image, d dropped."""
    from real_time_data_engineering_spark.sources import cdc

    schema = T.StructType(
        [
            T.StructField("before", T.StringType()),
            T.StructField("after", T.StructType([T.StructField("id", T.LongType()), T.StructField("ts_us", T.LongType())])),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    rows = [
        (json.dumps({"before": None, "after": {"id": 1, "ts_us": 1704067200000000}, "op": "c", "ts_ms": 1}),),
        (json.dumps({"before": None, "after": {"id": 2, "ts_us": 1704067200000000}, "op": "r", "ts_ms": 2}),),
        (json.dumps({"before": {"id": 3}, "after": {"id": 3, "ts_us": 1704067200000000}, "op": "u", "ts_ms": 3}),),
        (json.dumps({"before": {"id": 4}, "after": None, "op": "d", "ts_ms": 4}),),
    ]
    df = spark.createDataFrame(rows, "payload string")
    out = cdc.apply_upserts(cdc.parse_envelope(df, "payload", schema))
    got = {r.id: r.op for r in out.collect()}
    assert got == {1: "c", 2: "r", 3: "u"}
    ts = out.select(cdc.micros_to_ts("ts_us").alias("t")).first()["t"]
    assert ts == dt.datetime(2024, 1, 1, 0, 0, 0)


def test_cdc_materialize_latest_applies_deletes(spark):
    """q26 semantics golden: latest op per key wins; delete-last keys
    drop out; a create after a delete resurrects the key."""
    from real_time_data_engineering_spark.sources import cdc

    schema = T.StructType(
        [
            T.StructField("before", T.StringType()),
            T.StructField("after", T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.LongType())])),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    def env(id_, v, op, ts):
        return (json.dumps({"before": None, "after": {"id": id_, "v": v}, "op": op, "ts_ms": ts}),)

    rows = [
        env(1, 10, "c", 1), env(1, 11, "u", 3),            # survives with v=11
        env(2, 20, "c", 1), env(2, 20, "d", 5),            # deleted
        env(3, 30, "d", 2),                                 # only a delete
        env(4, 40, "c", 2), env(4, 40, "d", 3), env(4, 41, "c", 4),  # resurrected
    ]
    df = spark.createDataFrame(rows, "payload string")
    parsed = cdc.parse_envelope(df, "payload", schema)
    out = cdc.materialize_latest(parsed, ("id",), ("ts_ms",))
    got = {r.id: r.v for r in out.collect()}
    assert got == {1: 11, 4: 41}


def test_dlq_repair_recovers_fixable_events(spark):
    """ST4 extension: DLQ replay. Double-encoded JSON recovers (with
    timestamp-format fallback); true garbage stays dead; off-format
    timestamps inside valid JSON take the bronze path with NULL ts
    (silver quality filter drops them) instead of crashing under ANSI."""
    from real_time_data_engineering_spark.streaming.ingest import (
        parse_bronze,
        repair_dead_letters,
    )

    good = '{"VendorID": 1, "tpep_pickup_datetime": "2024-01-05T10:00:00", "tpep_dropoff_datetime": "2024-01-05T10:30:00", "fare_amount": 10.0}'
    spacefmt = good.replace("T1", " 1").replace('"VendorID": 1', '"VendorID": 3')
    dbl_encoded = '"' + good.replace('"', '\\"') + '"'  # JSON string containing the record
    garbage = "not json at all"
    no_ts = '{"VendorID": 2, "fare_amount": 1.0}'
    df = spark.createDataFrame([(v,) for v in (good, spacefmt, dbl_encoded, garbage, no_ts)], "value string")

    bronze, dead = parse_bronze(df)
    rows = {r.VendorID: r for r in bronze.collect()}  # forces ts evaluation
    assert set(rows) == {1, 3}
    assert rows[1].tpep_pickup_datetime is not None
    assert rows[3].tpep_pickup_datetime is None  # off-format → NULL, not a crash
    assert dead.count() == 3

    recovered, still_dead = repair_dead_letters(dead)
    rec = recovered.collect()
    assert len(rec) == 1 and rec[0].VendorID == 1 and rec[0].repaired
    assert rec[0].tpep_pickup_datetime is not None
    assert still_dead.count() == 2
    # idempotent: replaying the residue recovers nothing new

    r2, d2 = repair_dead_letters(still_dead)
    assert r2.count() == 0 and d2.count() == 2


def test_stateful_sessionization_matches_batch(spark):
    """Custom stateful operator (applyInPandasWithState): closed sessions
    emitted by the stream must equal the batch q18 sessionization for
    every session that closes before the final watermark."""
    from real_time_data_engineering_spark.streaming.stateful import sessionize_stream

    gap_sec = 1800
    stream = si.read_events_stream(spark, SF_DIR)
    sess = sessionize_stream(stream, gap_sec=gap_sec, watermark="0 seconds")
    q = sess.writeStream.format("memory").queryName("sessions_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    # batch twin (same gap constant as q18) over the same corpus
    batch_events = load_table(spark, SF_DIR, "events")
    max_ts = batch_events.agg(F.max(F.unix_micros("ts"))).first()[0]
    # rebuild per-session start/end in batch to know which ones CLOSED:
    # a session is closed iff its end + gap <= max event time (watermark
    # reached past it after processAllAvailable with 0s delay).
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    l = batch_events.select("user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev"))
    new_s = F.when(
        F.col("prev").isNull() | ((F.unix_micros("ts") - F.unix_micros("prev")) > gap_sec * 1_000_000), 1
    ).otherwise(0)
    s = l.select(
        "user_id", "ts",
        F.sum(new_s).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("session_num"),
    )
    want_df = s.groupBy("user_id", "session_num").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
        F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000").alias("duration_sec"),
        F.max(F.unix_micros("ts")).alias("end_us"),
    )
    want = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec)
        for r in want_df.filter(F.col("end_us") + gap_sec * 1_000_000 <= max_ts).collect()
    }
    assert want, "corpus should contain closed sessions"
    assert got >= want, f"missing {len(want - got)} closed sessions"
    # nothing emitted that batch doesn't recognize as a session start
    all_sessions = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec) for r in want_df.collect()
    }
    assert got <= all_sessions


def test_native_session_window_matches_stateful_and_batch(spark):
    """The JVM-side session_window plan (the default for plain gap
    sessions) must emit exactly the closed sessions of both the
    pandas-state twin and the q18 batch recompute: same finalize rule
    (watermark past last event + gap), value-identical schema."""
    from real_time_data_engineering_spark.streaming.stateful import (
        sessionize_stream,
        sessionize_stream_native,
    )

    gap_sec = 1800

    def run_stream(factory, name):
        sess = factory(
            si.read_events_stream(spark, SF_DIR), gap_sec=gap_sec, watermark="0 seconds"
        )
        q = sess.writeStream.format("memory").queryName(name).outputMode("append").start()
        q.processAllAvailable()
        q.stop()
        return {
            (r.user_id, r.session_start, r.n_events, r.duration_sec)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    native = run_stream(sessionize_stream_native, "native_sessions_out")
    stateful = run_stream(sessionize_stream, "stateful_sessions_out")
    assert native, "corpus should contain closed sessions"
    # equal to the arbitrary-state twin → transitively equal to the
    # batch oracle (test above pins stateful == batch closed sessions)
    assert native == stateful


def test_progress_listener_observability(spark):
    """ST9: the listener must record per-batch rows and durations for a
    streaming run, and the health record must reconcile with the sink."""
    import time

    from real_time_data_engineering_spark.streaming import observe

    listener = observe.attach(spark)
    try:
        stream = si.read_events_stream(spark, SF_DIR)
        q = (
            stream.select("event_id")
            .writeStream.format("memory")
            .queryName("observe_out")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # listener events are delivered async; give the bus a moment
        deadline = time.time() + 10
        want = spark.sql("SELECT COUNT(*) FROM observe_out").first()[0]
        while time.time() < deadline and listener.log.rows_processed() < want:
            time.sleep(0.2)
        assert listener.log.rows_processed() == want
        h = listener.log.health()
        assert h["n_batches"] >= 1 and h["healthy"]
    finally:
        observe.detach(spark, listener)


def test_streaming_asof_enrich_equals_batch(spark, tmp_path):
    """Stream-side as-of enrichment (foreachBatch) must equal the batch
    as-of join over the same inputs — one operator, two execution modes."""
    from real_time_data_engineering_spark.operators.asof import asof_join

    stream = si.read_events_stream(spark, SF_DIR).select("event_id", "user_id", "ts")
    orders = load_table(spark, SF_DIR, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    kwargs = dict(
        left_time="ts",
        right_time="o_orderdate",
        by=[("user_id", "o_custkey")],
        right_cols=["o_orderkey"],
        tie_col="o_orderkey",
    )
    si.run_asof_enrich(
        stream, orders, str(tmp_path / "enriched"), str(tmp_path / "ckpt"), **kwargs
    )
    got = {
        (r.event_id, r.o_orderkey)
        for r in spark.read.parquet(str(tmp_path / "enriched")).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts")
    want = {(r.event_id, r.o_orderkey) for r in asof_join(ev, orders, **kwargs).collect()}
    assert got == want


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """ST3 restart semantics: after a restart with the same checkpoint,
    a newly-arrived file is processed exactly once and previously
    committed input is NOT reprocessed — the file-source offset log is
    the Kafka-offset analogue."""
    import json as _json

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    row = {
        "VendorID": 1,
        "tpep_pickup_datetime": "2024-01-08T10:00:00",
        "tpep_dropoff_datetime": "2024-01-08T10:30:00",
        "passenger_count": 1, "trip_distance": 1.0, "RatecodeID": 1,
        "store_and_fwd_flag": "N", "PULocationID": 1, "DOLocationID": 2,
        "payment_type": 1, "fare_amount": 10.0, "extra": 0.0, "mta_tax": 0.5,
        "tip_amount": 1.0, "tolls_amount": 0.0, "improvement_surcharge": 0.5,
        "total_amount": 12.0, "congestion_surcharge": 0.0, "Airport_fee": 0.0,
    }
    def mk(i):
        r = dict(row)
        r["tpep_pickup_datetime"] = f"2024-01-08T10:{i:02d}:00"
        return _json.dumps(r)

    (src_dir / "a.txt").write_text("\n".join(mk(i) for i in range(10)))
    paths = {k: str(tmp_path / k) for k in ("bronze", "silver", "dlq", "ckpt")}

    def run():
        source = si.read_file_stream(
            spark, str(src_dir), T.StructType([T.StructField("value", T.StringType())]), fmt="text"
        ).withColumnRenamed("text", "value")
        si.run_bronze_to_silver(
            spark, source, paths["bronze"], paths["silver"], paths["dlq"], paths["ckpt"]
        )

    run()
    assert spark.read.parquet(paths["bronze"]).count() == 10
    # "restart": new file lands, same checkpoint — only the delta flows
    (src_dir / "b.txt").write_text("\n".join(mk(20 + i) for i in range(7)))
    run()
    assert spark.read.parquet(paths["bronze"]).count() == 17
    assert spark.read.parquet(paths["silver"]).count() == 17


def test_kafka_record_shape_roundtrips_through_bronze(spark):
    """S2⇄S5 contract: producer record shaping (key = location id,
    value = ISO-8601 JSON) must round-trip through parse_bronze with
    typed timestamps and no DLQ diversions."""
    from real_time_data_engineering_spark.testing.taxi_datagen import generate_raw_trips

    raw = generate_raw_trips(spark, n_valid=50).filter(
        F.col("tpep_pickup_datetime").isNotNull() & F.col("tpep_dropoff_datetime").isNotNull()
    ).drop("ingestion_ts")
    records = si.to_kafka_records(raw, key_col="PULocationID")
    assert records.columns == ["key", "value"]
    # key carries the reference's partition key (per-zone ordering)
    assert records.filter(F.col("key").cast("int").isNull() & F.col("key").isNotNull()).count() == 0
    bronze, dead = si.parse_bronze(records)
    assert dead.count() == 0
    got = bronze.select("VendorID", "tpep_pickup_datetime", "fare_amount", "PULocationID")
    # the wire format is second-precision ISO-8601 (generator.py:52-57)
    want = raw.select(
        "VendorID",
        F.date_trunc("second", "tpep_pickup_datetime").alias("tpep_pickup_datetime"),
        "fare_amount",
        "PULocationID",
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_read_events_stream_handles_both_timestamp_resolutions(spark, tmp_path):
    """The corpus has shipped ts as TIMESTAMP(NANOS) and as
    TIMESTAMP(MICROS); read_events_stream must yield identical event
    time for both (regression: a micros corpus read through the nanos
    path lands every event in 1970 and no window ever closes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros
    ids = list(range(4))
    us = [base_us + i * 60_000_000 for i in ids]
    for sub, typ, vals in (
        ("micros", pa.timestamp("us"), us),
        ("nanos", pa.timestamp("ns"), [v * 1000 for v in us]),
    ):
        d = tmp_path / sub
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(vals, typ),
                "user_id": pa.array(ids, pa.int64()),
                "event_type": pa.array(["a"] * 4),
                "value": pa.array([1.0] * 4),
                "props": pa.array(["{}"] * 4),
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))

    def collect_ts(sf_dir):
        stream = si.read_events_stream(spark, sf_dir)
        name = f"res_{sf_dir.split('/')[-1]}"
        q = (
            stream.select("event_id", "ts")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return {
            (r.event_id, r.ts) for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    a = collect_ts(str(tmp_path / "micros"))
    b = collect_ts(str(tmp_path / "nanos"))
    assert a == b and len(a) == 4
    years = {ts.year for _, ts in a}
    assert years == {2024}, years


def test_streaming_neardup_filter_matches_batch(spark, tmp_path):
    """The stateful MinHash dedup filter must flag EXACTLY the docs the
    batch candidate ladder flags (a doc with an earlier bucket-mate at
    est_jaccard >= threshold), with identical best estimates."""
    from real_time_data_engineering_spark.operators import dedup as D
    from real_time_data_engineering_spark.streaming.stateful import neardup_filter_stream

    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(150)
    dup = base.unionByName(
        base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    src = str(tmp_path / "docs_stream")
    dup.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(dup.schema).parquet(src)
    flagged = neardup_filter_stream(stream, threshold=0.5)
    q = (
        flagged.writeStream.format("memory")
        .queryName("neardup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got_rows = spark.sql("SELECT * FROM neardup_out").collect()
    got = {}
    for r in got_rows:
        got[r.doc_id] = max(got.get(r.doc_id, 0.0), r.est_jaccard)

    # batch twin: flag d iff an earlier doc shares a band bucket with
    # full-signature est >= threshold; best estimate = max over those
    cand = D.minhash_candidate_pairs(dup.cache()).filter(F.col("est_jaccard") >= 0.5)
    want = {
        r.d2: r.best
        for r in cand.groupBy("d2").agg(F.max("est_jaccard").alias("best")).collect()
    }
    assert set(got) == set(want), (
        f"flag sets differ: stream-only={set(got) - set(want)} batch-only={set(want) - set(got)}"
    )
    for d, est in want.items():
        assert abs(got[d] - est) < 1e-12, (d, got[d], est)
    # every planted copy must be flagged (est 1.0 against its original)
    for r in base.collect():
        assert got.get(r.doc_id + 100000) == 1.0


def test_streaming_neardup_state_survives_micro_batches(spark, tmp_path):
    """Same contract across TWO micro-batches: originals arrive first,
    copies arrive in a later file — every copy must be flagged against
    state persisted from the earlier batch."""
    from real_time_data_engineering_spark.streaming.stateful import neardup_filter_stream

    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(80)
    src = tmp_path / "docs_stream2"
    base.coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))
    base.select((F.col("doc_id") + 100000).alias("doc_id"), "text").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    flagged = neardup_filter_stream(stream, threshold=0.5)
    q = (
        flagged.writeStream.format("memory")
        .queryName("neardup_mb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: r.est_jaccard for r in spark.sql("SELECT * FROM neardup_mb").collect()}
    for r in base.collect():
        assert got.get(r.doc_id + 100000) == 1.0, f"copy of {r.doc_id} not flagged cross-batch"


def test_streaming_neardup_state_survives_restart(spark, tmp_path):
    """Stop the query after the originals, RESTART from the checkpoint,
    then stream the copies: flags must come from state recovered off
    the state store, not from anything in-memory."""
    from real_time_data_engineering_spark.streaming.stateful import neardup_filter_stream

    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    src = tmp_path / "docs_stream3"
    ck = str(tmp_path / "ck3")
    base.coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))

    out = str(tmp_path / "flags_out")

    def run_once():
        # memory sink does not support checkpoint recovery; a file sink
        # is the fault-tolerant shape a real pipeline uses anyway
        stream = spark.readStream.schema(base.schema).parquet(str(src / "b*"))
        q = (
            neardup_filter_stream(stream, threshold=0.5)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    base.select((F.col("doc_id") + 100000).alias("doc_id"), "text").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b1"))
    run_once()
    got = {r.doc_id: r.est_jaccard for r in spark.read.parquet(out).collect()}
    for r in base.collect():
        assert got.get(r.doc_id + 100000) == 1.0, f"copy of {r.doc_id} not flagged after restart"


def test_streaming_neardup_retention_evicts_expired_entries(spark, tmp_path):
    """Event-time retention: with retention_sec set, a stored signature
    older than the horizon (relative to the bucket's newest event) is
    evicted on the data path, so a late copy dedups only against the
    retained window. Within-horizon behavior is unchanged. Fully
    deterministic — event time drives everything, no wall clock."""
    from real_time_data_engineering_spark.streaming.stateful import neardup_filter_stream

    schema = "doc_id long, ts string, text string"
    doc_x = "the quick brown fox jumps over the lazy dog again and again tonight"
    rows_by_batch = [
        [(1, "2024-01-01 10:00:00", doc_x)],  # original
        [(2, "2024-01-01 10:30:00", doc_x)],  # copy INSIDE the 1h horizon
        [(3, "2024-01-01 12:01:00", doc_x)],  # copy past the horizon of 1 and 2
    ]
    src = tmp_path / "docs_ret"
    for i, rows in enumerate(rows_by_batch):
        df = spark.createDataFrame(rows, schema).select(
            "doc_id", F.to_timestamp("ts").alias("ts"), "text"
        )
        df.coalesce(1).write.parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    flagged = neardup_filter_stream(stream, threshold=0.5, retention_sec=3600)
    q = (
        flagged.writeStream.format("memory")
        .queryName("neardup_ret")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ret"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: r.dup_of for r in spark.sql("SELECT * FROM neardup_ret").collect()}
    assert got.get(2) == 1, "copy within the horizon must flag against the original"
    assert 3 not in got, "copy past the horizon must NOT flag (both entries evicted)"
    spark.catalog.dropTempView("neardup_ret")


def test_stream_stream_attribution_join_equals_batch(spark, tmp_path):
    """ST superset: watermarked stream-stream inner join (view->click
    attribution in a 1h window) over file streams equals the identical
    batch join — and the plan is a StreamingSymmetricHashJoin with
    state watermarks, not an unbounded buffer."""
    from real_time_data_engineering_spark.streaming.stateful import (
        attribution_join_stream,
    )

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts", "event_type")
    views_b = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("ts"), F.col("event_id").alias("view_id")
    )
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ts"), F.col("event_id").alias("click_id")
    )
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views_b.write.parquet(vdir)
    clicks_b.write.parquet(cdir)

    vs = spark.readStream.schema(views_b.schema).parquet(vdir)
    cs = spark.readStream.schema(clicks_b.schema).parquet(cdir)
    joined = attribution_join_stream(vs, cs, window_sec=3600)
    # no ambiguous columns: one user_id, view-side ts keeps its name,
    # click-side ts is disambiguated — select("ts") must not raise
    assert joined.columns.count("ts") == 1 and "click_ts" in joined.columns
    joined.select("ts", "click_ts")
    q = (
        joined.select("user_id", "view_id", "click_id")
        .writeStream.format("memory")
        .queryName("attr_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.view_id, r.click_id)
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }

    cond = (
        (views_b.user_id == clicks_b.user_id)
        & (clicks_b.ts > views_b.ts)
        & (clicks_b.ts <= views_b.ts + F.expr("INTERVAL 3600 SECONDS"))
    )
    want = {
        (r.user_id, r.view_id, r.click_id)
        for r in views_b.alias("v")
        .join(clicks_b.alias("c"), cond, "inner")
        .select(F.col("v.user_id"), "view_id", "click_id")
        .collect()
    }
    assert got == want and got, "attribution join must produce matches"


def test_streaming_drift_monitor_equals_batch_ks(spark, tmp_path):
    """The drift monitor's verdict after the final micro-batch must equal
    the batch KS (q46 machinery) over everything streamed so far."""
    from real_time_data_engineering_spark.operators.quality import exact_ks_counts

    ev = load_table(spark, SF_DIR, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("v")

    def counts(df):
        return df.select(cents).groupBy("v").agg(F.count("*").alias("cnt"))

    reference = counts(ev.filter(F.col("event_type") == "view"))

    # stream the purchase values in two chunks → two micro-batches
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "value")
    src = tmp_path / "purchase_stream"
    half = purchases.count() // 2
    purchases.filter(F.col("event_id") % 2 == 0).write.parquet(str(src / "chunk0"))
    purchases.filter(F.col("event_id") % 2 == 1).write.parquet(str(src / "chunk1"))
    stream = (
        spark.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .select(cents)
    )
    out = tmp_path / "drift_log"
    q = si.drift_monitor_stream(stream, reference, str(out)).start()
    q.processAllAvailable()
    q.stop()

    log = spark.read.parquet(str(out)).collect()
    assert len(log) >= 1  # one verdict per micro-batch
    last = max(log, key=lambda r: r.batch_id)
    want = exact_ks_counts(counts(purchases), reference).collect()[0]
    assert (last.n_a, last.n_b, last.d_num) == (want.n_a, want.n_b, want.d_num)
    assert last.ks_d == want.ks_d and last.drift == want.drift
    # intermediate verdicts ran on partial data: monotone sample growth
    assert min(r.n_a for r in log) <= last.n_a
    assert half > 0


def test_streaming_cm_sketch_appends_equal_batch(spark, tmp_path):
    """A Count-Min sketch maintained by per-micro-batch appends
    (foreachBatch over an availableNow file stream) must equal the
    all-at-once batch sketch EXACTLY: counter cells are sums, so
    micro-batch partials merge associatively — the d43 shard-union
    contract driven from a stream, with bounded state (d*w counters)
    regardless of how many batches arrive."""
    from real_time_data_engineering_spark.operators import sketches as sk

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src)

    def toks(df):
        return df.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("term")
        )

    sketch_dir = str(tmp_path / "sketch")
    seen = {"batches": 0}

    def commit(batch_df, batch_id):
        counters = sk.cm_sketch(toks(batch_df), d=4, w=256)
        if seen["batches"] == 0:
            sk.write_cm_sketch(counters, sketch_dir)
        else:
            sk.append_cm_sketch(counters, sketch_dir)
        seen["batches"] += 1

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(commit)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen["batches"] > 1  # the associativity claim needs >1 merge
    got = {
        (r.i, r.bucket, r.c) for r in sk.read_cm_sketch(spark, sketch_dir).collect()
    }
    want = {(r.i, r.bucket, r.c) for r in sk.cm_sketch(toks(docs), d=4, w=256).collect()}
    assert got == want and got
