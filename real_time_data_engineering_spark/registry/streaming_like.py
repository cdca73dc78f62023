"""Streaming-semantics operators in batch-checkable form.

Structured Streaming's contract is that a micro-batch computes the same
answer as a batch run over the same rows — so each streaming operator
(CDC apply, sessionization, tumbling rollup) registers here in its
batch form with a DuckDB oracle, while tests/test_streaming.py drives
the *same* functions through readStream + memory sinks and asserts the
streaming result equals the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.parity import money, ts_str
from ..sources.readers import load_table
from . import register

# ---------------------------------------------------------------------------
# q17 — CDC envelope apply (reference ST7, 06-silver-cdc.sql:58-90).
# Debezium-shaped JSON is synthesized deterministically from `events`
# (string concat — identical bytes on both engines), then parsed, deletes
# dropped, after-image extracted, epoch-µs converted.
# ---------------------------------------------------------------------------

_OP_CASE_SPARK = (
    "CASE event_type WHEN 'signup' THEN 'c' WHEN 'view' THEN 'r' "
    "WHEN 'error' THEN 'd' ELSE 'u' END"
)

_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("before", T.StringType()),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("event_id", T.LongType()),
                    T.StructField("user_id", T.LongType()),
                    T.StructField("value", T.StringType()),
                    T.StructField("ts_us", T.LongType()),
                ]
            ),
        ),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

_Q17_ORACLE = """
WITH env AS (
  SELECT '{"before":null,"after":{"event_id":' || CAST(event_id AS VARCHAR)
         || ',"user_id":' || CAST(user_id AS VARCHAR)
         || ',"value":"' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR)
         || '","ts_us":' || CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR)
         || '},"op":"' || (CASE event_type WHEN 'signup' THEN 'c' WHEN 'view' THEN 'r'
                            WHEN 'error' THEN 'd' ELSE 'u' END)
         || '","ts_ms":' || CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS VARCHAR) || '}'
         AS payload
  FROM events
), parsed AS (
  SELECT json_extract_string(payload, '$.op') AS op,
         CAST(json_extract_string(payload, '$.ts_ms') AS BIGINT) AS ts_ms,
         CAST(json_extract_string(payload, '$.after.event_id') AS BIGINT) AS event_id,
         CAST(json_extract_string(payload, '$.after.user_id') AS BIGINT) AS user_id,
         json_extract_string(payload, '$.after.value') AS value_str,
         CAST(json_extract_string(payload, '$.after.ts_us') AS BIGINT) AS ts_us
  FROM env
)
SELECT event_id, user_id, op, ts_ms,
       CAST(CAST(value_str AS DECIMAL(12,2)) AS DOUBLE) AS value,
       strftime(make_timestamp(ts_us), '%Y-%m-%d %H:%M:%S.%f') AS event_time
FROM parsed
WHERE op IN ('c', 'r', 'u')
"""


def _synth_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-shaped JSON payloads synthesized from `events` — byte-
    identical to the oracle's string concat."""
    from ..sources.readers import ensure_min_partitions

    # JSON synth + from_json is CPU-heavy narrow work; fan the compact
    # single-row-group scan out to all cores (no-op on real splits).
    e = ensure_min_partitions(load_table(spark, sf_dir, "events"))
    us = F.unix_micros("ts")
    payload = F.concat(
        F.lit('{"before":null,"after":{"event_id":'),
        F.col("event_id").cast("string"),
        F.lit(',"user_id":'),
        F.col("user_id").cast("string"),
        F.lit(',"value":"'),
        money("value").cast("string"),
        F.lit('","ts_us":'),
        us.cast("string"),
        F.lit('},"op":"'),
        F.expr(_OP_CASE_SPARK),
        F.lit('","ts_ms":'),
        F.expr("unix_micros(ts) div 1000").cast("string"),
        F.lit("}"),
    )
    return e.select(payload.alias("payload"))


@register("q17_cdc_apply", _Q17_ORACLE)
def q17_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium envelope parse → upsert stream (deletes dropped)."""
    from ..sources.cdc import apply_upserts, micros_to_ts, parse_envelope

    env = _synth_envelope(spark, sf_dir)
    applied = apply_upserts(parse_envelope(env, "payload", _ENVELOPE_SCHEMA))
    return applied.select(
        "event_id",
        "user_id",
        "op",
        "ts_ms",
        F.col("value").cast("decimal(12,2)").cast("double").alias("value"),
        ts_str(micros_to_ts("ts_us")).alias("event_time"),
    )


# ---------------------------------------------------------------------------
# q18 — sessionization with a 30-minute inactivity gap (the batch twin of
# streaming session windows; lag + cumulative-flag pattern).
# ---------------------------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000

_Q18_ORACLE = f"""
WITH l AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), f AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev IS NULL
                   OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(prev AS TIMESTAMP)) > {_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM l
), s AS (
  SELECT user_id, ts, event_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_num
  FROM f
)
SELECT user_id, CAST(session_num AS BIGINT) AS session_num,
       COUNT(*) AS n_events,
       CAST((epoch_us(CAST(MAX(ts) AS TIMESTAMP)) - epoch_us(CAST(MIN(ts) AS TIMESTAMP))) // 1000000
            AS BIGINT) AS duration_sec
FROM s
GROUP BY 1, 2
"""


@register("q18_sessionization", _Q18_ORACLE)
def q18_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag → new-session flag → running count."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = e.select("user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev"))
    new_s = F.when(
        F.col("prev").isNull() | ((F.unix_micros("ts") - F.unix_micros("prev")) > _GAP_US), 1
    ).otherwise(0)
    s = l.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_num"),
    )
    return s.groupBy("user_id", "session_num").agg(
        F.count("*").alias("n_events"),
        F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000").alias("duration_sec"),
    )


# ---------------------------------------------------------------------------
# q19 — tumbling hourly rollup (reference A6, the Druid ingest-time cube)
# in batch form; the streaming twin (F.window + watermark) is asserted
# equal in tests/test_streaming.py.
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("q19_hourly_rollup", _Q19_ORACLE)
def q19_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window × event_type cube (F.window in batch)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# q25 — sliding (hopping) 1-hour window, 15-minute slide: each event
# lands in exactly 4 epoch-aligned windows. The oracle fans each event
# out to its 4 window starts explicitly (floor-to-15-min minus k*15min,
# k=0..3) — the set-algebraic definition of Spark's window(ts, 1h, 15m).
# Streaming twin (watermarked hopping window) asserted equal in
# tests/test_streaming.py.
# ---------------------------------------------------------------------------

_Q25_ORACLE = """
WITH ev AS (
  SELECT CAST(ts AS TIMESTAMP) AS t, event_type,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events
), fanned AS (
  SELECT to_timestamp(CAST(floor(epoch(t) / 900) AS BIGINT) * 900
             - k.k * 900) AS ws,
         event_type, v
  FROM ev CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) AS k
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(v) AS DOUBLE) AS total_value
FROM fanned
GROUP BY 1, 2
"""


@register("q25_sliding_rollup", _Q25_ORACLE)
def q25_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping 1h/15min window × event_type cube (F.window in batch)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# q26 — CDC materialization WITH deletes: replay the keyed change stream
# to final table state. Latest op per user_id wins (ts_ms DESC,
# event_id DESC tie-break); users whose latest op is a delete ('error'
# events map to op='d') drop out — Hudi/Delta MERGE-with-delete
# semantics as one declarative window over the parsed envelope.
# ---------------------------------------------------------------------------

_Q26_ORACLE = """
WITH env AS (
  SELECT '{"before":null,"after":{"event_id":' || CAST(event_id AS VARCHAR)
         || ',"user_id":' || CAST(user_id AS VARCHAR)
         || ',"value":"' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR)
         || '","ts_us":' || CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR)
         || '},"op":"' || (CASE event_type WHEN 'signup' THEN 'c' WHEN 'view' THEN 'r'
                            WHEN 'error' THEN 'd' ELSE 'u' END)
         || '","ts_ms":' || CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS VARCHAR) || '}'
         AS payload
  FROM events
), parsed AS (
  SELECT json_extract_string(payload, '$.op') AS op,
         CAST(json_extract_string(payload, '$.ts_ms') AS BIGINT) AS ts_ms,
         CAST(json_extract_string(payload, '$.after.event_id') AS BIGINT) AS event_id,
         CAST(json_extract_string(payload, '$.after.user_id') AS BIGINT) AS user_id,
         json_extract_string(payload, '$.after.value') AS value
  FROM env
), latest AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts_ms DESC, event_id DESC) AS rn
  FROM parsed
)
SELECT user_id, event_id AS last_event_id, ts_ms AS last_ts_ms,
       CAST(value AS DOUBLE) AS last_value
FROM latest WHERE rn = 1 AND op <> 'd'
"""


@register("q26_cdc_materialize", _Q26_ORACLE)
def q26_cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC replay to final state: latest op per key, deletes applied."""
    from ..sources.cdc import materialize_latest, parse_envelope

    env = _synth_envelope(spark, sf_dir)
    parsed = parse_envelope(env, "payload", _ENVELOPE_SCHEMA)
    state = materialize_latest(parsed, ("user_id",), ("ts_ms", "event_id"))
    return state.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts_ms").alias("last_ts_ms"),
        F.col("value").cast("double").alias("last_value"),
    )
