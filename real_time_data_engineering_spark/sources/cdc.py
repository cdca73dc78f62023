"""CDC envelope parsing (reference ST7/S14: Debezium over Kafka).

The reference's CDC pipeline registers a Debezium Postgres connector
(register-connector.json:4-21) and parses the envelope in Flink SQL
with JSON_VALUE (06-silver-cdc.sql:58-90): keep op ∈ (c, r, u), drop
deletes, extract the after-image, convert epoch-microsecond timestamps.
Here that's one `from_json` + filter + projection — fully declarative,
so Catalyst pushes whatever it can into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

UPSERT_OPS = ("c", "r", "u")  # create, read(snapshot), update — deletes dropped


def parse_envelope(df: DataFrame, payload_col: str, schema: T.StructType) -> DataFrame:
    """payload JSON string → (before, after, op, ts_ms) columns."""
    return df.withColumn("_env", F.from_json(F.col(payload_col), schema)).select(
        "*", F.col("_env.before").alias("before"), F.col("_env.after").alias("after"),
        F.col("_env.op").alias("op"), F.col("_env.ts_ms").alias("ts_ms"),
    ).drop("_env")


def apply_upserts(parsed: DataFrame) -> DataFrame:
    """Keep creates/reads/updates; surface the after-image columns."""
    kept = parsed.filter(F.col("op").isin(*UPSERT_OPS) & F.col("after").isNotNull())
    return kept.select("op", "ts_ms", F.col("after.*"))


def micros_to_ts(c: Column | str) -> Column:
    """Debezium epoch-µs → timestamp (06-silver-cdc.sql:79-86)."""
    return F.timestamp_micros(F.col(c) if isinstance(c, str) else c)


def materialize_latest(
    parsed: DataFrame,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
) -> DataFrame:
    """Replay a keyed change stream to final table state: the latest op
    per key wins (ordered by ``order_cols`` descending, which must end
    in a unique tie-break), and keys whose latest op is a delete drop
    out — the Hudi/Delta MERGE-with-delete semantics expressed as one
    window. Shuffles once on the entity key; at scale that is the same
    partitioning the storage-side MERGE would use.

    Requires every record (deletes included) to carry ``key_cols`` in
    the after-image; for Debezium feeds where deletes have after=null,
    coalesce the key from the before-image upstream first.
    """
    from pyspark.sql import Window

    flat = parsed.select("op", "ts_ms", F.col("after.*"))
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    latest = flat.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    return latest.filter(F.col("op") != "d").drop("op")
