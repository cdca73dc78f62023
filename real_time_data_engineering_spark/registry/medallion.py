"""Medallion + multimodal queries over the driver corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..operators import gold as G
from ..operators import multimodal as M
from ..sources.readers import load_table
from . import register


# ---------------------------------------------------------------------------
# m1/m2 oracles. The media payload is the utf-8 byte encoding of `text`
# (synthesize_media_from_documents) and the feature/resize fakes are
# pure byte arithmetic, so DuckDB can mirror them exactly by walking
# the payload's hex rendering two characters (= one byte) at a time:
# hex(encode(text)) renders identically on both engines (verified:
# uppercase, no separators), and strpos over a nibble alphabet converts
# each pair back to its byte value. Everything downstream is exact-int
# accumulation + one float64 divide — the repo-wide parity shape. The
# REAL codec kernels (PIL/ffmpeg) stay documented stubs; what the
# oracle checks is the Spark-side plumbing and the deterministic fake
# the tests run on.
# ---------------------------------------------------------------------------
_NIBBLES = "'0123456789ABCDEF'"

_M_PAYLOAD_BYTES = f"""
WITH pay AS (
  SELECT doc_id AS media_id, 'image' AS kind, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE octet_length(encode(text)) > 0
), bytes AS (
  SELECT media_id, i,
         (strpos({_NIBBLES}, substr(hx, 2 * i - 1, 1)) - 1) * 16
       + (strpos({_NIBBLES}, substr(hx, 2 * i, 1)) - 1) AS b
  FROM pay, unnest(generate_series(1, n)) AS t(i)
)"""

_M1_ORACLE = (
    _M_PAYLOAD_BYTES
    + """, agg AS (
  SELECT media_id, CAST(SUM(b) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS nb
  FROM bytes GROUP BY 1
), vec AS (
  SELECT media_id, CAST((i - 1) % 8 AS INT) AS pos, CAST(SUM(b) AS BIGINT) AS acc
  FROM bytes GROUP BY 1, 2
)
SELECT p.media_id, p.kind,
       a.nb AS n_bytes,
       a.total % 2147483648 AS checksum,
       CAST(a.total AS DOUBLE) / CAST(a.nb AS DOUBLE) AS mean_byte,
       v.pos,
       CAST(v.acc AS DOUBLE) / CAST(a.nb AS DOUBLE) AS feature
FROM pay p
JOIN agg a ON a.media_id = p.media_id
JOIN vec v ON v.media_id = p.media_id
"""
)


@register(
    "m1_media_features",
    _M1_ORACLE,
    doc="Arrow-batched feature extraction over an opaque binary media column "
    "(real codec decode stubbed — no codecs in container; plumbing real). "
    "Value-checked: the registered projection explodes the feature vector "
    "to (pos, feature) rows and DuckDB recomputes every byte-level stat "
    "from the payload's hex rendering.",
)
def m1_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Empty payloads are excluded on BOTH sides (here and the oracle's
    # `WHERE octet_length(...) > 0`): the fake kernel emits zeroed
    # features for b'' while SQL aggregation over zero bytes yields no
    # row — filtering identically removes that undefined edge.
    media = M.synthesize_media_from_documents(docs).filter(F.length("payload") > 0)
    feats = M.extract_features(media, dim=8)
    # Registered projection explodes the vector: one (pos, feature) row
    # per dimension, plain doubles — hashable by the driver and
    # value-comparable against SQL, unlike a JSON-rendered float array
    # (cross-engine float-to-string rendering is not stable). Downstream
    # consumers use extract_features directly for the typed array.
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "checksum",
        "mean_byte",
        F.posexplode("feature_vec").alias("pos", "feature"),
    )


_M2_ORACLE = """
WITH pay AS (
  SELECT doc_id AS media_id, 'image' AS kind, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE octet_length(encode(text)) > 0
), sel AS (
  SELECT media_id, i, substr(hx, 2 * ((i * n) // 1024) + 1, 2) AS hp
  FROM pay, unnest(generate_series(0, 1023)) AS t(i)
), rez AS (
  SELECT media_id, string_agg(hp, '' ORDER BY i) AS payload_hex
  FROM sel GROUP BY 1
)
SELECT p.media_id, p.kind,
       CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
       CAST(1024 AS INT) AS n_bytes,
       r.payload_hex
FROM pay p JOIN rez r ON r.media_id = p.media_id
"""


@register(
    "m2_media_resize",
    _M2_ORACLE,
    doc="Arrow-batched image resize over the opaque binary payload "
    "(pixel kernel is the documented deterministic byte-resampler stand-in "
    "— container lacks codecs; batch mechanics, pruned input and output "
    "contract are the real plumbing). Value-checked: DuckDB rebuilds the "
    "index-scaled resample from the payload's hex rendering and compares "
    "the full resized payload hex-for-hex.",
)
def m2_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Empty payloads excluded identically to the oracle (index-scaled
    # resample of b'' is b'', but the oracle's fixed-1024 window assumes
    # a non-empty source) — see m1's note.
    media = M.synthesize_media_from_documents(docs).filter(F.length("payload") > 0)
    resized = M.resize_images(media, width=32, height=32)
    # registered projection renders the payload as hex (exact, both
    # engines render identically); consumers use resize_images directly
    return resized.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.length("payload").alias("n_bytes"),
        F.hex("payload").alias("payload_hex"),
    )


# ---------------------------------------------------------------------------
# q24 — SCD Type-2 snapshot history (dbt "check" strategy,
# snap_locations.sql:13-26). Two deterministic loads derived from the
# customer dim: load 2 adds keys (custkey%7==0), drops keys
# (custkey%13==0, which stay OPEN — dbt keeps rows missing from the
# source), and rewrites mktsegment for custkey%10==0 (closed old
# version + fresh open version). The oracle enumerates the same
# lifecycle outcomes set-algebraically.
# ---------------------------------------------------------------------------

_T1, _T2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"

_Q24_ORACLE = """
WITH dim AS (
  SELECT c_custkey AS custkey, c_mktsegment AS mktsegment,
         CAST(c_nationkey AS VARCHAR) AS nation
  FROM customer
), v1 AS (
  SELECT * FROM dim WHERE custkey % 7 <> 0
), v2 AS (
  SELECT custkey,
         CASE WHEN custkey % 10 = 0 THEN 'RELOCATED' ELSE mktsegment END AS mktsegment,
         nation
  FROM dim WHERE custkey % 13 <> 0
), changed AS (
  SELECT v1.custkey FROM v1 JOIN v2 USING (custkey)
  WHERE v1.mktsegment <> v2.mktsegment OR v1.nation <> v2.nation
)
SELECT custkey, mktsegment, nation,
       '2024-01-01 00:00:00.000000' AS valid_from,
       CAST(NULL AS VARCHAR) AS valid_to
FROM v1 WHERE custkey NOT IN (SELECT custkey FROM changed)
UNION ALL
SELECT custkey, mktsegment, nation,
       '2024-01-01 00:00:00.000000' AS valid_from,
       '2024-02-01 00:00:00.000000' AS valid_to
FROM v1 WHERE custkey IN (SELECT custkey FROM changed)
UNION ALL
SELECT custkey, mktsegment, nation,
       '2024-02-01 00:00:00.000000' AS valid_from,
       CAST(NULL AS VARCHAR) AS valid_to
FROM v2 WHERE custkey IN (SELECT custkey FROM changed)
   OR custkey NOT IN (SELECT custkey FROM v1)
"""


@register("q24_scd2_history", _Q24_ORACLE)
def q24_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 snapshot after two loads: open/closed version history."""
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_nationkey").cast("string").alias("nation"),
    )
    v1 = dim.filter(F.col("custkey") % 7 != 0)
    v2 = dim.filter(F.col("custkey") % 13 != 0).withColumn(
        "mktsegment",
        F.when(F.col("custkey") % 10 == 0, F.lit("RELOCATED")).otherwise(F.col("mktsegment")),
    )
    keyed = dict(key_col="custkey", check_cols=("mktsegment", "nation"))
    snap = G.scd2_snapshot(v2, G.scd2_snapshot(v1, None, _T1, **keyed), _T2, **keyed)
    return snap.select(
        "custkey",
        "mktsegment",
        "nation",
        F.date_format("dbt_valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.date_format("dbt_valid_to", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_to"),
    )


_M3_ORACLE = """
WITH pay AS (
  SELECT doc_id AS media_id, 'image' AS kind, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
), fr AS (
  SELECT media_id, kind,
         CAST(f AS INT) AS frame_idx,
         CAST(n // 256 AS INT) AS n_frames,
         substr(hx, f * 512 + 1, 512) AS frame_hex
  FROM pay, unnest(generate_series(0, greatest(n // 256 - 1, 0))) AS t(f)
  WHERE n // 256 > 0 AND f % 4 = 0
)
SELECT media_id, kind, frame_idx, n_frames, frame_hex FROM fr
"""


@register(
    "m3_frame_sample",
    _M3_ORACLE,
    doc="Video frame sampling over the opaque binary payload (real "
    "decoder needs ffmpeg — absent; the deterministic stand-in emits "
    "every 4th 256-byte frame granule). Plumbing real: Arrow-batched "
    "mapInPandas, pruned input, one row per sampled frame. "
    "Value-checked: DuckDB slices the same frames out of the payload's "
    "hex rendering (one frame = 512 hex chars).",
)
def m3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_from_documents(docs)
    frames = M.sample_frames(media, every_n=4)
    # registered projection renders the frame as hex (exact both engines)
    return frames.select(
        "media_id", "kind", "frame_idx", "n_frames", F.hex("frame").alias("frame_hex")
    )
