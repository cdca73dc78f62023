"""Medallion + multimodal queries over the driver corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..operators import gold as G
from ..operators import multimodal as M
from ..sources.readers import load_table
from . import register


@register(
    "m1_media_features",
    None,
    doc="Arrow-batched feature extraction over an opaque binary media column "
    "(decode kernels stubbed — no codecs in container; plumbing real). "
    "Rows-only check: mapInPandas output is not SQL-expressible in DuckDB.",
)
def m1_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_from_documents(docs)
    feats = M.extract_features(media, dim=8)
    # Registered projection serializes the vector: the driver's
    # canonicalizer hashes row values and array columns are unhashable.
    # Downstream consumers use extract_features directly for the typed
    # array<float> column.
    return feats.withColumn("feature_vec", F.to_json("feature_vec"))


@register(
    "m2_media_resize",
    None,
    doc="Arrow-batched image resize over the opaque binary payload "
    "(pixel kernel is the documented deterministic byte-resampler stand-in "
    "— container lacks codecs; batch mechanics, pruned input and output "
    "contract are the real plumbing). Rows-only check: binary kernel "
    "output is not SQL-expressible in DuckDB.",
)
def m2_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_from_documents(docs)
    resized = M.resize_images(media, width=32, height=32)
    # registered projection digests the payload to scalars (driver
    # canonicalizer contract; consumers use resize_images directly)
    return resized.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
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
