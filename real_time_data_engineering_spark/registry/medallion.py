"""Medallion + multimodal queries over the driver corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    return M.extract_features(media, dim=8)
