"""Fingerprint-gated idempotent index builds.

Every persisted index in this engine (IVF-PQ codes, the BM25 inverted
index, the MinHash band index) is DETERMINISTIC in (corpus,
parameters): rebuilding over the same inputs yields value-identical
artifacts. That makes "is the index current?" decidable by comparing a
cheap corpus digest + the build parameters against a stamp written
with the artifacts — the write-once/serve-many production shape, where
readers pay one narrow aggregation instead of a retrain/re-tokenize.

Protocol (crash-safe by ordering):

* a real build DELETES the stamp first, writes every artifact, then
  stamps LAST — a crash mid-build can never leave a passing stamp over
  half-written artifacts;
* APPENDS delete the stamp before mutating — an appended index serves
  MORE than the stamped corpus, so a later ``skip_if_current`` build
  against the original corpus must rebuild, not skip;
* the digest is duplicate-sensitive and order-independent: row count
  plus the DECIMAL(38,0) sum of per-row ``xxhash64`` (an XOR fold
  would cancel any repeated row to zero; decimal summation is exact
  and partition-order independent at any corpus size).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAMP_DIR = "_meta"

# Bumped on ANY persisted-index layout or build-algorithm change (centroid
# delta rows, _meta schema, posting clustering, code layout, ...).  Stamped
# into every writer's params so a code upgrade can never silently serve an
# old-format on-disk index whose (corpus, params) still match.
INDEX_FORMAT_VERSION = 2


def corpus_fingerprint(df: DataFrame, cols: tuple[str, ...]) -> tuple[int, str]:
    """Order-independent exact corpus digest over ``cols``: (row count,
    decimal sum of per-row xxhash64). One narrow agg scan — the cheap
    freshness probe that stands in for a rebuild."""
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(28,0)")).alias("h"),
    ).first()
    return int(row["n"]), str(row["h"])


class BuildStamp:
    """The ``_meta`` stamp for one index root.

    Usage at the top of a writer with ``skip_if_current``::

        stamp = BuildStamp(spark, path, params, corpus, ("doc_id", "text"))
        if skip_if_current and stamp.is_current():
            return
        stamp.invalidate()   # before any artifact write
        ...build...
        if skip_if_current:
            stamp.write()    # after every artifact landed

    The corpus fingerprint is computed at most once per instance.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        params: dict,
        df: DataFrame,
        cols: tuple[str, ...],
    ) -> None:
        self.spark = spark
        self.meta_path = os.path.join(path, STAMP_DIR)
        self.params_json = json.dumps(
            {**params, "__format_version__": INDEX_FORMAT_VERSION}, sort_keys=True
        )
        self._df = df
        self._cols = cols
        self._fp: tuple[int, str] | None = None

    def _fingerprint(self) -> tuple[int, str]:
        if self._fp is None:
            self._fp = corpus_fingerprint(self._df, self._cols)
        return self._fp

    def is_current(self) -> bool:
        if not os.path.isdir(self.meta_path):
            return False
        try:
            stamp = self.spark.read.parquet(self.meta_path).first()
        except Exception:
            return False  # unreadable stamp → rebuild
        if stamp is None or stamp["params"] != self.params_json:
            return False
        n, h = self._fingerprint()
        return int(stamp["n"]) == n and stamp["h"] == h

    def invalidate(self) -> None:
        shutil.rmtree(self.meta_path, ignore_errors=True)

    def write(self) -> None:
        n, h = self._fingerprint()
        self.spark.createDataFrame(
            [(self.params_json, n, h)], "params string, n bigint, h string"
        ).coalesce(1).write.mode("overwrite").parquet(self.meta_path)


def invalidate_stamp(path: str) -> None:
    """Drop an index root's stamp (the append-path obligation)."""
    shutil.rmtree(os.path.join(path, STAMP_DIR), ignore_errors=True)
