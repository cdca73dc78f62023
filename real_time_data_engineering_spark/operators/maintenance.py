"""Storage maintenance: compaction, file sizing, sort-on-write.

The reference runs nightly Iceberg maintenance (rewrite_data_files
binpack + sort by pickup_date, snapshot expiry, orphan cleanup —
Makefile:186-221, iceberg_maintenance_dag.py:30-80). On plain parquet
the same capability is: measure the file-size histogram, rewrite
undersized layouts to ~target-size files (optionally clustered on a
key for min/max pruning), and swap atomically.

Scale note: compaction is itself a big job at 100 TB — the rewrite
reads and rewrites only the partitions whose small-file count crosses
the threshold (pass `partition_filter`), never the whole lake.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def table_stats(path: str) -> dict:
    """File-level health of a parquet directory (the compaction input)."""
    files = []
    for root, _dirs, names in os.walk(path):
        files.extend(
            os.path.getsize(os.path.join(root, n))
            for n in names
            if n.endswith(".parquet")
        )
    total = sum(files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "avg_file_bytes": total // len(files) if files else 0,
        "min_file_bytes": min(files) if files else 0,
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
    partition_filter: str | None = None,
) -> dict:
    """Binpack-rewrite a parquet dir to ~target_mb files, atomically.

    Reads the current layout, repartitions to ceil(bytes/target) output
    files (clustered with sortWithinPartitions when ``sort_by`` is given
    — the ZORDER-lite that makes parquet min/max stats prune), writes to
    a staging dir, then swaps. Returns before/after stats.
    """
    before = table_stats(path)
    df = spark.read.parquet(path)
    if partition_filter:
        df = df.filter(partition_filter)
    n_out = max(1, round(before["total_bytes"] / (target_mb * 1024 * 1024)))
    out = df.repartition(n_out)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    staging = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(staging)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    after = table_stats(path)
    return {"before": before, "after": after, "target_files": n_out}


def incremental_overwrite(
    df,
    path: str,
    partition_col: str,
) -> list[str]:
    """Incremental model maintenance: rewrite ONLY the partitions the
    new batch touches (dbt `incremental` + `insert_overwrite` strategy,
    the reference's fct_trips materialization — fct_trips.sql config +
    nyc_taxi_dbt incremental models).

    Uses dynamic partition-overwrite: `overwrite` + `partitionBy` under
    `partitionOverwriteMode=dynamic` replaces exactly the partitions
    present in `df` and leaves every other partition's files untouched
    — at 100 TB a daily increment rewrites one date, not the table.
    Returns the list of partition values rewritten.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    from pyspark.sql import functions as F

    return [str(r[0]) for r in df.select(F.col(partition_col)).distinct().collect()]


def merge_upsert(
    existing,
    updates,
    key_cols: list[str],
    precombine_col: str,
):
    """Keyed upsert (reference S9: Hudi COPY_ON_WRITE upsert, record key
    + precombine field, pipelines/22-hudi-cdc-storage silver_transform
    .py:101-114; Delta `MERGE INTO` analogue on plain DataFrames).

    Result = one row per key: the row with the greatest precombine
    value, updates beating existing on exact ties. Storage-agnostic —
    callers pair it with `incremental_overwrite` to persist; on Delta
    the same semantics would be a MERGE INTO statement.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tagged = existing.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(precombine_col).desc(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
