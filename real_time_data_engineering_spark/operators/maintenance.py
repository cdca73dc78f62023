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
