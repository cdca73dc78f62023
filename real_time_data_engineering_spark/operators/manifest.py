"""Snapshot-manifest tables: lakehouse commit semantics on plain parquet.

The reference runs its tables on Iceberg/Delta/Hudi — snapshot commits,
`rewrite_data_files` compaction + `expire_snapshots`
(pipelines/01-kafka-flink-iceberg/Makefile:186-221,
iceberg_maintenance_dag.py:30-80), Hudi upsert
(pipelines/22-hudi-cdc-storage/spark/jobs/silver_transform.py:101-114).
delta-spark is unavailable in this environment, but the COMMIT PROTOCOL
those formats share does not need a library — it is a filesystem
discipline, implemented here from first principles:

* a table is a directory of immutable, uniquely-named parquet files
  plus `_manifests/v{NNNNNN}.json`, each manifest listing exactly the
  files that make up one snapshot;
* readers resolve the highest manifest version and read ONLY its file
  list — a half-written data file or an in-flight compaction is
  invisible because no manifest references it yet (snapshot isolation
  without locks);
* writers stage data files first, then publish with an `O_CREAT|O_EXCL`
  create of the next version file — the filesystem arbitrates racing
  committers, the loser gets `CommitConflict` and retries on the new
  snapshot (optimistic concurrency, the Delta protocol's shape);
* old manifests stay readable (time travel) until `expire` removes
  manifests and `vacuum` deletes data files no retained snapshot
  references — the Iceberg maintenance pair.

At 100 TB the same layout holds: manifests are O(files) metadata, data
files never move or mutate, and compaction is a rewrite + one metadata
commit. (Production formats add a catalog/log store for cross-writer
atomicity on object stores without atomic create — out of scope here,
as is column-level stats pruning.)
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer published this version first — reload and retry."""


_MANIFEST_DIR = "_manifests"


@dataclass(frozen=True)
class Snapshot:
    version: int
    files: tuple[str, ...]  # relative to the table root
    operation: str
    committed_at: float


class ManifestTable:
    """A parquet table whose visible state is defined by its latest
    version manifest, never by directory listing."""

    def __init__(self, path: str):
        self.path = path.rstrip("/")
        os.makedirs(os.path.join(self.path, _MANIFEST_DIR), exist_ok=True)

    # -- snapshot resolution ------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, _MANIFEST_DIR, f"v{version:06d}.json")

    def versions(self) -> list[int]:
        names = os.listdir(os.path.join(self.path, _MANIFEST_DIR))
        return sorted(
            int(n[1:7]) for n in names if n.startswith("v") and n.endswith(".json")
        )

    def snapshot(self, version: int | None = None) -> Snapshot:
        vs = self.versions()
        if not vs:
            return Snapshot(version=0, files=(), operation="empty", committed_at=0.0)
        v = version if version is not None else vs[-1]
        if v not in vs:
            raise ValueError(f"version {v} expired or never existed; have {vs}")
        with open(self._manifest_path(v)) as f:
            m = json.load(f)
        return Snapshot(
            version=v,
            files=tuple(m["files"]),
            operation=m["operation"],
            committed_at=m["committed_at"],
        )

    # -- read ---------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read one immutable snapshot (latest by default; pass a version
        for time travel). An empty table reads as an empty frame only if
        a schema-bearing snapshot ever existed — reading version 0 of a
        never-written table is an error by design."""
        snap = self.snapshot(version)
        if not snap.files:
            raise ValueError(f"{self.path} has no committed snapshot to read")
        return spark.read.parquet(*[os.path.join(self.path, f) for f in snap.files])

    # -- write / commit -----------------------------------------------------

    def _stage(self, df: DataFrame) -> list[str]:
        """Write data files under a unique staging name, return their
        table-relative paths. Files are invisible until a manifest
        references them."""
        stage_rel = f"data-{uuid.uuid4().hex[:12]}"
        stage_abs = os.path.join(self.path, stage_rel)
        df.write.mode("overwrite").parquet(stage_abs)
        rels = []
        for root, _dirs, names in os.walk(stage_abs):
            for n in names:
                if n.endswith(".parquet"):
                    rels.append(os.path.relpath(os.path.join(root, n), self.path))
        return sorted(rels)

    def _commit(self, version: int, files: list[str], operation: str) -> Snapshot:
        """Publish `files` as snapshot `version` — atomically, via
        O_CREAT|O_EXCL on the version file: exactly one racing writer
        can create it; everyone else gets CommitConflict."""
        payload = json.dumps(
            {"files": files, "operation": operation, "committed_at": time.time()}
        )
        try:
            fd = os.open(
                self._manifest_path(version), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} of {self.path} was committed concurrently"
            ) from e
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        return self.snapshot(version)

    def write(self, df: DataFrame, mode: str = "overwrite") -> Snapshot:
        """Commit a new snapshot: `overwrite` replaces the visible file
        set, `append` extends it. Data is staged before the metadata
        commit, so a crash mid-write leaves the table at its previous
        snapshot (plus orphan files for `vacuum`)."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode}")
        new_files = self._stage(df)
        base = self.snapshot()
        files = new_files if mode == "overwrite" else list(base.files) + new_files
        return self._commit(base.version + 1, files, mode)

    def merge_upsert(
        self,
        updates: DataFrame,
        key_cols: list[str],
        precombine_col: str,
    ) -> Snapshot:
        """MERGE INTO analogue (Hudi upsert semantics via
        `maintenance.merge_upsert`): read latest snapshot, resolve one
        row per key (greatest precombine, updates win ties), commit the
        result as a new snapshot."""
        from .maintenance import merge_upsert

        spark = updates.sparkSession
        existing = self.read(spark)
        merged = merge_upsert(existing, updates, key_cols, precombine_col)
        return self.write(merged, mode="overwrite")

    # -- maintenance --------------------------------------------------------

    def compact(self, spark: SparkSession, target_mb: int = 128) -> Snapshot:
        """rewrite_data_files binpack analogue: rewrite the CURRENT
        snapshot into ~target-size files and commit the new layout as a
        metadata-only swap. Readers of older versions are untouched —
        their files still exist until vacuum."""
        snap = self.snapshot()
        df = self.read(spark)
        total = sum(os.path.getsize(os.path.join(self.path, f)) for f in snap.files)
        n_out = max(1, round(total / (target_mb * 1024 * 1024)))
        files = self._stage(df.repartition(n_out))
        return self._commit(snap.version + 1, files, "compact")

    def expire(self, keep_last: int = 1) -> list[int]:
        """expire_snapshots analogue: drop all but the newest
        ``keep_last`` manifests. Returns expired versions."""
        vs = self.versions()
        expired = vs[:-keep_last] if keep_last > 0 else vs
        for v in expired:
            os.remove(self._manifest_path(v))
        return expired

    def vacuum(self) -> list[str]:
        """remove_orphan_files analogue: delete data files no retained
        manifest references. Safe by construction: the referenced set is
        read from the manifests that still exist."""
        referenced = set()
        for v in self.versions():
            referenced.update(self.snapshot(v).files)
        removed = []
        for root, _dirs, names in os.walk(self.path):
            if _MANIFEST_DIR in root:
                continue
            for n in names:
                rel = os.path.relpath(os.path.join(root, n), self.path)
                if n.endswith(".parquet") and rel not in referenced:
                    os.remove(os.path.join(root, n))
                    removed.append(rel)
        return removed


def write_stream_to_manifest(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming sink with exactly-once commits on the manifest log —
    the mechanism a Delta streaming sink uses, reproduced on the
    manifest protocol: every micro-batch appends ONE snapshot tagged
    with its batch id, and a replayed batch (foreachBatch reruns after
    a crash between sink write and checkpoint commit) is detected in
    the log and skipped, so rows land exactly once no matter where the
    failure hits. Single-writer per stream; a concurrent committer
    surfaces as CommitConflict rather than silent corruption.

    Returns the started StreamingQuery (caller awaits/stops).
    """
    table = ManifestTable(table_path)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"stream-append:{batch_id}"
        committed = {table.snapshot(v).operation for v in table.versions()}
        if tag in committed:
            return  # replayed batch: already durable, exactly-once holds
        files = table._stage(batch_df)
        base = table.snapshot()
        table._commit(base.version + 1, list(base.files) + files, tag)

    writer = stream.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
