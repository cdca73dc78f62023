"""Snapshot-manifest table semantics: atomic commits, snapshot
isolation, time travel, optimistic concurrency, compaction, retention.

These pin the lakehouse COMMIT PROTOCOL (what Delta/Iceberg provide and
plain directory-swap parquet does not): readers never observe partial
state, concurrent committers are arbitrated by the filesystem, and
maintenance (compact/expire/vacuum) never breaks a retained snapshot.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from real_time_data_engineering_spark.operators.manifest import (
    CommitConflict,
    ManifestTable,
)
from real_time_data_engineering_spark.sources.readers import load_table

from conftest import SF_DIR


@pytest.fixture()
def nation(spark):
    return load_table(spark, SF_DIR, "nation").select("n_nationkey", "n_name", "n_regionkey")


def test_write_read_append_roundtrip(spark, nation, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    s1 = t.write(nation)
    assert s1.version == 1 and s1.operation == "overwrite"
    assert t.read(spark).count() == nation.count()
    s2 = t.write(nation.limit(5), mode="append")
    assert s2.version == 2
    assert t.read(spark).count() == nation.count() + 5
    # overwrite replaces, not extends
    t.write(nation.limit(3))
    assert t.read(spark).count() == 3


def test_time_travel_and_snapshot_immutability(spark, nation, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.write(nation.filter(F.col("n_regionkey") == 0))
    v1_rows = t.read(spark).count()
    t.write(nation)  # v2 overwrites
    assert t.read(spark, version=1).count() == v1_rows
    assert t.read(spark).count() == nation.count()
    # the v1 snapshot still reads the same AFTER v2 exists (immutable)
    assert t.read(spark, version=1).count() == v1_rows


def test_commit_conflict_loses_cleanly(spark, nation, tmp_path):
    """Two writers racing for the same version: the filesystem admits
    exactly one; the loser raises CommitConflict and the table stays
    consistent with the winner's snapshot."""
    t = ManifestTable(str(tmp_path / "t"))
    t.write(nation)
    base = t.snapshot()
    files = t._stage(nation.limit(1))
    t._commit(base.version + 1, files, "writer-A")
    with pytest.raises(CommitConflict):
        t._commit(base.version + 1, t._stage(nation.limit(2)), "writer-B")
    assert t.snapshot().operation == "writer-A"
    # retry on the NEW base succeeds (optimistic concurrency loop)
    t.write(nation.limit(2), mode="append")
    assert t.snapshot().version == base.version + 2


def test_staged_but_uncommitted_data_is_invisible(spark, nation, tmp_path):
    """A crash between staging and commit must leave readers on the old
    snapshot: unreferenced parquet on disk is not part of the table."""
    t = ManifestTable(str(tmp_path / "t"))
    t.write(nation)
    before = t.read(spark).count()
    t._stage(nation)  # simulated crash: staged, never committed
    assert t.read(spark).count() == before
    removed = t.vacuum()
    assert removed, "vacuum should collect the orphaned staging files"
    assert t.read(spark).count() == before


def test_compact_is_metadata_swap_with_old_snapshot_intact(spark, nation, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    # many tiny files
    t.write(nation.repartition(8))
    rows = {tuple(r) for r in t.read(spark).collect()}
    v_before = t.snapshot().version
    n_files_before = len(t.snapshot().files)
    t.compact(spark, target_mb=128)
    assert len(t.snapshot().files) < n_files_before
    assert {tuple(r) for r in t.read(spark).collect()} == rows
    # pre-compaction snapshot still readable byte-for-byte (time travel)
    assert {tuple(r) for r in t.read(spark, version=v_before).collect()} == rows


def test_expire_and_vacuum_respect_retention(spark, nation, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.write(nation)
    t.write(nation.limit(10))
    t.compact(spark)
    expired = t.expire(keep_last=1)
    assert expired == [1, 2]
    removed = t.vacuum()
    assert removed, "files referenced only by expired snapshots are orphans"
    # the retained snapshot is untouched
    assert t.read(spark).count() == 10
    with pytest.raises(ValueError):
        t.read(spark, version=1)


def test_merge_upsert_commits_latest_wins(spark, nation, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    base = nation.withColumn("updated_at", F.lit(1))
    t.write(base)
    updates = (
        nation.limit(4)
        .withColumn("n_name", F.lit("RENAMED"))
        .withColumn("updated_at", F.lit(2))
    )
    t.merge_upsert(updates, key_cols=["n_nationkey"], precombine_col="updated_at")
    out = t.read(spark)
    assert out.count() == nation.count()
    assert out.filter(F.col("n_name") == "RENAMED").count() == 4
    # stale update (older precombine) must NOT win
    stale = nation.limit(2).withColumn("n_name", F.lit("STALE")).withColumn("updated_at", F.lit(0))
    t.merge_upsert(stale, key_cols=["n_nationkey"], precombine_col="updated_at")
    assert t.read(spark).filter(F.col("n_name") == "STALE").count() == 0


def test_manifest_listing_never_trusts_directory_state(spark, nation, tmp_path):
    """Dropping a junk parquet file into the table directory must not
    change what readers see — the manifest, not the listing, defines
    the table."""
    t = ManifestTable(str(tmp_path / "t"))
    t.write(nation)
    before = t.read(spark).count()
    nation.limit(7).write.mode("overwrite").parquet(str(tmp_path / "t" / "junk"))
    assert t.read(spark).count() == before


def test_streaming_sink_commits_exactly_once(spark, nation, tmp_path):
    """foreachBatch → manifest commits: all rows land; a REPLAYED batch
    (the crash-between-sink-and-checkpoint case) is detected in the log
    and skipped, so nothing duplicates."""
    from real_time_data_engineering_spark.operators.manifest import (
        ManifestTable,
        write_stream_to_manifest,
    )

    src = tmp_path / "stream_src"
    nation.limit(10).coalesce(1).write.mode("overwrite").parquet(str(src / "f0"))
    nation.filter(F.col("n_nationkey") >= 10).coalesce(1).write.mode("overwrite").parquet(
        str(src / "f1")
    )
    stream = (
        spark.readStream.schema(nation.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    tpath = str(tmp_path / "t")
    q = write_stream_to_manifest(stream, tpath, str(tmp_path / "ck"))
    q.awaitTermination(120)
    t = ManifestTable(tpath)
    assert t.read(spark).count() == nation.count()
    ops = [t.snapshot(v).operation for v in t.versions()]
    assert all(op.startswith("stream-append:") for op in ops)
    before = (t.snapshot().version, t.read(spark).count())
    tag0 = ops[0]
    committed = {t.snapshot(v).operation for v in t.versions()}
    assert tag0 in committed  # the sink's guard sees it and would skip
    # drive the real guard: call the sink again on the same checkpoint —
    # no new data, no new commits
    q2 = write_stream_to_manifest(
        spark.readStream.schema(nation.schema).option("maxFilesPerTrigger", 1).parquet(str(src / "f*")),
        tpath,
        str(tmp_path / "ck"),
    )
    q2.awaitTermination(120)
    assert (t.snapshot().version, t.read(spark).count()) == before
