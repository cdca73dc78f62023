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
    # default vacuum grace must NOT touch fresh files (they could be a
    # live writer's in-flight stage)
    assert t.vacuum() == []
    removed = t.vacuum(older_than_s=0)
    assert removed, "grace-0 vacuum should collect the orphaned staging files"
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
    removed = t.vacuum(older_than_s=0)
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


def test_vacuum_grace_protects_inflight_writer(spark, nation, tmp_path):
    """The race ADVICE flagged: writer B stages files, cleaner runs
    vacuum, writer B commits. With the retention grace the staged files
    survive and B's snapshot is fully readable."""
    t = ManifestTable(str(tmp_path / "t"))
    t.write(nation)
    staged = t._stage(nation.limit(5))  # writer B, commit still in flight
    assert t.vacuum() == []  # cleaner with default grace: hands off
    base = t.snapshot()
    t._commit(base.version + 1, list(base.files) + staged, "writer-B")
    assert t.read(spark).count() == nation.count() + 5


def test_file_stats_prune_scan(spark, nation, tmp_path):
    """File-level min/max data skipping: a point/range predicate must
    read strictly fewer files than the snapshot holds, and the pruned
    read returns exactly the predicate's rows."""
    t = ManifestTable(str(tmp_path / "t"))
    # one file per region → disjoint n_regionkey ranges per file
    t.write(nation.repartitionByRange(5, "n_regionkey"), mode="overwrite")
    all_files = t.files_for()
    assert len(all_files) > 1
    pred = [("n_regionkey", "==", 2)]
    pruned = t.files_for(pred)
    assert 0 < len(pruned) < len(all_files)
    got = {r.n_nationkey for r in t.read(spark, predicate=pred).collect()}
    want = {r.n_nationkey for r in nation.filter(F.col("n_regionkey") == 2).collect()}
    assert got == want
    # range predicate prunes too, and a provably-empty one reads 0 files
    assert len(t.files_for([("n_regionkey", ">=", 4)])) < len(all_files)
    assert t.files_for([("n_regionkey", ">", 99)]) == []
    assert t.read(spark, predicate=[("n_regionkey", ">", 99)]).count() == 0
    # string-column pruning works off the same footer bounds: the
    # lexicographically smallest name can only live in files whose min
    # IS that name, so every other file is provably empty for it
    target = nation.agg(F.min("n_name")).first()[0]
    named = t.files_for([("n_name", "==", target)])
    assert len(named) < len(all_files)
    assert (
        t.read(spark, predicate=[("n_name", "==", target)]).count()
        == nation.filter(F.col("n_name") == target).count()
    )


def test_stats_pruning_is_conservative_on_appends(spark, nation, tmp_path):
    """Appended snapshots merge stats; files whose range admits the
    value are all kept (pruning may never lose rows)."""
    t = ManifestTable(str(tmp_path / "t"))
    t.write(nation.filter(F.col("n_regionkey") < 2))
    t.write(nation.filter(F.col("n_regionkey") >= 2), mode="append")
    pred = [("n_regionkey", "==", 0)]
    got = t.read(spark, predicate=pred).count()
    assert got == nation.filter(F.col("n_regionkey") == 0).count()
    assert len(t.files_for(pred)) < len(t.files_for())


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


def test_exactly_once_survives_snapshot_expiry(spark, nation, tmp_path):
    """The ADVICE hole: if expire() prunes the manifest carrying a
    batch's stream-append tag, a replayed micro-batch must STILL be
    skipped — the committed-batch marker is durable independently of
    snapshot retention."""
    from real_time_data_engineering_spark.operators.manifest import (
        write_stream_to_manifest,
    )

    src = tmp_path / "stream_src"
    nation.limit(10).coalesce(1).write.mode("overwrite").parquet(str(src / "f0"))
    stream = (
        spark.readStream.schema(nation.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    tpath = str(tmp_path / "t")
    q = write_stream_to_manifest(stream, tpath, str(tmp_path / "ck"))
    q.awaitTermination(120)
    t = ManifestTable(tpath)
    before = t.read(spark).count()
    # a later batch arrives, then retention prunes ALL older manifests —
    # including the one whose operation tag recorded batch 0
    t.write(nation.limit(3), mode="append")
    t.expire(keep_last=1)
    assert all(
        not t.snapshot(v).operation.startswith("stream-append:") for v in t.versions()
    )
    # replay from a FRESH checkpoint re-delivers batch 0; marker skips it
    q2 = write_stream_to_manifest(
        spark.readStream.schema(nation.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*")),
        tpath,
        str(tmp_path / "ck2"),
    )
    q2.awaitTermination(120)
    assert t.read(spark).count() == before + 3


def test_exactly_once_marker_crash_window_repair(spark, nation, tmp_path):
    """Crash between manifest commit and marker append: the replayed
    batch sees its tag on the LATEST snapshot, repairs the marker, and
    does not duplicate."""
    import os

    from real_time_data_engineering_spark.operators.manifest import (
        _BATCHES_MARKER,
        _MANIFEST_DIR,
        write_stream_to_manifest,
    )

    src = tmp_path / "stream_src"
    nation.limit(10).coalesce(1).write.mode("overwrite").parquet(str(src / "f0"))
    tpath = str(tmp_path / "t")
    q = write_stream_to_manifest(
        spark.readStream.schema(nation.schema).parquet(str(src / "f*")),
        tpath,
        str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    t = ManifestTable(tpath)
    before = t.read(spark).count()
    # simulate the crash: wipe the marker (commit survived, record lost)
    os.remove(os.path.join(tpath, _MANIFEST_DIR, _BATCHES_MARKER))
    q2 = write_stream_to_manifest(
        spark.readStream.schema(nation.schema).parquet(str(src / "f*")),
        tpath,
        str(tmp_path / "ck2"),  # fresh checkpoint → batch 0 replays
    )
    q2.awaitTermination(120)
    assert t.read(spark).count() == before
    with open(os.path.join(tpath, _MANIFEST_DIR, _BATCHES_MARKER)) as f:
        assert "0" in f.read().split()


def test_cluster_by_write_makes_stats_prune(spark, tmp_path):
    """cluster_by: on a randomly-laid-out write, min/max ranges overlap
    everywhere and a point predicate prunes nothing; the clustered
    write of the SAME data prunes most files. This is the write-side
    half of data skipping (OPTIMIZE ZORDER's linear case)."""
    df = (
        spark.range(0, 10_000)
        .select(
            # shuffle key order so unclustered files span the full range
            F.xxhash64("id").alias("salt"),
            (F.col("id") % 100).alias("k"),
            F.col("id").alias("v"),
        )
        .repartition(8, "salt")
        .drop("salt")
    )
    pred = [("k", "==", 17)]

    un = ManifestTable(str(tmp_path / "unclustered"))
    un.write(df)
    assert len(un.files_for(pred)) == len(un.files_for())  # no skip possible

    cl = ManifestTable(str(tmp_path / "clustered"))
    cl.write(df, cluster_by=["k"], n_files=8)
    n_all, n_hit = len(cl.files_for()), len(cl.files_for(pred))
    assert n_all > 1 and n_hit < n_all
    # correctness unchanged by the layout
    assert cl.read(spark, predicate=pred).count() == 100
    assert un.read(spark, predicate=pred).count() == 100


def test_incremental_read_returns_exactly_appended_rows(spark, nation, tmp_path):
    """read_appended(since=v) over append-only commits returns exactly
    the rows committed after v, and diff_files reports the change set."""
    t = ManifestTable(str(tmp_path / "t"))
    s1 = t.write(nation.filter(F.col("n_regionkey") < 2))
    s2 = t.write(nation.filter(F.col("n_regionkey") == 2), mode="append")
    s3 = t.write(nation.filter(F.col("n_regionkey") > 2), mode="append")
    added, removed = t.diff_files(s1.version, s3.version)
    assert removed == [] and set(added) == set(s3.files) - set(s1.files)
    got = {r.n_nationkey for r in t.read_appended(spark, since=s1.version).collect()}
    want = {r.n_nationkey for r in nation.filter(F.col("n_regionkey") >= 2).collect()}
    assert got == want
    # bounded range: only the middle append
    mid = {r.n_nationkey for r in t.read_appended(spark, s1.version, s2.version).collect()}
    assert mid == {r.n_nationkey for r in nation.filter(F.col("n_regionkey") == 2).collect()}
    # empty range yields an empty, schema-stable frame
    assert t.read_appended(spark, s3.version).count() == 0


def test_incremental_read_refuses_rewrites(spark, nation, tmp_path):
    """A compact/overwrite inside the range must raise — added-files
    reads across rewrites double-count surviving rows."""
    t = ManifestTable(str(tmp_path / "t"))
    s1 = t.write(nation.filter(F.col("n_regionkey") < 2))
    t.write(nation.filter(F.col("n_regionkey") == 2), mode="append")
    t.compact(spark)
    t.write(nation.filter(F.col("n_regionkey") > 2), mode="append")
    with pytest.raises(ValueError, match="not an append"):
        t.read_appended(spark, since=s1.version)
    # but the post-rewrite append window reads fine
    vs = t.versions()
    assert t.read_appended(spark, since=vs[-2]).count() == nation.filter(
        F.col("n_regionkey") > 2
    ).count()


def test_incremental_refresh_from_appends_equals_recompute(spark, nation, tmp_path):
    """Maintaining a downstream additive aggregate from read_appended
    increments must equal the full recompute — the lakehouse MV
    maintenance loop (process only new files per refresh)."""
    t = ManifestTable(str(tmp_path / "t"))
    versions = [t.write(nation.filter(F.col("n_regionkey") == 0)).version]
    for rk in (1, 2, 3, 4):
        versions.append(
            t.write(nation.filter(F.col("n_regionkey") == rk), mode="append").version
        )
    # incremental: fold per-append partial counts (additive agg composes)
    acc: dict[int, int] = {}
    prev = 0
    for v in versions:
        inc = t.read_appended(spark, since=prev, until=v) if prev else t.read(spark, version=v)
        for r in inc.groupBy("n_regionkey").count().collect():
            acc[r.n_regionkey] = acc.get(r.n_regionkey, 0) + r["count"]
        prev = v
    full = {r.n_regionkey: r["count"] for r in t.read(spark).groupBy("n_regionkey").count().collect()}
    assert acc == full


def test_delete_where_rewrites_only_admitting_files(spark, nation, tmp_path):
    """Copy-on-write DELETE: files whose stats prove no match carry
    into the new snapshot BY REFERENCE (same relative paths); only
    admitting files are rewritten; old snapshots keep the rows."""
    t = ManifestTable(str(tmp_path / "t"))
    s1 = t.write(nation.repartitionByRange(5, "n_regionkey"))
    pred = [("n_regionkey", "==", 2)]
    admitting = set(t.files_for(pred))
    untouched_before = set(s1.files) - admitting
    assert admitting and untouched_before
    # stats-proven-empty predicate is a true no-op (same snapshot back)
    assert t.delete_where(spark, [("n_regionkey", ">", 99)]).version == s1.version

    s2 = t.delete_where(spark, pred)
    # untouched files referenced verbatim — the metadata-only half
    assert untouched_before <= set(s2.files)
    assert not (admitting & set(s2.files))
    # rows: exactly the predicate's rows gone
    got = {r.n_nationkey for r in t.read(spark).collect()}
    want = {r.n_nationkey for r in nation.filter(F.col("n_regionkey") != 2).collect()}
    assert got == want
    # time travel unaffected
    assert t.read(spark, version=s1.version).count() == nation.count()
    # post-delete, a no-stats survivor file keeps the prune conservative:
    # the same predicate now RE-RUNS (correctly — never lose rows) but
    # the data is unchanged
    s3 = t.delete_where(spark, [("n_regionkey", ">", 99)])
    assert {r.n_nationkey for r in t.read(spark).collect()} == want
    assert s3.version >= s2.version


def test_schema_evolution_is_a_metadata_event(spark, tmp_path):
    """Appending a frame with a NEW column evolves the manifest schema:
    readers see the union in either write order, pre-column files read
    NULLs, time travel shows each version's own schema, and a same-name
    type conflict is rejected loudly."""
    t = ManifestTable(str(tmp_path / "t"))
    t.write(spark.range(5).select(F.col("id"), F.lit("a").alias("x")))
    s2 = t.write(
        spark.range(5, 8).select(F.col("id"), F.lit("b").alias("x"), F.lit(1.5).alias("y")),
        mode="append",
    )
    df = t.read(spark)
    assert df.columns == ["id", "x", "y"] and df.count() == 8
    assert df.filter(F.col("y").isNull()).count() == 5  # pre-column files
    # the hazard order: WIDE first, narrow appended — y must survive
    u = ManifestTable(str(tmp_path / "u"))
    u.write(spark.range(5).select(F.col("id"), F.lit(1.5).alias("y")))
    u.write(spark.range(5, 8).select(F.col("id")), mode="append")
    assert u.read(spark).columns == ["id", "y"]
    assert u.read(spark).filter(F.col("y").isNotNull()).count() == 5
    # time travel reads version 1 under version 1's schema
    assert t.read(spark, version=1).columns == ["id", "x"]
    # type conflict: loud, not silent
    with pytest.raises(ValueError, match="schema evolution conflict"):
        t.write(spark.range(2).select(F.col("id"), F.lit(7).alias("y")), mode="append")
    # overwrite resets the schema explicitly
    t.write(spark.range(3).select(F.col("id").alias("only")))
    assert t.read(spark).columns == ["only"]
    assert s2.version < t.snapshot().version


def test_zorder_clustering_prunes_both_dimensions(spark, tmp_path):
    """Z-order vs linear clustering: linearly clustering on k1 leaves a
    k2 point predicate unprunable; the Morton key bounds every file in
    BOTH dimensions, so the same predicate skips most files — and a
    2-d box predicate skips even more."""
    from real_time_data_engineering_spark.operators.manifest import (
        ManifestTable,
        zorder_key,
    )

    df = spark.range(0, 16_384).select(
        (F.col("id") % 128).alias("k1"),
        (F.floor(F.col("id") / 128)).alias("k2"),
        F.col("id").alias("v"),
    )
    lin = ManifestTable(str(tmp_path / "linear"))
    lin.write(df, cluster_by=["k1"], n_files=16)
    zt = ManifestTable(str(tmp_path / "zorder"))
    zt.write(df.withColumn("_z", zorder_key("k1", "k2")), cluster_by=["_z"], n_files=16)

    pred_k2 = [("k2", "==", 3)]
    assert len(lin.files_for(pred_k2)) == len(lin.files_for())  # no skip
    n_all = len(zt.files_for())
    assert n_all > 1
    assert len(zt.files_for(pred_k2)) < n_all
    # 2-d box: prunes to a small corner
    box = [("k1", "<", 32), ("k2", "<", 32)]
    assert len(zt.files_for(box)) < n_all / 2
    # correctness identical under any layout
    want = df.filter((F.col("k1") < 32) & (F.col("k2") < 32)).count()
    assert zt.read(spark, predicate=box).drop("_z").count() == want
    assert lin.read(spark, predicate=box).count() == want


@pytest.mark.parametrize(
    "bloom_kw",
    [
        {},
        # tiny bloom (forced false positives) on both columns: fp must
        # only cost pruning, NEVER correctness, through every protocol
        # interaction the walk generates
        {"bloom_cols": ["val", "id"], "bloom_bits": 256},
    ],
    ids=["plain", "bloomed"],
)
def test_manifest_random_walk_matches_model(spark, tmp_path, bloom_kw):
    """Seeded 24-op random walk over write/append/delete/compact/
    expire/vacuum: after every op the table equals a plain in-memory
    model — including an equality-predicate probe each step, so the
    bloomed variant exercises bloom pruning against the model under
    every commit shape. Catches protocol interactions no single-op
    test sees (delete after compact after expire, stats carried
    across rewrites, vacuum not breaking the retained snapshot...)."""
    import random

    rng = random.Random(20260814)
    t = ManifestTable(str(tmp_path / "walk"), **bloom_kw)
    model: dict[int, int] = {}
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        rows = [(next_id + i, rng.randrange(100)) for i in range(n)]
        next_id += n
        return rows

    def df_of(rows):
        return spark.createDataFrame(rows, "id long, val long")

    t.write(df_of(fresh_rows(20)))
    model = {}
    # replay: the first write's rows ARE the model
    model = {r.id: r.val for r in t.read(spark).collect()}

    for step in range(24):
        op = rng.choice(
            ["append", "delete", "delete_mor", "compact", "expire", "vacuum", "overwrite"]
        )
        if op == "append":
            rows = fresh_rows(rng.randrange(1, 12))
            t.write(df_of(rows), mode="append")
            model.update(dict(rows))
        elif op == "overwrite":
            rows = fresh_rows(rng.randrange(1, 12))
            t.write(df_of(rows))
            model = dict(rows)
        elif op == "delete":
            cut = rng.randrange(100)
            t.delete_where(spark, [("val", "<", cut)])
            model = {k: v for k, v in model.items() if not (v < cut)}
        elif op == "delete_mor":
            cut = rng.randrange(100)
            t.delete_where(spark, [("val", ">", cut)], merge_on_read=True)
            model = {k: v for k, v in model.items() if not (v > cut)}
        elif op == "compact":
            t.compact(spark)
        elif op == "expire":
            t.expire(keep_last=2)
        elif op == "vacuum":
            t.vacuum(older_than_s=0)
        got = {r.id: r.val for r in t.read(spark).collect()} if model else {}
        if model:
            assert got == model, f"divergence after step {step} ({op})"
            # equality-predicate probe: point lookups (the bloom path)
            # must return exactly the model's matches after every op
            probe = rng.randrange(100)
            want = {k for k, v in model.items() if v == probe}
            hit = {r.id for r in t.read(spark, predicate=[("val", "==", probe)]).collect()}
            assert hit == want, f"predicate probe diverged after step {step} ({op})"
        else:
            assert t.read(spark).count() == 0, f"expected empty after step {step} ({op})"


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE WHERE keeps every row where the predicate is NOT TRUE —
    including NULL (Delta/Iceberg/SQL semantics). NULL rows inside a
    REWRITTEN file must survive the copy-on-write: a bare filter(~pred)
    evaluates to NULL on them and silently deletes them (r4 advice)."""
    t = ManifestTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, None), (5, 50)], "id int, val int"
    ).coalesce(1)  # one file → NULL rows live INSIDE the rewritten file
    t.write(df)
    t.delete_where(spark, [("val", ">", 25)])
    got = {(r.id, r.val) for r in t.read(spark).collect()}
    assert got == {(1, 10), (2, None), (4, None)}
    # and an all-NULL file behaves identically (kept, not layout-lucky)
    t2 = ManifestTable(str(tmp_path / "t2"))
    t2.write(
        spark.createDataFrame([(1, None), (2, None)], "id int, val int").coalesce(1)
    )
    t2.delete_where(spark, [("val", ">", 25)])
    assert t2.read(spark).count() == 2


def test_timestamp_pruning_safe_in_non_utc_session(spark, tmp_path):
    """Parquet TIMESTAMP stats come back tz-AWARE (UTC) from pyarrow;
    predicate datetimes are tz-NAIVE session wall clock. In a non-UTC
    session a naive strftime render of both sides can wrongly prove a
    file disjoint and silently skip matching rows (r4 advice). The fix
    refuses to inter-compare the two encodings, so pruning stays a pure
    optimization: read() and delete_where() must return exact results
    under a +05:30 session timezone."""
    import datetime as dt

    tz_before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        rows = [(i, dt.datetime(2024, 1, 1, 12, 0, i)) for i in range(10)]
        df = spark.createDataFrame(rows, "id int, ts timestamp").coalesce(1)
        t = ManifestTable(str(tmp_path / "t"))
        t.write(df)
        cut = dt.datetime(2024, 1, 1, 12, 0, 5)
        got = {r.id for r in t.read(spark, predicate=[("ts", ">=", cut)]).collect()}
        assert got == {5, 6, 7, 8, 9}, "read-side prune lost matching rows"
        t.delete_where(spark, [("ts", ">=", cut)])
        assert {r.id for r in t.read(spark).collect()} == {0, 1, 2, 3, 4}, (
            "delete-side prune excluded an admitting file"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)


def test_stat_encode_timezone_discipline():
    """Aware datetimes encode UTC-normalized and never inter-compare
    with naive encodings (TypeError → keep the file); aware-aware
    compares are offset-correct."""
    import datetime as dt

    from real_time_data_engineering_spark.operators.manifest import _stat_encode

    ist = dt.timezone(dt.timedelta(hours=5, minutes=30))
    aware = _stat_encode(dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=ist))
    same_utc = _stat_encode(dt.datetime(2024, 1, 1, 6, 30, 0, tzinfo=dt.timezone.utc))
    naive = _stat_encode(dt.datetime(2024, 1, 1, 12, 0, 0))
    assert aware == same_utc  # offset-normalized before rendering
    with pytest.raises(TypeError):
        aware < naive  # mixed awareness must refuse, not mis-prune


def test_bloom_skipping_prunes_point_lookups_minmax_cannot(spark, tmp_path):
    """Equality predicate on a high-cardinality column whose per-file
    [min, max] ranges ALL overlap: min/max skipping keeps every file,
    the bloom proves absence and prunes — and read() stays exact."""
    t = ManifestTable(str(tmp_path / "t"), bloom_cols=["k"])
    # interleaved keys: file A gets evens, file B odds over one range,
    # so both files span [0, 1999] and min/max can never separate them
    a = spark.createDataFrame([(i, "a") for i in range(0, 2000, 2)], "k int, src string")
    b = spark.createDataFrame([(i, "b") for i in range(1, 2000, 2)], "k int, src string")
    t.write(a.coalesce(1), mode="overwrite")
    t.write(b.coalesce(1), mode="append")
    assert len(t.snapshot().files) == 2
    # value 4 lives only in file A: bloom must prune B (min/max cannot)
    files = t.files_for([("k", "==", 4)])
    assert len(files) == 1, f"bloom failed to prune: {files}"
    got = t.read(spark, predicate=[("k", "==", 4)]).collect()
    assert [(r.k, r.src) for r in got] == [(4, "a")]
    # absent-everywhere value: bloom may prune BOTH files (fp aside),
    # and the read must still be exact (empty)
    assert t.read(spark, predicate=[("k", "==", 2001)]).count() == 0


def test_bloom_never_causes_wrong_results_on_unbloomable_types(spark, tmp_path):
    """Floats and timestamps are excluded from blooming by design
    (rendering/awareness mismatches would wrongly prune); the column
    simply carries no bloom and equality reads stay exact."""
    import datetime as dt

    t = ManifestTable(str(tmp_path / "t"), bloom_cols=["x", "ts", "k"])
    df = spark.createDataFrame(
        [(1.5, dt.datetime(2024, 1, 1, 12), 7), (2.5, dt.datetime(2024, 1, 2, 12), 8)],
        "x double, ts timestamp, k int",
    )
    t.write(df.coalesce(1))
    stats = t.snapshot().stats
    (fstats,) = stats.values()
    assert "bloom" not in fstats.get("x", {}), "float column must not bloom"
    assert "bloom" not in fstats.get("ts", {}), "timestamp column must not bloom"
    assert "bloom" in fstats.get("k", {}), "int column should bloom"
    assert t.read(spark, predicate=[("x", "==", 1.5)]).count() == 1
    assert t.read(spark, predicate=[("k", "==", 7)]).count() == 1


def test_bloom_saturation_cap_and_null_handling(spark, tmp_path):
    """Files past bloom_max_ndv skip the bloom (saturated filters prune
    nothing and bloat the manifest); NULLs neither enter the bloom nor
    let `== value` pruning drop NULL-bearing files wrongly."""
    t = ManifestTable(str(tmp_path / "t"), bloom_cols=["k"], bloom_max_ndv=50)
    big = spark.createDataFrame([(i,) for i in range(200)], "k int")
    t.write(big.coalesce(1))
    (fstats,) = t.snapshot().stats.values()
    assert "bloom" not in fstats.get("k", {}), "ndv cap ignored"
    t2 = ManifestTable(str(tmp_path / "t2"), bloom_cols=["k"])
    withnulls = spark.createDataFrame([(1,), (None,), (3,)], "k int")
    t2.write(withnulls.coalesce(1))
    assert t2.read(spark, predicate=[("k", "==", 3)]).count() == 1
    assert t2.read(spark, predicate=[("k", "==", 2)]).count() == 0


def test_bloom_survives_delete_where_and_json_roundtrip(spark, tmp_path):
    """Blooms persist through the manifest JSON and ride untouched-file
    stats across copy-on-write commits; rewritten files get fresh
    blooms (delete on a bloomed table keeps point-lookup pruning)."""
    t = ManifestTable(str(tmp_path / "t"), bloom_cols=["name"])
    a = spark.createDataFrame([("alpha", 1), ("beta", 2)], "name string, v int")
    b = spark.createDataFrame([("gamma", 3), ("delta", 4)], "name string, v int")
    t.write(a.coalesce(1), mode="overwrite")
    t.write(b.coalesce(1), mode="append")
    t.delete_where(spark, [("v", ">", 3)])  # rewrites only file B
    # fresh instance: stats come back through the JSON manifest
    t2 = ManifestTable(str(tmp_path / "t"), bloom_cols=["name"])
    assert len(t2.files_for([("name", "==", "alpha")])) == 1
    assert [(r.name, r.v) for r in t2.read(spark, predicate=[("name", "==", "gamma")]).collect()] == [("gamma", 3)]
    assert t2.read(spark, predicate=[("name", "==", "delta")]).count() == 0


def test_compact_recluster_turns_on_pruning(spark, tmp_path):
    """OPTIMIZE-style maintenance: a table ingested UNSORTED has
    every-file-overlapping stats (no pruning); compact(cluster_by)
    re-lays it out so range predicates prune, and compact(zorder)
    makes BOTH dimensions prune — same rows throughout."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(1000), rng.randrange(1000)) for i in range(4000)]
    rng.shuffle(rows)
    t = ManifestTable(str(tmp_path / "t"))
    df = spark.createDataFrame(rows, "id long, a long, b long")
    # 8 unsorted files: every file spans ~the full [0, 1000) range
    t.write(df.repartition(8))
    n_files = len(t.snapshot().files)
    assert n_files >= 8
    pred_a = [("a", "<", 100)]
    assert len(t.files_for(pred_a)) == n_files, "unsorted premise broken"
    want_a = {r.id for r in df.filter("a < 100").collect()}

    t.compact(spark, cluster_by=["a"], n_files=8)
    pruned = len(t.files_for(pred_a))
    total = len(t.snapshot().files)
    assert total > 3, "need multiple output files for pruning to mean anything"
    assert pruned < total, f"cluster_by failed to prune ({pruned}/{total})"
    assert {r.id for r in t.read(spark, predicate=pred_a).collect()} == want_a

    # b is still random within the a-sorted layout: no pruning on b
    pred_b = [("b", "<", 100)]
    assert len(t.files_for(pred_b)) == total

    t.compact(spark, zorder=("a", "b"), n_files=8)
    total_z = len(t.snapshot().files)
    assert total_z > 3
    pruned_a = len(t.files_for(pred_a))
    pruned_b = len(t.files_for(pred_b))
    assert pruned_a < total_z, f"zorder lost a-pruning ({pruned_a}/{total_z})"
    assert pruned_b < total_z, f"zorder failed b-pruning ({pruned_b}/{total_z})"
    assert {r.id for r in t.read(spark, predicate=pred_a).collect()} == want_a
    assert {r.id for r in t.read(spark, predicate=pred_b).collect()} == {
        r.id for r in df.filter("b < 100").collect()
    }
    assert t.snapshot().operation == "compact-zorder(a,b)"


def test_streamed_table_recluster_lifecycle(spark, tmp_path):
    """The full ingestion lifecycle: a stream appends unsorted
    micro-batches (every file spans the value range — zero pruning),
    maintenance re-clusters once, and the SAME table starts skipping —
    with the incremental reader correctly refusing to cross the
    rewrite (double-count hazard) while per-window reads still work."""
    import random

    from real_time_data_engineering_spark.operators.manifest import (
        write_stream_to_manifest,
    )

    rng = random.Random(11)
    src = str(tmp_path / "src")
    rows = [(i, rng.randrange(1000)) for i in range(3000)]
    for b in range(3):  # three files → three micro-batches
        spark.createDataFrame(rows[b * 1000 : (b + 1) * 1000], "id long, a long").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("id long, a long").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = write_stream_to_manifest(
        stream, str(tmp_path / "t"), str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    t = ManifestTable(str(tmp_path / "t"))
    v_streamed = t.snapshot().version
    assert t.read(spark).count() == 3000
    pred = [("a", "<", 100)]
    assert len(t.files_for(pred)) == len(t.snapshot().files), "unsorted premise"
    want = {r.id for r in t.read(spark, predicate=pred).collect()}

    t.compact(spark, cluster_by=["a"], n_files=6)
    assert len(t.files_for(pred)) < len(t.snapshot().files), "recluster must prune"
    assert {r.id for r in t.read(spark, predicate=pred).collect()} == want

    # incremental consumption refuses to span the rewrite...
    with pytest.raises(ValueError, match="not an append"):
        t.read_appended(spark, since=1)
    # ...but the pre-rewrite append window still reads exactly the
    # micro-batches that landed after the first commit
    assert t.read_appended(spark, since=1, until=v_streamed).count() == 2000


def test_append_with_retry_rebase_keeps_both_writers_rows(spark, tmp_path):
    """Optimistic append loop: a racer that loses the version CAS must
    rebase on the winner's snapshot and retry, landing BOTH writers'
    rows exactly once (Delta/Iceberg append-never-conflicts rule)."""
    path = str(tmp_path / "t")
    t = ManifestTable(path)
    t.write(spark.createDataFrame([(0, "base")], "id long, src string"))

    orig_commit = t._commit
    raced = {"n": 0}

    def commit_with_racer(
        version, files, operation, stats=None, schema_json=None, dvs=None
    ):
        if raced["n"] == 0:
            raced["n"] += 1
            # a concurrent writer wins THIS version first
            ManifestTable(path).write(
                spark.createDataFrame([(1, "racer")], "id long, src string"),
                mode="append",
            )
        return orig_commit(version, files, operation, stats, schema_json, dvs)

    t._commit = commit_with_racer
    try:
        snap = t.append_with_retry(
            spark.createDataFrame([(2, "retrier")], "id long, src string")
        )
    finally:
        t._commit = orig_commit
    assert raced["n"] == 1
    got = {(r.id, r.src) for r in t.read(spark).collect()}
    assert got == {(0, "base"), (1, "racer"), (2, "retrier")}
    # losing attempt's staged files are orphans, not table rows; the
    # lost attempt bumped no version (base=1, racer=2, retry lands 3)
    assert snap.version == 3
    assert t.vacuum(older_than_s=0), "the lost attempt should leave vacuumable orphans"
    assert {(r.id, r.src) for r in t.read(spark).collect()} == got


def test_append_with_retry_gives_up_after_max_attempts(spark, tmp_path):
    """A persistently-losing writer surfaces CommitConflict instead of
    spinning forever."""
    path = str(tmp_path / "t")
    t = ManifestTable(path)
    t.write(spark.createDataFrame([(0,)], "id long"))
    orig_commit = t._commit

    def always_raced(version, files, operation, stats=None, schema_json=None, dvs=None):
        ManifestTable(path).write(
            spark.createDataFrame([(99,)], "id long"), mode="append"
        )
        return orig_commit(version, files, operation, stats, schema_json, dvs)

    t._commit = always_raced
    try:
        with pytest.raises(CommitConflict, match="lost the version race 2 times"):
            t.append_with_retry(
                spark.createDataFrame([(1,)], "id long"), max_attempts=2
            )
    finally:
        t._commit = orig_commit


def test_merge_on_read_delete_equals_copy_on_write(spark, tmp_path):
    """DV delete and CoW delete must produce identical visible rows —
    the MOR path just moves the cost from write (no file rewritten) to
    read (anti-join) — including NULL-predicate rows surviving."""
    rows = [(i, None if i % 7 == 0 else i % 50) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, val int").repartition(4)
    cow = ManifestTable(str(tmp_path / "cow"))
    mor = ManifestTable(str(tmp_path / "mor"))
    cow.write(df)
    mor.write(df)
    files_before = set(mor.snapshot().files)
    cow.delete_where(spark, [("val", ">", 30)])
    mor.delete_where(spark, [("val", ">", 30)], merge_on_read=True)
    got_cow = {(r.id, r.val) for r in cow.read(spark).collect()}
    got_mor = {(r.id, r.val) for r in mor.read(spark).collect()}
    assert got_mor == got_cow
    assert any(r[1] is None for r in got_mor), "NULL-predicate rows must survive"
    # MOR rewrote NOTHING: the data file set is unchanged, only DVs added
    assert set(mor.snapshot().files) == files_before
    assert mor.snapshot().dvs, "expected deletion vectors in the snapshot"
    assert mor.snapshot().operation == "delete-mor"


def test_merge_on_read_deletes_stack_and_compact_clears_them(spark, tmp_path):
    """A second MOR delete unions into the file's vector; predicate
    reads apply vectors on the pruned scan; compact() rewrites the
    vectors away and the table reads identically vector-free."""
    df = spark.createDataFrame([(i, i % 100) for i in range(1000)], "id long, val int")
    t = ManifestTable(str(tmp_path / "t"))
    t.write(df.repartition(3))
    t.delete_where(spark, [("val", "<", 10)], merge_on_read=True)
    t.delete_where(spark, [("val", ">", 90)], merge_on_read=True)
    want = {
        (r.id, r.val) for r in df.filter("val >= 10 and val <= 90").collect()
    }
    assert {(r.id, r.val) for r in t.read(spark).collect()} == want
    # predicate read applies DVs too: a deleted band returns nothing
    assert t.read(spark, predicate=[("val", "<", 5)]).count() == 0
    assert t.read(spark, predicate=[("val", "==", 50)]).count() == len(
        [1 for i in range(1000) if i % 100 == 50]
    )
    v_mor = t.snapshot().version
    t.compact(spark)
    assert not t.snapshot().dvs, "compact must apply and clear the vectors"
    assert {(r.id, r.val) for r in t.read(spark).collect()} == want
    # time travel: the MOR snapshot still applies its vectors...
    assert {(r.id, r.val) for r in t.read(spark, version=v_mor).collect()} == want
    # ...and the PRE-delete snapshot still sees every row
    assert t.read(spark, version=1).count() == 1000


def test_merge_on_read_vectors_survive_append_and_vacuum(spark, tmp_path):
    """Appends carry existing vectors untouched; vacuum never collects
    a DV sidecar a retained snapshot references."""
    t = ManifestTable(str(tmp_path / "t"))
    t.write(spark.createDataFrame([(i, i) for i in range(100)], "id long, val long"))
    t.delete_where(spark, [("val", "<", 50)], merge_on_read=True)
    t.write(
        spark.createDataFrame([(1000 + i, i) for i in range(10)], "id long, val long"),
        mode="append",
    )
    assert t.snapshot().dvs, "append dropped the deletion vectors"
    assert t.read(spark).count() == 50 + 10
    t.expire(keep_last=1)
    removed = t.vacuum(older_than_s=0)
    assert t.read(spark).count() == 60, f"vacuum broke the DV read (removed {removed})"
    # a second fresh instance reads the same through the JSON roundtrip
    assert ManifestTable(str(tmp_path / "t")).read(spark).count() == 60


def test_bloom_dates_prune_but_timestamps_never_do(spark, tmp_path):
    """Plain DATE columns bloom safely (calendar equality, no timezone
    to disagree about) while TIMESTAMPs stay excluded — and since
    datetime subclasses date, the order of those checks is load-bearing
    (a timestamp slipping through as a date encoding would resurrect
    the naive/aware mis-prune hazard)."""
    import datetime as dt

    from real_time_data_engineering_spark.operators.manifest import _bloom_encode

    assert _bloom_encode(dt.date(2024, 3, 1)) == "d:2024-03-01"
    assert _bloom_encode(dt.datetime(2024, 3, 1, 12)) is None

    t = ManifestTable(str(tmp_path / "t"), bloom_cols=["d"])
    # two files with INTERLEAVED dates: identical [min, max] per file,
    # so min/max skipping keeps both — only the bloom can separate them
    a = [(i, dt.date(2024, 1, 1) + dt.timedelta(days=2 * i)) for i in range(50)]
    b = [(100 + i, dt.date(2024, 1, 2) + dt.timedelta(days=2 * i)) for i in range(50)]
    t.write(spark.createDataFrame(a, "id long, d date").coalesce(1))
    t.write(spark.createDataFrame(b, "id long, d date").coalesce(1), mode="append")
    (fa, fb) = t.snapshot().files
    assert "bloom" in t.snapshot().stats[fa]["d"]
    probe = dt.date(2024, 1, 5)  # an odd offset: lives only in file B
    files = t.files_for([("d", "==", probe)])
    assert len(files) == 1, f"date bloom failed to prune: {files}"
    got = t.read(spark, predicate=[("d", "==", probe)]).collect()
    assert [(r.id, r.d) for r in got] == [(101 + 1, probe)] or len(got) == 1
    assert got[0].d == probe


def test_bloom_cross_type_equality_never_prunes(spark, tmp_path):
    """ADVICE r5 (medium): a cross-typed equality probe — str '7' or
    bool True against an int-column bloom — encodes to a different
    type tag, so the bit test is a GUARANTEED miss; pruning on it
    would drop rows Spark's exact filter matches via implicit cast.
    The bloom entry now carries the written tag and refuses to prove
    absence across tags; min/max keeps its existing TypeError guard."""
    from real_time_data_engineering_spark.operators.manifest import (
        _bloom_build,
        _bloom_maybe_contains,
        _provably_empty,
    )

    bloom = _bloom_build([1, 7, 9], 256)
    assert bloom["t"] == "i"
    assert _bloom_maybe_contains(bloom, 7) is True
    assert _bloom_maybe_contains(bloom, 8) is False  # same-type miss still prunes
    # cross-type probes: encoding mismatch must NOT prove absence
    assert _bloom_maybe_contains(bloom, "7") is True
    assert _bloom_maybe_contains(bloom, True) is True
    stats = {"k": {"bloom": bloom, "min": 1, "max": 9}}
    assert not _provably_empty(stats, [("k", "==", "7")])
    assert not _provably_empty(stats, [("k", "==", True)])
    # legacy untagged entries (pre-r6 manifests) degrade to maybe-contains
    legacy = {kk: v for kk, v in bloom.items() if kk != "t"}
    assert _bloom_maybe_contains(legacy, 8) is True
    # mixed-type value sets refuse to bloom at all
    assert _bloom_build([1, "x"], 256) is None
    # end to end: files_for/delete_where on a bloomed int column keep
    # working under a str-typed predicate value (no silent no-op)
    t = ManifestTable(str(tmp_path / "t"), bloom_cols=["k"])
    t.write(spark.createDataFrame([(7, "a"), (9, "b")], "k int, s string").coalesce(1))
    assert len(t.files_for([("k", "==", "7")])) == 1
    assert t.read(spark, predicate=[("k", "==", "7")]).count() == 1
    t.delete_where(spark, [("k", "==", "7")])
    assert {r.k for r in t.read(spark).collect()} == {9}


def test_deletion_vectors_survive_symlinked_table_handles(spark, tmp_path):
    """ADVICE r5 (low): DV rows key on the scan's absolute
    ``_metadata.file_path`` URI. Handles on the same table through
    different path identities (symlink vs real path) must resolve to
    one canonical URI — realpath at init — or the anti-join misses and
    deleted rows silently reappear."""
    import os

    real = tmp_path / "real_tbl"
    link = tmp_path / "link_tbl"
    df = spark.createDataFrame([(i, i % 10) for i in range(200)], "id long, val int")
    ManifestTable(str(real)).write(df.repartition(2))
    os.symlink(str(real), str(link))
    # delete through the SYMLINK handle...
    ManifestTable(str(link)).delete_where(spark, [("val", "==", 3)], merge_on_read=True)
    # ...then read through the real path, a fresh symlink handle, and a
    # relative path: every identity must apply the vectors
    rel = os.path.relpath(str(link), os.getcwd())
    for handle in (str(real), str(link), rel):
        got = {r.id for r in ManifestTable(handle).read(spark).collect()}
        assert got == {i for i in range(200) if i % 10 != 3}, handle


def test_deletion_vectors_survive_a_table_directory_move(spark, tmp_path):
    """ADVICE r6 #1: DV rows key on TABLE-RELATIVE paths, so physically
    moving the table directory keeps every vector effective — the
    stable-file-id property production formats get from their metadata
    layer. (Legacy absolute-URI vectors are recovered by the read-side
    normalizer on an unmoved table; `compact()` is the documented
    migration before moving those.)"""
    import shutil

    src = str(tmp_path / "orig")
    dst = str(tmp_path / "relocated")
    t = ManifestTable(src)
    t.write(
        spark.createDataFrame([(i, i % 10) for i in range(200)], "id long, val int")
        .repartition(3)
    )
    t.delete_where(spark, [("val", "==", 3)], merge_on_read=True)
    assert t.snapshot().dvs
    want = {(r.id, r.val) for r in t.read(spark).collect()}
    assert len(want) == 180
    shutil.move(src, dst)
    moved = ManifestTable(dst)
    assert moved.snapshot().dvs, "move must not drop the DV mapping"
    got = {(r.id, r.val) for r in moved.read(spark).collect()}
    assert got == want, "deleted rows reappeared after the directory move"
    # and further MOR deletes at the new location stack correctly
    moved.delete_where(spark, [("val", "==", 7)], merge_on_read=True)
    assert moved.read(spark).count() == 160


def _physical_rows(spark, path):
    """Read every data parquet under the table DIRECTLY (no manifest,
    no DV application) — what a disk forensics pass would see. DV
    sidecars are (file_path, row_index) relations; data files carry the
    table schema, so select the table columns and let sidecars be
    excluded by schema."""
    import os

    files = []
    for root, _dirs, names in os.walk(path):
        if "_manifest" in root:
            continue
        for n in names:
            if n.endswith(".parquet"):
                files.append(os.path.join(root, n))
    rows = set()
    for f in files:
        df = spark.read.parquet(f)
        if set(df.columns) >= {"id", "val"}:
            rows.update((r.id, r.val) for r in df.select("id", "val").collect())
    return rows


@pytest.mark.parametrize("mor", [False, True])
def test_gdpr_erasure_is_physical_after_maintenance(spark, tmp_path, mor):
    """The GDPR guarantee is PHYSICAL (r7 verdict item 7): after the
    erasure flow — delete (+compact when merge-on-read: DVs only MASK
    rows; applying them is what rewrites the data) + expire(keep_last=1)
    + vacuum — no parquet file left under the table contains a deleted
    row, read directly from disk rather than through the manifest."""
    import shutil

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    base = str(tmp_path / "t")

    @given(erase_vals=st.sets(st.integers(0, 9), min_size=1, max_size=4))
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(erase_vals):
        shutil.rmtree(base, ignore_errors=True)
        t = ManifestTable(base)
        t.write(
            spark.createDataFrame(
                [(i, i % 10) for i in range(100)], "id long, val int"
            ).repartition(3)
        )
        for v in sorted(erase_vals):
            t.delete_where(spark, [("val", "==", v)], merge_on_read=mor)
        if mor:
            # a DV-only delete leaves bytes in place — time travel still
            # serves them and the disk still holds them; compact()
            # applies the vectors (the erasure-critical rewrite)
            assert any(
                r[1] in erase_vals for r in _physical_rows(spark, base)
            ), "MOR delete should NOT be physical before compact"
            t.compact(spark, n_files=2)
        t.expire(keep_last=1)
        t.vacuum(older_than_s=0.0)
        left = _physical_rows(spark, base)
        assert left, "table must still hold the survivors"
        assert not {r for r in left if r[1] in erase_vals}, (
            f"deleted rows physically present after erasure flow: mor={mor}"
        )
        # logical view agrees with the physical one
        got = {(r.id, r.val) for r in t.read(spark).collect()}
        assert got == left

    run()


def test_write_expected_base_version_is_a_true_cas(spark, tmp_path):
    """`expected_base_version` turns write into a compare-and-swap on
    the snapshot the caller decided from: a stale expectation is
    refused (CommitConflict, table untouched), a correct one commits
    at exactly expected+1 — the contract the erasure-log id stamping
    and the retrain backfill rebase depend on."""
    t = ManifestTable(str(tmp_path / "t"))
    df = spark.range(3).withColumnRenamed("id", "k")
    t.write(df)  # v1
    with pytest.raises(CommitConflict, match="expected base version"):
        t.write(df, mode="append", expected_base_version=0)
    assert t.snapshot().version == 1  # refused commit left no trace
    assert t.read(spark).count() == 3
    snap = t.write(df, mode="append", expected_base_version=1)
    assert snap.version == 2 and t.read(spark).count() == 6

    # bootstrap shape: expected 0 succeeds ONLY on a never-written
    # table — the blind-overwrite truncation race this closes
    t2 = ManifestTable(str(tmp_path / "t2"))
    assert t2.write(df, expected_base_version=0).version == 1
    with pytest.raises(CommitConflict, match="expected base version"):
        t2.write(df, expected_base_version=0)
    assert t2.read(spark).count() == 3
