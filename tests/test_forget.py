"""GDPR right-to-be-forgotten across DERIVED state (r8): erasure must
reach every persisted index, not just the source table. Contracts:

* the manifest's ``in`` predicate op — the write-side `read_any_of` —
  stats-prunes and deletes exactly;
* lexical: forget + serve is BIT-IDENTICAL to an index rebuilt from the
  survivors (BM25's sufficient statistics are linear in the doc set);
* MinHash: probes after a forget equal probes of a survivor-built index
  (per-doc rows carry no cross-doc state);
* fingerprint registry: erasing a retained doc deletes its content's
  fingerprint rows, so re-ingesting identical content classifies `new`;
* IVF-PQ: erased ids never surface, and with the exact routing
  decrement the re-aggregated routing stats equal the survivor sums;
* physical=True leaves NO parquet file under the index containing an
  erased row (the on-disk guarantee erasure actually requires);
* the plan-level `forget_docs` composes all of it over one state dir.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from real_time_data_engineering_spark.operators.manifest import ManifestTable
from real_time_data_engineering_spark.sources.readers import load_table

from conftest import SF_DIR

FORGET_IDS = [3, 53, 103, 153]


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 300).cache()


@pytest.fixture(scope="module")
def survivors(spark, documents):
    return documents.filter(~F.col("doc_id").isin(FORGET_IDS)).cache()


def _parquet_ids_under(root: str, col: str) -> set[int]:
    """Every value of ``col`` readable from ANY parquet data file under
    ``root`` — reads files directly (NOT through the manifest), so
    merge-on-read tombstones don't hide rows: this is what a disk
    forensics pass would see. The ``_erasure_log`` is excluded by
    design: the GDPR Art. 30 record of WHAT was erased retains the
    erased IDS (no content) lawfully — it is the compliance artifact,
    not a leak."""
    out: set[int] = set()
    for dirpath, _dirs, files in os.walk(root):
        if "_erasure_log" in dirpath:
            continue
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(dirpath, f))
            if col in t.column_names:
                out.update(x for x in t.column(col).to_pylist() if x is not None)
    return out


# ---------------------------------------------------------------------------
# the `in` predicate op (manifest layer)
# ---------------------------------------------------------------------------


def test_in_predicate_prunes_files_and_deletes_exactly(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = ManifestTable(str(tmp_path / "t"))
    t.write(df, cluster_by=["k"], n_files=8)
    # stats pruning: a tight id cluster admits only its range's files
    assert len(t.files_for([("k", "in", [3, 5, 7])])) < len(t.snapshot().files)
    t.delete_where(spark, [("k", "in", [3, 5, 7, 999])], merge_on_read=True)
    left = {r.k for r in t.read(spark).collect()}
    assert left == set(range(1000)) - {3, 5, 7, 999}
    # empty in-list matches nothing: a true no-op
    v = t.snapshot().version
    t.delete_where(spark, [("k", "in", [])], merge_on_read=True)
    assert t.snapshot().version == v


# ---------------------------------------------------------------------------
# lexical index
# ---------------------------------------------------------------------------


def test_lexical_forget_equals_rebuild_from_survivors(
    spark, documents, survivors, tmp_path
):
    from real_time_data_engineering_spark.operators.retrieval import (
        bm25_literal_queries,
        forget_from_lexical_index,
        lexical_index_bm25,
        write_lexical_index,
    )

    q = bm25_literal_queries(
        spark, ((1, "hash"), (1, "join"), (2, "stream"), (2, "window"))
    )
    forgot, rebuilt = str(tmp_path / "forgot"), str(tmp_path / "rebuilt")
    write_lexical_index(documents, forgot, n_files=4)
    forget_from_lexical_index(spark, forgot, FORGET_IDS, physical=True)
    write_lexical_index(survivors, rebuilt, n_files=4)

    def scores(path):
        return {
            (r.query_id, r.doc_id, str(r.score_x), r.n_terms_matched)
            for r in lexical_index_bm25(spark, path, q).collect()
        }

    assert scores(forgot) == scores(rebuilt)
    # physical guarantee: no data file under the index still carries a
    # forgotten doc's rows
    assert not set(FORGET_IDS) & _parquet_ids_under(forgot, "doc_id")


# ---------------------------------------------------------------------------
# MinHash index
# ---------------------------------------------------------------------------


def test_minhash_forget_equals_rebuild_from_survivors(
    spark, documents, survivors, tmp_path
):
    from real_time_data_engineering_spark.operators.dedup import (
        forget_from_minhash_index,
        minhash_index_probe,
        write_minhash_index,
    )

    shard = (
        documents.filter(F.col("doc_id").isin(FORGET_IDS) | (F.col("doc_id") < 30))
        .select((F.col("doc_id") + 10_000).alias("doc_id"), "text", "source", "lang")
    )
    forgot, rebuilt = str(tmp_path / "forgot"), str(tmp_path / "rebuilt")
    write_minhash_index(documents, forgot)
    forget_from_minhash_index(spark, forgot, FORGET_IDS, physical=True)
    write_minhash_index(survivors, rebuilt)

    def probe(path):
        return {
            (r.new_id, r.old_id, str(r.est_jaccard))
            for r in minhash_index_probe(spark, shard, path).collect()
        }

    got = probe(forgot)
    assert got == probe(rebuilt)
    assert not {o for _n, o, _j in got} & set(FORGET_IDS)
    assert not set(FORGET_IDS) & _parquet_ids_under(forgot, "doc_id")


# ---------------------------------------------------------------------------
# fingerprint registry
# ---------------------------------------------------------------------------


def test_fingerprint_forget_makes_reingest_new(spark, documents, tmp_path):
    from real_time_data_engineering_spark.operators.dedup import (
        forget_fingerprint_registry,
        incremental_exact_dedup,
        read_fingerprint_registry,
        write_fingerprint_registry,
    )

    path = str(tmp_path / "fp")
    write_fingerprint_registry(documents, path)
    # re-ingesting the erased doc's exact content under a new id...
    reingest = documents.filter(F.col("doc_id") == FORGET_IDS[0]).select(
        F.lit(99_999).cast("long").alias("doc_id"), "text", "source", "lang"
    )
    before = incremental_exact_dedup(
        reingest, read_fingerprint_registry(spark, path)
    ).first()
    assert before.status == "dup_of_corpus"  # ...is a dup while retained
    forget_fingerprint_registry(spark, path, FORGET_IDS, physical=True)
    after = incremental_exact_dedup(
        reingest, read_fingerprint_registry(spark, path)
    ).first()
    assert after.status == "new"  # erased content is GONE, not remembered
    # and no keeper row under the registry still names an erased id
    assert not set(FORGET_IDS) & _parquet_ids_under(path, "keeper")


# ---------------------------------------------------------------------------
# IVF-PQ index
# ---------------------------------------------------------------------------


def test_ivfpq_forget_excludes_erased_and_decrements_routing(spark, tmp_path):
    from real_time_data_engineering_spark.operators.ann_index import (
        _routing_stats,
        forget_from_ivfpq_index,
        ivfpq_index_topk,
        write_ivfpq_index,
    )
    from real_time_data_engineering_spark.operators.similarity import with_quantized

    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 300).cache()
    gone = [23, 73, 123, 173]
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, n_cells=4, m=4, k_codes=8, manifest_codes=True)
    forget_from_ivfpq_index(spark, path, gone, vectors=emb, physical=True)

    res = ivfpq_index_topk(
        spark, path, emb.filter(F.col("vec_id") < 20), topk=5, exclude_self=True
    )
    assert res.count() == 100
    assert not {r.nid for r in res.collect()} & set(gone)

    # exact routing decrement: re-aggregated stats == survivor sums
    surv = with_quantized(emb.filter(~F.col("vec_id").isin(gone)), "embedding")
    # recompute each survivor's per-cell sums using the INDEX's own
    # assignment (codes rows carry the cluster)
    codes_clusters = (
        ManifestTable(os.path.join(path, "codes"))
        .read(spark)
        .select("vec_id", "cluster")
        .distinct()
    )
    want = {
        (r.cluster, tuple(r.cent_s), r.c)
        for r in surv.join(codes_clusters, "vec_id")
        .select("cluster", F.posexplode("emb_q").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.sum("v").alias("s"))
        .groupBy("cluster")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "s"))).getField("s").alias("cent_s")
        )
        .join(
            surv.join(codes_clusters, "vec_id").groupBy("cluster").agg(F.count("*").alias("c")),
            "cluster",
        )
        .collect()
    }
    got = {
        (r.cluster, tuple(r.cent_s), r.c) for r in _routing_stats(spark, path).collect()
    }
    assert got == want

    # physical guarantee on the codes (the derived personal data)
    assert not set(gone) & _parquet_ids_under(os.path.join(path, "codes"), "vec_id")


def test_lexical_double_forget_raises_instead_of_corrupting_n(
    spark, documents, tmp_path
):
    """Forgetting an id with no doclen row (double-forget / never
    ingested) must RAISE at the decrement site under the default strict
    mode — a silent −1 on n_docs would skew every later idf."""
    from real_time_data_engineering_spark.operators.retrieval import (
        forget_from_lexical_index,
        write_lexical_index,
    )

    path = str(tmp_path / "lex")
    write_lexical_index(documents, path, n_files=4)
    forget_from_lexical_index(spark, path, FORGET_IDS[:2], physical=True)
    with pytest.raises(ValueError, match="no doclen row"):
        forget_from_lexical_index(spark, path, FORGET_IDS[:2])  # double
    with pytest.raises(ValueError, match="no doclen row"):
        forget_from_lexical_index(spark, path, [987_654])  # never ingested
    # stats untouched by the refused calls: N reflects exactly one forget
    stats = (
        ManifestTable(os.path.join(path, "_stats"))
        .read(spark)
        .agg(F.sum("n_docs"))
        .first()[0]
    )
    assert int(stats) == documents.count() - 2


def test_lexical_forget_physical_keeps_postings_layout(
    spark, documents, tmp_path
):
    """The erasure rewrite must preserve the build's n_files postings
    layout (term clustering + file count), not collapse to one file —
    collapsed files un-prune every later term probe."""
    from real_time_data_engineering_spark.operators.retrieval import (
        forget_from_lexical_index,
        write_lexical_index,
    )

    path = str(tmp_path / "lex")
    write_lexical_index(documents, path, n_files=4)
    forget_from_lexical_index(
        spark, path, FORGET_IDS, physical=True, n_files=4
    )
    post_t = ManifestTable(os.path.join(path, "postings"))
    assert len(post_t.snapshot().files) == 4


def test_ivfpq_forget_ignores_ids_without_codes(spark, tmp_path):
    """Mixed-ingest safety (ADVICE r8): forgetting ids the index never
    saw — with `vectors` covering them — must not corrupt the routing
    stats: the negative delta only covers vectors whose codes rows were
    actually present, so the survivor-sum identity still holds."""
    from real_time_data_engineering_spark.operators.ann_index import (
        _routing_stats,
        forget_from_ivfpq_index,
        write_ivfpq_index,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    indexed = emb.filter(F.col("vec_id") < 200)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(indexed, path, n_cells=4, m=4, k_codes=8, manifest_codes=True)
    before = {
        (r.cluster, tuple(r.cent_s), r.c)
        for r in _routing_stats(spark, path).collect()
    }
    # ids 300/301 were never indexed (the embedding-less-shard shape);
    # passing the FULL corpus as `vectors` must still be a no-op for them
    forget_from_ivfpq_index(spark, path, [300, 301], vectors=emb, physical=True)
    after = {
        (r.cluster, tuple(r.cent_s), r.c)
        for r in _routing_stats(spark, path).collect()
    }
    assert after == before
    # a real forget mixed with phantom ids decrements ONLY the real one
    forget_from_ivfpq_index(spark, path, [7, 300, 301], vectors=emb, physical=True)
    # double-forgetting the same mix is again a no-op
    mid = {
        (r.cluster, tuple(r.cent_s), r.c)
        for r in _routing_stats(spark, path).collect()
    }
    forget_from_ivfpq_index(spark, path, [7, 300], vectors=emb, physical=True)
    assert {
        (r.cluster, tuple(r.cent_s), r.c)
        for r in _routing_stats(spark, path).collect()
    } == mid
    assert 7 not in _parquet_ids_under(os.path.join(path, "codes"), "vec_id")


def test_ivfpq_forget_physical_keeps_per_cell_layout(spark, tmp_path):
    """The erasure rewrite must re-pin one file per live cell so the
    manifest's per-file cluster stats keep pruning unprobed cells."""
    from real_time_data_engineering_spark.operators.ann_index import (
        forget_from_ivfpq_index,
        write_ivfpq_index,
    )

    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 300)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, n_cells=4, m=4, k_codes=8, manifest_codes=True)
    forget_from_ivfpq_index(spark, path, [23, 73], vectors=emb, physical=True)
    codes_t = ManifestTable(os.path.join(path, "codes"))
    live_cells = codes_t.read(spark).select("cluster").distinct().count()
    files = codes_t.snapshot().files
    # range partitioning may merge adjacent small cells into one file,
    # but must never collapse to the single unprunable file a
    # byte-targeted compact would emit
    assert 1 < len(files) <= live_cells
    # and the layout actually prunes: one cell's probe admits < all files
    some_cell = int(codes_t.read(spark).select("cluster").first()[0])
    assert len(codes_t.files_for([("cluster", "in", [some_cell])])) < len(files)


def test_ivfpq_forget_requires_manifest_codes(spark, tmp_path):
    from real_time_data_engineering_spark.operators.ann_index import (
        forget_from_ivfpq_index,
        write_ivfpq_index,
    )

    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 100)
    path = str(tmp_path / "hive")
    write_ivfpq_index(emb, path, n_cells=4, m=4, k_codes=8)  # hive layout
    with pytest.raises(ValueError, match="manifest-backed"):
        forget_from_ivfpq_index(spark, path, [5])


# ---------------------------------------------------------------------------
# plan-level composition
# ---------------------------------------------------------------------------


def test_plan_forget_docs_erases_every_surface(spark, tmp_path):
    from real_time_data_engineering_spark.plans import incremental_ingest as I

    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 240)
    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 240)
    state = str(tmp_path / "state")
    I.ingest_shard(spark, state, docs.filter("doc_id < 120"), emb.filter("vec_id < 120"))
    I.ingest_shard(spark, state, docs.filter("doc_id >= 120"), emb.filter("vec_id >= 120"))

    # forget two docs the ladder actually kept (so every surface has rows)
    kept = I.stage_sets(spark, state)["neardup_keep"]
    gone = sorted(int(r.doc_id) for r in kept.limit(2).collect())
    audit = I.forget_docs(spark, state, gone, vectors=emb, physical=True)
    assert audit["fingerprints"] > 0
    assert audit["minhash_bands"] > 0
    assert audit["curated"] > 0

    # no surface serves the ids any more...
    for stage, df in I.stage_sets(spark, state).items():
        assert not {int(r.doc_id) for r in df.select("doc_id").collect()} & set(gone), stage
    # ...and no parquet file under the whole state dir still carries
    # them in ANY id-bearing column — root pointers included
    for col in ("doc_id", "vec_id", "keeper", "root", "twin"):
        assert not set(gone) & _parquet_ids_under(state, col), col

    # erased content re-ingested under fresh ids is judged on its own: new
    reborn = docs.filter(F.col("doc_id").isin(gone)).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text", "source", "lang"
    )
    rep = I.ingest_shard(spark, state, reborn)
    assert rep.n_new == len(gone)


def test_plan_forget_docs_is_idempotent_and_dup_safe(spark, tmp_path):
    """Forgetting the same ids twice — or ids that were never indexed
    (exact dups the ladder classified and dropped) — must erase zero
    rows the second time and leave the lexical stats EXACT: the N
    decrement counts only docs currently in the index, so BM25 after
    any forget sequence still equals a rebuild from the survivors."""
    from real_time_data_engineering_spark.operators.manifest import ManifestTable
    from real_time_data_engineering_spark.operators.retrieval import (
        bm25_literal_queries,
        lexical_index_bm25,
        write_lexical_index,
    )
    from real_time_data_engineering_spark.plans import incremental_ingest as I

    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 120)
    # append an exact dup of doc 5 under id 200: classified dup, never indexed
    dup = docs.filter("doc_id == 5").select(
        F.lit(200).cast("long").alias("doc_id"), "text", "source", "lang"
    )
    state = str(tmp_path / "state")
    I.ingest_shard(spark, state, docs)
    I.ingest_shard(spark, state, dup)

    kept = I.stage_sets(spark, state)["neardup_keep"]
    gone = sorted(int(r.doc_id) for r in kept.limit(2).collect())
    first = I.forget_docs(spark, state, gone + [200], physical=True)
    assert first["postings"] > 0
    # second pass: nothing left to erase on any index surface
    second = I.forget_docs(spark, state, gone + [200], physical=True)
    assert all(v == 0 for v in second.values()), second

    # lexical stats stayed exact through dup-id + double forget: the
    # served index equals one rebuilt from the curated survivors
    survivors = docs.join(
        I.stage_sets(spark, state)["exact_unique"], "doc_id"
    )
    rebuilt = str(tmp_path / "rebuilt")
    write_lexical_index(survivors, rebuilt)
    q = bm25_literal_queries(spark, ((1, "hash"), (2, "stream")))

    def scores(path):
        return {
            (r.query_id, r.doc_id, str(r.score_x))
            for r in lexical_index_bm25(spark, path, q).collect()
        }

    assert scores(I._paths(state)["lexical"]) == scores(rebuilt)

    # audit trail: ONE summary row per call with DISTINCT CAS-derived
    # ids; the no-op second pass records an explicit zero-count entry
    # (the Art. 30 record), and per-surface counts sum to the total
    log = sorted(
        ManifestTable(I._paths(state)["erasure_log"]).read(spark).collect(),
        key=lambda r: int(r.erasure_id),
    )
    assert len(log) == 2
    assert log[0].erasure_id != log[1].erasure_id
    for row in log:
        assert sorted(row.doc_ids) == sorted(gone + [200])
        assert int(row.n_ids) == len(gone) + 1
        surfaces = (
            row.fingerprints + row.minhash_bands + row.postings + row.ann_codes
            + row.vectors + row.semantic + row.clusters + row.curated
            + row.train_scores
        )
        assert int(row.rows_erased_total) == int(surfaces)
    assert int(log[0].rows_erased_total) == sum(first.values())
    assert int(log[1].rows_erased_total) == 0


def test_forget_keeper_tombstones_member_root_pointers(spark, tmp_path):
    """Erasing a near-dup KEEPER must also scrub its id from surviving
    members' `root` columns (ADVICE r8: the forensics walk now scans
    `root`): members re-root to the -1 tombstone, stay suppressed, and
    later ingests neither elect the tombstone nor bridge through it."""
    from real_time_data_engineering_spark.plans import incremental_ingest as I

    base_text = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the quiet green field before it rests for a while"
    )
    rows = [
        (1, "a", base_text + " zz"),
        (2, "a", base_text + " qq"),  # near-dup of 1; 1 keeps (min-id tie)
        (3, "a", "completely unrelated words live here today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    state = str(tmp_path / "state")
    I.ingest_shard(spark, state, docs)
    kept = {int(r.doc_id) for r in I.stage_sets(spark, state)["neardup_keep"].collect()}
    assert kept == {1, 3}  # 2 suppressed under keeper 1

    I.forget_docs(spark, state, [1], physical=True)
    # the member stays suppressed (quasi-copy of erased content)...
    after = {int(r.doc_id) for r in I.stage_sets(spark, state)["neardup_keep"].collect()}
    assert after == {3}
    # ...and NO column on disk still carries the erased id — root included
    for col in ("doc_id", "keeper", "root"):
        assert 1 not in _parquet_ids_under(state, col), col
    # the tombstone is current for the member and carries no erased score
    cur = {int(r.doc_id): r for r in I.clusters_current(spark, state).collect()}
    assert int(cur[2].root) == -1 and cur[2].root_q == float("inf")

    # a later shard near-dup of the SUPPRESSED member is judged on its
    # own: it neither roots at -1 nor resurrects the member
    fresh = spark.createDataFrame(
        [(10, "a", base_text + " rr")], "doc_id long, source string, text string"
    )
    I.ingest_shard(spark, state, fresh)
    final = {int(r.doc_id) for r in I.stage_sets(spark, state)["neardup_keep"].collect()}
    assert final == {3, 10}
    cur2 = {int(r.doc_id): int(r.root) for r in I.clusters_current(spark, state).collect()}
    assert cur2[10] == 10 and cur2[2] == -1


def test_erasure_log_ids_are_unique_under_concurrency(spark, tmp_path):
    """Two (here: four) concurrent forgets must mint DISTINCT erasure
    ids and each land exactly once — the read-max-then-append scheme
    this replaced could double-assign an id (r8 verdict item; the id is
    now the CAS-committed manifest version)."""
    import threading

    from real_time_data_engineering_spark.plans import incremental_ingest as I

    log_path = str(tmp_path / "_erasure_log")
    seqs: list[int] = []
    errors: list[Exception] = []
    lock = threading.Lock()

    def go(i: int) -> None:
        try:
            s = I._append_erasure_log(
                spark, log_path, [i], {"clusters": i}, True, max_attempts=20
            )
            with lock:
                seqs.append(s)
        except Exception as exc:  # surface, don't swallow
            with lock:
                errors.append(exc)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(set(seqs)) == 4, seqs
    rows = ManifestTable(log_path).read(spark).collect()
    assert len(rows) == 4
    assert {int(r.erasure_id) for r in rows} == set(seqs)
    # per-call totals are PER ROW (never a repeated call-wide sum)
    assert {int(r.rows_erased_total) for r in rows} == {0, 1, 2, 3}


def test_erasure_log_restamps_when_a_racer_wins_the_window(spark, tmp_path, monkeypatch):
    """DETERMINISTIC version of the id-CAS contract (the threaded test
    above only catches it by timing): force a competing erasure to
    commit in the exact snapshot→commit window. Without the
    expected-base-version CAS the loser's append would land at a later
    version still stamped with the stale seq — a duplicate erasure_id;
    with it the loser conflicts, restamps on the winner's snapshot and
    retries."""
    from real_time_data_engineering_spark.plans import incremental_ingest as I

    log_path = str(tmp_path / "_erasure_log")
    I._append_erasure_log(spark, log_path, [1], {"clusters": 1}, True)  # id 2
    orig = ManifestTable.write
    armed = {"on": True}

    def racy(self, df, mode="overwrite", **kw):
        if (
            armed["on"]
            and mode == "append"
            and kw.get("expected_base_version") is not None
            and self.path.endswith("_erasure_log")
        ):
            armed["on"] = False
            I._append_erasure_log(spark, log_path, [99], {"clusters": 99}, True)
        return orig(self, df, mode=mode, **kw)

    monkeypatch.setattr(ManifestTable, "write", racy)
    seq = I._append_erasure_log(spark, log_path, [2], {"clusters": 2}, True)
    rows = ManifestTable(log_path).read(spark).collect()
    ids = sorted(int(r.erasure_id) for r in rows)
    assert len(rows) == 3 and len(set(ids)) == 3, ids
    assert seq == max(ids)  # the loser restamped AFTER the winner
    # ids really are the manifest versions the rows committed as
    assert set(ids) <= set(ManifestTable(log_path).versions())


def test_erasure_log_bootstrap_race_never_truncates_audit_rows(spark, tmp_path, monkeypatch):
    """A racer whose empty-table check raced a winner's commit must NOT
    land a blind overwrite that truncates committed audit rows (GDPR
    audit-row loss): the bootstrap goes through the same version CAS
    (expected base 0), so the stale racer conflicts and falls through
    to a plain rebased append."""
    from real_time_data_engineering_spark.plans import incremental_ingest as I

    log_path = str(tmp_path / "_erasure_log")
    I._append_erasure_log(spark, log_path, [7], {"clusters": 7}, True)  # id 2
    orig = ManifestTable.versions
    stale = {"armed": True}

    def stale_versions(self):
        if stale["armed"] and self.path.endswith("_erasure_log"):
            stale["armed"] = False  # the racer's pre-check raced the winner
            return []
        return orig(self)

    monkeypatch.setattr(ManifestTable, "versions", stale_versions)
    seq = I._append_erasure_log(spark, log_path, [8], {"clusters": 8}, True)
    rows = ManifestTable(log_path).read(spark).collect()
    assert len(rows) == 2  # the winner's audit row SURVIVED
    assert {int(r.erasure_id) for r in rows} == {2, seq}
