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
    # ...and no parquet file under the whole state dir still carries them
    for col in ("doc_id", "vec_id", "keeper"):
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

    # audit trail: one row per requested id per call, zero-count rows
    # recorded for the no-op second pass (the Art. 30 record)
    log = ManifestTable(I._paths(state)["erasure_log"]).read(spark)
    assert log.count() == 2 * (len(gone) + 1)
    assert log.filter(F.col("erasure_id") == 1).agg(
        F.max("rows_erased_total")
    ).first()[0] == 0
