"""Incremental-ingest audit artifact — run two consecutive id-ordered
shards through the full incremental curation ladder
(`plans/incremental_ingest.ingest_shard`) against fresh persisted
state, print the per-pass funnels plus the final curated accounting,
and VERIFY the equivalence contract in-line: the two-pass state read
must equal one batch `curate_corpus` pass over the union, per-doc, at
every ladder stage.

Usage::

    python -m real_time_data_engineering_spark.checks.ingest [SF_DIR]

Exits non-zero on any stage mismatch. Part of ``make round-artifacts``
(the INGEST_r{N}.txt evidence file).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time


def main(sf_dir: str = "/root/testdata/sf0.1") -> int:
    from pyspark.sql import functions as F

    from ..operators.quality import load_probe
    from ..plans import incremental_ingest as I
    from ..plans.curation_pipeline import curate_corpus
    from ..session import get_spark
    from ..sources.readers import load_table

    spark = get_spark(app_name="ingest_audit")
    t0 = time.time()
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    mm = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (int(mm[0]) + int(mm[1])) // 2
    state = tempfile.mkdtemp(prefix="ingest_audit_") + "/state"

    try:
        for doc_pred, vec_pred in (
            (F.col("doc_id") <= mid, F.col("vec_id") <= mid),
            (F.col("doc_id") > mid, F.col("vec_id") > mid),
        ):
            t = time.time()
            rep = I.ingest_shard(spark, state, docs.filter(doc_pred), emb.filter(vec_pred))
            print(f"-- pass {rep.pass_id} ({time.time() - t:.1f}s)", flush=True)
            for stage, n in rep.as_dict().items():
                if stage != "pass":
                    print(f"{stage:16s} {n:>9d}", flush=True)

        sampled, sharded, accounting = I.curated_outputs(spark, state, n_shards=8)
        print("-- curated accounting (shard, n_docs, total_tokens)", flush=True)
        for r in accounting.orderBy("shard").collect():
            print(f"shard {int(r.shard):>2d}  {int(r.n_docs):>7d}  {int(r.total_tokens):>10d}", flush=True)

        # equivalence verdict: incremental state read vs one batch pass
        # — semantic stage INCLUDED (r9): both sides bucket with the
        # bootstrap-frozen coarse quantizer and judge at the 0.35 radius
        weights = load_probe(spark, I._paths(state)["probe"])
        batch = curate_corpus(
            spark, sf_dir, probe_weights=weights,
            decontam_phrases=I.DEFAULT_PHRASES,
            semantic_dedup=True,
            semantic_centroids=I.frozen_centroids(spark, state),
        )
        inc = I.stage_sets(spark, state)
        bad = 0
        for stage, bdf in (
            ("exact_unique", batch.exact_unique),
            ("neardup_keep", batch.neardup_keep),
            ("semantic_keep", batch.semantic_keep),
            ("quality_pass", batch.quality_pass),
            ("probe_keep", batch.probe_keep),
            ("decontaminated", batch.decontaminated),
        ):
            got = {r.doc_id for r in inc[stage].select("doc_id").collect()}
            want = {r.doc_id for r in bdf.select("doc_id").collect()}
            ok = got == want
            bad += not ok
            print(
                f"equiv {stage:16s} inc={len(got):>7d} batch={len(want):>7d} "
                f"{'OK' if ok else 'MISMATCH'}",
                flush=True,
            )
        want_sh = {(r.doc_id, r.shard) for r in batch.sharded.collect()}
        got_sh = {(r.doc_id, r.shard) for r in sharded.collect()}
        ok = got_sh == want_sh
        bad += not ok
        print(f"equiv {'sharded':16s} inc={len(got_sh):>7d} batch={len(want_sh):>7d} "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)

        # erasure verdict (r8): forget two kept docs across ALL derived
        # state, then verify nothing serves them and — the physical
        # guarantee — no parquet file under the state dir still carries
        # a forgotten row (direct file reads, not manifest reads).
        t = time.time()
        kept = inc["neardup_keep"]
        gone = sorted(int(r.doc_id) for r in kept.limit(2).collect())
        audit = I.forget_docs(spark, state, gone, vectors=emb, physical=True)
        print(f"-- forget_docs({gone}) ({time.time() - t:.1f}s)", flush=True)
        for surface, n in sorted(audit.items()):
            print(f"erased {surface:16s} {n:>9d} rows", flush=True)
        import os

        import pyarrow.parquet as pq

        leaked: set[int] = set()
        for dirpath, _dirs, files in os.walk(state):
            if "_erasure_log" in dirpath:
                continue  # the Art. 30 record retains erased IDs lawfully
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                tbl = pq.read_table(os.path.join(dirpath, f))
                for col in ("doc_id", "vec_id", "keeper", "root", "twin"):
                    if col in tbl.column_names:
                        leaked |= set(tbl.column(col).to_pylist()) & set(gone)
        served = {
            int(r.doc_id)
            for s in I.stage_sets(spark, state).values()
            for r in s.select("doc_id").collect()
        } & set(gone)
        ok = not leaked and not served
        bad += not ok
        print(
            f"equiv {'forget':16s} served={sorted(served)} "
            f"on_disk={sorted(leaked)} {'OK' if ok else 'MISMATCH'}",
            flush=True,
        )
        print(f"ingest audit: 2 passes + equivalence + erasure in {time.time() - t0:.1f}s "
              f"({'ALL OK' if not bad else f'{bad} MISMATCHES'})", flush=True)
        return 1 if bad else 0
    finally:
        shutil.rmtree(state.rsplit("/", 1)[0], ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
