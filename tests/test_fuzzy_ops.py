"""Property tests for operators without a SQL oracle.

The approximate operators (IVF ANN, 64-bit SimHash, MinHash estimates)
can't be hash-matched against DuckDB, so they're checked against their
own mathematical contracts — mirroring the reference's invariant-based
validation layer (SURVEY.md §5.6-5.7).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_engineering_spark.operators import dedup as D
from real_time_data_engineering_spark.operators import similarity as S
from real_time_data_engineering_spark.sources.readers import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF_DIR, "documents").cache()


def test_ivf_recall_against_brute_force(spark, embeddings):
    """Probing 2/10 cells must still recover most true neighbors, and
    every IVF result must be a genuine cosine (subset correctness)."""
    pred = F.col("vec_id") < 20
    exact_rows = S.cosine_topk(embeddings, pred, k=5).collect()
    exact = {(r.qid, r.nid) for r in exact_rows}
    exact_cos = {(r.qid, r.nid): r.cosine for r in exact_rows}

    def recall(n_probe: int) -> float:
        approx = S.ivf_topk(embeddings, pred, k=5, n_probe=n_probe).collect()
        for r in approx:  # any shared pair must carry the identical cosine
            if (r.qid, r.nid) in exact_cos:
                assert abs(r.cosine - exact_cos[(r.qid, r.nid)]) < 1e-12
        return len(exact & {(r.qid, r.nid) for r in approx}) / len(exact)

    r2, r10 = recall(2), recall(10)
    assert r10 == 1.0, f"probing all cells must be exhaustive, got {r10}"
    assert r2 >= 0.2, f"IVF recall collapsed: {r2}"


def test_minhash_estimates_track_exact_jaccard(spark, documents):
    """For LSH candidate pairs, |est − exact| must be small on average
    (k=16 signatures → std ≈ 0.125; mean abs error well under that)."""
    est = {(r.d1, r.d2): r.est_jaccard for r in D.minhash_candidate_pairs(documents).collect()}
    if not est:
        pytest.skip("no candidate pairs at this scale")
    exact = {(r.d1, r.d2): r.jaccard for r in D.jaccard_pairs(documents).collect()}
    errs = [abs(v - exact.get(kk, 0.0)) for kk, v in est.items()]
    assert sum(errs) / len(errs) < 0.25


def test_simhash64_properties(spark, documents):
    """Deterministic, full-coverage, 64-bit-range signatures; identical
    texts get identical signatures."""
    sig = D.simhash64(documents)
    rows = sig.collect()
    assert len(rows) == documents.count()
    again = {r.doc_id: r.simhash for r in D.simhash64(documents).collect()}
    for r in rows:
        assert again[r.doc_id] == r.simhash
    # duplicate text ⇒ duplicate signature
    doubled = documents.unionByName(documents.withColumn("doc_id", F.col("doc_id") + 10_000))
    d_sig = {r.doc_id: r.simhash for r in D.simhash64(doubled).collect()}
    for r in rows:
        assert d_sig[r.doc_id] == d_sig[r.doc_id + 10_000]


def test_exact_dedup_collapses_duplicates(spark, documents):
    doubled = documents.unionByName(documents.withColumn("doc_id", F.col("doc_id") + 10_000))
    groups = D.exact_dedup(doubled)
    assert groups.filter(F.col("n_copies") != 2).count() == 0
    survivors = D.dedup_keep_first(doubled)
    assert survivors.count() == documents.count()
    # keep-first policy: every survivor is the original (small) id
    assert survivors.filter(F.col("doc_id") >= 10_000).count() == 0
