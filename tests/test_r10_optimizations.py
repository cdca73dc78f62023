"""Round-10 optimization equivalence tests.

The r10 optimization round replaced the per-round distributed
pre-aggregation in the two Lloyd-style trainers (k-means, PQ
codebooks) with a one-stage per-task-combine + driver-fold when the
partial relation is provably driver-small, gated by a module constant
(``DIRECT_STATS_BOUND``).
Both paths must produce BIT-IDENTICAL training output — integer sums
are order-independent, so this is an exactness contract, not a
tolerance. These tests force each path via the module constant and
assert equality, so a future edit that breaks the parity (e.g. a
float fold) fails loudly instead of silently desynchronizing the
gated branches.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def embeddings(spark):
    from real_time_data_engineering_spark.sources.readers import load_table

    return load_table(spark, SF_DIR, "embeddings").cache()


def test_kmeans_direct_and_distributed_round_stats_bit_identical(
    spark, embeddings, monkeypatch
):
    import real_time_data_engineering_spark.operators.similarity as S

    # force >1 partition so the per-task combine actually combines
    emb = embeddings.repartition(5)
    monkeypatch.setattr(S, "DIRECT_STATS_BOUND", 1_000_000)
    out_d, cents_d = S.kmeans_assign(emb, k=4, max_iter=5, with_centroids=True)
    rows_d = {(r.vec_id, r.cluster, r.dist_sq) for r in out_d.collect()}
    monkeypatch.setattr(S, "DIRECT_STATS_BOUND", 0)
    out_x, cents_x = S.kmeans_assign(emb, k=4, max_iter=5, with_centroids=True)
    rows_x = {(r.vec_id, r.cluster, r.dist_sq) for r in out_x.collect()}
    assert np.array_equal(cents_d, cents_x)  # bit-identical centroids
    assert rows_d == rows_x


def test_pq_direct_and_distributed_round_stats_bit_identical(
    spark, embeddings, monkeypatch
):
    import real_time_data_engineering_spark.operators.similarity as S

    emb = embeddings.repartition(5)
    monkeypatch.setattr(S, "DIRECT_STATS_BOUND", 1_000_000)
    codes_d, books_d = S.pq_train_codes(emb, m=8, k=8, max_iter=4)
    rows_d = {(r.vec_id, r.sub, r.code) for r in codes_d.collect()}
    monkeypatch.setattr(S, "DIRECT_STATS_BOUND", 0)
    codes_x, books_x = S.pq_train_codes(emb, m=8, k=8, max_iter=4)
    rows_x = {(r.vec_id, r.sub, r.code) for r in codes_x.collect()}
    assert np.array_equal(books_d, books_x)  # bit-identical codebooks
    assert rows_d == rows_x


# NOTE: a matching direct-collect rewrite of the quality-probe GD
# rounds was tried and REVERTED: the probe's per-round aggregation was
# already pure-JVM codegen (decimal sums with map-side partials), and
# moving it onto the Python/Arrow boundary tripled d47/d48/d50 wall
# time (2.5 s → 8.4 s at sf0.1) — guide §4.1's boundary cost in the
# wrong direction. See OPTIMIZATION_r10.md. The k-means/PQ cases above
# differ because their per-round pass was ALREADY a mapInPandas kernel;
# the rewrite there only removed the posexplode/groupBy exchange.


def test_bm25_single_pass_equals_two_pass_formulation(spark):
    """r10 lexical-chain rewrite: `corpus_stats` computes dl as
    size(token array) — a narrow projection, no explode+groupBy
    exchange, no separate docs.count() scan — and `bm25_scores`
    derives tf AND df from ONE (term, doc_id)-keyed aggregation over a
    single tokenize pass. Both must be BIT-IDENTICAL to the pre-r10
    two-pass formulation, spelled literally below (a token-less doc is
    unioned in so the n_docs-vs-avgdl-denominator split is exercised
    too)."""
    from pyspark.sql import functions as F

    from real_time_data_engineering_spark.operators.retrieval import (
        _bm25_from_parts,
        bm25_scores,
        corpus_stats,
        tokens_df,
    )
    from real_time_data_engineering_spark.sources.readers import load_table

    base = load_table(spark, SF_DIR, "documents")
    extra = spark.createDataFrame(
        [(900_000_001, "12345 --- !!!", "xx", "synthetic", 13)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs = base.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        extra
    )
    tok = tokens_df(docs)
    n_docs, avgdl, dl = corpus_stats(docs, tok)

    # the old dl/n_docs/avgdl formulation, spelled out
    old_dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    assert {(r.doc_id, r.dl) for r in dl.collect()} == {
        (r.doc_id, r.dl) for r in old_dl.collect()
    }
    assert n_docs == float(docs.count())
    row = old_dl.agg(F.sum("dl").alias("s"), F.count("*").alias("c")).first()
    assert avgdl == float(row["s"]) / float(row["c"])

    qterms = (
        tok.filter(F.col("doc_id") < 5)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    got = bm25_scores(tok, qterms, n_docs, avgdl, dl, exclude_self=True)

    # the old two-pass tf/df formulation, spelled out
    tf = (
        tok.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    dfq = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    want = _bm25_from_parts(tf, dfq, dl, n_docs, avgdl, 1.2, 0.75)

    def key(df):
        return {
            (r.query_id, r.doc_id, str(r.score_x), r.n_terms_matched)
            for r in df.collect()
        }

    assert key(got) == key(want) and key(got)
