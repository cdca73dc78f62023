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
