"""Round-11 optimization equivalence tests.

The r11 round rebuilt ``connected_components`` as two tiers gated by
the measured edge-set byte size: a bounded driver union-find under
``DIRECT_EDGE_BOUND`` (mirroring r10's ``DIRECT_STATS_BOUND`` pattern)
and the large-star/small-star variant past it (adopted on the r11
replica measurement). Both paths must produce
IDENTICAL output — component membership is join-order independent and
min-of-component is deterministic, so this is an exactness contract.
These tests force each path via the module constant and assert
equality, including a string-id case (UTF-8 binary order must match
Python's code-point min).
"""

from __future__ import annotations

from conftest import SF_DIR  # noqa: F401 — scale anchor for future cases


def _cc_rows(df):
    return {(r.node, r.cluster_id, r.cluster_size) for r in df.collect()}


def test_cc_driver_and_distributed_paths_identical(spark, monkeypatch):
    from real_time_data_engineering_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (10, 11), (11, 12), (12, 10), (3, 1)],
        "d1 bigint, d2 bigint",
    )
    monkeypatch.setattr(D, "DIRECT_EDGE_BOUND", 1 << 30)
    direct = _cc_rows(D.connected_components(pairs))
    monkeypatch.setattr(D, "DIRECT_EDGE_BOUND", -1)
    dist = _cc_rows(D.connected_components(pairs))
    assert direct == dist
    assert direct == {
        (1, 1, 3), (2, 1, 3), (3, 1, 3),
        (7, 7, 2), (8, 7, 2),
        (10, 10, 3), (11, 10, 3), (12, 10, 3),
    }


def test_cc_driver_path_string_ids_match_star_variant(spark, monkeypatch):
    """String ids: Python's min (code points) must order like Spark's
    MIN (UTF-8 binary). The distributed min-label path's label-sum
    convergence probe is numeric-only (pre-existing; every registered
    consumer keys on bigint ids), so the distributed reference here is
    `connected_components_star`, whose count+xxhash64 fingerprint probe
    is type-agnostic."""
    from real_time_data_engineering_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [("docB", "docA"), ("docC", "docB"), ("x1", "x2")],
        "d1 string, d2 string",
    )
    monkeypatch.setattr(D, "DIRECT_EDGE_BOUND", 1 << 30)
    direct = _cc_rows(D.connected_components(pairs))
    star = _cc_rows(D.connected_components_star(pairs))
    assert direct == star
    assert ("docA", "docA", 3) in direct


def test_cc_driver_path_schema_matches_distributed(spark, monkeypatch):
    from real_time_data_engineering_spark.operators import dedup as D

    pairs = spark.createDataFrame([(1, 2)], "d1 bigint, d2 bigint")
    monkeypatch.setattr(D, "DIRECT_EDGE_BOUND", 1 << 30)
    direct = D.connected_components(pairs)
    monkeypatch.setattr(D, "DIRECT_EDGE_BOUND", -1)
    dist = D.connected_components(pairs)
    assert [(f.name, f.dataType) for f in direct.schema.fields] == [
        (f.name, f.dataType) for f in dist.schema.fields
    ]


def test_d15_oracle_green_through_driver_tier(spark, differ):
    """d15's registered lineage (default bound → driver tier at test
    scale) must still reconcile with the DuckDB oracle end-to-end."""
    res = differ.run("d15_dup_clusters")
    assert res.ok, res.mismatches
