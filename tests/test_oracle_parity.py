"""Every registered query must reconcile against the DuckDB oracle.

This mirrors the driver's t2 gate (CORRECTNESS_r{N}.json) but stricter:
value-exact comparison after canonical sorting, at sf0.001 for speed.

The diffs are PRECOMPUTED by a module fixture that overlaps the
stateless queries through a small thread pool (guide §2.6: the
per-query cost at sf0.001 is the job-scheduling floor, not compute, so
concurrent queries back-fill the idle executors — measured ~3x on this
file, the single biggest pytest line item). Every query keeps its own
parametrized test and its own failure. Queries that touch a persisted
work_dir (CAS manifests assume a single writer — the driver, bench and
sweep all run sequentially) run strictly sequentially afterwards, in
registration order, exactly like every other consumer.
"""

from __future__ import annotations

import threading

import pytest

from real_time_data_engineering_spark.registry import all_specs

from conftest import SF_DIR

#: Queries whose lineage WRITES a persisted per-(kind, corpus) work_dir
#: (AST-traced through the registry call graph: direct `work_dir` calls
#: + helpers). Single-writer by convention — never run concurrently.
STATEFUL = frozenset(
    {
        "q49_gdpr_delete_mor",
        "d42_bm25_index",
        "d43_countmin_union",
        "d44_index_decontam",
        "d45_incremental_dedup",
        "d46_minhash_index",
        "d51_incremental_ingest",
        "d52_bm25_forget",
        "d53_drift_retrain",
        "s11_hybrid_rrf_ann",
        "s13_hybrid_ann_recall",
        "s14_ivfpq_refine",
        "s18_ann_forget",
        "s20_range_search_ivf",
        "s21_range_recall",
    }
)


def _names():
    return sorted(all_specs())


@pytest.fixture(scope="module")
def parity_results(spark):
    from concurrent.futures import ThreadPoolExecutor

    from real_time_data_engineering_spark.checks.oracle import OracleDiffer

    tl = threading.local()

    def run_one(name: str):
        differ = getattr(tl, "differ", None)
        if differ is None:  # one DuckDB connection per worker thread
            differ = tl.differ = OracleDiffer(spark, SF_DIR)
        return name, differ.run(name)

    names = _names()
    results = {}
    stateless = [n for n in names if n not in STATEFUL]
    with ThreadPoolExecutor(max_workers=4) as pool:
        for name, res in pool.map(run_one, stateless, timeout=3600):
            results[name] = res
    for name in (n for n in names if n in STATEFUL):
        results[name] = run_one(name)[1]
    return results


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(parity_results, name):
    res = parity_results[name]
    res.raise_if_failed()
    assert res.spark_rows >= 0
