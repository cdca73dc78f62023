"""Query registry — the engine's declared capability surface.

Every operator from SURVEY.md §2 (plus the LLM-data-pipeline extensions)
is exposed here as a named query over the driver corpus, paired with an
ANSI-SQL oracle that DuckDB runs on the same parquet files. The driver
hash-compares both sides (order-insensitive, columns sorted by name), so
the registry is the machine-checked contract of what the engine can do.

Oracle-parity discipline (applies to every query in this package):

* **Exact arithmetic internally.** Money/measure doubles are cast to
  DECIMAL before any sum/product — decimal arithmetic is exact and
  order-independent, so Spark's partial aggregation over 32 (or 10 000)
  partitions equals DuckDB's single-threaded fold bit-for-bit.
* **Final outputs only in stable types**: BIGINT, DOUBLE (cast from an
  exact decimal, or produced by one identical double division on both
  sides), STRING, DATE, BOOLEAN. Never ROUND() a double — Spark rounds
  the shortest-decimal rendering (HALF_UP on BigDecimal) while DuckDB
  rounds the binary value, and they disagree on values like 2.675.
* **Timestamps are stringified** with an explicit microsecond format —
  raw timestamp hashing across engines is needlessly fragile.
* **Deterministic order-sensitivity**: any LIMIT/top-k/window orders by
  a unique tie-break key; mode() uses an explicit (count DESC, value
  ASC) rule on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One declared capability: a Spark query and (usually) its oracle."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def work_dir(kind: str, sf_dir: str) -> str:
    """Stable per-(query, corpus) scratch directory for registered
    queries whose semantics include PERSISTING an index/sketch (s11,
    d42, d43): one reused path per (kind, corpus), overwritten in
    place, bounds scratch disk to a single artifact per query per
    corpus — a fresh mkdtemp per call would leak one corpus-sized
    directory per bench iteration / sweep / driver run. Single-writer
    by convention (the bench, driver and sweep all run queries
    sequentially); the ManifestTable commits inside are CAS-protected
    regardless."""
    import hashlib
    import os
    import tempfile

    p = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_work",
        f"{kind}_{hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:8]}",
    )
    os.makedirs(p, exist_ok=True)
    return p


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Driver-budget ordering. The round-2 driver recorded exactly the first
# 50 registered queries (CORRECTNESS_r02.json cut q25/q26/q22/q23 — the
# last 4 in registration order), so whatever the budget is (query count
# or wall clock), REGISTRATION ORDER decides which checks make the
# artifact. The 50 queries green in earlier driver rounds keep the head
# positions; the tail holds (in order of decreasing signal) the round-3
# additions and upgrades — first-ever hash checks that must not evict a
# previously-green one under a budget — then q16 (a derivative summary
# of q3, doubly-green with unchanged code since r1) and finally q21,
# the one remaining rows-only check (HLL sketch — approximate by
# construction, accuracy property-tested instead).

# The 50 queries CORRECTNESS_r03 recorded green, IN ITS ORDER —
# re-confirmed by CORRECTNESS_r04 AND CORRECTNESS_r05 (same 50 keys,
# same order, 50/50 green each), so the pin freezes those artifacts
# too; tests/test_plans.py asserts the r5 key list verbatim. Without
# this pin, new round-4 analytics-module queries would register ahead
# of the dedup/mixing/similarity modules (import order) and silently
# evict previously-green rows from a budgeted artifact. Never reorder
# or remove entries here; append-only discipline lives in the round-4+
# additions that follow registration order after this block.
_R3_GREEN_HEAD = (
    "q1_daily_revenue", "q2_top_nations", "q3_hourly_demand",
    "q4_priority_share", "q5_running_revenue", "q6_mode_per_user",
    "q7_user_features", "q8_distinct_counts", "q9_daily_anomaly",
    "q10_date_spine", "q11_json_extract", "q12_dedup_latest",
    "q13_silver_lineitem", "q14_referential_check", "q15_topk_per_brand",
    "q20_grouping_sets", "q27_group_quantiles", "d1_exact_dedup",
    "d2_ngram_jaccard_topk", "d3_lang_id", "d4_text_stats",
    "d5_minhash_lsh", "d6_simhash", "d7_embedding_neardup",
    "d8_fingerprint_neardup", "d15_dup_clusters", "d16_cluster_keepers",
    "d19_embedding_neardup_lsh", "q24_scd2_history", "d9_stratified_sample",
    "d10_token_budget_mix", "d11_shard_assignment", "d18_sequence_packing",
    "d12_repetition_stats", "d13_pii_redaction", "d14_decontamination",
    "d17_leakage_safe_split", "d20_gopher_quality", "s1_cosine_topk",
    "s2_knn_label_vote", "s3_ivf_topk", "s4_kmeans_clusters",
    "s5_ivf_topk_kmeans", "q17_cdc_apply", "q18_sessionization",
    "q19_hourly_rollup", "q25_sliding_rollup", "q26_cdc_materialize",
    "q22_asof_order", "q23_range_clicks",
)

_DRIVER_TAIL = (
    "d21_simhash_neardup",
    "s6_pq_topk",
    "m1_media_features",
    "m2_media_resize",
    "m3_frame_sample",
    "q28_trailing_window",
    "d22_dup_span_coverage",
    "d23_source_scorecard",
    "q16_hourly_demand_summary",
    "q21_approx_distinct",
)


def all_specs() -> dict[str, QuerySpec]:
    _load()
    pinned = set(_R3_GREEN_HEAD) | set(_DRIVER_TAIL)
    head = {n: _REGISTRY[n] for n in _R3_GREEN_HEAD if n in _REGISTRY}
    mid = {n: s for n, s in _REGISTRY.items() if n not in pinned}
    tail = {n: _REGISTRY[n] for n in _DRIVER_TAIL if n in _REGISTRY}
    return {**head, **mid, **tail}


def get(name: str) -> QuerySpec:
    _load()
    return _REGISTRY[name]


_LOADED = False


def _load() -> None:
    """Import all query modules (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    from . import analytics, dedup_text, medallion, mixing, quality, similarity, streaming_like, temporal  # noqa: F401

    _LOADED = True
