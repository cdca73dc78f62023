"""Curation-funnel audit artifact — materialize the composed d35
pipeline's per-stage survivor counts at an arbitrary corpus.

Usage::

    python -m real_time_data_engineering_spark.checks.funnel [SF_DIR]

Prints one line per funnel stage plus a wall-clock summary, and exits
non-zero if the funnel is non-monotone (a later stage keeping MORE
docs than its input would mean a stage gate failed open). Part of
``make round-artifacts`` so the per-round FUNNEL artifact is one
regenerated output, never a hand-edited paste.
"""

from __future__ import annotations

import sys
import time


def main(sf_dir: str = "/root/testdata/sf0.1") -> int:
    from ..plans.curation_pipeline import curate_corpus
    from ..session import get_spark

    spark = get_spark(app_name="funnel_audit")
    t0 = time.time()
    # the artifact runs the FULL ladder including the opt-in SemDeDup
    # stage (r6 verdict #7) and the opt-in trained-classifier gate
    # (FineWeb-Edu position) so the committed funnel shows all 8 gates
    run = curate_corpus(spark, sf_dir, semantic_dedup=True, probe_gate=True)
    counts = run.audit_counts()
    for stage, n in counts.items():
        print(f"{stage:16s} {n:>9d}", flush=True)
    elapsed = time.time() - t0
    # sharded re-keys the sampled set (same rows); everything upstream
    # must shrink or hold
    order = [
        "raw",
        "exact_unique",
        "neardup_keep",
        "semantic_keep",
        "quality_pass",
        "probe_keep",
        "decontaminated",
        "sampled",
    ]
    monotone = all(
        counts[a] >= counts[b] for a, b in zip(order, order[1:])
    ) and counts["sharded"] == counts["sampled"]
    print(
        f"funnel: {counts['raw']} -> {counts['sharded']} docs in "
        f"{elapsed:.1f}s at {sf_dir} ({'monotone' if monotone else 'NON-MONOTONE'})"
    )
    spark.stop()
    return 0 if monotone else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"))
