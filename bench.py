"""Benchmark harness — the engine's feedback loop.

Runs the headline query suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line. Protocol is a cut-down version of the reference's benchmark
runner (10 runs / 2 warm-up discards / p50 per query,
shared/benchmarks/queries/README.md:41-74): per query, 1 warm-up run is
discarded and the p50 of 2 timed runs is reported, so numbers reflect
steady-state plan execution rather than whichever query first pays
session-wide one-time costs (codegen, Arrow Python-worker spin-up,
parquet footer cache). Each run is forced end-to-end with a noop sink
so the measured time is full plan execution, not driver-side
collection. The taxi E2E stage runs cold twice (fresh warehouse each
time, one-time costs included — it is the end-to-end analogue) and
reports the median, since tempdir I/O + GC swing single runs 2×.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: the reference's 4 benchmark queries, the silver-contract
# projection (the "processing" stage analogue), the window marts, and one
# representative of each extension family (dedup / similarity / text /
# CDC / sessionization / tumbling rollup / multimodal).
HEADLINE = [
    "q1_daily_revenue",
    "q2_top_nations",
    "q3_hourly_demand",
    "q4_priority_share",
    "q5_running_revenue",
    "q6_mode_per_user",
    "q13_silver_lineitem",
    "q17_cdc_apply",
    "q18_sessionization",
    "q19_hourly_rollup",
    "q22_asof_order",
    "q23_range_clicks",
    "d1_exact_dedup",
    "d2_ngram_jaccard_topk",
    "d4_text_stats",
    "d5_minhash_lsh",
    "d7_embedding_neardup",
    "d8_fingerprint_neardup",
    "d12_repetition_stats",
    "d13_pii_redaction",
    "d14_decontamination",
    "d15_dup_clusters",
    "s1_cosine_topk",
    "m1_media_features",
]


def _sibling_jvms() -> list[str]:
    """Live JVM processes that would contend for the local[32] cores.

    BENCH_r02.json recorded a 2-6x phantom regression because another
    Spark session was alive during the run (shared cores inflate every
    CPU-bound query). The guard refuses to measure under contention —
    by waiting for the sibling JVM to drain (orphaned pyspark JVMs exit
    when their gateway stdin closes, so the usual straggler clears in
    seconds). If contention persists past the grace period the bench
    still runs — a stamped-as-contended record beats a round with no
    benchmark artifact at all — and the JSON carries the evidence in a
    `contention` field so no future regression gets misread as real.
    """
    sibs = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode(errors="replace").strip()
        except OSError:
            continue
        argv0 = os.path.basename(cmd.split(" ", 1)[0]) if cmd else ""
        if argv0 == "java" or "org.apache.spark" in cmd:
            sibs.append(f"pid={pid}: {cmd[:160]}")
    return sibs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    grace = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_SEC", "300"))
    deadline = time.time() + grace
    contention = _sibling_jvms()
    while contention and time.time() < deadline:
        print(
            f"bench: {len(contention)} sibling JVM(s) alive, waiting for an idle machine "
            f"({int(deadline - time.time())}s grace left)",
            file=sys.stderr,
        )
        time.sleep(5)
        contention = _sibling_jvms()
    if contention:
        print("bench: RUNNING UNDER CONTENTION — numbers are inflated:", file=sys.stderr)
        for s in contention:
            print(f"  {s}", file=sys.stderr)
    t0 = time.time()
    from real_time_data_engineering_spark.registry import all_specs
    from real_time_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="bench")
    specs = all_specs()
    startup = time.time() - t0

    def run(name: str) -> float:
        t = time.time()
        specs[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t

    times: dict[str, float] = {}
    for name in HEADLINE:
        run(name)  # warm-up discard (reference protocol, cut down)
        timed = sorted(run(name) for _ in range(2))
        times[name] = round((timed[0] + timed[1]) / 2, 3)  # p50 of 2

    # Capabilities added after round 1 — timed the same way but reported
    # separately so headline_suite_sec stays comparable round-over-round.
    EXTRA = [
        "d18_sequence_packing",
        "d19_embedding_neardup_lsh",
        "d20_gopher_quality",
        "d21_simhash_neardup",
        "s3_ivf_topk",
        "s5_ivf_topk_kmeans",
        "s6_pq_topk",
        "d22_dup_span_coverage",
        "m2_media_resize",
        "m3_frame_sample",
        "q28_trailing_window",
    ]
    extra_times: dict[str, float] = {}
    for name in EXTRA:
        run(name)
        timed = sorted(run(name) for _ in range(2))
        extra_times[name] = round((timed[0] + timed[1]) / 2, 3)

    # E2E medallion analogue of the reference's 10k-event benchmark
    # (BASELINE.md P02: 53 s processing + 18 s gold at the same event
    # count): generate 10k raw trips, run silver + the 16-model gold
    # DAG, force every mart.
    import tempfile

    from real_time_data_engineering_spark.plans.taxi_pipeline import run_pipeline
    from real_time_data_engineering_spark.testing.taxi_datagen import generate_raw_trips

    raw = generate_raw_trips(spark, n_valid=10_000)
    check_summary: dict[str, str] = {}

    def e2e_once(with_checks: bool = False) -> float:
        t = time.time()
        with tempfile.TemporaryDirectory() as wh:
            res = run_pipeline(spark, raw, warehouse_dir=wh)
            for name in ("fct_trips", "mart_daily_revenue", "mart_hourly_demand", "mart_location_performance"):
                res.built[name].write.format("noop").mode("overwrite").save()
            if with_checks:
                # full-DAG accounting (reference's dbt `91/91 PASS` +
                # Soda scan, docs/BENCHMARK_RESULTS.md:42) — timed
                # separately so the E2E number stays comparable
                tc = time.time()
                from real_time_data_engineering_spark.checks.taxi_suite import taxi_check_suite

                summary, flat = taxi_check_suite(res.built, min_rows=5000)
                n_pass = sum(1 for r in flat if r.passed)
                check_summary["checks"] = f"{n_pass}/{len(flat)} PASS"
                check_summary["checks_detail"] = summary
                check_summary["checks_sec"] = round(time.time() - tc, 3)
                return time.time() - t - check_summary["checks_sec"]
        return time.time() - t

    # two cold runs (fresh warehouse each), p50 — the E2E number swings
    # 2x run-to-run from tempdir I/O + GC; the median is the honest read
    e2e = sorted([e2e_once(with_checks=True), e2e_once()])
    times["taxi_e2e_10k"] = round((e2e[0] + e2e[1]) / 2, 3)

    total = round(sum(times.values()), 3)
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # results.csv-compatible comparison row (reference
    # shared/benchmarks/runner.py:405-457 header set; container/memory
    # columns are N/A in-process)
    csv_header = (
        "pipeline_id,pipeline_name,startup_s,ingestion_s,processing_s,"
        "dbt_build_s,e2e_total_s,events,events_per_sec,peak_memory_mb,"
        "peak_cpu_pct,avg_memory_mb,containers,dbt_pass"
    )
    e2e_s = times["taxi_e2e_10k"]
    csv_row = ",".join(
        str(v)
        for v in (
            "SPARK",
            "pyspark-native-engine",
            round(startup, 3),
            0.0,
            e2e_s,
            check_summary.get("checks_sec", 0.0),
            round(startup + e2e_s + float(check_summary.get("checks_sec", 0.0)), 3),
            10_000,
            round(10_000 / e2e_s, 1) if e2e_s else "",
            "",
            "",
            "",
            1,
            check_summary.get("checks", ""),
        )
    )
    with open(Path(__file__).resolve().parent / "results.csv", "w") as f:
        f.write(csv_header + "\n" + csv_row + "\n")
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "startup_sec": round(startup, 3),
                "extra_queries": extra_times,
                "checks": check_summary.get("checks", ""),
                "checks_detail": check_summary.get("checks_detail", ""),
                "results_csv": csv_row,
                "contention": contention,
                "protocol": "per query: 1 warm-up discard, p50 of 2 timed runs; taxi_e2e_10k: p50 of 2 cold runs (fresh warehouse each; checks timed separately); refuses to start while sibling JVMs are alive (300s grace), stamps `contention` if any persist",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
