"""Benchmark harness — the engine's feedback loop.

Runs the headline query suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line. Protocol follows the reference's benchmark runner
(shared/benchmarks/queries/README.md:41-74): per query, 10 iterations
with the first 2 discarded as warm-up, reporting p50/p95/p99 over the
8 kept samples — so one-time costs (codegen, Arrow worker spin-up,
parquet footer cache) never masquerade as a regression, and tail
latency is visible next to the median. Each run is forced end-to-end
with a noop sink so the measured time is full plan execution, not
driver-side collection. Resource accounting mirrors the reference's
per-container sampler (shared/benchmarks/metrics.py:47-141): a
background thread samples the whole process tree (python driver + the
local[32] JVM) for RSS and CPU, reporting suite-wide peak/avg and a
per-query peak-RSS map. The taxi E2E stage runs cold twice (fresh
warehouse each time, one-time costs included — it is the end-to-end
analogue) and reports the median, since tempdir I/O + GC swing single
runs 2×.
"""

from __future__ import annotations

import json
import math
import os
import sys
import threading
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

# Capabilities added after round 1 — timed identically but reported
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
    "q29_running_revenue_stitched",
    "d24_incremental_neardup",
    "d25_temperature_sampling",
    "s7_ann_recall",
    "q30_cohort_retention",
    "q31_funnel_stages",
    "d26_corpus_bigrams",
    "q32_gap_fill_interpolation",
    "d27_rag_chunking",
    "q33_event_pivot",
    "q34_behavior_set_ops",
    "q35_skew_salted_brand_revenue",
    "q36_variant_extract",
    "q37_table_profile",
    "q38_metric_unpivot",
    "q39_snapshot_diff",
    "q40_time_weighted_avg",
    "q43_spend_deciles",
    "q44_event_transitions",
    "d28_tfidf_topk",
    "d29_editdist_verify",
    "d30_char_entropy",
    "d31_zipf_fit",
    "q41_rolling_active_users",
    "q42_purchaser_semi_join",
    "d32_pagerank",
    "q45_price_histogram",
    "q46_ks_drift",
    "d33_weighted_reservoir",
    "d34_lm_perplexity",
    "q47_chi_square_independence",
    "d35_full_curation",
    "q48_spend_deciles_sketch",
    "d36_bpe_merges",
    "d37_bpe_tokenize_stats",
    "s8_ivfpq_topk",
    "d38_heavy_hitter_tokens",
    "d39_epoch_shuffle",
    "s9_semdedup",
    "d40_bm25_retrieval",
    "s10_hybrid_rrf",
    "d41_countmin_freq",
    "s11_hybrid_rrf_ann",
    "d42_bm25_index",
    "d43_countmin_union",
    "s12_index_cell_health",
    "d44_index_decontam",
    "d45_incremental_dedup",
    "q49_gdpr_delete_mor",
    "s13_hybrid_ann_recall",
    "d46_minhash_index",
    "d47_quality_probe",
    "d48_probe_gated_sampling",
    "d49_epoch_budget",
    "s14_ivfpq_refine",
    "s15_triplet_mining",
    "s16_mmr_diversified",
    "s17_semdedup_autok",
    "d50_probe_drift",
    "d52_bm25_forget",
    "s18_ann_forget",
    "s19_range_search",
    "s20_range_search_ivf",
    "s21_range_recall",
    "s22_semantic_cell_census",
    # d51_incremental_ingest and d53_drift_retrain are deliberately NOT
    # benched: each is a stateful multi-pass INGEST/RETRAIN JOB (wipes
    # + rebuilds the persisted indexes per call), not a query; their
    # timing evidence is the per-round INGEST_r{N}.txt artifact and the
    # sweep row.
]

# Queries whose lineage persists an exploded working relation DISK_ONLY
# — their on-disk cache footprint is the dominant disk cost at 100 TB,
# so the bench records it (VERDICT r3 #7). Accounting is per-RDD-id and
# FIRST-MATERIALIZER: Spark's CacheManager dedupes identical plans, so
# when two queries share a persisted relation (d15's cluster feed IS
# d19's LSH candidate path) the bytes land on whichever ran first and
# the reuser reports 0 — a 0 here means "cache already resident", not
# "no spill".
SPILL_QUERIES = {
    "d2_ngram_jaccard_topk",
    "d5_minhash_lsh",
    "d15_dup_clusters",
    "d19_embedding_neardup_lsh",
    "d24_incremental_neardup",
}


def _pct(sorted_vals: list[float], p: float) -> float:
    """Nearest-rank percentile over an already-sorted sample."""
    if not sorted_vals:
        return 0.0
    rank = max(1, math.ceil(p / 100.0 * len(sorted_vals)))
    return sorted_vals[rank - 1]


class TreeSampler(threading.Thread):
    """Samples memory + CPU of this process AND its descendants (the
    pyspark JVM is a child) from /proc — the in-process analogue of the
    reference's per-container docker-stats sampler
    (shared/benchmarks/metrics.py:47-141). Keeps a suite-wide peak/avg
    and a resettable per-query peak window.

    Memory is PSS (proportional set size, /proc/<pid>/smaps_rollup):
    each shared page is divided by its mapper count, so the local[32]
    fork tree's COW-shared daemon/worker image and Arrow buffers are
    counted ONCE. Summed per-process RSS counts them once per fork —
    the r9 driver run reported a physically impossible 249.8 GB "peak"
    in a 128 GiB sandbox that way. Per-process RSS remains the fallback
    where smaps_rollup is unreadable, and the total is clamped at
    MemTotal with `mem_overcounted` flagged, so an impossible reading
    is never reported as fact."""

    def __init__(self, interval: float = 0.2, disk_probe=None):
        super().__init__(daemon=True)
        self.interval = interval
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self.peak_mb = 0.0
        self._sum_mb = 0.0
        self._n = 0
        self._window_peak_mb = 0.0
        # optional block-manager disk probe ({rdd_id: disk_bytes}),
        # sampled on the same cadence so short-lived DISK_ONLY caches
        # are seen BEFORE the context cleaner GC-unpersists them
        self._disk_probe = disk_probe
        self._window_disk: dict[int, int] = {}
        self.peak_cpu_pct = 0.0
        # suite-peak attribution: the label active when the suite-wide
        # peak RSS sample was taken (VERDICT r4 #5 — name the moment,
        # don't leave one opaque number)
        self.label = "startup"
        self.peak_label = "startup"
        self._last_cpu_s: float | None = None
        self._last_t: float | None = None
        self._page = os.sysconf("SC_PAGE_SIZE")
        self._hz = os.sysconf("SC_CLK_TCK")
        self._ncpu = os.cpu_count() or 1
        self._memtotal_mb = self._read_memtotal_mb()
        self.mem_overcounted = False  # True iff the RSS fallback ever clamped

    @staticmethod
    def _read_memtotal_mb() -> float:
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal:"):
                        return int(line.split()[1]) / 1e3  # kB → MB
        except (OSError, ValueError, IndexError):
            pass
        return float("inf")

    def _tree_pids(self) -> set[int]:
        ppid: dict[int, int] = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    after = f.read().rsplit(")", 1)[1].split()
                ppid[int(pid)] = int(after[1])
            except (OSError, IndexError, ValueError):
                continue
        tree = {os.getpid()}
        grew = True
        while grew:
            grew = False
            for p, pp in ppid.items():
                if pp in tree and p not in tree:
                    tree.add(p)
                    grew = True
        return tree

    def _sample(self) -> tuple[float, float]:
        """(tree PSS in MB, cumulative tree CPU seconds)."""
        mem_mb = 0.0
        clamped = False
        cpu_ticks = 0
        for p in self._tree_pids():
            try:
                with open(f"/proc/{p}/stat") as f:
                    after = f.read().rsplit(")", 1)[1].split()
                cpu_ticks += int(after[11]) + int(after[12])  # utime+stime
            except (OSError, IndexError, ValueError):
                continue
            pss = None
            try:
                with open(f"/proc/{p}/smaps_rollup") as f:
                    for line in f:
                        if line.startswith("Pss:"):
                            pss = int(line.split()[1]) / 1e3  # kB → MB
                            break
            except (OSError, IndexError, ValueError):
                pss = None
            if pss is not None:
                mem_mb += pss
                continue
            # no smaps_rollup (old kernel / hardened proc / exit race):
            # RSS fallback — flagged as over-counting only when it
            # actually contributes pages (a process that died between
            # listing and sampling contributes nothing either way)
            try:
                with open(f"/proc/{p}/statm") as f:
                    pages = int(f.read().split()[1])
            except (OSError, IndexError, ValueError):
                continue
            if pages:
                mem_mb += pages * self._page / 1e6
                clamped = True
        if mem_mb > self._memtotal_mb:
            mem_mb = self._memtotal_mb  # physically impossible → clamp
            clamped = True
        if clamped:
            self.mem_overcounted = True
        return mem_mb, cpu_ticks / self._hz

    def run(self) -> None:
        while not self._stop.is_set():
            rss_mb, cpu_s = self._sample()
            now = time.time()
            if self._disk_probe is not None:
                try:
                    disk = self._disk_probe()
                except Exception:
                    disk = {}
                with self._lock:
                    for rdd_id, size in disk.items():
                        self._window_disk[rdd_id] = max(self._window_disk.get(rdd_id, 0), size)
            with self._lock:
                if rss_mb > self.peak_mb:
                    self.peak_label = self.label
                self.peak_mb = max(self.peak_mb, rss_mb)
                self._window_peak_mb = max(self._window_peak_mb, rss_mb)
                self._sum_mb += rss_mb
                self._n += 1
                if self._last_cpu_s is not None and now > self._last_t:
                    pct = (cpu_s - self._last_cpu_s) / (now - self._last_t) / self._ncpu * 100
                    self.peak_cpu_pct = max(self.peak_cpu_pct, pct)
                self._last_cpu_s, self._last_t = cpu_s, now
            self._stop.wait(self.interval)

    def avg_mb(self) -> float:
        with self._lock:
            return self._sum_mb / self._n if self._n else 0.0

    def window_peak_mb(self) -> float:
        """Peak RSS since the last reset — take one synchronous sample
        first so sub-interval queries still get a reading."""
        rss_mb, _ = self._sample()
        with self._lock:
            peak = max(self._window_peak_mb, rss_mb)
            self._window_peak_mb = 0.0
            return peak

    def window_disk(self) -> dict[int, int]:
        """Per-RDD max disk bytes observed since the last reset."""
        with self._lock:
            v = dict(self._window_disk)
            self._window_disk = {}
            return v

    def stop(self) -> None:
        self._stop.set()


def _calibrate_cpu() -> float:
    """Fixed, single-threaded, deterministic CPU microbenchmark stamped
    into the bench JSON (`calib_cpu_sec`): the wall seconds this exact
    machine needs for a constant amount of work (sha256 over 256 MB +
    a fixed pure-Python loop). Cross-round wall-clock comparisons can
    then be machine-normalized PRINCIPLED-ly (divide by the calibration
    ratio) instead of post-hoc (r10's committed artifact was produced
    on a container ~1.6x slower than r9's and the comparison had to be
    reconstructed from untouched-lineage medians). Runs before the
    session exists and is not part of any timed region; min of 3 so a
    scheduling blip never inflates the constant."""
    import hashlib

    def once() -> float:
        t = time.perf_counter()
        buf = b"\x5a" * (1 << 20)
        for _ in range(256):
            hashlib.sha256(buf).digest()
        acc = 0
        for i in range(2_000_000):
            acc = (acc * 1315423911 + i) & 0xFFFFFFFFFFFF
        return time.perf_counter() - t

    return round(min(once() for _ in range(3)), 4)


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
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "10"))
    warmups = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "2"))
    # soft wall-clock budget for the per-query phases: the full 10-run
    # protocol over 35 queries at sf0.1 costs ~9 min, and the harness
    # invoking this CLI may enforce a timeout — once the budget is
    # spent, REMAINING queries fall back to 1 warm-up + 2 timed runs
    # (the r3 protocol) and are stamped in `degraded`, so a partial
    # record with full-protocol headline numbers always beats a killed
    # run with no record at all. Raise the env to disable.
    # an EMPTY env var is explicitly "unset" (default budget): shell
    # quoting accidents must not silently flip a run between the
    # rotated driver protocol and the committed full-suite protocol
    _budget_env = os.environ.get("SPARK_GRAFT_BENCH_BUDGET")
    budget_raised = _budget_env is not None and _budget_env.strip() != ""
    budget = float(_budget_env) if budget_raised else 420.0
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
    calib_cpu_sec = _calibrate_cpu()
    t0 = time.time()
    from real_time_data_engineering_spark import registry
    from real_time_data_engineering_spark.session import get_spark

    # Overlap the registry's module imports (pandas/numpy + the 8 query
    # modules — pure-Python work) with the JVM launch the main thread
    # blocks on inside getOrCreate (a socket wait that releases the
    # GIL): guide §2.6's overlap principle applied to the driver's own
    # startup path. Python's per-module import locks make the
    # concurrent import safe.
    loader = threading.Thread(target=registry._load)
    loader.start()
    spark = get_spark(app_name="bench")
    loader.join()
    specs = registry.all_specs()
    startup = time.time() - t0

    def run(name: str) -> float:
        t = time.time()
        specs[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t

    def _disk_cached_by_id() -> dict[int, int]:
        """{rdd_id: disk bytes} the block manager currently holds for
        cached RDDs (the DISK_ONLY persists of the dedup ladder)."""
        try:
            infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
            return {int(i.id()): int(i.diskSize()) for i in infos}
        except Exception:
            return {}

    sampler = TreeSampler(disk_probe=_disk_cached_by_id)
    sampler.start()

    times: dict[str, float] = {}
    percentiles: dict[str, dict[str, float]] = {}
    query_peak_mb: dict[str, float] = {}
    spill_bytes: dict[str, int] = {}
    degraded: list[str] = []
    phase_start = time.time()

    def bench_query(name: str, into: dict[str, float]) -> None:
        if time.time() - phase_start > budget:
            q_iters, q_warmups = 3, 1
            degraded.append(name)
        else:
            q_iters, q_warmups = iters, warmups
        spill = name in SPILL_QUERIES
        spill_delta = 0
        sampler.label = name
        sampler.window_peak_mb()  # reset the per-query window
        # per-RDD-id accounting: only caches that appear AFTER this
        # query starts count toward its footprint, so concurrent
        # GC-unpersists of earlier queries' caches can neither mask nor
        # inflate it. The baseline sits before the warm-ups because
        # Spark's CacheManager dedupes identical plans — every run of
        # the query shares ONE cached RDD, created on the first run.
        before_ids = set(_disk_cached_by_id()) if spill else set()
        if spill:
            sampler.window_disk()
        for _ in range(q_warmups):
            run(name)
        samples = []
        for _ in range(q_iters - q_warmups):
            samples.append(run(name))
            if spill:
                seen = sampler.window_disk()
                for rdd_id, size in _disk_cached_by_id().items():
                    seen[rdd_id] = max(seen.get(rdd_id, 0), size)
                new_bytes = sum(s for i, s in seen.items() if i not in before_ids)
                spill_delta = max(spill_delta, new_bytes)
        samples.sort()
        into[name] = round(_pct(samples, 50), 3)
        percentiles[name] = {
            "p50": round(_pct(samples, 50), 3),
            "p95": round(_pct(samples, 95), 3),
            "p99": round(_pct(samples, 99), 3),
            "n": len(samples),
        }
        query_peak_mb[name] = round(sampler.window_peak_mb(), 1)
        if spill:
            spill_bytes[name] = spill_delta

    for name in HEADLINE:
        bench_query(name, times)
    # Extra-suite rotation (VERDICT r8 #7, resized per r9 #3): at the
    # DEFAULT budget — the driver's per-round invocation — the fixed
    # wall budget can't time the whole extra suite at the full
    # protocol, and the r8 half-slice still degraded 33 of its 38
    # picks. The slice is now COST-MODELED against the budget actually
    # left when the extras phase starts: each candidate's full-protocol
    # cost is estimated from the committed BENCH_local.json p50s
    # (iters × p50 + overhead), and candidates are taken in rotation
    # order until 90% of the remaining window is spoken for — so every
    # selected extra runs the FULL protocol (n_degraded == 0 is the
    # design point, with the in-loop degrade check as the belt when the
    # estimate is beaten by a cold cache). Rotation advances a
    # PERSISTED start cursor by the actual selection size — strict
    # cycling, so every extra gets a full-protocol driver timing within
    # a bounded number of rounds GUARANTEED (the r9 HEAD-keyed slices
    # were statistically independent: an unlucky extra could be skipped
    # for many consecutive rounds). Raised-budget runs (make
    # round-artifacts → the committed BENCH_local.json) still time the
    # ENTIRE suite, zero-degraded — round-over-round comparability
    # lives there.
    extras_to_run = list(EXTRA)
    rotation: dict = {}
    if not budget_raised:
        counter_path = Path(__file__).resolve().parent / ".bench_rotation.json"
        try:
            start = int(json.loads(counter_path.read_text())["start"]) % len(EXTRA)
        except Exception:
            start = 0
        est: dict[str, float] = {}
        try:
            prev = json.loads(
                (Path(__file__).resolve().parent / "BENCH_local.json").read_text()
            )
            est = {
                q: float(p.get("p50", 2.0))
                for q, p in prev.get("percentiles", {}).items()
            }
        except Exception:
            pass  # no committed report yet: every query estimates at 2 s
        n_forced = int(os.environ.get("SPARK_GRAFT_BENCH_ROTATION_N", "0") or 0)
        window = max(0.0, budget - (time.time() - phase_start))
        budget_left = 0.9 * window
        extras_to_run = []
        for i in range(len(EXTRA)):
            q = EXTRA[(start + i) % len(EXTRA)]
            if n_forced:
                if len(extras_to_run) >= n_forced:
                    break
            else:
                cost = iters * est.get(q, 2.0) + 1.0
                if cost > budget_left:
                    break
                budget_left -= cost
            extras_to_run.append(q)
        n_sel = len(extras_to_run)
        try:
            counter_path.write_text(
                json.dumps({"start": (start + n_sel) % len(EXTRA)}) + "\n"
            )
        except OSError:
            pass  # read-only checkout: the cursor just stays put
        rotation = {
            "start": start,
            "n_total": len(EXTRA),
            "n_selected": n_sel,
            "window_s": round(window, 1),
            "skipped": sorted(set(EXTRA) - set(extras_to_run)),
        }
    extra_times: dict[str, float] = {}
    for name in extras_to_run:
        bench_query(name, extra_times)

    # Streaming sessionization twins (VERDICT r3 #4): the JVM-side
    # session_window default plan vs the applyInPandasWithState
    # arbitrary-state exemplar, same corpus, memory sink — recorded so
    # the "native ≤ pandas-state" claim is measured, not asserted.
    from real_time_data_engineering_spark.streaming import ingest as _si
    from real_time_data_engineering_spark.streaming.stateful import (
        sessionize_stream,
        sessionize_stream_native,
    )

    def _run_session_twin(factory, tag: str) -> float:
        t = time.time()
        q = (
            factory(_si.read_events_stream(spark, sf_dir), watermark="0 seconds")
            .writeStream.format("memory")
            .queryName(f"bench_sessions_{tag}")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        spark.catalog.dropTempView(f"bench_sessions_{tag}")
        return time.time() - t

    streaming_sessionization: dict[str, float] = {}
    for tag, factory in (("native", sessionize_stream_native), ("pandas_state", sessionize_stream)):
        # attribute peak RSS PER TWIN (r7 verdict item 3: the suite peak
        # doubled inside this phase and one opaque window hid which twin)
        sampler.label = f"streaming_sessionization_{tag}"
        sampler.window_peak_mb()
        # Bound the pandas twin's Arrow transfer: each forked python
        # worker buffers one Arrow batch per group stream; the 10k-row
        # default times 32 concurrent workers is the spike. 2048 rows
        # caps per-worker buffering at ~1/5 the default with no effect
        # on results (batch boundaries are invisible to the state fn).
        arrow_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old_arrow = spark.conf.get(arrow_key)
        if tag == "pandas_state":
            spark.conf.set(arrow_key, "2048")
        try:
            _run_session_twin(factory, f"{tag}_warm")  # warm-up discard
            twin = sorted(_run_session_twin(factory, f"{tag}_{i}") for i in range(2))
        finally:
            spark.conf.set(arrow_key, old_arrow)
        streaming_sessionization[f"{tag}_sec"] = round((twin[0] + twin[1]) / 2, 3)
        peak = round(sampler.window_peak_mb(), 1)
        query_peak_mb[f"streaming_sessionization_{tag}"] = peak
        streaming_sessionization[f"{tag}_peak_mb"] = peak

    # E2E medallion analogue of the reference's 10k-event benchmark
    # (BASELINE.md P02: 53 s processing + 18 s gold at the same event
    # count): generate 10k raw trips, run silver + the 16-model gold
    # DAG, force every mart.
    import tempfile

    from real_time_data_engineering_spark.plans.taxi_pipeline import run_pipeline
    from real_time_data_engineering_spark.testing.taxi_datagen import generate_raw_trips

    raw = generate_raw_trips(spark, n_valid=10_000)

    # ingestion phase (VERDICT r5 #8): the reference's results.csv
    # attributes generate→ingest wall time as its own column
    # (pipelines/comparison/results.csv:3-8, Kafka→bronze); the
    # broker-less analogue is the S6/S7 path — land the 10k raw trips
    # as files, then the checkpointed file-source availableNow stream
    # appends them to bronze. Timed once, reported as ingestion_s.
    from real_time_data_engineering_spark.streaming.ingest import read_file_stream

    sampler.label = "ingestion_10k"
    sampler.window_peak_mb()
    with tempfile.TemporaryDirectory() as ing:
        t_ing = time.time()
        raw.write.mode("overwrite").parquet(f"{ing}/landing")
        q = (
            read_file_stream(spark, f"{ing}/landing", raw.schema)
            .writeStream.format("parquet")
            .option("path", f"{ing}/bronze")
            .option("checkpointLocation", f"{ing}/_chk")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        ingestion_s = round(time.time() - t_ing, 3)
    query_peak_mb["ingestion_10k"] = round(sampler.window_peak_mb(), 1)

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
    sampler.label = "taxi_e2e_10k"
    sampler.window_peak_mb()
    e2e = sorted([e2e_once(with_checks=True), e2e_once()])
    times["taxi_e2e_10k"] = round((e2e[0] + e2e[1]) / 2, 3)
    query_peak_mb["taxi_e2e_10k"] = round(sampler.window_peak_mb(), 1)

    sampler.stop()
    total = round(sum(times.values()), 3)
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    peak_mb = round(sampler.peak_mb, 1)
    avg_mb = round(sampler.avg_mb(), 1)
    peak_cpu = round(sampler.peak_cpu_pct, 1)
    # results.csv-compatible comparison row (reference
    # shared/benchmarks/runner.py:405-457 header set; single in-process
    # "container", resource columns from the tree sampler)
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
            ingestion_s,
            e2e_s,
            check_summary.get("checks_sec", 0.0),
            round(
                startup
                + ingestion_s
                + e2e_s
                + float(check_summary.get("checks_sec", 0.0)),
                3,
            ),
            10_000,
            round(10_000 / e2e_s, 1) if e2e_s else "",
            peak_mb,
            peak_cpu,
            avg_mb,
            1,
            check_summary.get("checks", ""),
        )
    )
    repo = Path(__file__).resolve().parent
    # Same committed-artifact guard as BENCH_local.json (VERDICT r7 #2):
    # only zero-degraded raised-budget runs own the committed
    # results.csv; driver-budget runs write a git-ignored twin so the
    # two committed artifacts always come from the SAME run.
    csv_name = "results.csv" if budget_raised else "results_driver.csv"
    with open(repo / csv_name, "w") as f:
        f.write(csv_header + "\n" + csv_row + "\n")
    # Per-query peak-RSS attribution (VERDICT r4 #5): name the suite's
    # memory hogs in both reports instead of leaving one opaque peak.
    top_memory = dict(
        sorted(query_peak_mb.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    # FULL report goes to a committed FILE, mirroring the reference's
    # runner which writes per-run JSON files and never relies on stdout
    # (shared/benchmarks/runner.py:379-400). BENCH_r04.json lost every
    # per-query percentile because the one-line stdout report outgrew
    # the driver's 2,000-char capture (VERDICT r4 #1) — stdout now
    # carries a short summary line only; everything else lives here.
    full_report = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "calib_cpu_sec": calib_cpu_sec,
        "startup_sec": round(startup, 3),
        "ingestion_sec": ingestion_s,
        "extra_queries": extra_times,
        "extras_rotation": rotation,  # {} on full-suite (raised-budget) runs
        "percentiles": percentiles,
        "query_peak_mb": query_peak_mb,
        "top_memory_queries": top_memory,
        "peak_memory_mb": peak_mb,
        "peak_during": sampler.peak_label,
        "avg_memory_mb": avg_mb,
        "mem_overcounted": sampler.mem_overcounted,
        "peak_cpu_pct": peak_cpu,
        "spill_bytes": spill_bytes,
        "degraded": degraded,
        "streaming_sessionization": streaming_sessionization,
        "checks": check_summary.get("checks", ""),
        "checks_detail": check_summary.get("checks_detail", ""),
        "results_csv": csv_row,
        "contention": contention,
        "protocol": (
            f"per query: {iters} iterations, first {warmups} discarded as warm-up "
            f"(after {budget:.0f}s of query phases, remaining queries degrade to "
            "1 warm-up + 2 runs and are listed in `degraded`; per-query kept-sample "
            "count is percentiles[q].n); default-budget runs time a rotating "
            "slice of the extra suite cost-modeled to the remaining window "
            "(iters x committed p50 per candidate), cycled by a persisted "
            "start cursor so full coverage is guaranteed within a bounded "
            "number of rounds (`extras_rotation` names the skipped complement "
            "— raised-budget committed runs time everything), "
            "p50/p95/p99 over the kept samples (reference protocol, "
            "shared/benchmarks/queries/README.md:41-74); resource sampler: 0.2s "
            "process-tree PSS/CPU (suite peak/avg + per-query peak); spill_bytes: "
            "block-manager disk bytes of caches FIRST materialized by each "
            "DISK_ONLY-persisting query (plan-cache reuse reports 0 on the reuser); "
            "taxi_e2e_10k: p50 of 2 cold runs (fresh warehouse each; checks timed "
            "separately); refuses to start while sibling JVMs are alive (300s "
            "grace), stamps `contention` if any persist; the 26-check suite "
            "includes ONE deliberate warn-severity exemplar (passenger_count "
            "soft bound, checks/taxi_suite.py), so 25/26 PASS + WARN=1 is the "
            "healthy steady state; memory is PSS from smaps_rollup — shared "
            "COW pages (JVM/daemon fork image, Arrow buffers) are counted "
            "once, not once per local[32] worker fork as summed RSS would "
            "(the r9 249.8 GB artifact) — with a per-process RSS fallback "
            "clamped at MemTotal and flagged in `mem_overcounted`; "
            "the sessionization phase reports PER-TWIN peak windows and the "
            "pandas-state twin runs under arrow.maxRecordsPerBatch=2048 to "
            "bound per-worker Arrow buffering (results unchanged — batch "
            "boundaries are invisible to the state function)"
        ),
    }
    # The COMMITTED artifact (BENCH_local.json) is the zero-degraded
    # full-protocol run (`make round-artifacts` raises the budget env).
    # A run at the DEFAULT budget — the driver's per-round invocation —
    # degrades its tail, so it writes a sibling, git-ignored path
    # instead of clobbering the committed full-resolution report
    # (VERDICT r5 #7); SPARK_GRAFT_BENCH_REPORT still overrides both.
    default_report = (
        "BENCH_local.json" if budget_raised else "BENCH_local_driver.json"
    )
    report_path = repo / os.environ.get("SPARK_GRAFT_BENCH_REPORT", default_report)
    with open(report_path, "w") as f:
        json.dump(full_report, f, indent=1, sort_keys=True)
        f.write("\n")
    # ONE short stdout line for the driver (its capture keeps only the
    # last 2,000 chars): required keys + suite-level vitals + the
    # top-memory attribution + a pointer to the full on-disk report.
    summary = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "calib_cpu_sec": calib_cpu_sec,
        "startup_sec": round(startup, 3),
        "extra_suite_sec": round(sum(extra_times.values()), 3),
        "n_extra_queries": len(extra_times),
        "n_extra_registered": len(EXTRA),
        "extras_rotated": bool(rotation),
        "peak_memory_mb": peak_mb,
        "peak_during": sampler.peak_label,
        "avg_memory_mb": avg_mb,
        "mem_overcounted": sampler.mem_overcounted,
        "peak_cpu_pct": peak_cpu,
        "top_memory_queries": top_memory,
        "n_degraded": len(degraded),
        "streaming_sessionization": streaming_sessionization,
        "checks": check_summary.get("checks", ""),
        "contention": bool(contention),
        "full_report": report_path.name,
    }
    line = json.dumps(summary)
    if len(line) > 1900:  # never outgrow the driver capture again
        # `queries` is a required driver key — shed the optional extras
        for drop in ("top_memory_queries", "streaming_sessionization", "checks"):
            summary.pop(drop, None)
            line = json.dumps(summary)
            if len(line) <= 1900:
                break
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
