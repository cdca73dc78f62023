"""Benchmark protocol — the reference's measurement discipline.

Implements the q1–q4 protocol (shared/benchmarks/queries/README.md:41-74):
N iterations, first W discarded as warm-up, p50/p95/p99 over the rest;
plus the results.csv-compatible row shape (runner.py:405-457: pipeline,
phase timings, row counts). `bench.py` at the repo root remains the
driver-facing single-line harness; this module is the full protocol for
apples-to-apples comparison against BASELINE.md.
"""

from __future__ import annotations

import csv
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .registry import all_specs


def _percentile(sorted_vals: list[float], p: float) -> float:
    """Nearest-rank percentile (the reference's protocol semantics)."""
    if not sorted_vals:
        return float("nan")
    idx = min(len(sorted_vals) - 1, max(0, round(p / 100.0 * (len(sorted_vals) - 1))))
    return sorted_vals[idx]


@dataclass
class QueryTiming:
    name: str
    iterations: int
    warmups: int
    times_sec: list[float] = field(default_factory=list)

    @property
    def measured(self) -> list[float]:
        return sorted(self.times_sec[self.warmups :])

    def summary(self) -> dict:
        m = self.measured
        return {
            "query": self.name,
            "iterations": self.iterations,
            "warmups": self.warmups,
            "p50_sec": _percentile(m, 50),
            "p95_sec": _percentile(m, 95),
            "p99_sec": _percentile(m, 99),
            "min_sec": m[0] if m else float("nan"),
        }


def run_protocol(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    iterations: int = 10,
    warmups: int = 2,
) -> list[dict]:
    """Run each query `iterations` times, discard `warmups`, report
    percentiles — one row per query, results.csv-compatible."""
    specs = all_specs()
    rows = []
    for name in names or sorted(specs):
        t = QueryTiming(name, iterations, warmups)
        n_rows = 0
        for _ in range(iterations):
            t0 = time.perf_counter()
            n_rows = specs[name].spark(spark, sf_dir).count()
            t.times_sec.append(time.perf_counter() - t0)
        row = t.summary()
        row["rows"] = n_rows
        rows.append(row)
    return rows


def write_results_csv(rows: list[dict], path: str) -> None:
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
