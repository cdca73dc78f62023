"""Pipeline lifecycle runner — the reference's stage contract.

SURVEY.md §7.3: the reference's five orchestrators (Dagster/Prefect/
Airflow/Kestra/Make) all reduce to "run these stages in order with
retries, record metrics". This is that reduction: ordered stages, per-
stage retry with backoff, and a metrics JSON in the generator's shape
(events, elapsed, rows — generator.py:196-208; per-run JSON
runner.py:379-400).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Stage:
    name: str
    fn: Callable[[dict], object]  # receives the shared context, returns stage output
    retries: int = 2
    backoff_sec: float = 0.5


@dataclass
class LifecycleResult:
    stages: list[dict] = field(default_factory=list)
    context: dict = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(s["ok"] for s in self.stages)

    def metrics(self) -> dict:
        """Generator-shaped run metrics (one JSON object per run)."""
        return {
            "stages": {s["stage"]: round(s["elapsed_sec"], 3) for s in self.stages},
            "elapsed_sec": round(sum(s["elapsed_sec"] for s in self.stages), 3),
            "ok": self.ok,
            "attempts": {s["stage"]: s["attempts"] for s in self.stages},
        }

    def write_metrics(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.metrics(), f, indent=2)


def run_lifecycle(stages: list[Stage], context: dict | None = None) -> LifecycleResult:
    """Run stages in order; a stage that exhausts retries halts the run
    (downstream stages are not attempted — the dbt/orchestrator rule)."""
    res = LifecycleResult(context=dict(context or {}))
    for st in stages:
        t0 = time.perf_counter()
        attempts = 0
        err: Exception | None = None
        out = None
        while attempts <= st.retries:
            attempts += 1
            try:
                out = st.fn(res.context)
                err = None
                break
            except Exception as e:  # noqa: BLE001 — stage isolation is the point
                err = e
                time.sleep(st.backoff_sec * attempts)
        rec = {
            "stage": st.name,
            "ok": err is None,
            "attempts": attempts,
            "elapsed_sec": time.perf_counter() - t0,
            "error": str(err) if err else None,
        }
        res.stages.append(rec)
        if err is not None:
            break
        res.context[st.name] = out
    return res
