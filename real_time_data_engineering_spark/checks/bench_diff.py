"""Round-over-round bench regression detector.

Compares two full bench reports (the committed ``BENCH_local.json``
from two rounds, or any pair written by ``bench.py``) per query at the
p50 and flags regressions beyond the noise band — so a slow query is
caught by the diff the round it regresses, instead of by a judge
reading two JSON files side by side.

Usage::

    python -m real_time_data_engineering_spark.checks.bench_diff OLD NEW
    git show HEAD~5:BENCH_local.json > /tmp/old.json && \\
        python -m real_time_data_engineering_spark.checks.bench_diff \\
            /tmp/old.json BENCH_local.json

Noise band: a query is a REGRESSION only if it is BOTH >1.5× slower
AND >0.3 s absolutely slower (sub-second queries swing tens of
percent from GC/codegen timing alone — the taxi-E2E band documented
in bench.py is ±40%). Exit code 1 on any regression.
"""

from __future__ import annotations

import json
import sys

RATIO = 1.5
ABS_FLOOR_S = 0.3


def _p50s(report: dict) -> dict[str, float]:
    out = {}
    for name, pct in (report.get("percentiles") or {}).items():
        if isinstance(pct, dict) and "p50" in pct:
            out[name] = float(pct["p50"])
    # pre-percentile reports: fall back to the flat maps
    for key in ("queries", "extra_queries"):
        for name, sec in (report.get(key) or {}).items():
            out.setdefault(name, float(sec))
    return out


def main(old_path: str, new_path: str) -> int:
    old = _p50s(json.load(open(old_path)))
    new = _p50s(json.load(open(new_path)))
    regressions, improvements, added, removed = [], [], [], []
    for name in sorted(new):
        if name not in old:
            added.append(name)
            continue
        o, n = old[name], new[name]
        if n > o * RATIO and n - o > ABS_FLOOR_S:
            regressions.append((name, o, n))
        elif o > n * RATIO and o - n > ABS_FLOOR_S:
            improvements.append((name, o, n))
    removed = sorted(set(old) - set(new))
    for name, o, n in regressions:
        print(f"REGRESSION {name:32s} {o:7.3f}s -> {n:7.3f}s ({n / o:.2f}x)")
    for name, o, n in improvements:
        print(f"improved   {name:32s} {o:7.3f}s -> {n:7.3f}s ({o / n:.2f}x)")
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED queries ({len(removed)}): {', '.join(removed)}")
    print(
        f"bench-diff: {len(regressions)} regression(s), {len(improvements)} "
        f"improvement(s), {len(added)} new, {len(removed)} removed over "
        f"{len(new)} queries (band: >{RATIO}x AND >{ABS_FLOOR_S}s)"
    )
    return 1 if regressions or removed else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
