"""Isolated per-query profiler — the measurement harness behind the
optimization rounds' before/after claims (guide §1).

For each named registered query:

* runs it end-to-end into the noop sink (guide §1.4) for
  ``--warmups`` discarded + ``--iters`` timed runs and reports p50;
* counts JOBS PER RUN via a job group around each timed run — the
  deterministic structural evidence for removed-exchange /
  removed-round claims on iterative drivers whose rounds never appear
  in one explain;
* optionally dumps ``.explain("formatted")`` to ``--plans DIR`` as
  ``<query>_<tag>.txt`` (the committed plans/r{N}/ artifacts).

Usage:
    python tools/qprof.py d15_dup_clusters d8_fingerprint_neardup \
        --sf /root/testdata/sf0.1 --iters 4 --warmups 1 \
        --plans plans/r11 --tag before
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--warmups", type=int, default=1)
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--tag", default="before", help="plan filename suffix")
    args = ap.parse_args()

    from real_time_data_engineering_spark.registry import all_specs
    from real_time_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="qprof")
    sc = spark.sparkContext
    specs = all_specs()
    out: dict[str, dict] = {}
    for name in args.queries:
        spec = specs[name]
        if args.plans:
            df = spec.spark(spark, args.sf)
            qe = df._jdf.queryExecution()
            plan = spark._jvm.PythonSQLUtils.explainString(qe, "formatted")  # type: ignore[attr-defined]
            p = Path(args.plans) / f"{name}_{args.tag}.txt"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(plan)
        samples: list[float] = []
        jobs: list[int] = []
        for i in range(args.warmups + args.iters):
            group = f"qprof_{name}_{i}"
            sc.setJobGroup(group, name)
            t = time.time()
            spec.spark(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t
            sc.setJobGroup(None, None)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            if i >= args.warmups:
                samples.append(dt)
                jobs.append(n_jobs)
        samples.sort()
        out[name] = {
            "p50": round(samples[len(samples) // 2], 3),
            "min": round(samples[0], 3),
            "max": round(samples[-1], 3),
            "jobs_per_run": jobs[-1],
            "n": len(samples),
        }
        print(f"{name}: p50={out[name]['p50']}s jobs={jobs[-1]} samples={[round(s,2) for s in samples]}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
