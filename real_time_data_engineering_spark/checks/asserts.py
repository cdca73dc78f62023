"""dbt-style assertion library (reference test classes, SURVEY.md §5).

Each check compiles to a DataFrame whose rows are *violations* — the
check passes when the frame is empty, exactly like a compiled dbt test.
``run_checks`` produces the reference's N/N PASS accounting.

Checks are lazy single-action queries (one count per check); at scale
they run as narrow aggregations over the scanned table, and a batch of
checks over one model can share the scan via ``summarize``.
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class CheckResult:
    name: str
    passed: bool
    failing_rows: int = 0
    severity: str = "error"  # or "warn" (reference: accepted_values warns)
    detail: str = ""


def _violations(name: str, df: DataFrame, severity: str = "error") -> CheckResult:
    n = df.limit(1001).count()
    return CheckResult(name=name, passed=n == 0, failing_rows=n, severity=severity)


def not_null(df: DataFrame, cols: Iterable[str], model: str = "") -> list[CheckResult]:
    return [
        _violations(f"not_null:{model}.{c}", df.filter(F.col(c).isNull())) for c in cols
    ]


def unique(df: DataFrame, col: str, model: str = "") -> CheckResult:
    dups = df.groupBy(col).count().filter(F.col("count") > 1)
    return _violations(f"unique:{model}.{col}", dups)


def accepted_values(
    df: DataFrame, col: str, values: Iterable, model: str = "", severity: str = "warn"
) -> CheckResult:
    bad = df.filter(F.col(col).isNotNull() & ~F.col(col).isin(list(values)))
    return _violations(f"accepted_values:{model}.{col}", bad, severity)


def relationships(
    child: DataFrame, col: str, parent: DataFrame, parent_col: str, model: str = "",
    severity: str = "warn",
) -> CheckResult:
    """Referential integrity as a left-anti join (reference J5)."""
    orphans = child.filter(F.col(col).isNotNull()).join(
        parent, child[col] == parent[parent_col], "left_anti"
    )
    return _violations(f"relationships:{model}.{col}", orphans, severity)


def accepted_range(
    df: DataFrame, col: str, min_value=None, max_value=None, model: str = ""
) -> CheckResult:
    pred: Column = F.lit(False)
    if min_value is not None:
        pred = pred | (F.col(col) < min_value)
    if max_value is not None:
        pred = pred | (F.col(col) > max_value)
    return _violations(f"accepted_range:{model}.{col}", df.filter(F.col(col).isNotNull() & pred))


def positive_value(df: DataFrame, col: str, model: str = "") -> CheckResult:
    """Custom generic test (macros/test_positive_value.sql:11-17)."""
    return _violations(f"positive_value:{model}.{col}", df.filter(F.col(col) < 0))


def singular(df: DataFrame, predicate: Column, name: str) -> CheckResult:
    """Singular test: rows matching the *violation* predicate must be empty
    (e.g. assert_fare_not_exceeds_total.sql:5-11)."""
    return _violations(f"singular:{name}", df.filter(predicate))


def expect_schema(df: DataFrame, contract: T.StructType, model: str = "") -> CheckResult:
    """Model contract: enforced column name+type set (core.yml:6-8)."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    expected = {f.name: f.dataType.simpleString() for f in contract.fields}
    diffs = [
        f"{k}: expected {v}, got {actual.get(k, '<missing>')}"
        for k, v in expected.items()
        if actual.get(k) != v
    ] + [f"{k}: unexpected column" for k in actual if k not in expected]
    return CheckResult(
        name=f"contract:{model}", passed=not diffs, failing_rows=len(diffs), detail="; ".join(diffs)
    )


def freshness(
    df: DataFrame, ts_col: str, now: str, warn_after_hours: int, model: str = ""
) -> CheckResult:
    """Source freshness: max(ts) must be recent (sources.yml:7-16)."""
    row = df.agg(F.max(ts_col).alias("m")).first()
    ok = row["m"] is not None and (
        row["m"] >= __import__("datetime").datetime.fromisoformat(now)
        - __import__("datetime").timedelta(hours=warn_after_hours)
    )
    return CheckResult(name=f"freshness:{model}.{ts_col}", passed=bool(ok), severity="warn")


# ---------------------------------------------------------------------------
# Soda-class table-level metric bounds (reference
# pipelines/11-observability-stack/soda/checks/silver_checks.yml:4-12,
# gold_checks.yml:2-14: row_count > 5000, duplicate_count = 0,
# avg(fare) between 5 and 30, min(fare) >= 0). Unlike the dbt-class
# row-violation checks above, these assert on ONE aggregate of the
# table; `metric_suite` fuses any number of them into a single
# narrow aggregation pass — one scan however many bounds, which is the
# form that survives 100 TB.
# ---------------------------------------------------------------------------


@dataclass
class MetricBound:
    """One Soda-style bound: metric in {row_count, avg, min, max, sum,
    duplicate_count} over ``col`` (None for row_count), violated when
    outside [min_value, max_value] (either side open)."""

    metric: str
    col: str | None = None
    min_value: float | None = None
    max_value: float | None = None
    severity: str = "error"

    def expr(self, idx: int) -> Column:
        agg = {
            "row_count": lambda: F.count(F.lit(1)),
            "avg": lambda: F.avg(self.col),
            "min": lambda: F.min(self.col),
            "max": lambda: F.max(self.col),
            "sum": lambda: F.sum(self.col),
            "duplicate_count": lambda: (
                F.count(self.col) - F.count_distinct(F.col(self.col))
            ),
        }[self.metric]()
        return agg.cast("double").alias(f"_m{idx}")

    @property
    def name(self) -> str:
        tgt = f"({self.col})" if self.col else ""
        lo = "-inf" if self.min_value is None else self.min_value
        hi = "inf" if self.max_value is None else self.max_value
        return f"{self.metric}{tgt}∈[{lo},{hi}]"


def metric_suite(df: DataFrame, bounds: list[MetricBound], model: str = "") -> list[CheckResult]:
    """Evaluate every bound in ONE aggregation over one scan of ``df``."""
    row = df.agg(*[b.expr(i) for i, b in enumerate(bounds)]).first()
    out = []
    for i, b in enumerate(bounds):
        v = row[f"_m{i}"]
        ok = v is not None
        if ok and b.min_value is not None:
            ok = v >= b.min_value
        if ok and b.max_value is not None:
            ok = v <= b.max_value
        out.append(
            CheckResult(
                name=f"metric:{model}.{b.name}",
                passed=bool(ok),
                failing_rows=0 if ok else 1,
                severity=b.severity,
                detail=f"observed {v}",
            )
        )
    return out


def row_count_between(
    df: DataFrame, min_rows: int, max_rows: int | None = None, model: str = ""
) -> CheckResult:
    return metric_suite(df, [MetricBound("row_count", None, min_rows, max_rows)], model)[0]


def avg_between(df: DataFrame, col: str, lo: float, hi: float, model: str = "") -> CheckResult:
    return metric_suite(df, [MetricBound("avg", col, lo, hi)], model)[0]


def min_at_least(df: DataFrame, col: str, bound: float, model: str = "") -> CheckResult:
    return metric_suite(df, [MetricBound("min", col, bound, None)], model)[0]


def max_at_most(df: DataFrame, col: str, bound: float, model: str = "") -> CheckResult:
    return metric_suite(df, [MetricBound("max", col, None, bound)], model)[0]


def run_checks(results: Iterable[CheckResult | list[CheckResult]]) -> tuple[str, list[CheckResult]]:
    """Flatten + account like a dbt build: 'PASS=n WARN=n ERROR=n TOTAL=n'."""
    flat: list[CheckResult] = []
    for r in results:
        flat.extend(r if isinstance(r, list) else [r])
    errors = [r for r in flat if not r.passed and r.severity == "error"]
    warns = [r for r in flat if not r.passed and r.severity == "warn"]
    passed = [r for r in flat if r.passed]
    summary = f"PASS={len(passed)} WARN={len(warns)} ERROR={len(errors)} TOTAL={len(flat)}"
    return summary, flat
