"""Partition-and-stitch global windows: the 100× mitigation for the
single-partition WindowExec the running-total/lag marts plan.

Equivalence is exact: the stitched formulation must reproduce the
global-window result row for row (including NULL semantics), while the
corpus-scaled window pass is partitioned (by year) instead of global.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_data_engineering_spark.functions.parity import money
from real_time_data_engineering_spark.operators.windows import (
    stitched_lag,
    stitched_running_sum,
)
from real_time_data_engineering_spark.sources.readers import load_table

from conftest import SF_DIR


def _daily_revenue(spark):
    o = load_table(spark, SF_DIR, "orders")
    return o.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.sum(money("o_totalprice")).alias("rev")
    )


def test_stitched_running_sum_equals_global_window(spark):
    d = _daily_revenue(spark)
    w = Window.orderBy("order_date")
    want = {
        (r.order_date, float(r.run))
        for r in d.select(
            "order_date",
            F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias("run"),
        ).collect()
    }
    got_df = stitched_running_sum(
        d, "order_date", "rev", F.year("order_date"), out_col="run"
    )
    got = {
        (r.order_date, float(r.run))
        for r in got_df.select("order_date", F.col("run").cast("double")).collect()
    }
    assert got == want
    # multiple calendar years → the stitch is actually exercised
    assert d.select(F.year("order_date")).distinct().count() > 1
    # the corpus-scaled window pass is partitioned (the plan carries the
    # partition key), not a bare global ORDER BY over the data
    assert "__part" in got_df._jdf.queryExecution().executedPlan().toString()


def test_stitched_lag_equals_global_window(spark):
    d = _daily_revenue(spark)
    w = Window.orderBy("order_date")
    want = {
        (r.order_date, None if r.prev is None else float(r.prev))
        for r in d.select(
            "order_date", F.lag("rev").over(w).cast("double").alias("prev")
        ).collect()
    }
    got = {
        (r.order_date, None if r.prev is None else float(r.prev))
        for r in stitched_lag(d, "order_date", "rev", F.year("order_date"), out_col="prev")
        .select("order_date", F.col("prev").cast("double"))
        .collect()
    }
    assert got == want
    assert sum(1 for _, v in want if v is None) == 1  # only the global first row


def test_stitched_lag_preserves_null_values(spark):
    """A legitimately-NULL lagged VALUE must stay NULL at partition
    boundaries — positional stitching, not value-coalescing."""
    rows = [
        ("2023-12-30", 1.0),
        ("2023-12-31", None),  # last row of partition 2023 is NULL
        ("2024-01-01", 3.0),  # its lag must be NULL (the 12-31 value)
        ("2024-01-02", 4.0),
    ]
    d = spark.createDataFrame(rows, "ds string, v double").select(
        F.to_date("ds").alias("ds"), "v"
    )
    got = {
        (str(r.ds), r.prev)
        for r in stitched_lag(d, "ds", "v", F.year("ds"), out_col="prev").collect()
    }
    assert got == {
        ("2023-12-30", None),
        ("2023-12-31", 1.0),
        ("2024-01-01", None),
        ("2024-01-02", 3.0),
    }


def test_gap_fill_interpolation_micro(spark, tmp_path):
    """q32 on a hand-built series: gaps of width 1 and 2 interpolate to
    the exact linear values; observed days pass through untouched."""
    import datetime as dt

    import pandas as pd

    rows = [
        ("1995-01-01", 100.0),
        # 1995-01-02 missing  -> lerp(100, 400) = 250
        ("1995-01-03", 400.0),
        # 01-04, 01-05 missing -> lerp to 700: 500, 600
        ("1995-01-06", 700.0),
    ]
    pdf = pd.DataFrame(
        [(dt.date.fromisoformat(d), v) for d, v in rows],
        columns=["o_orderdate", "o_totalprice"],
    )
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "orders.parquet")
    df.write.parquet(path)
    from real_time_data_engineering_spark.registry.analytics import (
        q32_gap_fill_interpolation,
    )

    out = {
        str(r.date_key): (r.observed, r.rev_ffill, r.rev_interp)
        for r in q32_gap_fill_interpolation(spark, str(tmp_path)).collect()
    }
    assert len(out) == 6
    assert out["1995-01-01"] == (True, 100.0, 100.0)
    assert out["1995-01-02"] == (False, 100.0, 250.0)
    assert out["1995-01-03"] == (True, 400.0, 400.0)
    assert out["1995-01-04"] == (False, 400.0, 500.0)
    assert out["1995-01-05"] == (False, 400.0, 600.0)
    assert out["1995-01-06"] == (True, 700.0, 700.0)
