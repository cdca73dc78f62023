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
