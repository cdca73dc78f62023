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


def test_spend_decile_sketch_equals_exact_ntile_boundary_tolerant(spark):
    """q43's 100x plan (percentile_approx cut points + narrow bucket
    lookup, registry/analytics.py:spend_decile_assignment_sketch) vs
    the exact global-sort NTILE, at the largest local corpus (sf0.1).

    Boundary tolerance: value-based cut points cannot split spend TIES
    the way NTILE's unique order does, and the sketch's rank error is
    <= n/accuracy — so per-customer assignments may differ by AT MOST
    one adjacent decile, for a small fraction of customers near the 9
    boundaries. Everything else must agree exactly."""
    from real_time_data_engineering_spark.registry.analytics import (
        spend_decile_assignment,
        spend_decile_assignment_sketch,
    )

    sf = "/root/testdata/sf0.1"
    exact = spend_decile_assignment(spark, sf).select(
        "o_custkey", F.col("decile").alias("d_exact")
    )
    sketch = spend_decile_assignment_sketch(spark, sf).select(
        "o_custkey", "spend", F.col("decile").alias("d_sketch")
    )
    j = exact.join(sketch, "o_custkey").select(
        "o_custkey", "spend", "d_exact", "d_sketch"
    )
    agg = j.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("d_exact") != F.col("d_sketch"), 1).otherwise(0)).alias(
            "n_diff"
        ),
        F.max(F.abs(F.col("d_exact") - F.col("d_sketch"))).alias("max_drift"),
        F.sum("spend").alias("tot"),
    ).first()
    assert agg["n"] > 5_000, "sf0.1 premise: a real customer population"
    # never off by more than one adjacent decile
    assert agg["max_drift"] <= 1, f"non-adjacent decile drift: {agg['max_drift']}"
    # boundary drift only: <2% of customers (9 boundaries x sketch error)
    assert agg["n_diff"] / agg["n"] < 0.02, f"{agg['n_diff']}/{agg['n']} drifted"
    # conservation: both assignments cover every customer exactly once
    assert spend_decile_assignment_sketch(spark, sf).count() == agg["n"]
    # the aggregated decile table conserves totals and bucket count
    from real_time_data_engineering_spark.registry.analytics import (
        q43_spend_deciles_sketch,
    )

    tbl = q43_spend_deciles_sketch(spark, sf)
    rows = {r["decile"]: r for r in tbl.collect()}
    assert set(rows) == set(range(1, 11)), f"missing deciles: {sorted(rows)}"
    total = sum(r["n_customers"] for r in rows.values())
    assert total == agg["n"]
    # equi-depth within sketch tolerance: every decile within 5% of n/10
    for d, r in rows.items():
        assert abs(r["n_customers"] - agg["n"] / 10) < 0.05 * agg["n"], (
            f"decile {d} size {r['n_customers']} vs expected ~{agg['n'] / 10:.0f}"
        )
    # deciles are value-ordered: decile 1 holds the top spenders
    for d in range(1, 10):
        assert rows[d]["min_spend"] >= rows[d + 1]["max_spend"] - 1e-9


def test_spend_decile_sketch_plan_has_no_global_window(spark):
    """The 100x plan must contain NO WindowExec (the exact form's
    single-partition global sort is exactly what it removes) and no
    collect-based driver loop — one sketch aggregate + narrow lookup."""
    from real_time_data_engineering_spark.registry.analytics import (
        q43_spend_deciles_sketch,
    )

    plan = q43_spend_deciles_sketch(
        spark, SF_DIR
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
