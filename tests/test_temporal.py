"""As-of and interval/range join: semantics + physical-plan gates.

The reference has no temporal joins (SURVEY.md §2.3); these pin the
extension operators' contracts — backward-inclusive match, largest-tie
wins, tolerance nulling, left-join shape — against naive non-equi
formulations, and gate the plans against nested-loop regressions.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from real_time_data_engineering_spark.operators.asof import asof_join, interval_point_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_basic_backward_inclusive(spark):
    """Match = most recent right row with t <= left t; equality counts."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 10:00:00")), (2, "k", _ts("2024-01-01 09:00:00"))],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 09:00:00"), 100),
            ("k", _ts("2024-01-01 09:30:00"), 200),
            ("k", _ts("2024-01-01 11:00:00"), 300),
        ],
        "rk string, rt timestamp, val long",
    )
    out = {
        r.id: r.val
        for r in asof_join(
            left, right, "t", "rt", by=[("k", "rk")], right_cols=["val"]
        ).collect()
    }
    assert out == {1: 200, 2: 100}  # 09:00 row visible at exactly 09:00


def test_asof_tie_break_largest_wins(spark):
    left = spark.createDataFrame([(1, "k", _ts("2024-01-02 00:00:00"))], "id long, k string, t timestamp")
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:00"), 7, 70), ("k", _ts("2024-01-01 00:00:00"), 9, 90)],
        "rk string, rt timestamp, seq long, val long",
    )
    row = asof_join(left, right, "t", "rt", by=[("k", "rk")], right_cols=["val"], tie_col="seq").collect()[0]
    assert row.val == 90


def test_asof_unmatched_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-10 00:00:00")), (2, "zzz", _ts("2024-01-10 00:00:00"))],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:00:00"), 5)], "rk string, rt timestamp, val long"
    )
    no_tol = {r.id: r.val for r in asof_join(left, right, "t", "rt", by=[("k", "rk")], right_cols=["val"]).collect()}
    assert no_tol == {1: 5, 2: None}  # key with no right rows → NULL
    tol = {
        r.id: r.val
        for r in asof_join(
            left, right, "t", "rt", by=[("k", "rk")], right_cols=["val"],
            tolerance=F.expr("INTERVAL 7 DAYS"),
        ).collect()
    }
    assert tol == {1: None, 2: None}  # match is 9 days stale → nulled


def test_asof_matches_naive_window_formulation(spark, load):
    """Union-window as-of == naive join+row_number on the corpus."""
    ev = load("events").select("event_id", "user_id", "ts").limit(400)
    orders = load("orders").select("o_custkey", "o_orderdate", "o_orderkey")
    fast = asof_join(
        ev, orders, "ts", "o_orderdate", by=[("user_id", "o_custkey")],
        right_cols=["o_orderkey"], tie_col="o_orderkey",
    ).select("event_id", "o_orderkey")

    from pyspark.sql import Window

    cand = ev.join(orders, (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ts))
    w = Window.partitionBy("event_id").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    naive = (
        cand.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        .select("event_id", "o_orderkey")
    )
    naive = ev.select("event_id").join(naive, "event_id", "left")
    assert {tuple(r) for r in fast.collect()} == {tuple(r) for r in naive.collect()}


def test_interval_point_join_matches_naive(spark, load):
    """Bucketed range join == direct non-equi join, bucket width ≠ span."""
    ev = load("events")
    p = ev.filter("event_type = 'purchase'").select(
        "event_id", F.col("ts").alias("hi"), (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("lo")
    )
    c = ev.filter("event_type = 'click'").select(F.col("ts").alias("c_ts"))
    for bucket in (600, 137):  # aligned and deliberately misaligned widths
        fast = interval_point_join(p, c, "lo", "hi", "c_ts", bucket_seconds=bucket)
        naive = p.join(c, (F.col("c_ts") >= F.col("lo")) & (F.col("c_ts") < F.col("hi")))
        assert sorted(map(tuple, fast.select("event_id", "c_ts").collect())) == sorted(
            map(tuple, naive.select("event_id", "c_ts").collect())
        )


def test_range_join_plan_has_no_nested_loop(spark):
    """The q23 plan must be a hash equi-join on the bucket id — a
    BroadcastNestedLoopJoin/CartesianProduct here is the N·M scan the
    operator exists to avoid; at 100 TB that plan never finishes."""
    from real_time_data_engineering_spark.registry import all_specs

    from conftest import SF_DIR

    plan = all_specs()["q23_range_clicks"].spark(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_asof_plan_single_keyed_exchange(spark):
    """As-of = union + ONE window shuffle on the by-key; a join-shaped
    plan (SortMergeJoin over two exchanges of the big sides) would mean
    the operator regressed to the candidate-explosion formulation."""
    from real_time_data_engineering_spark.registry import all_specs

    from conftest import SF_DIR

    plan = all_specs()["q22_asof_order"].spark(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert plan.count("Window") >= 1


def test_cohort_retention_semantics(spark):
    """q30: offset-0 retention is exactly 1.0 for every cohort, rates
    never exceed 1, and cohort sizes sum to the distinct-user count."""
    from conftest import SF_DIR
    from real_time_data_engineering_spark.registry.analytics import q30_cohort_retention
    from real_time_data_engineering_spark.sources.readers import load_table

    out = q30_cohort_retention(spark, SF_DIR).toPandas()
    day0 = out[out.day_offset == 0]
    assert (day0.n_active == day0.cohort_size).all()
    assert (out.retention_rate <= 1.0 + 1e-12).all()
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert int(day0.cohort_size.sum()) == n_users


def test_funnel_stage_ordering_and_conservation(spark):
    """q31: stages partition the user base (counts sum to distinct
    users), and a hand-built micro-case resolves every stage boundary —
    out-of-order and out-of-window events must not convert."""
    import datetime as dt

    from conftest import SF_DIR
    from real_time_data_engineering_spark.registry.analytics import q31_funnel_stages
    from real_time_data_engineering_spark.sources.readers import load_table

    out = {r.stage: r.n_users for r in q31_funnel_stages(spark, SF_DIR).collect()}
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert sum(out.values()) == n_users

    T0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return T0 + dt.timedelta(hours=h)

    rows = [
        # u1: full in-order funnel within windows -> stage 3
        (1, ts(0), "view"), (1, ts(1), "click"), (1, ts(2), "purchase"),
        # u2: click BEFORE first view (order violation) -> stage 1
        (2, ts(1), "view"), (2, ts(0), "click"),
        # u3: click 25h after view (window violation) -> stage 1
        (3, ts(0), "view"), (3, ts(25), "click"),
        # u4: purchase 25h after click -> stage 2
        (4, ts(0), "view"), (4, ts(1), "click"), (4, ts(26), "purchase"),
        # u5: never viewed -> stage 0
        (5, ts(0), "error"),
    ]
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = {r.stage: r.n_users for r in q31_funnel_stages(spark, d).collect()}
    assert got == {3: 1, 1: 2, 2: 1, 0: 1}
