"""Scalable global-window equivalents: partition + stitch.

A running total / lag over a global ``ORDER BY`` plans a single-
partition ``WindowExec`` — Spark warns "No Partition Defined" and every
row funnels through one task. For the repo's registered queries that is
deliberate and bounded (the windows run over per-DAY aggregates: one
row per calendar day, same single-stream semantics as the reference
SQL). These operators are the 100× mitigation those code comments
promise: the SAME result computed as

1. a **partitioned** window (e.g. by year) — the corpus-scaled pass,
   parallel across partitions;
2. a tiny per-partition summary (one row per partition) where the only
   global window lives — bounded by the partition count, not the data;
3. a broadcast stitch joining each partition's exclusive prefix back.

Equivalence to the single-window formulation is exact (integer/decimal
sums reassociate freely; lag stitches the previous partition's last
value) and pinned by tests against the q5 shape.

Reference parity: the nightly dbt marts compute the same running
revenue / day-over-day deltas (mart_daily_revenue.sql) — this is the
shape they take when the date axis outgrows one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stitched_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    part: Column,
    out_col: str = "running_sum",
) -> DataFrame:
    """Global cumulative sum over ``order_col``, computed partitioned.

    ``part`` must be monotone in ``order_col`` (e.g. ``F.year(order)``
    over a date axis): ordering by (part, order) must equal ordering by
    order alone. Rows ordered equal within a partition must carry a
    deterministic total order upstream if exact per-row attribution
    matters (same contract as the single-window form).
    """
    df = df.withColumn("__part", part)
    w_local = (
        Window.partitionBy("__part")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = df.withColumn("__local_run", F.sum(value_col).over(w_local))
    # one row per partition → the ONLY global window, bounded by the
    # partition count (years), never the data
    totals = df.groupBy("__part").agg(F.sum(value_col).alias("__part_total"))
    w_parts = Window.orderBy("__part").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__part",
        F.coalesce(F.sum("__part_total").over(w_parts), F.lit(0)).alias("__offset"),
    )
    return (
        local.join(F.broadcast(offsets), "__part")
        .withColumn(out_col, F.col("__local_run") + F.col("__offset"))
        .drop("__part", "__local_run", "__offset")
    )


def stitched_lag(
    df: DataFrame,
    order_col: str,
    value_col: str,
    part: Column,
    out_col: str = "lagged",
) -> DataFrame:
    """Global ``lag(value) OVER (ORDER BY order)``, computed partitioned.

    In-partition rows take the ordinary partitioned lag; each
    partition's FIRST row stitches the previous partition's last value
    via a broadcast of one row per partition. The globally first row is
    NULL, exactly like the single-window form. Same monotone-``part``
    contract as `stitched_running_sum`.
    """
    df = df.withColumn("__part", part)
    w_local = Window.partitionBy("__part").orderBy(order_col)
    # positional first-row detection, NOT coalesce on the lag value: a
    # legitimately-NULL lagged value must stay NULL, not be replaced by
    # the previous partition's last value
    local = df.withColumn("__local_lag", F.lag(value_col).over(w_local)).withColumn(
        "__rn1", F.row_number().over(w_local)
    )
    last_per_part = (
        df.withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("__part").orderBy(F.desc(order_col))),
        )
        .filter(F.col("__rn") == 1)
        .select("__part", F.col(value_col).alias("__part_last"))
    )
    w_parts = Window.orderBy("__part")
    prev_last = last_per_part.select(
        "__part", F.lag("__part_last").over(w_parts).alias("__prev_last")
    )
    return (
        local.join(F.broadcast(prev_last), "__part")
        .withColumn(
            out_col,
            F.when(F.col("__rn1") == 1, F.col("__prev_last")).otherwise(
                F.col("__local_lag")
            ),
        )
        .drop("__part", "__local_lag", "__prev_last", "__rn1")
    )
