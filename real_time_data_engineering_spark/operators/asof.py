"""Temporal joins Spark lacks as primitives: as-of join and
interval/range join, built scale-first from one-shuffle compositions.

The reference has no theta/range/as-of joins (SURVEY.md §2.3 "No
theta/range/as-of/interval joins exist in the reference") — these are
the engine-extension operators a training-data/event pipeline needs:
point-in-time feature lookup (as-of) and windowed event correlation
(range). Both avoid the naive O(N·M) non-equi join:

* ``asof_join`` — union-sort-window: tag both sides, ONE shuffle on
  the `by` key, one ordered pass per key with running
  ``last(_, ignorenulls=True)``. Spark's growing-frame window executes
  incrementally, so cost is O((N+M) log(N+M)) for the sort and O(N+M)
  for the pass — vs the O(N·M)-per-key worst case of
  ``JOIN ON key = key AND r.t <= l.t`` + row_number, which Catalyst
  plans as a hash join whose per-key candidate set explodes on hot
  keys. At 1000 executors this is a single keyed exchange; skew in
  `by` hits the same limits as any per-key ordered op (salt upstream
  if one key dominates).
* ``interval_point_join`` — time-bucketed equi-join: intervals explode
  to the O(span/bucket) buckets they cover, points map to exactly one
  bucket, the join is a plain hash equi-join on the bucket id plus an
  exact residual filter. Each (interval, point) pair meets exactly
  once (a point has one bucket), so no dedup pass. Bucket width tunes
  the explode factor vs candidate selectivity; AQE handles the
  residual skew of busy buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_t"
_SIDE = "__asof_side"  # 1 = right (visible to later left rows), 0 = left
_TIE = "__asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    by: Sequence[tuple[str, str]],
    right_cols: Sequence[str],
    tie_col: str | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of left join: for each left row, the most recent
    right row with ``right_time <= left_time`` and equal `by` keys.

    by        — [(left_key, right_key), ...]; the shuffle key.
    right_cols — columns carried from the matched right row.
    tie_col   — right column breaking (key, time) ties; the row with
                the LARGEST tie value wins (deterministic vs oracle
                ``ROW_NUMBER ... ORDER BY t DESC, tie DESC``).
    tolerance — optional max lookback (e.g. ``F.expr("INTERVAL 7 DAYS")``);
                matches older than ``left_time - tolerance`` null out.

    Unmatched left rows keep NULLs in `right_cols` (left-join shape).
    """
    lkeys = [lk for lk, _ in by]
    carried = list(right_cols)
    if right_time not in carried:
        carried = [right_time, *carried]

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias(_T),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast("long").alias(_TIE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carried],
    )
    rhs = right.select(
        *[F.col(rk).alias(lk) for lk, rk in by],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in lkeys],
        F.col(right_time).alias(_T),
        F.lit(1).alias(_SIDE),
        (F.col(tie_col).cast("long") if tie_col else F.lit(0).cast("long")).alias(_TIE),
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    ).select(*lhs.columns)  # align column order for unionByName-free union

    # Right rows sort BEFORE left rows at equal time (side desc) so a
    # right row at exactly left_time is visible (<= semantics); among
    # equal (key, time) right rows the largest tie sorts last → wins last().
    w = (
        Window.partitionBy(*lkeys)
        .orderBy(F.col(_T).asc(), F.col(_SIDE).desc(), F.col(_TIE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = lhs.unionByName(rhs).select(
        *lhs.columns,
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}") for c in carried],
    )
    out = matched.filter(F.col(_SIDE) == 0)
    if tolerance is not None:
        stale = F.col(f"__m_{right_time}") < (F.col(_T) - tolerance)
        out = out.select(
            *[F.col(c) for c in left.columns],
            *[F.when(stale, F.lit(None)).otherwise(F.col(f"__m_{c}")).alias(c) for c in carried],
        )
    else:
        out = out.select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"__m_{c}").alias(c) for c in carried],
        )
    return out if right_time in right_cols else out.drop(right_time)


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    lo: str,
    hi: str,
    point_time: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner join of half-open intervals ``[lo, hi)`` to points, as a
    bucketed equi-join (no BroadcastNestedLoopJoin, no N·M scan).

    Columns from both inputs are carried through; callers aggregate on
    the interval key afterwards. `bucket_seconds` should be ≈ the
    typical interval span: explode factor = span/bucket + 1.
    """
    b = F.lit(int(bucket_seconds)).cast("long")
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lo)) / b),
                # hi is exclusive, but a point in hi's bucket can still be < hi
                F.floor(F.unix_timestamp(F.col(hi)) / b),
            )
        ),
    )
    pb = points.withColumn("__bucket", F.floor(F.unix_timestamp(F.col(point_time)) / b))
    return (
        ib.join(pb, "__bucket")
        .filter((F.col(point_time) >= F.col(lo)) & (F.col(point_time) < F.col(hi)))
        .drop("__bucket")
    )
