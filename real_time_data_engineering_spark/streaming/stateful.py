"""Custom stateful streaming operators (`applyInPandasWithState`).

The reference's streaming engines have no arbitrary-state operator
(SURVEY.md §2.8: "no mapGroupsWithState-style arbitrary state") — this
is the Spark-native superset: gap-based sessionization maintained as
keyed state with event-time timeouts, the canonical shape for any
custom stateful op (funnels, CDC reconciliation, per-entity models).

Scale notes: state lives in the state store partitioned by the group
key, so memory is O(active keys), not O(events); the watermark bounds
both late data and state lifetime (timeout fires one gap after a
session's last event). Arrow batches keep the Python hop amortized.
Closures are self-contained — executors never import this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_SCHEMA = "user_id bigint, session_start timestamp, n_events bigint, duration_sec bigint"
_STATE_SCHEMA = "start_us long, last_us long, n long"


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-sessionization with event-time-timeout state.

    Emits a row per CLOSED session: either an in-batch gap closes it, or
    the event-time timeout (watermark passing last_event + gap) does.
    Sessions still open when the stream idles stay in state — exactly
    the semantics a continuous pipeline needs; the batch twin
    (q18_sessionization) is the recompute oracle for closed sessions.
    """
    gap_us = gap_sec * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        def emit(rows):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in rows],
                    "n_events": [n for _, _, n in rows],
                    "duration_sec": [(last - s) // 1_000_000 for s, last, n in rows],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit([(start, last, n)])
            return

        us_parts = []
        for pdf in pdfs:
            col = pdf[ts_col]
            us_parts.extend((col.astype("int64") // 1000).tolist())
        us_parts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        for t in us_parts:
            if start is None:
                start = last = t
                n = 1
            elif t - last > gap_us:
                closed.append((start, last, n))
                start = last = t
                n = 1
            else:
                last = t
                n += 1
        state.update((start, last, n))
        # timeout when the watermark passes last event + gap (ms epoch)
        state.setTimeoutTimestamp(last // 1000 + gap_sec * 1000)
        if closed:
            yield emit(closed)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, SESSION_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
