"""Streaming observability (reference ST9: consumer-lag / health checks).

The reference shells out to `kafka-consumer-groups --describe` and the
Flink REST API (Makefile:171-180); Spark's native equivalents are the
StreamingQueryListener event stream and `query.lastProgress`. This
module collects per-batch progress into a queryable health record:
input rate, processed rate, batch durations, and state-store size —
the numbers a lag/SLA alert would fire on.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressLog:
    """Accumulated per-batch metrics for one or more streaming queries."""

    batches: list[dict] = field(default_factory=list)

    def rows_processed(self) -> int:
        return int(sum(b["numInputRows"] for b in self.batches))

    def max_batch_duration_ms(self) -> int:
        return max((b["durationMs"] for b in self.batches), default=0)

    def health(self, max_batch_ms: int = 60_000) -> dict:
        """The SLA record: healthy = no batch exceeded the budget."""
        return {
            "n_batches": len(self.batches),
            "rows": self.rows_processed(),
            "max_batch_ms": self.max_batch_duration_ms(),
            "healthy": self.max_batch_duration_ms() <= max_batch_ms,
        }


class ProgressListener(StreamingQueryListener):
    """Collects QueryProgressEvent into a ProgressLog (driver-side)."""

    def __init__(self) -> None:
        self.log = ProgressLog()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.log.batches.append(
            {
                "queryId": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows or 0,
                "durationMs": sum((p.durationMs or {}).values()),
                "stateRows": sum(s.numRowsTotal for s in (p.stateOperators or [])),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach(spark: SparkSession) -> ProgressListener:
    listener = ProgressListener()
    spark.streams.addListener(listener)
    return listener


def detach(spark: SparkSession, listener: ProgressListener) -> None:
    spark.streams.removeListener(listener)
