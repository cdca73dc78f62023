"""Model-DAG runner — the dbt lifecycle reduced to its engine core.

The reference drives ~16 dbt models in dependency order with retries
(and five different orchestrators that all reduce to exactly that —
SURVEY.md §3.2). Here a model is a named function over previously-built
models; the runner topo-sorts, builds each as a DataFrame, optionally
materializes to partitioned parquet, and registers temp views so
`spark.sql` sees the same namespace dbt would.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Model:
    name: str
    fn: Callable[[dict[str, DataFrame]], DataFrame]
    deps: tuple[str, ...] = ()
    # 'view' → temp view only; 'table' → parquet materialization when a
    # warehouse dir is configured (marts/fct in the reference policy)
    materialization: str = "view"
    partition_by: tuple[str, ...] = ()


@dataclass
class RunResult:
    built: dict[str, DataFrame] = field(default_factory=dict)
    order: list[str] = field(default_factory=list)
    timings: dict[str, float] = field(default_factory=dict)  # build seconds per model


class DagRunner:
    def __init__(self, spark: SparkSession, warehouse_dir: str | None = None):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.models: dict[str, Model] = {}

    def add(self, model: Model) -> None:
        self.models[model.name] = model

    def _toposort(self) -> list[str]:
        order: list[str] = []
        state: dict[str, int] = {}

        def visit(name: str) -> None:
            if state.get(name) == 2:
                return
            if state.get(name) == 1:
                raise ValueError(f"cycle at {name}")
            state[name] = 1
            for d in self.models[name].deps:
                if d in self.models:
                    visit(d)
            state[name] = 2
            order.append(name)

        for name in self.models:
            visit(name)
        return order

    def run(self, inputs: dict[str, DataFrame] | None = None) -> RunResult:
        import time

        res = RunResult(built=dict(inputs or {}))
        for name in self._toposort():
            t0 = time.perf_counter()
            m = self.models[name]
            df = m.fn(res.built)
            if m.materialization == "table" and self.warehouse_dir:
                path = f"{self.warehouse_dir}/{name}"
                writer = df.write.mode("overwrite")
                if m.partition_by:
                    writer = writer.partitionBy(*m.partition_by)
                writer.parquet(path)
                df = self.spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            res.built[name] = df
            res.order.append(name)
            res.timings[name] = time.perf_counter() - t0
        return res
