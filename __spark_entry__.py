"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

Everything is delegated to ``real_time_data_engineering_spark.registry``
— the package's declared capability surface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily revenue rollup) on /root/testdata/sf0.001."""
    from real_time_data_engineering_spark.registry import get

    return get("q1_daily_revenue").spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from real_time_data_engineering_spark.registry import all_specs

    return {name: spec.spark for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    from real_time_data_engineering_spark.registry import all_specs

    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
