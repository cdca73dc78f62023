"""Every registered query must reconcile against the DuckDB oracle.

This mirrors the driver's t2 gate (CORRECTNESS_r{N}.json) but stricter:
value-exact comparison after canonical sorting, at sf0.001 for speed.
"""

from __future__ import annotations

import pytest

from real_time_data_engineering_spark.registry import all_specs


def _names():
    return sorted(all_specs())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(differ, name):
    res = differ.run(name)
    res.raise_if_failed()
    assert res.spark_rows >= 0
