from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from real_time_data_engineering_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def differ(spark):
    from real_time_data_engineering_spark.checks.oracle import OracleDiffer

    return OracleDiffer(spark, SF_DIR)


@pytest.fixture(scope="session")
def load(spark):
    """Corpus table loader bound to the unit-test scale factor."""
    from real_time_data_engineering_spark.sources.readers import load_table

    return lambda name: load_table(spark, SF_DIR, name)
