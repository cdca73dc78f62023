from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from real_time_data_engineering_spark.session import get_spark

    # Tests run sf0.001 data where the job-scheduling floor, not
    # compute, dominates: the r10 scaling block measured most of the
    # suite FLAT-TO-FASTER on 8 cores than 32 even at sf0.1, and the
    # full pytest run outgrew the driver's verification window
    # (VERIFY_r10 tests_ok=false, truncated at 16%). 8 workers cut the
    # per-stage task churn (32 tiny tasks → 8) without changing any
    # plan shape the gates assert on. Override with SPARK_GRAFT_TEST_CPUS.
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    s = get_spark(app_name="tests", master=f"local[{cpus}]", shuffle_partitions=8)
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
