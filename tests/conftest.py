from __future__ import annotations

import os

import pytest

from traffic_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_TEST_SHUFFLE lets a sweep re-run the whole suite under a
    # different shuffle width — any output that changes with the width is
    # an order-dependence bug (see tests/test_partition_invariance.py for
    # the always-on per-query version)
    width = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8"))
    s = get_spark("tdp-tests", shuffle_partitions=width)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_oracle():
    return SF_DIR_ORACLE
