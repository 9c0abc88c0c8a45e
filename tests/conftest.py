"""Shared fixtures: one SparkSession per test session, sf0.001 data."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from database_peak_streaming_spark import get_spark

    s = get_spark("dps-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def oracle():
    from database_peak_streaming_spark.harness.diff import oracle_connection

    con = oracle_connection(SF_DIR)
    yield con
    con.close()
