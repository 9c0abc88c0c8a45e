"""Shared fixtures: one SparkSession per test session, sf0.001 data."""

from __future__ import annotations

import os
import pathlib
import sys

import pytest

SF_DIR = "/root/testdata/sf0.001"

# transformWithState needs google.protobuf in the driver AND in every
# Spark Python worker; where no wheel is installed, fall back to the
# vendored pure-Python runtime (third_party/README.md).  PYTHONPATH
# must carry it BEFORE the SparkSession (and its workers) launch, so
# this runs at conftest import time, and only when the real package is
# absent — an installed protobuf always wins.
try:
    import google.protobuf  # noqa: F401
except ImportError:
    _TP = str(pathlib.Path(__file__).resolve().parents[1] / "third_party")
    sys.path.insert(0, _TP)
    os.environ["PYTHONPATH"] = (
        _TP + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)


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
