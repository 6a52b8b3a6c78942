from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must run BEFORE any SparkSession exists: exports the vendored-protobuf
# shim onto PYTHONPATH so local-mode Python workers (which inherit the
# JVM's env, snapshotted at gateway launch) can import google.protobuf —
# required by transformWithStateInPandas' state-server protocol.
from aws_data_engineering_spark.compat import ensure_protobuf

ensure_protobuf()

from aws_data_engineering_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
