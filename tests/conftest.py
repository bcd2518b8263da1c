"""Shared fixtures: one SparkSession per test run, testdata locations."""

from __future__ import annotations

import os

import pytest

from chapterhousedb_spark.session import build_session

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="chdb-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
