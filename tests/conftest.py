"""Shared fixtures: one session-scoped SparkSession, sf0.001 fixtures dir."""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.session import (
        get_spark,
    )

    s = get_spark(app_name="evlake-tests", master="local[4]", conf={
        "spark.sql.shuffle.partitions": "4",
    })
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
