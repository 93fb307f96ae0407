"""Every registered (query, oracle) pair must hash-match at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (
    ORACLES,
    QUERIES,
)

from .oracle_compare import duckdb_conn, run_and_compare


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, sf_dir, name):
    run_and_compare(spark, con, QUERIES[name], ORACLES[name], name, sf_dir)


def test_approx_distinct_error_contract(spark, sf_dir):
    """HLL++ at rsd=0.01 must stay within 2% of the exact count
    (rows-only query — this pins its accuracy contract instead of an
    oracle)."""
    rows = QUERIES["approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_orders - r.exact_orders) / r.exact_orders < 0.02


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
        assert len(df.columns) > 0, name
