"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the
``ev_charging_sessions_orchestrated_lakehouse_pipeline_spark``
package; this file only adapts its registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (  # noqa: E402
    get_oracles,
    get_queries,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Session-conf contract: every callable returned by ``queries()`` (and
# ``entry``) pins these two confs on the session it is handed, and
# deliberately LEAVES them set. They govern execution-time semantics
# (timestamp rendering under UTC, non-ANSI cast behavior) that the
# DuckDB oracle comparison depends on — and because DataFrame
# execution is lazy, restoring them before the driver collects the
# result would silently change the values it hashes. Nothing else in
# the package mutates caller-session confs (fixture reads save/
# restore the one read-time conf they need; see
# sources/readers.py:read_fixture).
_EXECUTION_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
}


def _pin_execution_confs(spark: SparkSession) -> None:
    for k, v in _EXECUTION_CONFS.items():
        spark.conf.set(k, v)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = queries()
    return qs["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable pins the documented execution confs (module
    docstring above) before delegating to the registry."""

    def _wrap(fn):
        def pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_execution_confs(spark)
            return fn(spark, sf_dir)

        pinned.__name__ = getattr(fn, "__name__", "query")
        pinned.__doc__ = fn.__doc__
        return pinned

    return {name: _wrap(fn) for name, fn in get_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every registered query — since round 5 ALL
    registry entries carry an exact value-hash oracle (the formerly
    rows-only xxhash LSH variant left the registry for its fully
    oracled md5-family twin)."""
    return get_oracles()
