"""Partition-count invariance: the determinism contract behind every
float result in the engine, pinned directly.

functions/oracle.py routes double aggregation through exact
DECIMAL(25,10) sums precisely so that results are a pure function of
the DATA, not of how Spark happened to split it — the property that
makes a number computed on local[4] reproducible on a 1000-executor
cluster (and hash-comparable against DuckDB). These tests re-run a
cross-section of float-heavy queries (group aggregates, broadcast
moments, window frames, ratio-of-aggregates, an iterative algorithm)
under a DIFFERENT ``spark.sql.shuffle.partitions`` and assert the
collected rows are bit-identical to the default-config run. A
failure means someone introduced an order-dependent double
accumulation (raw F.sum on doubles, float merge in an aggregator) —
the exact class of bug that only shows up as run-to-run flakiness at
cluster scale, caught here at fixture scale.

pagerank's sibling test (tests/test_graph.py) covers the graph loop;
this file covers the aggregate/window surface.
"""

from __future__ import annotations

import pytest

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (
    QUERIES,
)

#: group aggregate / broadcast-moments / decimal window frame /
#: ratio-of-aggregates / regression-fold / iterative-convergence —
#: one representative per float-accumulation shape in the engine.
INVARIANCE_PROBES = [
    "pricing_summary",
    "value_outliers",
    "rolling_zscore",
    "tpch_q8_market_share",
    "linear_trend",
    "kmeans_clusters",
    # r9: ladder-join rank statistics and the bounded BPE loop — the
    # two shapes where a partition-dependent accumulation would hide
    "spearman_corr",
    "kendall_tau",
    "bpe_merge_table",
    # r10: the ordered-array residual fold, the median-ladder ANOVA,
    # the integer-register sketch, and the checkpointed peeling loop
    "durbin_watson",
    "levene_test",
    "hll_sketch",
    "k_core",
]

ALT_PARTITIONS = "7"


def _rows(spark, name, sf_dir):
    return sorted(
        map(tuple, QUERIES[name](spark, sf_dir).collect()),
        key=lambda t: tuple(str(x) for x in t),
    )


@pytest.mark.parametrize("name", INVARIANCE_PROBES)
def test_result_invariant_under_shuffle_partition_count(spark, sf_dir, name):
    base = _rows(spark, name, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.catalog.clearCache()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", ALT_PARTITIONS)
        alt = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()
    assert base == alt, f"{name}: result depends on partition count"
