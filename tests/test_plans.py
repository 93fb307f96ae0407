"""Physical-plan regression audit: the plan SHAPES that matter at
100 TB, asserted at fixture scale. Catches silent regressions like a
broadcast hint getting dropped (join flips to a payload shuffle) or a
join condition bug degenerating into a cartesian product.
"""

from __future__ import annotations

import pytest

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (
    QUERIES,
)

# Queries whose plans legitimately contain a BroadcastNestedLoopJoin:
# broadcast probe-set cross/inequality joins where the corpus side
# must stream against every (tiny) probe row.
BNLJ_ALLOWED = {
    "similarity_topk",
    "knn_join",
    "similarity_ivf",
    "dedup_embedding_cosine",
    "range_join_bands",
}


def _formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_and_controlled_bnlj(spark, sf_dir, name):
    plan = _formatted_plan(spark, QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected nested-loop join — a broadcast hint or "
            f"equi-join condition was probably lost"
        )


def test_scan_prunes_columns(spark, sf_dir):
    """Projection pushdown must reach the parquet scan: a 5-column
    select over 16-column lineitem reads exactly those columns."""
    plan = _formatted_plan(spark, QUERIES["filter_project"](spark, sf_dir))
    scan = next(
        block
        for block in plan.split("\n\n")
        if "Scan parquet" in block and "ReadSchema" in block
    )
    read_schema = next(
        line for line in scan.splitlines() if "ReadSchema" in line
    )
    for col in ("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"):
        assert col in read_schema
    assert "l_comment" not in read_schema and "l_shipmode" not in read_schema


def test_filter_pushes_down(spark, sf_dir):
    plan = _formatted_plan(spark, QUERIES["filter_project"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "LessThan" in plan
