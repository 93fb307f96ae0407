"""Driver-checkable queries over the native DQ framework
(:mod:`.quality`), exercising the reference's verification semantics
(jobs/ev_sessions_silver_etl_clean.py:132-208) on the TPC-H fixtures.

Metrics are exposed as INTEGER counts (not fractions) so the DuckDB
oracle comparison is bit-exact — a fraction would ride on float
division order. The aggregation shape is identical to what
``VerificationSuite.run`` compiles: every scan-level metric folds into
ONE ``df.agg(...)`` pass (single scan at 100 TB), uniqueness adds one
combiner-reduced groupBy pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .quality import RowRule, annotate_rows

ORACLE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Dataset-level verification metrics in ONE aggregation pass
# (reference A3-A5, A7: Deequ completeness / non-negativity /
# containment compiled to a single scan). Deequ null semantics:
# nulls FAIL completeness, PASS compliance/containment.
# ---------------------------------------------------------------------------
def q_dq_verification(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    status_ok = F.col("o_orderstatus").isNull() | F.col("o_orderstatus").isin(
        "O", "F", "P"
    )
    nonneg = F.coalesce(F.col("o_totalprice"), F.lit(0.0)) >= 0
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("n_null_custkey"),
        F.sum((~nonneg).cast("long")).alias("n_negative_totalprice"),
        F.sum((~status_ok).cast("long")).alias("n_bad_status"),
    )
    return agg.select(
        "*",
        (
            (F.col("n_null_custkey") == 0)
            & (F.col("n_negative_totalprice") == 0)
            & (F.col("n_bad_status") == 0)
        ).alias("passed"),
    )


ORACLE["dq_verification"] = """
WITH m AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_custkey,
         CAST(SUM(CASE WHEN NOT (COALESCE(o_totalprice, 0) >= 0) THEN 1 ELSE 0 END)
           AS BIGINT) AS n_negative_totalprice,
         CAST(SUM(CASE WHEN NOT (o_orderstatus IS NULL OR o_orderstatus IN ('O','F','P'))
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status
  FROM orders
)
SELECT n_rows, n_null_custkey, n_negative_totalprice, n_bad_status,
       (n_null_custkey = 0 AND n_negative_totalprice = 0 AND n_bad_status = 0)
         AS passed
FROM m
"""


# ---------------------------------------------------------------------------
# Uniqueness analyzer (reference A6: Deequ isUnique = values occurring
# exactly once / total rows) — the one constraint that needs its own
# grouping pass. Exposed as exact counts.
# ---------------------------------------------------------------------------
def q_dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per_value = o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    return per_value.agg(
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_unique_values"),
        F.sum("cnt").alias("n_rows"),
    ).select(
        "*", (F.col("n_unique_values") == F.col("n_rows")).alias("is_unique")
    )


ORACLE["dq_uniqueness"] = """
WITH g AS (SELECT o_orderkey, COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)
SELECT CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique_values,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) = SUM(cnt) AS is_unique
FROM g
"""


# ---------------------------------------------------------------------------
# Row-level rule annotation -> per-reason violation counts (reference
# row-rule quarantine, :170-208). annotate_rows builds the nullable
# slot array + higher-order filter in one codegen projection; the
# explode/groupBy here is the reporting summary a DQ dashboard reads.
# ---------------------------------------------------------------------------
LINEITEM_RULES = [
    ("high_qty", "l_quantity > 45"),
    ("deep_discount", "l_discount >= 0.08"),
    ("returned", "l_returnflag = 'R'"),
]


def q_dq_reason_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rules = [RowRule(name, F.expr(cond)) for name, cond in LINEITEM_RULES]
    annotated = annotate_rows(li, rules)
    return (
        annotated.select(F.explode("quarantine_reason").alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("reason")
    )


_CASES = ", ".join(
    f"CASE WHEN {cond} THEN '{name}' END" for name, cond in LINEITEM_RULES
)
ORACLE["dq_reason_counts"] = f"""
SELECT reason, COUNT(*) AS n_rows FROM (
  SELECT unnest(list_filter([{_CASES}], x -> x IS NOT NULL)) AS reason
  FROM lineitem
) GROUP BY reason ORDER BY reason
"""
