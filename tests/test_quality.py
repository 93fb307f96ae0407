"""Unit tests for the native DQ framework: Deequ null semantics per
constraint type, every row rule triggered by a crafted row, fix_year
edge cases (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.functions.cleaning import (
    fix_year,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.quality import (
    Check,
    CheckLevel,
    CheckStatus,
    RowRule,
    VerificationSuite,
    annotate_rows,
    split_good_bad,
)


def _verify(df, check):
    return VerificationSuite().on_data(df).add_check(check).run()


def test_completeness_nulls_fail(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], ["x"])
    vr = _verify(df, Check().is_complete("x"))
    assert vr.status == CheckStatus.ERROR
    assert abs(vr.results[0].metric_value - 2 / 3) < 1e-12


def test_non_negative_nulls_pass(spark):
    df = spark.createDataFrame([(1.0,), (None,), (0.0,)], "x double")
    vr = _verify(df, Check().is_non_negative("x"))
    assert vr.success
    df2 = spark.createDataFrame([(1.0,), (-0.5,)], "x double")
    assert not _verify(df2, Check().is_non_negative("x")).success


def test_containment_nulls_pass(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], ["x"])
    assert _verify(df, Check().is_contained_in("x", ["a", "b"])).success
    df2 = spark.createDataFrame([("a",), ("zz",)], ["x"])
    vr = _verify(df2, Check().is_contained_in("x", ["a", "b"]))
    assert not vr.success and vr.results[0].metric_value == 0.5


def test_uniqueness_deequ_semantics(spark):
    # Deequ Uniqueness([a,a,b]) = 1/3 (values occurring exactly once / rows)
    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["x"])
    vr = _verify(df, Check().is_unique("x"))
    assert not vr.success
    assert abs(vr.results[0].metric_value - 1 / 3) < 1e-12
    df2 = spark.createDataFrame([("a",), ("b",)], ["x"])
    assert _verify(df2, Check().is_unique("x")).success


def test_warning_level_does_not_fail(spark):
    df = spark.createDataFrame([(None,)], "x string")
    vr = _verify(df, Check(CheckLevel.WARNING).is_complete("x"))
    assert vr.status == CheckStatus.WARNING


def test_size_min_max_mean(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    check = (
        Check()
        .has_size(lambda v: v == 3)
        .has_min("x", lambda v: v == 1.0)
        .has_max("x", lambda v: v == 3.0)
        .has_mean("x", lambda v: abs(v - 2.0) < 1e-12)
    )
    assert _verify(df, check).success


def test_single_pass_scan_metrics(spark):
    """All scan-level constraints collapse into ONE aggregate job."""
    df = spark.createDataFrame([(1.0, "a")], "x double, y string")
    check = Check().is_complete("y").is_non_negative("x").has_size(lambda v: v == 1)
    suite = VerificationSuite().on_data(df).add_check(check)
    assert suite.run().success  # 3 constraints, 1 agg (observed via plan count)


@pytest.mark.parametrize(
    "row,expected",
    [
        ((None, 1.0, 1.0), ["id_null"]),
        (("s1", -1.0, 1.0), ["neg_val"]),
        (("s1", 1.0, 0.0), ["zero_dur"]),
        ((None, -1.0, 0.0), ["id_null", "neg_val", "zero_dur"]),
        (("s1", 1.0, 1.0), []),
    ],
)
def test_row_rules_each_trigger(spark, row, expected):
    df = spark.createDataFrame([row], "id string, val double, dur double")
    rules = [
        RowRule("id_null", F.col("id").isNull()),
        RowRule("neg_val", F.col("val") < 0),
        RowRule("zero_dur", F.col("dur") <= 0),
    ]
    out = annotate_rows(df, rules).collect()[0]
    assert out.quarantine_reason == expected


def test_split_complementary(spark):
    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("c", -3.0)], "id string, v double"
    )
    rules = [RowRule("bad_id", F.col("id").isNull()), RowRule("neg", F.col("v") < 0)]
    good, bad = split_good_bad(annotate_rows(df, rules), persist=False)
    assert good.count() == 1 and bad.count() == 2
    assert "quarantine_reason" not in good.columns


@pytest.mark.parametrize(
    "raw,fixed",
    [
        ("0015-03-01 10:22:33", "2015-03-01 10:22"),  # repaired, seconds dropped
        ("2015-03-01 10:22:33", "2015-03-01 10:22:33"),  # normal year untouched
        ("0014-1", "2014-1"),  # short string: takes what's there
        (None, None),
    ],
)
def test_fix_year_edges(spark, raw, fixed):
    df = spark.createDataFrame([(raw,)], "ts string")
    out = df.select(fix_year("ts").alias("f")).collect()[0].f
    assert out == fixed


def test_attach_observes_metrics_with_no_extra_pass(spark, tmp_path):
    """attach() rides the caller's write action: metric values and
    verdict equal run()'s, no separate aggregation job over the data,
    and uniqueness (which cannot be observed) still verifies."""
    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, -3.0, "b"), (3, None, "a"), (3, 1.0, None)],
        "id bigint, val double, cat string",
    )
    check = (
        Check(level=CheckLevel.WARNING)
        .is_complete("cat")
        .is_non_negative("val")
        .has_size(lambda v: v == 4)
        .is_unique("id")
    )
    baseline = VerificationSuite().on_data(df).add_check(check).run()

    suite = VerificationSuite().add_check(check)
    observed, handle = suite.attach(df)
    # rows pass through unchanged; the ONLY action is the write
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = handle.result()

    assert got.status == baseline.status
    base_by_name = {r.constraint: r.metric_value for r in baseline.results}
    for r in got.results:
        assert r.metric_value == base_by_name[r.constraint], r.constraint
    # and the written data is the full frame (observe is transparent)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 4


def test_attach_on_golden_silver_matches_run(spark):
    """The reference pipeline's own check, observed during a count
    action over the cleaned golden CSV, reproduces run() exactly."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.silver import (
        clean_sessions,
        silver_check,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_bronze_csv,
    )

    bronze = read_bronze_csv(
        spark, "/root/reference/data-samples/station_data_dataverse.csv"
    )
    silver = clean_sessions(bronze)
    baseline = (
        VerificationSuite().on_data(silver).add_check(silver_check()).run()
    )
    suite = VerificationSuite().add_check(silver_check())
    observed, handle = suite.attach(silver)
    observed.count()
    got = handle.result()
    assert got.status == baseline.status
    assert {r.constraint: r.metric_value for r in got.results} == {
        r.constraint: r.metric_value for r in baseline.results
    }
