"""Golden-output tests on the reference sample dataset (SURVEY.md §5):
3,395 rows in -> 2,330 good / 1,065 quarantined; years repaired;
minute-granular timestamps; gold derived fields; partition-overwrite
idempotency."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.gold import (
    build_gold,
    run_gold,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.silver import (
    clean_sessions,
    run_silver,
    silver_check,
    silver_row_rules,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.quality import (
    CheckStatus,
    VerificationSuite,
    annotate_rows,
    split_good_bad,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
    read_bronze_csv,
)

SAMPLE_CSV = "/root/reference/data-samples/station_data_dataverse.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SAMPLE_CSV), reason="reference sample not available"
)


@pytest.fixture(scope="module")
def silver_df(spark):
    bronze = read_bronze_csv(spark, SAMPLE_CSV, infer=True)
    return clean_sessions(bronze).cache()


def test_bronze_row_count(spark):
    assert read_bronze_csv(spark, SAMPLE_CSV, infer=True).count() == 3395


def test_year_repair_and_minute_granularity(silver_df):
    years = silver_df.select(F.year("created").alias("y")).distinct().collect()
    assert {r.y for r in years} == {2014, 2015}
    secs = silver_df.select(F.second("created").alias("s")).distinct().collect()
    assert {r.s for r in secs} == {0}  # fix_year drops seconds (reference quirk)


def test_precise_timestamps_keep_seconds(spark):
    bronze = read_bronze_csv(spark, SAMPLE_CSV, infer=True)
    precise = clean_sessions(bronze, precise_timestamps=True)
    secs = precise.select(F.second("created").alias("s")).distinct().count()
    assert secs > 1


def test_event_date_span(silver_df):
    row = silver_df.agg(
        F.min("event_date").alias("lo"), F.max("event_date").alias("hi")
    ).collect()[0]
    assert str(row.lo) == "2014-11-18" and str(row.hi) == "2015-10-04"


def test_categorical_decodes(silver_df):
    fts = {r[0] for r in silver_df.select("facilityType").distinct().collect()}
    assert fts == {"Manufacturing", "Office", "Research and Development", "Other"}
    wds = {r[0] for r in silver_df.select("weekday").distinct().collect()}
    assert wds <= {
        "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday",
    }


def test_golden_split(silver_df):
    annotated = annotate_rows(silver_df, silver_row_rules())
    good, bad = split_good_bad(annotated, persist=False)
    assert good.count() == 2330
    assert bad.count() == 1065
    # every quarantined row carries a machine-readable reason
    reasons = (
        bad.select(F.explode("quarantine_reason").alias("r"))
        .groupBy("r")
        .count()
        .collect()
    )
    by_reason = {r.r: r["count"] for r in reasons}
    assert by_reason["distance_negative_or_zero"] == 1065  # all "NA" distances
    assert by_reason["kwhTotal_non_positive"] == 55


def test_dataset_verification_passes(silver_df):
    vr = VerificationSuite().on_data(silver_df).add_check(silver_check()).run()
    assert vr.status == CheckStatus.SUCCESS, vr.to_dict()
    d = vr.to_dict()
    assert d["uniqueness(sessionId)"]["metric"] == 1.0
    assert d["completeness(sessionId)"]["metric"] == 1.0
    # distance has nulls but isNonNegative passes them (Deequ semantics)
    assert d["non_negative(distance)"]["passed"]


def test_gold_derived_fields(silver_df):
    gold = build_gold(silver_df.limit(100))
    row = gold.filter(
        F.col("kwhTotal") > 0
    ).select("session_duration_minutes", "avg_cost_per_kwh", "chargeTimeHrs").first()
    assert row.session_duration_minutes is not None
    assert row.avg_cost_per_kwh is not None


def test_end_to_end_pipeline_and_idempotency(spark, tmp_path):
    lake = str(tmp_path / "lake")
    res = run_silver(
        spark,
        input_path=SAMPLE_CSV,
        silver_path=f"{lake}/silver",
        quarantine_path=f"{lake}/quarantine",
    )
    assert (res.good_count, res.bad_count) == (2330, 1065)
    assert res.verification.status == CheckStatus.SUCCESS

    n1 = run_gold(spark, f"{lake}/silver", f"{lake}/gold")
    assert n1 == 2330
    total1 = spark.read.parquet(f"{lake}/gold").count()

    # partition re-run: same day twice -> same table state (reference S9)
    some_date = str(
        spark.read.parquet(f"{lake}/silver").groupBy("event_date").count()
        .orderBy(F.col("count").desc()).first().event_date
    )
    n2 = run_gold(spark, f"{lake}/silver", f"{lake}/gold", event_date=some_date)
    assert n2 > 0
    total2 = spark.read.parquet(f"{lake}/gold").count()
    assert total1 == total2 == 2330

    # empty-input early exit (reference C6)
    n3 = run_gold(spark, f"{lake}/silver", f"{lake}/gold", event_date="1999-01-01")
    assert n3 == 0


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    """compact_dataset: same rows, bounded file count per partition,
    clustered rows inside each file."""
    import glob

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.writers import (
        compact_dataset,
        write_partitioned_parquet,
    )
    from pyspark.sql import functions as F

    ev = read_fixture(spark, "/root/testdata/sf0.001", "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    path = str(tmp_path / "events_part")
    # deliberately fragmented: many files per partition
    write_partitioned_parquet(ev.repartition(8), path, ["event_date"])
    before = len(glob.glob(f"{path}/event_date=*/*.parquet"))
    n_before = spark.read.parquet(path).count()

    n = compact_dataset(spark, path, ["event_date"], cluster_by=["user_id"])
    after = len(glob.glob(f"{path}/event_date=*/*.parquet"))
    n_parts = len(glob.glob(f"{path}/event_date=*"))

    assert n == n_before
    assert spark.read.parquet(path).count() == n_before
    assert after == n_parts  # exactly one file per partition
    assert after < before


def test_gold_catalog_registration_and_partition_pruning(spark, tmp_path):
    """Reference S7/S8/S11: CREATE DATABASE + external fact-table DDL
    + MSCK partition discovery must leave a catalog table whose
    date-filtered scans prune partitions (the Athena-style SQL
    endpoint over the gold layer)."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.silver import (
        run_silver,
    )

    lake = str(tmp_path / "lake")
    run_silver(
        spark,
        input_path=SAMPLE_CSV,
        silver_path=f"{lake}/silver",
        quarantine_path=f"{lake}/quarantine",
    )
    n = run_gold(
        spark, f"{lake}/silver", f"{lake}/gold", database="evcat", table="fact_test"
    )
    assert n == 2330
    try:
        total = spark.sql("SELECT COUNT(*) AS c FROM evcat.fact_test").collect()[0].c
        assert total == 2330
        # partition pruning: a one-day filter must reach the scan as
        # a partition filter, not a post-scan row filter
        some_date = spark.sql(
            "SELECT CAST(event_date AS STRING) AS d FROM evcat.fact_test "
            "GROUP BY 1 ORDER BY COUNT(*) DESC LIMIT 1"
        ).collect()[0].d
        df = spark.sql(
            f"SELECT * FROM evcat.fact_test WHERE event_date = DATE'{some_date}'"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "isnotnull(event_date" in plan or "event_date" in plan.split(
            "PartitionFilters"
        )[1].split("]")[0]
        day = df.count()
        assert 0 < day < 2330
    finally:
        spark.sql("DROP TABLE IF EXISTS evcat.fact_test")
        spark.sql("DROP DATABASE IF EXISTS evcat")


def test_compaction_crash_recovery(spark, tmp_path):
    """Kill-between-steps safety: at every intermediate state of the
    compaction swap, both copies exist on disk and recover_compaction
    restores a readable dataset at the original path."""
    import shutil

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.writers import (
        COMPACT_NEW_SUFFIX,
        COMPACT_TRASH_SUFFIX,
        recover_compaction,
        write_partitioned_parquet,
    )
    from pyspark.sql import functions as F

    ev = read_fixture(spark, "/root/testdata/sf0.001", "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    path = str(tmp_path / "events_part")
    write_partitioned_parquet(ev, path, ["event_date"])
    n = spark.read.parquet(path).count()

    # crash after writing the new copy, before any rename
    shutil.copytree(path, path + COMPACT_NEW_SUFFIX)
    assert recover_compaction(path) == "clean"
    assert spark.read.parquet(path).count() == n

    # crash between rename(old, trash) and rename(new, old)
    shutil.copytree(path, path + COMPACT_NEW_SUFFIX)
    shutil.move(path, path + COMPACT_TRASH_SUFFIX)
    assert recover_compaction(path) == "rolled_forward"
    assert spark.read.parquet(path).count() == n

    # crash after rename(old, trash) with the new copy lost/incomplete
    shutil.move(path, path + COMPACT_TRASH_SUFFIX)
    assert recover_compaction(path) == "rolled_back"
    assert spark.read.parquet(path).count() == n

    # idempotent on a healthy dataset
    assert recover_compaction(path) == "clean"


def test_discover_table_crawler_semantics(spark, tmp_path):
    """Reference S10 (infra/glue-crawlers.tf:25-58): point
    discover_table at a partitioned Parquet prefix -> schema +
    partition columns inferred and registered, every partition
    queryable; re-discover after schema evolution re-registers with
    the merged schema (the crawler's UPDATE_IN_DATABASE policy)."""
    from pyspark.sql import functions as F

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.gold import (
        discover_table,
    )

    path = str(tmp_path / "crawled")
    df = (
        spark.range(0, 100)
        .withColumn("day", (F.col("id") % 3).cast("string"))
        .withColumn("v", F.col("id") * 2)
    )
    df.write.partitionBy("day").parquet(path)
    try:
        fqn = discover_table(spark, path, "crawldb", "t_crawled")
        assert fqn == "crawldb.t_crawled"
        got = spark.sql(f"SELECT COUNT(*) AS c FROM {fqn}").collect()[0].c
        assert got == 100
        assert (
            spark.sql(
                f"SELECT COUNT(DISTINCT day) AS d FROM {fqn}"
            ).collect()[0].d
            == 3
        )
        # partition pruning works through the registered table
        plan = (
            spark.sql(f"SELECT v FROM {fqn} WHERE day = '1'")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters: [" in plan

        # idempotent re-discover: same schema, no-op re-register
        assert discover_table(spark, path, "crawldb", "t_crawled") == fqn

        # schema evolution: newer files carry an extra column
        df2 = (
            spark.range(100, 130)
            .withColumn("day", F.lit("3"))
            .withColumn("v", F.col("id") * 2)
            .withColumn("extra", F.lit("new"))
        )
        df2.write.mode("append").partitionBy("day").parquet(path)
        discover_table(spark, path, "crawldb", "t_crawled")
        cols = [f.name for f in spark.table(fqn).schema.fields]
        assert "extra" in cols
        assert (
            spark.sql(f"SELECT COUNT(*) AS c FROM {fqn}").collect()[0].c
            == 130
        )
        assert (
            spark.sql(
                f"SELECT COUNT(*) AS c FROM {fqn} WHERE extra = 'new'"
            ).collect()[0].c
            == 30
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS crawldb.t_crawled")
        spark.sql("DROP DATABASE IF EXISTS crawldb")
