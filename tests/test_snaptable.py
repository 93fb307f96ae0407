"""Snapshot table format (sources/snaptable.py): versioned commits,
time travel, dynamic partition overwrite carry-over, rerun
idempotency, crash orphans, optimistic-concurrency collision,
rollback, and vacuum retention."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources import (
    snaptable as st,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
    read_fixture,
)


@pytest.fixture
def orders(spark, sf_dir):
    return read_fixture(spark, sf_dir, "orders")


def _tbl(tmp_path) -> str:
    return str(tmp_path / "snap_orders")


def test_create_append_read(spark, orders, tmp_path):
    t = _tbl(tmp_path)
    v1 = st.create_table(orders, t, ["o_orderstatus"])
    assert v1 == 1
    n = orders.count()
    assert st.read_snapshot(spark, t).count() == n
    extra = orders.limit(100)
    assert st.append(extra, t) == 2
    assert st.read_snapshot(spark, t).count() == n + 100
    # time travel: v1 unchanged
    assert st.read_snapshot(spark, t, version=1).count() == n
    # schema round-trips, including the partition column
    assert set(st.read_snapshot(spark, t).columns) == set(orders.columns)


def test_overwrite_partitions_carries_untouched_files(spark, orders, tmp_path):
    t = _tbl(tmp_path)
    st.create_table(orders, t, ["o_orderstatus"])
    high_f = orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)
    )
    st.overwrite_partitions(high_f, t)
    got = st.read_snapshot(spark, t)
    expected = orders.filter(
        (F.col("o_orderstatus") != "F") | (F.col("o_totalprice") > 150000)
    )
    assert got.count() == expected.count()
    # the untouched partitions are byte-identical carry-overs
    assert (
        got.filter(F.col("o_orderstatus") == "O").count()
        == orders.filter(F.col("o_orderstatus") == "O").count()
    )
    # v1 still reads the original full table
    assert st.read_snapshot(spark, t, version=1).count() == orders.count()


def test_overwrite_partitions_rerun_idempotent(spark, orders, tmp_path):
    """Replaying the same batch (the reference's rerun unit) converges
    to the same visible state while each replay stays auditable as a
    new version."""
    t = _tbl(tmp_path)
    st.create_table(orders, t, ["o_orderstatus"])
    batch = orders.filter(F.col("o_orderstatus") == "P")
    st.overwrite_partitions(batch, t)
    first = st.read_snapshot(spark, t)
    state1 = (first.count(), first.filter(F.col("o_orderstatus") == "P").count())
    st.overwrite_partitions(batch, t)
    second = st.read_snapshot(spark, t)
    assert (second.count(), second.filter(F.col("o_orderstatus") == "P").count()) == state1
    assert st.current_version(t) == 3
    ops = [h["operation"] for h in st.history(t)]
    assert ops == ["create", "overwrite_partitions", "overwrite_partitions"]


def test_crashed_write_is_invisible_and_vacuumable(spark, orders, tmp_path):
    """Data files written without a manifest commit (a writer killed
    between data write and publish) must not affect readers and must
    be reclaimed by vacuum — while every referenced file survives."""
    t = _tbl(tmp_path)
    st.create_table(orders, t, ["o_orderstatus"])
    n = st.read_snapshot(spark, t).count()
    # simulate the crash: data lands, no manifest follows
    st._write_data(orders.limit(50), t, ["o_orderstatus"])
    assert st.read_snapshot(spark, t).count() == n  # readers unaffected
    report = st.vacuum(t)
    assert report["deleted_files"] > 0 and report["expired_versions"] == 0
    assert st.read_snapshot(spark, t).count() == n  # nothing referenced was lost


def test_vacuum_retention_expires_time_travel(spark, orders, tmp_path):
    t = _tbl(tmp_path)
    st.create_table(orders, t, ["o_orderstatus"])
    st.overwrite_table(orders.limit(10), t)
    st.overwrite_table(orders.limit(20), t)
    report = st.vacuum(t, retain_last=1)
    assert report["expired_versions"] == 2
    # v1's files were only referenced by expired manifests -> gone
    assert report["deleted_files"] > 0
    assert st.read_snapshot(spark, t).count() == 20
    with pytest.raises(ValueError, match="does not exist"):
        st.read_snapshot(spark, t, version=1)


def test_concurrent_commit_collision_raises(spark, orders, tmp_path):
    t = _tbl(tmp_path)
    st.create_table(orders.limit(10), t, [])
    head = st.current_version(t)
    manifest = st._read_manifest(t, head)
    with pytest.raises(st.ConcurrentCommit):
        st._publish(t, head, manifest)
    # the losing writer leaves no partial state behind
    assert [f for f in os.listdir(st._snap_dir(t)) if f.endswith(".tmp")] == []


def test_rollback_restores_old_state_keeps_history(spark, orders, tmp_path):
    t = _tbl(tmp_path)
    st.create_table(orders, t, ["o_orderstatus"])
    n = orders.count()
    st.overwrite_table(orders.limit(5), t)
    assert st.read_snapshot(spark, t).count() == 5
    st.rollback(t, 1)
    assert st.read_snapshot(spark, t).count() == n
    assert st.current_version(t) == 3
    # the bad head remains time-travelable until vacuumed
    assert st.read_snapshot(spark, t, version=2).count() == 5


def test_gold_pipeline_through_snaptable(spark, tmp_path):
    """The reference's gold flow (build_gold + overwritePartitions +
    rerun, gold_etl.py:106-156) lands on the snapshot format with
    idempotent reruns AND gains the time travel the Parquet fallback
    lacks."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.gold import (
        build_gold,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.silver import (
        clean_sessions,
    )

    bronze = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv("/root/reference/data-samples/station_data_dataverse.csv")
    )
    gold = build_gold(clean_sessions(bronze))
    t = str(tmp_path / "fact_ev_session")
    st.create_table(gold, t, ["event_date"])
    # rerun one day, reference-style
    day = gold.select(F.min("event_date").alias("d")).collect()[0].d
    batch = gold.filter(F.col("event_date") == F.lit(day))
    st.overwrite_partitions(batch, t)
    st.overwrite_partitions(batch, t)
    final = st.read_snapshot(spark, t)
    assert final.count() == gold.count() == 3395
    assert st.read_snapshot(spark, t, version=1).count() == 3395
    assert len(st.history(t)) == 3
