"""Policy-driven warehouse maintenance (sources/maintenance.py): the
managed-lakehouse upkeep sweep. Tables declare maintenance.* in their
properties; run_maintenance applies exactly what each declares."""

from __future__ import annotations

import os

import pytest

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources import (
    maintenance as mx,
    snaptable as st,
)


@pytest.fixture
def wh(spark, tmp_path):
    root = str(tmp_path / "wh")
    os.makedirs(root)
    # fragmented table with full policy declared
    t1 = os.path.join(root, "hot")
    st.create_table(
        spark.createDataFrame(
            [(i, "g%d" % (i % 2), float(i)) for i in range(40)],
            "id int, g string, v double",
        ).repartition(6),
        t1,
        ["g"],
    )
    for i in range(3):  # fragment further + build history
        st.append(
            spark.createDataFrame(
                [(100 + i, "g0", 0.5)], "id int, g string, v double"
            ),
            t1,
        )
    st.set_table_properties(
        t1,
        {
            "maintenance.autoCompact": "true",
            "maintenance.maxFilesPerPartition": "2",
            "maintenance.vacuumRetainHours": "0",
            "maintenance.analyze": "v",
            "vacuum.graceSeconds": "0",
        },
    )
    # policy-free table: must be listed but untouched
    t2 = os.path.join(root, "cold")
    st.create_table(
        spark.createDataFrame([(1, 1.0)], "id int, v double").coalesce(1),
        t2,
        [],
    )
    return root


def test_run_maintenance_applies_declared_policies(spark, wh):
    t1 = os.path.join(wh, "hot")
    rep = mx.run_maintenance(spark, wh)
    assert set(rep) == {"hot", "cold"}
    assert rep["cold"] == {}  # no policy, nothing ran
    hot = rep["hot"]
    assert hot["compacted_versions"]  # fragmented partitions compacted
    assert hot["vacuum"]["deleted_files"] > 0  # superseded files swept
    assert "analyzed_version" in hot
    # compaction respected the per-partition cap
    man = st._read_manifest(t1, st.current_version(t1))
    from collections import Counter

    per_part = Counter(f.split("/")[1] for f in man["files"])
    assert all(n <= 2 for n in per_part.values()), per_part
    # stats landed
    stats = st._read_manifest(t1, st.current_version(t1))["table_stats"]
    assert stats["rows"] == 43 and "v" in stats["columns"]
    # content intact
    assert st.read_snapshot(spark, t1).count() == 43
    # second sweep: nothing fragmented, nothing to vacuum
    rep2 = mx.run_maintenance(spark, wh)
    assert rep2["hot"]["compacted_versions"] == []
    assert rep2["hot"]["vacuum"]["deleted_files"] == 0


def test_run_maintenance_dry_run_touches_nothing(spark, wh):
    t1 = os.path.join(wh, "hot")
    head = st.current_version(t1)
    rep = mx.run_maintenance(spark, wh, dry_run=True)
    hot = rep["hot"]
    assert hot["compaction_plan"]  # flagged partitions reported
    assert hot["vacuum"]["dry_run"] is True
    assert hot["analyze"] == "pending (dry run)"
    assert st.current_version(t1) == head  # nothing committed


def test_cli_maintenance(spark, wh, capsys, monkeypatch):
    import json as _json

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.cli import main

    monkeypatch.setattr(spark.__class__, "stop", lambda self: None)
    rc = main(["maintenance", "--lake", wh, "--dry-run"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "hot" in out and "compaction_plan" in out["hot"]


def test_run_maintenance_isolates_per_table_failures(spark, wh):
    """r14 (VERDICT r13 nit 1): one table with a corrupt maintenance
    property must not abort the warehouse sweep — its failure is
    reported in ITS slot and every other table still processes."""
    bad = os.path.join(wh, "hot")
    st.set_table_properties(
        bad, {"maintenance.vacuumRetainHours": "not_a_number"}
    )
    rep = mx.run_maintenance(spark, wh)
    assert set(rep) == {"hot", "cold"}
    assert "error" in rep["hot"]
    assert "ValueError" in rep["hot"]["error"]
    assert "error" not in rep["cold"]  # policy-free, still swept


def test_cli_maintenance_exit_codes(spark, wh, capsys, monkeypatch):
    """CLI: partial failure exits 0 (report carries the error);
    all-tables-failed exits nonzero."""
    import json as _json

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.cli import (
        main,
    )

    monkeypatch.setattr(spark.__class__, "stop", lambda self: None)
    st.set_table_properties(
        os.path.join(wh, "hot"),
        {"maintenance.vacuumRetainHours": "not_a_number"},
    )
    rc = main(["maintenance", "--lake", wh])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "error" in out["hot"] and "error" not in out["cold"]
    # poison the remaining table too -> all failed -> nonzero
    st.set_table_properties(
        os.path.join(wh, "cold"),
        {"maintenance.vacuumRetainHours": "also_bad"},
    )
    assert main(["maintenance", "--lake", wh]) == 1
