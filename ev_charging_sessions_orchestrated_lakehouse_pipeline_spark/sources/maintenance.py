"""Policy-driven warehouse maintenance — the background-upkeep half
of a managed lakehouse (Databricks' predictive optimization /
auto-maintenance, re-expressed as declared table properties + one
sweep entry point).

Tables DECLARE their upkeep on themselves (``SET TBLPROPERTIES``):

* ``maintenance.autoCompact`` = ``"true"`` — compact fragmented
  partitions (:func:`..sources.snaptable.auto_compact`); the byte
  policy engages when ``maintenance.targetFileBytes`` is set, else
  the file-count policy with ``maintenance.maxFilesPerPartition``
  (default 4). A declared ``clusterBy`` (liquid clustering) applies
  automatically because OPTIMIZE reads it.
* ``maintenance.vacuumRetainHours`` = ``"<float>"`` — age-based
  history expiry + orphan sweep (:func:`..sources.snaptable.vacuum`
  with ``retain_hours``; the table's own ``vacuum.graceSeconds``
  property still governs the in-flight-writer grace).
* ``maintenance.analyze`` = ``"true"`` or a comma-joined column list
  — refresh table-level NDV/null stats
  (:func:`..sources.snaptable.analyze_table`) so planners read fresh
  cardinalities.

:func:`run_maintenance` sweeps every snapshot table under a
warehouse root and applies exactly what each declares — tables with
no maintenance properties are untouched. One call, cron-able
(CLI ``maintenance --lake <root>``).

Scale: the sweep's planning is pure manifest arithmetic per table
(zero data reads); only the work each policy actually demands runs
distributed jobs, partition-scoped where the format allows it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from . import snaptable as st
from .ddl import _is_snapshot_table

__all__ = ["run_maintenance", "maintain_table"]


def maintain_table(
    spark: SparkSession, table: str, dry_run: bool = False
) -> dict:
    """Apply the table's declared maintenance policies. Returns a
    report of what ran (or, with ``dry_run``, what WOULD run:
    the compaction plan and the vacuum audit, touching nothing)."""
    props = st.table_properties(table)
    report: dict = {}
    if str(props.get("maintenance.autoCompact", "")).lower() == "true":
        target = props.get("maintenance.targetFileBytes")
        max_files = int(props.get("maintenance.maxFilesPerPartition", 4))
        if dry_run:
            plan = (
                st.plan_compaction_bytes(table, int(target))
                if target
                else st.plan_compaction(table, max_files)
            )
            report["compaction_plan"] = {
                "/".join(f"{k}={v}" for k, v in key) or "<table>": n
                for key, n in sorted(plan.items())
            }
        else:
            report["compacted_versions"] = st.auto_compact(
                spark,
                table,
                max_files_per_partition=max_files,
                target_file_bytes=int(target) if target else None,
            )
    if "maintenance.vacuumRetainHours" in props:
        hours = float(props["maintenance.vacuumRetainHours"])
        report["vacuum"] = st.vacuum(
            table, retain_hours=hours, dry_run=dry_run
        )
    analyze = props.get("maintenance.analyze")
    if analyze and not dry_run:
        cols = (
            None
            if str(analyze).lower() == "true"
            else [c for c in str(analyze).split(",") if c]
        )
        report["analyzed_version"] = st.analyze_table(
            spark, table, columns=cols
        )
    elif analyze:
        report["analyze"] = "pending (dry run)"
    return report


def run_maintenance(
    spark: SparkSession, warehouse_root: str, dry_run: bool = False
) -> dict[str, dict]:
    """Sweep every snapshot table under ``warehouse_root`` and apply
    each one's declared maintenance. Returns {table_name: report};
    tables declaring nothing map to an empty report (listed so the
    caller can tell "no policy" from "not a table").

    Per-table failure isolation: a cron-able sweep must not let one
    table with, say, a corrupt ``maintenance.vacuumRetainHours``
    value abort the whole warehouse — each table's failure is caught
    and reported as ``{"error": "<ExcType>: <msg>"}`` in its slot,
    and every other table is still processed. Callers that need to
    fail hard can check for ``"error"`` keys (the CLI exits nonzero
    only when EVERY swept table failed)."""
    if not os.path.isdir(warehouse_root):
        raise ValueError(f"warehouse root {warehouse_root!r} does not exist")
    out: dict[str, dict] = {}
    for entry in sorted(os.listdir(warehouse_root)):
        path = os.path.join(warehouse_root, entry)
        if _is_snapshot_table(path):
            try:
                out[entry] = maintain_table(spark, path, dry_run=dry_run)
            except Exception as exc:  # noqa: BLE001 — isolate per table
                out[entry] = {
                    "error": f"{type(exc).__name__}: {exc}"
                }
    return out
