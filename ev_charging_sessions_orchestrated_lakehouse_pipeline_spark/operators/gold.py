"""Gold layer: silver Parquet -> curated fact table with derived
metrics and idempotent partition-level overwrite (reference job
`jobs/ev_sessions_gold_etl.py`).

The reference writes to an Iceberg v2 table via
``writeTo(...).overwritePartitions()`` (:156). Spark-native
equivalent used here: a path-backed Parquet table written with
dynamic partition overwrite — only the ``event_date`` partitions
present in the batch are replaced, so re-running a day converges to
the same state. When Delta is importable (session.HAS_DELTA) the same
writer switches to ``format("delta")`` and gains ACID/time-travel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import safe_div
from ..schemas import EV_GOLD_SELECT_COLS
from ..session import HAS_DELTA


def build_gold(df: DataFrame) -> DataFrame:
    """Derived metrics (reference :106-118): session duration in
    minutes from epoch arithmetic, guarded cost-per-kWh."""
    return df.withColumn(
        "session_duration_minutes",
        (F.unix_timestamp("ended") - F.unix_timestamp("created")) / F.lit(60.0),
    ).withColumn("avg_cost_per_kwh", safe_div("dollars", "kwhTotal"))


FACT_TABLE_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
  sessionId STRING, userId STRING, stationId STRING, locationId STRING,
  kwhTotal DOUBLE, dollars DOUBLE, distance DOUBLE, chargeTimeHrs DOUBLE,
  facilityType STRING, platform STRING, weekday STRING,
  created TIMESTAMP, ended TIMESTAMP, event_date DATE,
  session_duration_minutes DOUBLE, avg_cost_per_kwh DOUBLE
)
USING {fmt}
PARTITIONED BY (event_date)
LOCATION '{location}'
"""


def ensure_fact_table(
    spark: SparkSession, database: str, table: str, location: str
) -> str:
    """Idempotent namespace + fact-table DDL (reference S7/S8,
    :125-150). Returns the qualified table name."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    fqn = f"{database}.{table}"
    fmt = "DELTA" if HAS_DELTA else "PARQUET"
    spark.sql(FACT_TABLE_DDL.format(table=fqn, fmt=fmt, location=location))
    return fqn


def run_gold(
    spark: SparkSession,
    silver_path: str,
    gold_path: str,
    event_date: str | None = None,
    database: str | None = None,
    table: str = "fact_ev_session",
    table_format: str = "parquet",
) -> int:
    """End-to-end gold job (reference :83-160): projected silver scan
    (column pruning) -> optional partition-pruned date filter ->
    derived metrics -> dynamic partition overwrite. Returns rows
    written (0 = early exit on empty input, reference C6).

    ``table_format="snapshot"`` lands the same batch as a versioned
    commit on the manifest-log table format (sources/snaptable.py) —
    the rerun stays idempotent in visible state AND every run becomes
    an auditable, time-travelable snapshot, which is the actual
    Iceberg-v2 semantics of the reference's fact table
    (gold_etl.py:147-150). With ``database`` the snapshot head is
    registered as the session view ``<database>_<table>`` via
    :func:`..sources.snaptable.register_snapshot_view` — the
    SQL-on-ACID surface the reference serves through
    Athena-on-Iceberg (gold_etl.py:159-160). A Hive TABLE over the
    snapshot data tree is still refused implicitly (it would see
    every version's files at once); the view plans the committed
    manifest's exact file list instead."""
    from ..sources.writers import overwrite_partitions

    if table_format not in ("parquet", "snapshot"):
        raise ValueError(f"unknown table_format {table_format!r}")

    df = spark.read.parquet(silver_path).select(*EV_GOLD_SELECT_COLS)
    if event_date:
        df = df.filter(F.col("event_date") == F.to_date(F.lit(event_date)))

    row_count = df.count()
    if row_count == 0:
        return 0

    df_gold = build_gold(df)
    if table_format == "snapshot":
        from ..sources import snaptable

        if snaptable.current_version(gold_path) is None:
            snaptable.create_table(df_gold, gold_path, ["event_date"])
        else:
            snaptable.overwrite_partitions(df_gold, gold_path)
        if database:
            fqn = snaptable.register_snapshot_view(
                spark, gold_path, f"{database}_{table}"
            )
            # post-write verification through the SQL surface
            # (reference A2, gold_etl.py:159-160)
            spark.sql(f"SELECT COUNT(*) AS cnt FROM {fqn}").collect()
        return row_count
    overwrite_partitions(df_gold, gold_path, ["event_date"])

    if database:
        fqn = ensure_fact_table(spark, database, table, gold_path)
        spark.sql(f"MSCK REPAIR TABLE {fqn}")
        # post-write verification (reference A2, :159-160)
        spark.sql(f"SELECT COUNT(*) AS cnt FROM {fqn}").collect()
    return row_count


def _discover_partition_cols(path: str) -> list[str]:
    """Hive partition columns implied by the directory layout: one
    ``key=value`` level per partition column, outermost first."""
    import os

    cols: list[str] = []
    cur = path
    while True:
        try:
            entries = sorted(os.listdir(cur))
        except (FileNotFoundError, NotADirectoryError):
            break
        parts = [
            e
            for e in entries
            if "=" in e and os.path.isdir(os.path.join(cur, e))
        ]
        if not parts:
            break
        key = parts[0].split("=", 1)[0]
        cols.append(key)
        cur = os.path.join(cur, parts[0])
    return cols


def discover_table(
    spark: SparkSession, path: str, database: str, table: str
) -> str:
    """Crawler-style schema discovery (reference S10,
    ``infra/glue-crawlers.tf:25-58``): point at a Parquet prefix,
    infer the schema from the file footers and the partition columns
    from the Hive directory layout, and register the result as an
    external table — then ``MSCK REPAIR`` so every existing partition
    is queryable immediately.

    Re-running against an EVOLVED prefix (new columns in newer files)
    is the crawler's ``UPDATE_IN_DATABASE`` behavior: the table is
    re-registered with the merged schema (external tables are
    metadata-only, so drop+recreate touches no data). Scale note: the
    inference reads parquet FOOTERS only — no data scan — and Spark
    samples footers in parallel; at 100 TB this is bounded by file
    count, the same cost a real crawler pays. Returns the qualified
    table name."""
    pcols = _discover_partition_cols(path)
    df = spark.read.option("mergeSchema", "true").option(
        "basePath", path
    ).parquet(path)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    fqn = f"{database}.{table}"
    part_fields = [f for f in df.schema.fields if f.name in pcols]
    data_fields = [f for f in df.schema.fields if f.name not in pcols]
    col_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in data_fields
    )
    existing = spark.catalog.tableExists(fqn)
    if existing:
        old = {f.name: f.dataType for f in spark.table(fqn).schema.fields}
        new = {f.name: f.dataType for f in df.schema.fields}
        if old == new:
            if pcols:
                spark.sql(f"MSCK REPAIR TABLE {fqn}")
            return fqn
        spark.sql(f"DROP TABLE {fqn}")  # external: metadata-only
    stmt = f"CREATE TABLE {fqn} ({col_ddl}) USING PARQUET"
    if part_fields:
        pddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in part_fields
        )
        stmt += f" PARTITIONED BY ({pddl})"
    spark.sql(stmt + f" LOCATION '{path}'")
    if pcols:
        spark.sql(f"MSCK REPAIR TABLE {fqn}")
    return fqn
