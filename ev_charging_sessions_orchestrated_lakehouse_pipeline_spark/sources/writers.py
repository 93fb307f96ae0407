"""Sink operators (reference S3-S5, S9 — SURVEY.md §2.1).

Partitioned zstd Parquet writes and idempotent dynamic partition
overwrite. With ``spark.sql.sources.partitionOverwriteMode=dynamic``
(set in session.py), ``mode("overwrite").partitionBy(...)`` replaces
only the partitions present in the incoming batch — the Spark-native
equivalent of Iceberg's ``overwritePartitions()``
(jobs/ev_sessions_gold_etl.py:156).

Scale notes: the reference partitions silver by
``event_date x stationId`` — ~25k directories for 3,395 rows, an
anti-pattern that explodes small files at 100 TB (SURVEY.md §4). Here
the secondary partition column is optional and OFF by default, and
``target_file_partitions`` lets callers repartition by the partition
columns before the write so each Hive partition receives a bounded
number of files (one shuffle, then sequential writes — far cheaper
than millions of small files at read time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
    files_per_partition: int | None = None,
) -> None:
    """Partitioned Parquet sink (reference S3/S4,
    jobs/ev_sessions_silver_etl_clean.py:215-225).

    ``files_per_partition``: if set, repartition by the partition
    columns first so each output partition gets at most that many
    files (small-file control the reference lacks).
    """
    out = df
    if partition_cols and files_per_partition:
        out = df.repartition(files_per_partition, *partition_cols)
    writer = out.write.mode(mode).option("compression", compression)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    compression: str = "zstd",
) -> None:
    """Idempotent partition-level upsert (reference S9): with dynamic
    partitionOverwriteMode, only partitions present in ``df`` are
    replaced; re-running the same batch converges to the same state."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
