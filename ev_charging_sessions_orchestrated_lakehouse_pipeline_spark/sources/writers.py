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


def compact_dataset(
    spark,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    cluster_by: list[str] | None = None,
    compression: str = "zstd",
) -> int:
    """Small-file compaction — the local-Parquet stand-in for Delta
    ``OPTIMIZE [ZORDER BY]`` (SURVEY.md §4's small-file hazard: the
    reference's event_date x stationId layout makes ~25k tiny files).

    Rewrites the dataset so each Hive partition holds
    ``files_per_partition`` files; ``cluster_by`` additionally sorts
    rows within each output file so Parquet min/max page stats become
    selective for those columns (the data-skipping benefit of
    Z-ORDER for the single-column / prefix case).

    Reads the whole dataset once, shuffles once on the partition
    columns, writes once — at cluster scale run it per-partition-
    range instead of whole-table. Returns the row count written
    (sanity handle for callers/tests).

    Crash safety (local filesystem): the swap is write-new →
    rename(old, trash) → rename(new, old) → delete(trash). Renames
    are atomic on POSIX, and at every intermediate point BOTH copies
    of the data exist on disk — a kill anywhere loses nothing, and
    :func:`recover_compaction` restores ``path`` from whichever side
    prefix survived. On an object store / real lakehouse this whole
    dance is replaced by a metadata commit to a new table-version
    prefix (Delta/Iceberg snapshot), which is the design this
    mirrors; the rename swap is the local-FS stand-in only."""
    df = spark.read.parquet(path)
    out = df.repartition(files_per_partition, *[df[c] for c in partition_cols])
    if cluster_by:
        out = out.sortWithinPartitions(*cluster_by)
    base = path.rstrip("/")
    tmp, trash = base + COMPACT_NEW_SUFFIX, base + COMPACT_TRASH_SUFFIX
    import os
    import shutil

    for leftover in (tmp, trash):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    (
        out.write.mode("overwrite")
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(tmp)
    )
    n = spark.read.parquet(tmp).count()
    if n != df.count():
        raise RuntimeError(f"compaction row-count mismatch at {path}; aborting swap")
    os.rename(base, trash)
    os.rename(tmp, base)
    shutil.rmtree(trash)
    return n


COMPACT_NEW_SUFFIX = "__compact_new"
COMPACT_TRASH_SUFFIX = "__compact_trash"


def recover_compaction(path: str) -> str:
    """Restore a dataset whose :func:`compact_dataset` run was killed
    mid-swap. Idempotent. Returns which state was found:

    - ``"clean"``     — ``path`` exists; stray side prefixes removed.
    - ``"rolled_forward"`` — crash landed between the two renames
      (old data at the trash prefix, new at the new prefix): the new,
      verified copy is promoted and the old removed.
    - ``"rolled_back"`` — only the trash copy exists (crash after the
      first rename with an incomplete new copy): old data restored.
    """
    import os
    import shutil

    base = path.rstrip("/")
    tmp, trash = base + COMPACT_NEW_SUFFIX, base + COMPACT_TRASH_SUFFIX
    if os.path.exists(base):
        for leftover in (tmp, trash):
            if os.path.exists(leftover):
                shutil.rmtree(leftover)
        return "clean"
    if os.path.exists(tmp):
        os.rename(tmp, base)
        if os.path.exists(trash):
            shutil.rmtree(trash)
        return "rolled_forward"
    if os.path.exists(trash):
        os.rename(trash, base)
        return "rolled_back"
    raise FileNotFoundError(f"no dataset or compaction remnant at {path}")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed
    Parquet table — the pay-the-shuffle-once primitive for 100 TB
    co-located joins.

    Bucketing hash-partitions rows into ``n_buckets`` files per
    partition by ``bucket_cols`` AT WRITE TIME and records the layout
    in the catalog. Every later equi-join or aggregation on the
    bucket columns between tables with matching bucket specs reads
    co-located buckets directly: Catalyst drops both Exchange nodes
    (verified by the plan audit in tests/test_plans.py), and when
    ``sort_cols`` match the join key the per-bucket Sort disappears
    too — a 100 TB fact-fact join becomes a streaming zip of
    pre-sorted files with zero network traffic. Size ``n_buckets``
    so one bucket ≈ 100-200 MB at the target scale (the same
    guidance as shuffle partitions), and keep specs identical on
    both sides — mismatched bucket counts shuffle the smaller side.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "gzip",
    partition_by: list[str] | None = None,
) -> None:
    """Newline-delimited JSON sink (interchange format for
    training-data handoff — every tokenizer/loader reads JSONL).
    Compressed per-file; gzip by default because it's the codec every
    downstream JSONL consumer can read. Same partitioned-layout
    contract as the Parquet sinks."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Partitioned ORC sink — the second columnar format of the lake
    (Spark ships the ORC reader/writer natively; some warehouses are
    ORC-standardized). Same layout contract as the Parquet sink:
    Hive-style partition directories, zstd by default, dynamic
    partition overwrite semantics from the session conf. ORC carries
    min/max/bloom indexes per stripe, so predicate pushdown survives
    the format switch (asserted in tests)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def write_xml(df, path: str, row_tag: str, root_tag: str = "rows") -> None:
    """XML sink (ingest-hop format only — see read_xml's scale note)."""
    df.write.format("xml").option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).mode("overwrite").save(path)
