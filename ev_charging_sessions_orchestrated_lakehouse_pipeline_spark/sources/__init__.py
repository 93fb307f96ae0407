"""Sources & sinks: scans, partitioned writers, catalog DDL (SURVEY.md §2.1)."""

from .readers import load_testdata, read_bronze_csv, read_fixture, read_parquet_table
from .writers import write_partitioned_parquet, overwrite_partitions

__all__ = [
    "load_testdata",
    "read_fixture",
    "read_bronze_csv",
    "read_parquet_table",
    "write_partitioned_parquet",
    "overwrite_partitions",
]
