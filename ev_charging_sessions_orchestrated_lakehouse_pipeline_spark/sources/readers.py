"""Scan operators (reference S1, S2 — SURVEY.md §2.1).

Scale notes: at 100 TB, schema inference is a full extra pass, so the
production CSV reader takes an explicit ``StructType``; Parquet scans
rely on Catalyst column pruning + predicate pushdown (verify with
``df.explain`` — the scan node must show ``PushedFilters``/pruned
``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_bronze_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """CSV scan with header (reference S1,
    jobs/ev_sessions_silver_etl_clean.py:57).

    ``infer=True`` reproduces the reference's ``inferSchema`` behavior
    (extra sampling pass — fine for samples, wrong at scale); the
    default takes an explicit schema.
    """
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet_table(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Parquet scan with optional explicit projection (reference S2,
    jobs/ev_sessions_gold_etl.py:83-87). Catalyst prunes columns from
    the physical scan either way; the explicit ``select`` is kept as
    documentation of intent."""
    df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)
    return df


def read_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver fixture table (TESTDATA.md).

    ``events.parquet`` has shipped ``ts`` in two physical layouts
    across driver generations: INT64 TIMESTAMP(NANOS) (which the
    vectorized Parquet reader rejects — read nanos as long via the
    legacy conf and truncate to microseconds with integer ``div``,
    exactly DuckDB's ns→us narrowing, so oracle comparisons agree)
    and plain TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ). Both are
    normalized to session-zone TIMESTAMP under UTC so downstream
    ``unix_timestamp``/``hour`` arithmetic and oracle hashing see
    identical values either way.

    This function leaves every session conf exactly as it found it
    (tests/test_sources_extra.py asserts this): ``nanosAsLong`` is
    needed only while the Parquet footer's schema is resolved — read
    scheduling bakes the resolved schema into the plan, so restoring
    the conf before execution is safe — and it is save/restored
    around the eager ``spark.read`` call. Session-zone/ANSI pinning
    is NOT done here: execution is lazy, so those confs must hold
    when the caller *executes* the plan, long after this returns.
    Sessions from :func:`..session.get_spark` pin them at build
    time; the driver-contract adapter (``__spark_entry__.py``) pins
    them per call as a documented contract.
    """
    if name == "events":
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            # eager: the footer schema is resolved in this call
            df = spark.read.parquet(f"{sf_dir}/events.parquet")
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes)["ts"]
        if ts_type in ("bigint", "long"):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_testdata(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver's parquet fixtures (TESTDATA.md) as DataFrames."""
    from ..schemas import TESTDATA_TABLES

    names = tables or TESTDATA_TABLES
    return {t: read_fixture(spark, sf_dir, t) for t in names}


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each fixture table as a temp view for the SQL surface
    (reference S12 — Athena-style SQL-on-lake, README.md:41)."""
    for name, df in load_testdata(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Newline-delimited JSON scan. Same schema policy as the CSV
    reader: explicit ``StructType`` in production (JSON inference
    samples the whole input — a full extra pass at 100 TB and a
    schema that drifts with the data); inference only when no schema
    is given. Corrupt lines land in ``_corrupt_record`` instead of
    failing the job (PERMISSIVE mode), mirroring the quarantine-not-
    crash stance of the silver pipeline."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        if "_corrupt_record" not in schema.fieldNames():
            schema = schema.add("_corrupt_record", T.StringType())
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Column pruning and predicate pushdown work exactly as
    for Parquet (the scan node reports PushedFilters/ReadSchema); the
    vectorized ORC reader is on by default
    (spark.sql.orc.enableVectorizedReader)."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """XML scan (built-in source since Spark 4; ``rowTag`` names the
    repeated record element). Same schema policy as JSON: explicit
    ``StructType`` in production — XML inference is a full extra
    parse pass — and PERMISSIVE corrupt-record capture instead of
    job failure. No filter pushdown exists for XML (the scan parses
    every record): at scale, land XML ONCE into Parquet and query
    that, using this reader only for the ingest hop."""
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if schema is not None:
        if "_corrupt_record" not in schema.fieldNames():
            schema = schema.add("_corrupt_record", T.StringType())
        reader = reader.schema(schema)
    return reader.load(path)
