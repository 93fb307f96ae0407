"""JSONL source/sink round-trip and z-order clustering properties."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.functions.zorder import (
    zorder_key,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
    read_fixture,
    read_jsonl,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.writers import (
    write_jsonl,
)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = read_fixture(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = read_jsonl(spark, out, schema).drop("_corrupt_record")
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.select(*docs.columns).collect()}
    assert a == b


def test_jsonl_corrupt_records_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"a": 1}\nnot json at all\n{"a": 3}\n')
    schema = T.StructType([T.StructField("a", T.LongType())])
    df = read_jsonl(spark, str(p), schema)
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and bad[0].a is None
    assert sorted(r.a for r in rows if r.a is not None) == [1, 3]


def test_zorder_interleave_known_values(spark):
    # (a=0b11, b=0b01, 2 bits) -> bits: a0->pos0, b0->pos1, a1->pos2, b1->pos3
    # a=3 (11), b=1 (01): pos0=1, pos1=1, pos2=1, pos3=0 -> 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], ["a", "b"])
    got = df.select(zorder_key(["a", "b"], bits=2)).collect()[0].zkey
    assert got == 7
    # negative and overflow clamp
    df2 = spark.createDataFrame([(-5, 999)], ["a", "b"])
    got2 = df2.select(zorder_key(["a", "b"], bits=2)).collect()[0].zkey
    # a->0, b->3 (11): pos1=1, pos3=1 -> 0b1010 = 10
    assert got2 == 10


def test_zorder_clusters_files_for_skipping(spark, sf_dir, tmp_path):
    """After sorting by zkey into ranged files, a point predicate on
    EITHER dimension must touch a strict subset of files (the
    stats-skipping property the layout exists for)."""
    ev = read_fixture(spark, sf_dir, "events").select(
        "event_id", "user_id", F.hour("ts").alias("hr")
    )
    n_files = 8
    ranged = (
        ev.select("*", zorder_key(["user_id", "hr"], bits=8))
        .repartitionByRange(n_files, "zkey")
    )
    # per-partition min/max of each dim = the file stats a reader would see
    stats = (
        ranged.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min("user_id").alias("u_lo"), F.max("user_id").alias("u_hi"),
            F.min("hr").alias("h_lo"), F.max("hr").alias("h_hi"),
        )
        .collect()
    )
    assert len(stats) == n_files
    u_probe, h_probe = 3, 12
    u_files = sum(1 for s in stats if s.u_lo <= u_probe <= s.u_hi)
    h_files = sum(1 for s in stats if s.h_lo <= h_probe <= s.h_hi)
    assert u_files < n_files, "user_id predicate cannot skip any file"
    assert h_files < n_files, "hour predicate cannot skip any file"


def test_orc_roundtrip_partitioned(spark, sf_dir, tmp_path):
    """ORC sink/scan: partitioned write round-trips values, and the
    scan still receives pushed filters + pruned columns."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
        read_orc,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.writers import (
        write_orc,
    )

    orders = read_fixture(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path, partition_cols=["o_orderstatus"])

    back = read_orc(spark, path)
    assert back.count() == orders.count()
    src = {(r.o_orderkey, r.o_totalprice) for r in orders.collect()}
    rt = {(r.o_orderkey, r.o_totalprice) for r in back.collect()}
    assert rt == src

    # partition pruning + filter/projection pushdown reach the ORC scan
    q = back.filter(F.col("o_orderstatus") == "F").filter(
        F.col("o_totalprice") > 1000.0
    ).select("o_orderkey", "o_totalprice")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Scan orc" in plan
    assert "PushedFilters: [" in plan and "GreaterThan(o_totalprice" in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_orderkey" in read_schema and "o_custkey" not in read_schema


def test_read_fixture_leaves_session_confs_untouched(spark, sf_dir):
    """read_fixture must not leak conf changes into a caller-owned
    session (round-3 VERDICT item 4). The nanosAsLong read conf is
    save/restored; timeZone/ANSI pinning belongs to the session
    factory and the __spark_entry__ contract, not the fixture reader."""
    keys = [
        "spark.sql.session.timeZone",
        "spark.sql.ansi.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
    ]
    before = {k: spark.conf.get(k, None) for k in keys}
    for name in ("events", "lineitem", "documents"):
        df = read_fixture(spark, sf_dir, name)
        df.limit(1).collect()  # execute too — lazy paths must also be clean
    after = {k: spark.conf.get(k, None) for k in keys}
    assert before == after


def test_read_fixture_normalizes_both_ts_parquet_layouts(spark, tmp_path):
    """Driver fixture generations have shipped events.ts as INT64
    TIMESTAMP(NANOS) and as native TIMESTAMP(MICROS); both must read
    to identical session-zone timestamps (ns truncated to us, exactly
    DuckDB's narrowing). Writes both layouts with pyarrow so the
    nanos dispatch branch stays exercised even when the shipped
    fixtures are micros (ADVICE r3)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    wall = pd.to_datetime(
        ["2024-01-01T12:34:56.789123456", "2024-06-30T23:59:59.000000999"]
    )
    ids = pa.array([1, 2], pa.int64())
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        vals = wall if unit == "ns" else wall.floor("us")
        pq.write_table(
            pa.table({"event_id": ids, "ts": pa.array(vals, pa.timestamp(unit))}),
            str(d / "events.parquet"),
        )
    got = {}
    for unit in ("ns", "us"):
        df = read_fixture(spark, str(tmp_path / unit), "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        got[unit] = sorted((r.event_id, r.ts) for r in df.collect())
    assert got["ns"] == got["us"]
    # micros truncation, not rounding: ...789123456 ns -> ...789123 us
    assert got["ns"][0][1].microsecond == 789123


def test_xml_roundtrip_and_corrupt_capture(spark, sf_dir, tmp_path):
    """Spark 4 built-in XML source: write/read roundtrip preserves
    values; a malformed record lands in _corrupt_record under the
    explicit-schema PERMISSIVE path instead of failing the read."""
    from pyspark.sql import types as T

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
        read_xml,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.writers import (
        write_xml,
    )

    region = read_fixture(spark, sf_dir, "region").select("r_regionkey", "r_name")
    out = str(tmp_path / "region_xml")
    write_xml(region, out, row_tag="region")
    back = read_xml(spark, out, row_tag="region")
    got = sorted((r.r_regionkey, r.r_name) for r in back.collect())
    want = sorted((r.r_regionkey, r.r_name) for r in region.collect())
    assert got == want

    bad = tmp_path / "bad.xml"
    bad.write_text(
        "<rows><region><r_regionkey>1</r_regionkey><r_name>ok</r_name></region>"
        "<region><r_regionkey>not_a_number</r_regionkey><r_name>x</r_name>"
        "</region></rows>"
    )
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.LongType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    rows = read_xml(spark, str(bad), row_tag="region", schema=schema).collect()
    assert len(rows) == 2
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 1 and corrupt[0].r_regionkey is None
