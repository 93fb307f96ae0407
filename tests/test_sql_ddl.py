"""SQL-text management surface (sources/ddl.py): the reference drives
its lakehouse DDL through spark.sql statements
(jobs/ev_sessions_gold_etl.py:127-150) and reaches tables durably by
name through the Glue catalog (README.md:41).  execute_sql must route
every management statement shape to the one authoritative snaptable
implementation; register_all_tables must make a FRESH session reach
every warehouse table by name in one call."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources import (
    ddl,
    snaptable as st,
)


@pytest.fixture
def wh(spark, tmp_path):
    """A warehouse with two snapshot tables."""
    root = str(tmp_path / "wh")
    os.makedirs(root)
    st.create_table(
        spark.createDataFrame(
            [(i, "g%d" % (i % 3), float(i)) for i in range(40)],
            "id int, g string, v double",
        ).coalesce(1),
        os.path.join(root, "facts"),
        ["g"],
    )
    st.create_table(
        spark.createDataFrame(
            [("g0", "alpha"), ("g1", "beta"), ("g2", "gamma")],
            "g string, label string",
        ).coalesce(1),
        os.path.join(root, "dims"),
        [],
    )
    return root


def test_execute_sql_full_lifecycle(spark, wh):
    """One statement vocabulary end-to-end: properties, constraints,
    column DDL, OPTIMIZE, ANALYZE, DESCRIBE, VACUUM, RESTORE —
    each effective, each observable through the Python API it
    routes to."""
    t = os.path.join(wh, "facts")
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)

    r = run("ALTER TABLE facts SET TBLPROPERTIES ('owner'='etl', 'tier'='gold')")
    assert r.collect()[0].operation == "set_properties"
    assert st.table_properties(t) == {"owner": "etl", "tier": "gold"}
    run("ALTER TABLE facts UNSET TBLPROPERTIES ('tier')")
    assert st.table_properties(t) == {"owner": "etl"}

    run("ALTER TABLE facts ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    assert st._read_manifest(t, st.current_version(t))["constraints"] == {
        "v_nonneg": "v >= 0"
    }
    with pytest.raises(st.ConstraintViolation):
        st.append(spark.createDataFrame([(99, "g0", -1.0)], "id int, g string, v double"), t)
    run("ALTER TABLE facts DROP CONSTRAINT v_nonneg")
    run("ALTER TABLE facts DROP CONSTRAINT IF EXISTS v_nonneg")  # tolerated
    with pytest.raises(ValueError, match="no constraint"):
        run("ALTER TABLE facts DROP CONSTRAINT v_nonneg")

    # column DDL: rename (metadata-only), widen, drop
    run("ALTER TABLE facts RENAME COLUMN v TO val")
    assert "val" in st.read_snapshot(spark, t).columns
    run("ALTER TABLE facts ALTER COLUMN id TYPE bigint")
    assert dict(st.read_snapshot(spark, t).dtypes)["id"] == "bigint"
    run("ALTER TABLE facts DROP COLUMN val")
    assert "val" not in st.read_snapshot(spark, t).columns

    # OPTIMIZE + ANALYZE + DESCRIBE
    st.append(
        spark.createDataFrame([(100, "g0"), (101, "g1")], "id bigint, g string"), t
    )
    run("OPTIMIZE facts")
    r = run("ANALYZE TABLE facts COMPUTE STATISTICS FOR COLUMNS id")
    assert r.collect()[0].operation == "analyze"
    stats = st._read_manifest(t, st.current_version(t))["table_stats"]
    assert stats["rows"] == 42 and stats["columns"]["id"]["ndv"] == 42

    hist = run("DESCRIBE HISTORY facts")
    ops = [r.operation for r in hist.collect()]
    assert ops[0] == "create" and "optimize" in ops and "analyze" in ops
    detail = run("DESCRIBE DETAIL facts").collect()[0]
    assert detail.partition_cols == '["g"]' or "g" in detail.partition_cols

    # RESTORE by version; VACUUM DRY RUN then real
    head = st.current_version(t)
    run(f"RESTORE TABLE facts TO VERSION AS OF {head - 1}")
    assert st.current_version(t) == head + 1
    dry = run("VACUUM facts RETAIN 0 HOURS DRY RUN").collect()[0]
    real = run("VACUUM facts RETAIN 0 HOURS").collect()[0]
    assert real.operation == "vacuum"
    assert real.reclaimed_bytes == dry.reclaimable_bytes


def test_execute_sql_timestamp_restore_and_paths(spark, wh):
    """RESTORE ... TIMESTAMP AS OF with a unix timestamp; table
    addressed by backquoted PATH (no warehouse)."""
    t = os.path.join(wh, "dims")
    ts1 = st._read_manifest(t, 1)["committed_at"]
    st.append(spark.createDataFrame([("g3", "delta")], "g string, label string"), t)
    ddl.execute_sql(spark, f"RESTORE TABLE `{t}` TO TIMESTAMP AS OF {ts1}")
    assert st.read_snapshot(spark, t).count() == 3
    with pytest.raises(ValueError, match="warehouse"):
        ddl.execute_sql(spark, "DESCRIBE HISTORY dims")  # bare name, no root


def test_execute_sql_falls_through_to_spark_sql(spark, wh):
    """A non-management statement runs as ordinary Spark SQL — one
    endpoint for queries AND management."""
    ddl.register_all_tables(spark, wh)
    n = ddl.execute_sql(
        spark, "SELECT COUNT(*) AS n FROM facts JOIN dims USING (g)"
    ).collect()[0].n
    assert n == 40
    for v in ("facts", "dims"):
        spark.catalog.dropTempView(v)


def test_register_all_tables_fresh_session_joins(spark, wh):
    """The Glue-durability parity test demanded by VERDICT r12 #3:
    a fresh catalog state + ONE bootstrap call -> spark.sql joins two
    snapshot tables by bare name."""
    reg = ddl.register_all_tables(spark, wh)
    assert reg == {"dims": "dims", "facts": "facts"}
    got = {
        r.label: r.n
        for r in spark.sql(
            """SELECT d.label, COUNT(*) AS n
               FROM facts f JOIN dims d ON f.g = d.g
               GROUP BY d.label"""
        ).collect()
    }
    assert got == {"alpha": 14, "beta": 13, "gamma": 13}
    # non-table dirs are skipped; views pin registration-time head
    os.makedirs(os.path.join(wh, "not_a_table"))
    st.append(
        spark.createDataFrame([(999, "g0", 0.0)], "id int, g string, v double"),
        os.path.join(wh, "facts"),
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM facts").collect()[0].n == 40
    reg2 = ddl.register_all_tables(spark, wh, prefix="gold_")
    assert set(reg2.values()) == {"gold_facts", "gold_dims"}
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM gold_facts").collect()[0].n == 41
    )
    for v in ("facts", "dims", "gold_facts", "gold_dims"):
        spark.catalog.dropTempView(v)


def test_register_all_tables_missing_root(spark, tmp_path):
    with pytest.raises(ValueError, match="does not exist"):
        ddl.register_all_tables(spark, str(tmp_path / "nope"))


def test_cli_table_sql_action(spark, wh, capsys, monkeypatch):
    """CLI `table sql`: --table is the warehouse root, tables are
    pre-registered by name, statements run in order and print JSON."""
    import json as _json

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.cli import main

    monkeypatch.setattr(spark.__class__, "stop", lambda self: None)
    rc = main(
        [
            "table",
            "--table",
            wh,
            "sql",
            "--statement",
            "ALTER TABLE facts SET TBLPROPERTIES ('owner'='cli')",
            "--statement",
            "SELECT COUNT(*) AS n FROM facts JOIN dims USING (g)",
        ]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out[0]["rows"][0]["operation"] == "set_properties"
    assert out[1]["rows"] == [{"n": 40}]
    assert st.table_properties(os.path.join(wh, "facts")) == {"owner": "cli"}
    for v in ("facts", "dims"):
        spark.catalog.dropTempView(v)


def test_execute_sql_drop_feature(spark, wh):
    """ALTER TABLE ... DROP FEATURE routes to snaptable.drop_feature:
    refused while live DVs need the flag, lands after OPTIMIZE."""
    t = os.path.join(wh, "facts")
    st.delete_where(spark, t, [("id", "<", 5)], use_dv=True)
    with pytest.raises(ValueError, match="live deletion vector"):
        ddl.execute_sql(
            spark, "ALTER TABLE facts DROP FEATURE deletion-vectors",
            warehouse=wh,
        )
    st.optimize(spark, t, files_per_partition=1)
    r = ddl.execute_sql(
        spark, "ALTER TABLE facts DROP FEATURE deletion-vectors",
        warehouse=wh,
    ).collect()[0]
    assert r.operation == "drop_feature"
    head = st._read_manifest(t, st.current_version(t))
    assert "deletion-vectors" not in (head.get("reader_features") or [])


def test_execute_sql_ctas_insert_delete_update(spark, wh):
    """The reference's CTAS shape plus SQL DML end-to-end: CREATE
    TABLE ... PARTITIONED BY ... TBLPROPERTIES AS SELECT, INSERT INTO
    (SELECT and VALUES), DELETE/UPDATE with the conjunctive WHERE
    grammar — every statement routed to the snapshot implementations
    (partitioning, properties, and version history all observable)."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    ddl.register_all_tables(spark, wh)
    r = run(
        "CREATE TABLE gold_rollup USING snapshot PARTITIONED BY (g) "
        "TBLPROPERTIES ('tier'='gold') AS "
        "SELECT g, COUNT(*) AS n, SUM(v) AS sv FROM facts GROUP BY g"
    ).collect()[0]
    assert r.operation == "create_table"
    t = os.path.join(wh, "gold_rollup")
    assert st.table_properties(t) == {"tier": "gold"}
    man = st._read_manifest(t, st.current_version(t))
    assert man["partition_cols"] == ["g"]
    assert st.read_snapshot(spark, t).count() == 3

    # IF NOT EXISTS tolerates; plain CREATE refuses
    assert (
        run(
            "CREATE TABLE IF NOT EXISTS gold_rollup AS SELECT 1 AS x"
        ).collect()[0].skipped
        == "exists"
    )
    with pytest.raises(ValueError, match="already exists"):
        run("CREATE TABLE gold_rollup AS SELECT 1 AS x")

    run("INSERT INTO gold_rollup VALUES ('g9', 0, 0.0)")
    run(
        "INSERT INTO gold_rollup "
        "SELECT concat(g, '_copy'), COUNT(*), SUM(v) FROM facts GROUP BY g"
    )
    assert st.read_snapshot(spark, t).count() == 7
    with pytest.raises(ValueError, match="arity"):
        run("INSERT INTO gold_rollup VALUES (1, 2)")

    run("UPDATE gold_rollup SET sv = round(sv * 2.0, 1) WHERE g = 'g9' AND n <= 0")
    assert (
        st.read_snapshot(spark, t).filter(F.col("g") == "g9").collect()[0].sv
        == 0.0
    )
    run("DELETE FROM gold_rollup WHERE g IN ('g9') AND n IS NOT NULL")
    assert st.read_snapshot(spark, t).count() == 6
    ops = [h["operation"] for h in st.history(t)]
    assert ops == ["create", "set_properties", "append", "append",
                   "update", "delete"]
    # unsupported predicate shapes fail loudly, pointing at the API
    with pytest.raises(ValueError, match="only AND"):
        run("DELETE FROM gold_rollup WHERE g = 'a' OR g = 'b'")
    with pytest.raises(ValueError, match="unsupported WHERE"):
        run("DELETE FROM gold_rollup WHERE length(g) = 2")
    for v in ("facts", "dims"):
        spark.catalog.dropTempView(v)


def test_execute_sql_merge_into(spark, wh):
    """MERGE INTO via SQL text: whole-row upsert + conditional
    matched-delete + NOT MATCHED BY SOURCE DELETE, all routed to
    snaptable.merge_into (one commit, pruned rewrite path)."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    # source: updates g0, deletes g2, inserts g7; g1 untouched
    spark.createDataFrame(
        [("g0", "ALPHA", False), ("g2", None, True), ("g7", "eta", False)],
        "g string, label string, is_del boolean",
    ).createOrReplaceTempView("dim_updates")
    r = run(
        "MERGE INTO dims USING (SELECT g, label FROM dim_updates "
        "WHERE NOT is_del) AS s ON t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert r.operation == "merge"
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert got == {"g0": "ALPHA", "g1": "beta", "g2": "gamma", "g7": "eta"}
    # conditional matched-delete via marker source
    run(
        "MERGE INTO dims USING dim_updates AS s ON t.g = s.g "
        "WHEN MATCHED AND s.is_del THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert "g2" not in got and got["g0"] == "ALPHA" and "is_del" not in got
    # NOT MATCHED BY SOURCE DELETE prunes rows the source omits
    spark.createDataFrame(
        [("g0", "ALPHA")], "g string, label string"
    ).createOrReplaceTempView("dim_keep")
    run(
        "MERGE INTO dims USING dim_keep AS s ON t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    assert {r.g for r in st.read_snapshot(spark, t).collect()} == {"g0"}
    # unsupported shapes raise with pointers
    with pytest.raises(ValueError, match="MERGE ON"):
        run(
            "MERGE INTO dims USING dim_keep AS s ON t.g > s.g "
            "WHEN MATCHED THEN UPDATE SET *"
        )
    with pytest.raises(ValueError, match="column-level"):
        run(
            "MERGE INTO dims USING dim_keep AS s ON t.g = s.g "
            "WHEN MATCHED THEN UPDATE SET label = 'x'"
        )
    spark.catalog.dropTempView("dim_updates")
    spark.catalog.dropTempView("dim_keep")


def test_execute_sql_show_and_drop_table(spark, wh):
    """SHOW TABLES / SHOW TBLPROPERTIES / DROP TABLE round out the
    catalog statements; DROP refuses non-snapshot directories."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    rows = run("SHOW TABLES").collect()
    assert [(r.tableName, r.version) for r in rows] == [("dims", 1), ("facts", 1)]
    run("ALTER TABLE dims SET TBLPROPERTIES ('owner'='x', 'a'='1')")
    props = {r.key: r.value for r in run("SHOW TBLPROPERTIES dims").collect()}
    assert props == {"owner": "x", "a": "1"}
    # DROP TABLE: guard, IF EXISTS, effect
    os.makedirs(os.path.join(wh, "random_dir"))
    with pytest.raises(ValueError, match="not a snapshot table"):
        run("DROP TABLE random_dir")
    assert (
        run("DROP TABLE IF EXISTS random_dir").collect()[0].skipped == "absent"
    )
    run("DROP TABLE dims")
    assert not os.path.exists(os.path.join(wh, "dims"))
    assert [r.tableName for r in run("SHOW TABLES").collect()] == ["facts"]


def test_execute_sql_ctas_hidden_partitioning(spark, wh):
    """CTAS with a TRANSFORM partition spec (hidden partitioning):
    bucket(4, id) must survive the statement parse — the transform's
    own parens and comma are not statement structure."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    ddl.register_all_tables(spark, wh)
    run(
        "CREATE TABLE bucketed USING snapshot "
        "PARTITIONED BY (bucket(4, id)) AS SELECT id, v FROM facts"
    )
    t = os.path.join(wh, "bucketed")
    man = st._read_manifest(t, 1)
    assert man["partition_cols"] == ["bucket(4,id)"]
    assert st.read_snapshot(spark, t).count() == 40
    for v in ("facts", "dims"):
        spark.catalog.dropTempView(v)


def test_copy_into_idempotent_ingest(spark, wh, tmp_path):
    """COPY INTO: first run loads everything, re-run loads nothing,
    a NEW landing file loads exactly itself, a mid-run crash loads
    nothing (one atomic commit), PATTERN filters, force reloads."""
    land = tmp_path / "landing"
    land.mkdir()

    def drop(name, rows):
        stage = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, "id int, v double").coalesce(1).write.parquet(
            str(stage)
        )
        part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
        part.rename(land / name)

    drop("a.parquet", [(1, 1.0), (2, 2.0)])
    drop("b.parquet", [(3, 3.0)])
    t = os.path.join(wh, "ingest")
    st.create_table(
        spark.createDataFrame([], "id int, v double").coalesce(1), t, []
    )
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    r1 = run(
        f"COPY INTO ingest FROM '{land}' FILEFORMAT = PARQUET"
    ).collect()[0]
    assert (r1.loaded_files, r1.skipped_files) == (2, 0)
    assert st.read_snapshot(spark, t).count() == 3
    # idempotent re-run: nothing loads, version unchanged
    r2 = run(
        f"COPY INTO ingest FROM '{land}' FILEFORMAT = PARQUET"
    ).collect()[0]
    assert (r2.loaded_files, r2.skipped_files) == (0, 2)
    assert r2.version == r1.version
    # a new landing file loads exactly itself
    drop("c.parquet", [(4, 4.0)])
    r3 = st.copy_into(spark, t, str(land))
    assert (r3["loaded_files"], r3["skipped_files"]) == (1, 2)
    assert st.read_snapshot(spark, t).count() == 4
    # history records the op and ledger
    assert [h["operation"] for h in st.history(t)][1:] == [
        "copy_into", "copy_into"
    ]
    assert len(st.copied_files(t)) == 3
    # PATTERN filters; force reloads (duplicates by design)
    r4 = st.copy_into(spark, t, str(land), pattern="a.*", force=True)
    assert r4["loaded_files"] == 1
    assert st.read_snapshot(spark, t).count() == 6


def test_parse_where_roundtrip_property():
    """Property: any clause BUILT from the documented grammar parses
    back to exactly its tuples (hypothesis sweep over conjunct
    shapes, operators, literal types, and whitespace)."""
    from hypothesis import given, settings
    from hypothesis import strategies as hs

    ident = hs.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)
    lit = hs.one_of(
        hs.integers(-10**6, 10**6),
        hs.floats(
            allow_nan=False, allow_infinity=False, width=32,
            min_value=-1e6, max_value=1e6,
        ).map(lambda f: round(f, 3)),
        hs.from_regex(r"[A-Za-z0-9_ .:-]{0,12}", fullmatch=True),
        hs.booleans(),
    )
    op = hs.sampled_from([">=", "<=", "!=", "=", ">", "<"])
    conj = hs.one_of(
        hs.tuples(ident, hs.just("isnull"), hs.none()),
        hs.tuples(ident, hs.just("notnull"), hs.none()),
        hs.tuples(ident, hs.just("in"), hs.lists(lit, min_size=1, max_size=4)),
        hs.tuples(ident, op, lit),
    )

    def render(c):
        col, o, v = c
        if o == "isnull":
            return f"{col} IS NULL"
        if o == "notnull":
            return f"{col} IS NOT NULL"

        def rv(x):
            if isinstance(x, bool):
                return "TRUE" if x else "FALSE"
            if isinstance(x, str):
                return "'" + x + "'"
            return repr(x)

        if o == "in":
            return f"{col} IN ({', '.join(rv(x) for x in v)})"
        return f"{col} {o} {rv(v)}"

    from hypothesis import HealthCheck

    @given(conjs=hs.lists(conj, min_size=1, max_size=5))
    @settings(max_examples=300, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(conjs):
        clause = " AND ".join(render(c) for c in conjs)
        got = ddl.parse_where(clause)
        want = [
            (col, o, v if not isinstance(v, float) else v)
            for col, o, v in conjs
        ]
        # int-valued floats parse back as ints (3.0 renders "3.0" ->
        # float; repr keeps the dot, so floats stay floats)
        assert len(got) == len(want)
        for (gc, go, gv), (wc, wo, wv) in zip(got, want):
            assert (gc, go) == (wc, wo)
            if isinstance(wv, list):
                assert gv == wv
            else:
                assert gv == wv

    check()


def test_cli_r13_actions(spark, wh, tmp_path, capsys, monkeypatch):
    """CLI plumbing for the r13 surfaces: cluster-by (metadata-only,
    no Spark), drop-feature, copy-into, refresh-view --hll-col."""
    import json as _json

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.cli import main

    monkeypatch.setattr(spark.__class__, "stop", lambda self: None)
    t = os.path.join(wh, "facts")

    rc = main(["table", "--table", t, "cluster-by", "--cluster-columns", "v"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["properties"]["clusterBy"] == "v"
    main(["table", "--table", t, "cluster-by"])  # unset
    capsys.readouterr()
    assert "clusterBy" not in st.table_properties(t)

    # copy-into a fresh table
    land = tmp_path / "cli_land"
    land.mkdir()
    stage = tmp_path / "cli_stage"
    spark.createDataFrame([(1, 2.0)], "id int, v double").coalesce(1).write.parquet(str(stage))
    next(p for p in stage.iterdir() if p.name.endswith(".parquet")).rename(
        land / "x.parquet"
    )
    t2 = os.path.join(wh, "cli_ingest")
    st.create_table(spark.createDataFrame([], "id int, v double").coalesce(1), t2, [])
    rc = main(
        ["table", "--table", t2, "copy-into", "--source", str(land)]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["loaded_files"] == 1
    assert st.read_snapshot(spark, t2).count() == 1

    # refresh-view --hll-col
    sink = os.path.join(wh, "cli_hll_sink")
    rc = main(
        ["table", "--table", t, "refresh-view", "--sink", sink,
         "--keys", "g", "--hll-col", "id"]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "full"
    assert st.read_snapshot(spark, sink).count() > 0

    # drop-feature (metadata-only path) on a table without the flag:
    # idempotent no-op returns the head
    rc = main(["table", "--table", t, "drop-feature", "--feature", "deletion-vectors"])
    assert rc == 0


def test_copy_into_concurrent_race_never_double_loads(spark, wh, tmp_path):
    """Two COPY INTOs racing over the same landing directory: the
    publish barrier (pre_publish_hook seam) makes both compute
    against the SAME parent ledger; the loser must collide (no
    lenient rebase for copy commits), re-read the ledger, and load
    ZERO — never the duplicate a rebase would land."""
    import threading

    land = tmp_path / "race_land"
    land.mkdir()
    stage = tmp_path / "race_stage"
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id int, v double"
    ).coalesce(1).write.parquet(str(stage))
    next(p for p in stage.iterdir() if p.name.endswith(".parquet")).rename(
        land / "batch.parquet"
    )
    t = os.path.join(wh, "race_ingest")
    st.create_table(
        spark.createDataFrame([], "id int, v double").coalesce(1), t, []
    )
    barrier = threading.Barrier(2, timeout=60)
    seen = []

    def hook(table, version, manifest):
        if manifest.get("operation") == "copy_into" and len(seen) < 2:
            seen.append(version)
            barrier.wait()  # both writers reach the publish together

    results = {}

    def run(name):
        results[name] = st.copy_into(spark, t, str(land))

    st.pre_publish_hook = hook
    try:
        t1 = threading.Thread(target=run, args=("a",))
        t2 = threading.Thread(target=run, args=("b",))
        t1.start(); t2.start(); t1.join(120); t2.join(120)
    finally:
        st.pre_publish_hook = None
    loads = sorted(r["loaded_files"] for r in results.values())
    assert loads == [0, 1], results  # one winner, loser skipped on retry
    assert st.read_snapshot(spark, t).count() == 10  # no duplicates
    assert len(st.copied_files(t)) == 1


def test_ctas_cluster_by(spark, wh):
    """Liquid table declared at creation: CTAS ... CLUSTER BY records
    the keys; later plain OPTIMIZE applies them."""
    ddl.register_all_tables(spark, wh)
    ddl.execute_sql(
        spark,
        "CREATE TABLE liquid_ctas CLUSTER BY (v) "
        "TBLPROPERTIES ('tier'='gold') AS SELECT id, v FROM facts",
        warehouse=wh,
    )
    t = os.path.join(wh, "liquid_ctas")
    props = st.table_properties(t)
    assert props == {"clusterBy": "v", "tier": "gold"}
    for v in ("facts", "dims"):
        spark.catalog.dropTempView(v)


def test_register_all_tables_global_views(spark, wh):
    """global_views=True registers global_temp views (the in-process
    shared-catalog analogue): reachable via the global_temp database
    from any session of the application."""
    reg = ddl.register_all_tables(spark, wh, global_views=True)
    assert reg == {"dims": "global_temp.dims", "facts": "global_temp.facts"}
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM global_temp.facts f "
        "JOIN global_temp.dims d ON f.g = d.g"
    ).collect()[0].n
    assert n == 40
    for v in ("facts", "dims"):
        spark.catalog.dropGlobalTempView(v)


def test_merge_condition_semantics(spark, wh):
    """Review fixes (r13): conditional UPDATE SET * / INSERT * are
    REFUSED (whole-row merge can't honor them — silently updating
    every match would be wrong data); delete conditions evaluate on
    the correct side with cross-alias references rejected; a
    target-qualified NOT MATCHED BY SOURCE condition works."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    spark.createDataFrame(
        [("g0", "ALPHA")], "g string, label string"
    ).createOrReplaceTempView("m_src")
    with pytest.raises(ValueError, match="UPDATE SET \\* is"):
        run(
            "MERGE INTO dims USING m_src AS s ON t.g = s.g "
            "WHEN MATCHED AND s.label = 'x' THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(ValueError, match="INSERT \\* is"):
        run(
            "MERGE INTO dims USING m_src AS s ON t.g = s.g "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED AND s.label = 'x' THEN INSERT *"
        )
    # matched-delete cond referencing the TARGET alias: rejected
    with pytest.raises(ValueError, match="evaluated on the source"):
        run(
            "MERGE INTO dims USING m_src AS s ON t.g = s.g "
            "WHEN MATCHED AND t.label = 'beta' THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET *"
        )
    # by-source cond with the target alias: stripped and applied to
    # target rows — only non-matching rows satisfying it delete
    run(
        "MERGE INTO dims USING m_src AS s ON t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND t.label = 'beta' THEN DELETE"
    )
    got = {r.g: r.label for r in st.read_snapshot(
        spark, os.path.join(wh, "dims")).collect()}
    assert got == {"g0": "ALPHA", "g2": "gamma"}  # g1/beta deleted
    spark.catalog.dropTempView("m_src")


def test_in_list_quoted_commas(spark, wh):
    """A quoted IN literal carrying a comma parses as ONE value."""
    flt = ddl.parse_where("city IN ('San Jose, CA', 'NYC') AND n >= 2")
    assert flt == [
        ("city", "in", ["San Jose, CA", "NYC"]),
        ("n", ">=", 2),
    ]


def test_merge_review2_semantics(spark, wh):
    """Second review pass fixes: unreachable MATCHED clauses after an
    unconditional one refuse (first-match-wins); alias prefixes inside
    string literals are data (neither rewritten nor falsely rejected);
    double-quoted IN literals with apostrophes parse; empty IN raises."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    spark.createDataFrame(
        [("g0", "t.legacy"), ("g9", "new")], "g string, label string"
    ).createOrReplaceTempView("m2_src")
    # unreachable clause ordering
    with pytest.raises(ValueError, match="unreachable"):
        run(
            "MERGE INTO dims USING m2_src AS s ON t.g = s.g "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN MATCHED AND s.label = 'x' THEN DELETE "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    # alias text inside a literal: matched-delete cond comparing to
    # the literal 't.legacy' must not be rejected or rewritten — the
    # g0 row carries exactly that label and must delete
    run(
        "MERGE INTO dims USING m2_src AS s ON t.g = s.g "
        "WHEN MATCHED AND s.label = 't.legacy' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r.g: r.label for r in st.read_snapshot(
        spark, os.path.join(wh, "dims")).collect()}
    assert "g0" not in got and got["g9"] == "new"
    # WHERE grammar: double-quoted literal with apostrophe; empty IN
    assert ddl.parse_where("name IN (\"O'Brien\", 'x')") == [
        ("name", "in", ["O'Brien", "x"])
    ]
    with pytest.raises(ValueError, match="empty IN"):
        ddl.parse_where("c IN ()")
    spark.catalog.dropTempView("m2_src")
