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
    # r14: top-level OR now lowers to DNF skipping instead of raising
    run("DELETE FROM gold_rollup WHERE g = 'no_such' OR g = 'nope'")
    assert st.read_snapshot(spark, t).count() == 6  # stats no-op
    # unsupported predicate shapes still fail loudly
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
    # r14: column-level SET no longer raises — it updates in place
    # (update-only statement: unmatched source rows are NOT inserted)
    run(
        "MERGE INTO dims USING dim_keep AS s ON t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET label = 'x'"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert got == {"g0": "x"}
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

    ident = hs.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True).filter(
        # reserved connectives can't be bare column names in the
        # grammar (r14: OR became a real top-level connective)
        lambda s: s.upper() not in {"OR", "AND", "IN", "IS", "NOT", "NULL"}
    )
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

    @given(
        branches=hs.lists(
            hs.lists(conj, min_size=1, max_size=3), min_size=2, max_size=4
        )
    )
    @settings(max_examples=150, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check_dnf(branches):
        # top-level OR of parenthesized conjunct groups -> DNF
        clause = " OR ".join(
            "(" + " AND ".join(render(c) for c in b) + ")" for b in branches
        )
        got = ddl.parse_where(clause)
        assert len(got) == len(branches)
        for gb, wb in zip(got, branches):
            assert [(c, o) for c, o, _ in gb] == [(c, o) for c, o, _ in wb]
            assert [v for _, _, v in gb] == [v for _, _, v in wb]

    check_dnf()


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
    """r14: conditional UPDATE SET * / INSERT * now lower to the
    general clause path (r13 refused them) — a conditional whole-row
    update touches ONLY the matches satisfying the condition, a
    conditional INSERT * only the unmatched rows satisfying it; a
    matched-delete condition referencing the TARGET alias routes to
    the joined-frame path (the fast path evaluates it on source rows
    only); target-qualified NOT MATCHED BY SOURCE still works."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    spark.createDataFrame(
        [("g0", "ALPHA"), ("g9", "NEW")], "g string, label string"
    ).createOrReplaceTempView("m_src")
    # conditional UPDATE SET *: only the g0 match satisfies the cond
    run(
        "MERGE INTO dims USING m_src AS s ON t.g = s.g "
        "WHEN MATCHED AND s.label = 'ALPHA' THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.label = 'missing' THEN INSERT *"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    # g0 updated, g9 NOT inserted (its cond fails), others untouched
    assert got == {"g0": "ALPHA", "g1": "beta", "g2": "gamma"}
    # conditional INSERT *: now g9's cond holds
    run(
        "MERGE INTO dims USING m_src AS s ON t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.label = 'NEW' THEN INSERT *"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert got["g9"] == "NEW"
    # matched-delete cond on the TARGET alias: joined-frame path
    run(
        "MERGE INTO dims USING m_src AS s ON t.g = s.g "
        "WHEN MATCHED AND t.label = 'NEW' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert "g9" not in got and got["g0"] == "ALPHA"
    # by-source cond with the target alias: stripped and applied to
    # target rows — only non-matching rows satisfying it delete
    run(
        "MERGE INTO dims USING m_src AS s ON t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND t.label = 'beta' THEN DELETE"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert got == {"g0": "ALPHA", "g2": "gamma", "g9": "NEW"}  # g1 deleted
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


# ---------------------------------------------------------------------------
# r14: plain column-list CREATE TABLE, DNF WHERE, literal-aware SET,
# conditional / column-level MERGE
# ---------------------------------------------------------------------------


def test_create_table_column_list_reference_shape(spark, wh):
    """The reference's EXACT gold DDL shape
    (jobs/ev_sessions_gold_etl.py:127-150): IF NOT EXISTS, typed
    column list WITH an embedded -- comment, USING iceberg,
    PARTITIONED BY, TBLPROPERTIES, no AS SELECT — lands as an empty
    typed snapshot table that INSERT then feeds."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    r = run(
        """
        CREATE TABLE IF NOT EXISTS ev_sessions (
          sessionId STRING,
          kwhTotal DOUBLE,
          dollars DOUBLE,
          created TIMESTAMP,
          event_date DATE,
          -- Derived fields
          session_duration_minutes DOUBLE,
          avg_cost_per_kwh DOUBLE
        )
        USING iceberg
        PARTITIONED BY (event_date)
        TBLPROPERTIES ('format-version'='2')
        """
    )
    assert r.collect()[0].operation == "create_table"
    t = os.path.join(wh, "ev_sessions")
    df = st.read_snapshot(spark, t)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "sessionId", "kwhTotal", "dollars", "created", "event_date",
        "session_duration_minutes", "avg_cost_per_kwh",
    ]
    assert dict(df.dtypes)["event_date"] == "date"
    assert st._read_manifest(t, st.current_version(t))["partition_cols"] == [
        "event_date"
    ]
    assert st.table_properties(t) == {"format-version": "2"}
    # IF NOT EXISTS: second run skips, even with a DIFFERENT column list
    r2 = run("CREATE TABLE IF NOT EXISTS ev_sessions (x INT)")
    assert r2.collect()[0].skipped == "exists"
    # without the guard: loud error
    with pytest.raises(ValueError, match="already exists"):
        run("CREATE TABLE ev_sessions (x INT)")
    # INSERT feeds the empty table (positional bind + cast)
    run(
        "INSERT INTO ev_sessions VALUES "
        "('s1', 7.5, 3.2, TIMESTAMP'2024-05-01 08:00:00', "
        "DATE'2024-05-01', 45.0, 0.43)"
    )
    assert st.read_snapshot(spark, t).count() == 1


def test_create_table_column_list_cluster_by(spark, wh):
    """CLUSTER BY on an empty-DDL table declares liquid clustering."""
    ddl.execute_sql(
        spark,
        "CREATE TABLE lc (id BIGINT, g STRING, v DOUBLE) CLUSTER BY (g, id)",
        warehouse=wh,
    )
    t = os.path.join(wh, "lc")
    assert st.table_properties(t) == {"clusterBy": "g,id"}


def test_create_table_column_list_scd2_target_via_sql(spark, wh, tmp_path):
    """cdc_scd2_stream's create-the-target-first contract is now
    satisfiable from SQL text: CREATE TABLE (keys+attrs+validity)
    through execute_sql, then the stream applies a CDC feed into it."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.streaming import (
        cdc_scd2_stream,
    )

    ddl.execute_sql(
        spark,
        "CREATE TABLE scd2_tgt (k INT, v STRING, valid_from INT, "
        "valid_to INT, is_current BOOLEAN)",
        warehouse=wh,
    )
    table = os.path.join(wh, "scd2_tgt")
    schema = "k int, v string, ts int, seq int"
    src = tmp_path / "cdc_src"
    src.mkdir()
    rows = [(1, "a", 10, 0), (2, "x", 10, 1), (1, "b", 20, 0)]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q = cdc_scd2_stream(
        spark,
        spark.readStream.schema(schema).parquet(str(src)),
        table,
        str(tmp_path / "ck"),
        ["k"],
        "ts",
        tiebreak="seq",
    )
    q.awaitTermination(180)
    got = sorted(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in st.read_snapshot(spark, table).collect()
    )
    assert got == [
        (1, "a", 10, 20, False),
        (1, "b", 20, None, True),
        (2, "x", 10, None, True),
    ]


def test_dnf_delete_update_semantics(spark, wh):
    """Top-level OR lowers to DNF: DELETE and UPDATE apply the exact
    OR-of-ANDs predicate."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "facts")  # id int, g string, v double; 0..39
    run("DELETE FROM facts WHERE (g = 'g0' AND v < 6.0) OR v >= 36.0")
    left = sorted(r.id for r in st.read_snapshot(spark, t).collect())
    # g0 rows are ids % 3 == 0; deleted: {0,3} (v<6) and {36..39}
    want = [i for i in range(40) if not ((i % 3 == 0 and i < 6) or i >= 36)]
    assert left == want
    run("UPDATE facts SET v = v + 1000.0 WHERE id = 7 OR id = 11")
    got = {
        r.id: r.v
        for r in st.read_snapshot(spark, t).filter(F.col("v") > 900).collect()
    }
    assert got == {7: 1007.0, 11: 1011.0}


def test_dnf_delete_prunes_per_disjunct(spark, tmp_path):
    """Scale pin: a disjunctive DELETE rewrites ONLY the files at
    least one branch's stats keep — files no branch can touch carry
    over BY REFERENCE (same relative path in the new manifest)."""
    t = str(tmp_path / "pruned")
    # three one-file commits with disjoint id ranges -> tight stats
    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(lo, lo + 50)], "id int, v double"
        ).coalesce(1)
        if lo == 0:
            st.create_table(df, t, [])
        else:
            st.append(df, t)
    man0 = st._read_manifest(t, st.current_version(t))
    assert len(man0["files"]) == 3
    by_range = {}
    for f, s in man0["file_stats"].items():
        by_range[int(s["min"]["id"]) // 100] = f
    ddl.execute_sql(
        spark,
        f"DELETE FROM `{t}` WHERE (id <= 10) OR (id >= 240)",
    )
    man1 = st._read_manifest(t, st.current_version(t))
    # the middle file (ids 100-149) is untouched by either branch:
    # it must carry over as the SAME file entry
    assert by_range[1] in man1["files"]
    # the outer two were rewritten (dropped + replaced)
    assert by_range[0] not in man1["files"]
    assert by_range[2] not in man1["files"]
    df = st.read_snapshot(spark, t)
    assert df.count() == 150 - 11 - 10


def test_update_set_literal_with_keywords(spark, wh):
    """A SET expression carrying ' WHERE ' (or ' OR ') inside a
    string literal must not confuse the statement split — the
    literal-aware scanner finds the real clause boundary."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    run("UPDATE dims SET label = ' WHERE OR AND ' WHERE g = 'g1'")
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert got["g1"] == " WHERE OR AND "
    assert got["g0"] == "alpha"  # untouched
    # and in a WHERE comparison literal
    run("DELETE FROM dims WHERE label = ' WHERE OR AND '")
    assert {r.g for r in st.read_snapshot(spark, t).collect()} == {"g0", "g2"}


def test_merge_insert_column_list_and_cascade(spark, wh):
    """INSERT (cols) VALUES (exprs) fills unlisted columns with NULL;
    the MATCHED cascade is first-match-wins across mixed
    column-level clauses; expressions see both aliases."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "facts")  # id int, g string, v double
    spark.createDataFrame(
        [(1, "z", 500.0), (5, "z", 0.5), (999, "new", 77.0)],
        "id int, g string, v double",
    ).createOrReplaceTempView("m14_src")
    run(
        "MERGE INTO facts USING m14_src AS s ON t.id = s.id "
        "WHEN MATCHED AND s.v > 100.0 THEN UPDATE SET v = s.v + t.v "
        "WHEN MATCHED THEN UPDATE SET g = concat(t.g, '_touched') "
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v * 2)"
    )
    rows = {r.id: (r.g, r.v) for r in st.read_snapshot(spark, t).collect()}
    # id=1: first clause (500>100) -> v = 500+1, g unchanged
    assert rows[1] == ("g1", 501.0)
    # id=5: second clause -> g suffixed, v unchanged
    assert rows[5] == ("g2_touched", 5.0)
    # id=999: inserted with NULL g
    assert rows[999] == (None, 154.0)
    # untouched row intact
    assert rows[2] == ("g2", 2.0)
    spark.catalog.dropTempView("m14_src")


def test_merge_update_only_and_delete_only(spark, wh):
    """Delta allows any clause subset: an update-only MERGE never
    inserts; a delete-only MERGE (matched delete with target-alias
    cond) never updates."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    spark.createDataFrame(
        [("g0", "seen"), ("g8", "ghost")], "g string, label string"
    ).createOrReplaceTempView("m14b_src")
    run(
        "MERGE INTO dims USING m14b_src AS s ON t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET label = s.label"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert got == {"g0": "seen", "g1": "beta", "g2": "gamma"}
    run(
        "MERGE INTO dims USING m14b_src AS s ON t.g = s.g "
        "WHEN MATCHED AND t.label = 'seen' THEN DELETE"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert got == {"g1": "beta", "g2": "gamma"}
    spark.catalog.dropTempView("m14b_src")


def test_merge_rejects_unknown_assignment_column(spark, wh, dims_src):
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    with pytest.raises(ValueError, match="unknown target column"):
        run(
            "MERGE INTO dims USING dims_src AS s ON t.g = s.g "
            "WHEN MATCHED THEN UPDATE SET nope = 1"
        )


@pytest.fixture
def dims_src(spark):
    spark.createDataFrame(
        [("g0", "x")], "g string, label string"
    ).createOrReplaceTempView("dims_src")
    yield "dims_src"
    spark.catalog.dropTempView("dims_src")


def test_merge_nmbs_update_sql(spark, wh):
    """WHEN NOT MATCHED BY SOURCE THEN UPDATE SET through SQL text —
    the soft-delete mirror: unmatched target rows get FLAGGED rather
    than pruned, with conditions and expressions resolving over
    target columns only. Ordered with a DELETE clause after it:
    first-match-wins, so a row the UPDATE claims never reaches the
    DELETE."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    spark.createDataFrame(
        [("g0", "x")], "g string, label string"
    ).createOrReplaceTempView("nmbs_upd_src")
    run(
        "MERGE INTO dims USING nmbs_upd_src AS s ON t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE AND t.label = 'beta' "
        "THEN UPDATE SET label = concat('retired:', label) "
        "WHEN NOT MATCHED BY SOURCE AND t.g = 'g1' THEN DELETE"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    # g1 satisfied BOTH by-source clauses; UPDATE is first, so it wins
    assert got == {"g0": "x", "g1": "retired:beta", "g2": "gamma"}
    spark.catalog.dropTempView("nmbs_upd_src")


def test_merge_nmbs_update_rejections(spark, wh, dims_src):
    """BY SOURCE clauses have no source row: an expression or
    condition referencing the source alias rejects loudly, as does an
    assignment to a column the target doesn't carry."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    with pytest.raises(ValueError, match="source alias"):
        run(
            "MERGE INTO dims USING dims_src AS s ON t.g = s.g "
            "WHEN NOT MATCHED BY SOURCE AND s.label = 'x' THEN DELETE"
        )
    with pytest.raises(ValueError, match="source alias"):
        run(
            "MERGE INTO dims USING dims_src AS s ON t.g = s.g "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET label = s.label"
        )
    with pytest.raises(ValueError, match="unknown target"):
        run(
            "MERGE INTO dims USING dims_src AS s ON t.g = s.g "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET nope = 1"
        )


def test_merge_nmbs_only_statement(spark, wh):
    """A MERGE with only WHEN NOT MATCHED BY SOURCE THEN DELETE is a
    full-sync prune (Delta allows the clause alone): matched rows
    survive unchanged, unmatched target rows delete, unmatched source
    rows are NOT inserted."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    spark.createDataFrame(
        [("g0", "x"), ("g8", "ghost")], "g string, label string"
    ).createOrReplaceTempView("nmbs_src")
    run(
        "MERGE INTO dims USING nmbs_src AS s ON t.g = s.g "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert got == {"g0": "alpha"}  # g1/g2 pruned; g8 NOT inserted
    spark.catalog.dropTempView("nmbs_src")


def test_alter_table_add_columns_sql(spark, wh):
    """ALTER TABLE ADD COLUMNS through SQL text: metadata-only
    evolution (old rows null-fill), full Spark type vocabulary via
    the session DDL parser (decimal + array), and the evolved table
    accepts INSERTs at the new arity."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    r = run(
        "ALTER TABLE dims ADD COLUMNS "
        "(score decimal(10,2), tags array<string>)"
    )
    assert r.collect()[0].operation == "add_columns"
    snap = st.read_snapshot(spark, t)
    assert snap.columns == ["g", "label", "score", "tags"]
    assert dict(snap.dtypes)["score"] == "decimal(10,2)"
    assert snap.filter(F.col("score").isNotNull()).count() == 0
    run(
        "INSERT INTO dims VALUES "
        "('g9', 'delta', 1.25, array('new', 'dim'))"
    )
    row = (
        st.read_snapshot(spark, t).filter(F.col("g") == "g9").collect()[0]
    )
    assert float(row.score) == 1.25 and row.tags == ["new", "dim"]
    # old rows still read with NULLs under the evolved schema
    assert st.read_snapshot(spark, t).count() == 4


def test_truncate_show_partitions_describe(spark, wh):
    """TRUNCATE TABLE is metadata-only (zero files referenced, data
    untouched, schema + history survive); SHOW PARTITIONS and
    DESCRIBE TABLE are manifest-only reports."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    parts = {
        r.partition: (r.n_files, r.rows)
        for r in run("SHOW PARTITIONS facts").collect()
    }
    assert set(parts) == {"g=g0", "g=g1", "g=g2"}
    assert all(nf >= 1 and rows > 0 for nf, rows in parts.values())
    desc = {
        r.col_name: (r.data_type, r.is_partition)
        for r in run("DESCRIBE TABLE facts").collect()
    }
    assert desc == {
        "id": ("int", False),
        "g": ("string", True),
        "v": ("double", False),
    }
    t = os.path.join(wh, "facts")
    r = run("TRUNCATE TABLE facts").collect()[0]
    assert r.operation == "truncate"
    m = st._read_manifest(t, st.current_version(t))
    assert m["files"] == []  # metadata-only: nothing rewritten
    snap = st.read_snapshot(spark, t)
    assert snap.count() == 0 and snap.columns == ["id", "g", "v"]
    assert st.read_snapshot(spark, t, version=1).count() == 40


def test_create_or_replace_and_insert_overwrite(spark, wh):
    """CREATE OR REPLACE TABLE re-declares schema AND partitioning
    atomically with history preserved; INSERT OVERWRITE is the static
    full-table overwrite; the OR REPLACE + IF NOT EXISTS combination
    rejects."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    run(
        "CREATE OR REPLACE TABLE dims PARTITIONED BY (lab) "
        "AS SELECT 'x' AS lab, 1 AS n"
    )
    snap = st.read_snapshot(spark, t)
    assert set(snap.columns) == {"lab", "n"} and snap.count() == 1
    m = st._read_manifest(t, st.current_version(t))
    assert m["operation"] == "replace" and m["partition_cols"] == ["lab"]
    # history preserved: v1 still reads the ORIGINAL dims shape
    assert st.read_snapshot(spark, t, version=1).columns == ["g", "label"]
    run("INSERT OVERWRITE dims VALUES ('y', 2), ('z', 3)")
    got = {(r.lab, r.n) for r in st.read_snapshot(spark, t).collect()}
    assert got == {("y", 2), ("z", 3)}
    with pytest.raises(ValueError, match="IF NOT EXISTS"):
        run("CREATE OR REPLACE TABLE IF NOT EXISTS dims AS SELECT 1 AS x")


def test_create_table_not_null_and_generated(spark, wh):
    """Column-list DDL decorations: NOT NULL lands as an ENFORCED
    CHECK constraint; GENERATED ALWAYS AS (expr) lifts into the
    manifest's generated map — computed when a batch omits the
    column, validated when it provides it."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    run(
        "CREATE TABLE typed (k bigint NOT NULL, v double, "
        "v2 double GENERATED ALWAYS AS (v * 2.0))"
    )
    t = os.path.join(wh, "typed")
    m = st._read_manifest(t, 1)
    assert m["constraints"] == {"k_not_null": "k IS NOT NULL"}
    assert m["generated"] == {"v2": "v * 2.0"}
    st.append(spark.createDataFrame([(1, 3.0)], "k bigint, v double"), t)
    row = st.read_snapshot(spark, t).collect()[0]
    assert row.v2 == 6.0  # computed on the way in
    with pytest.raises(st.ConstraintViolation):
        st.append(
            spark.createDataFrame([(None, 1.0)], "k bigint, v double"), t
        )


def test_optimize_where_partition_scoped(spark, wh):
    """OPTIMIZE ... WHERE compacts ONLY the matching partition
    directories; other partitions' files carry by reference, and
    non-partition or non-equality predicates reject."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "facts")
    # fragment partition g0 with two extra appends
    for i in (200, 201):
        st.append(
            spark.createDataFrame(
                [(i, "g0", float(i))], "id int, g string, v double"
            ),
            t,
        )
    before = st._read_manifest(t, st.current_version(t))["files"]
    g1_before = sorted(f for f in before if "g=g1" in f)
    assert len([f for f in before if "g=g0" in f]) == 3
    r = run("OPTIMIZE facts WHERE g = 'g0'").collect()[0]
    assert r.operation == "optimize"
    after = st._read_manifest(t, st.current_version(t))["files"]
    assert len([f for f in after if "g=g0" in f]) == 1  # compacted
    assert sorted(f for f in after if "g=g1" in f) == g1_before  # untouched
    assert st.read_snapshot(spark, t).count() == 42
    with pytest.raises(ValueError, match="partition"):
        run("OPTIMIZE facts WHERE v > 1.0")
    with pytest.raises(ValueError, match="no OR"):
        run("OPTIMIZE facts WHERE (g = 'g0') OR (g = 'g1')")


def test_create_table_complex_type_not_null_split(spark, wh):
    """The column-list split is angle-bracket aware: a map type's
    internal comma must not tear the entry apart, and NOT NULL on a
    complex-typed column derives the constraint from the COLUMN name,
    not a type fragment."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    run(
        "CREATE TABLE cplx (k bigint, attrs map<string, int> NOT NULL, "
        "tags array<string>)"
    )
    t = os.path.join(wh, "cplx")
    m = st._read_manifest(t, 1)
    assert m["constraints"] == {"attrs_not_null": "attrs IS NOT NULL"}
    snap = st.read_snapshot(spark, t)
    assert dict(snap.dtypes)["attrs"] == "map<string,int>"
    assert dict(snap.dtypes)["tags"] == "array<string>"


def test_merge_multiple_conditional_deletes_or_together(spark, wh):
    """Review r14: several conditional WHEN MATCHED ... THEN DELETE
    clauses on the fast path must OR together — a per-clause marker
    overwrite silently turned earlier deletes into updates."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    spark.createDataFrame(
        [("g0", "x"), ("g1", "y"), ("g2", "z"), ("g9", "w")],
        "g string, label string",
    ).createOrReplaceTempView("mdel_src")
    run(
        "MERGE INTO dims USING mdel_src AS s ON t.g = s.g "
        "WHEN MATCHED AND s.label = 'x' THEN DELETE "
        "WHEN MATCHED AND s.label = 'y' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    # g0 deleted by clause 1, g1 by clause 2 (previously overwritten
    # to an update), g2 updated, g9 inserted
    assert got == {"g2": "z", "g9": "w"}
    spark.catalog.dropTempView("mdel_src")


def test_merge_rejects_key_assignment(spark, wh, dims_src):
    """Review r14: UPDATE SET on a merge-key column would silently
    duplicate rows in a key-based merge core — refuse loudly."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    with pytest.raises(ValueError, match="merge key"):
        run(
            "MERGE INTO dims USING dims_src AS s ON t.g = s.g "
            "WHEN MATCHED THEN UPDATE SET g = concat(t.g, '_new')"
        )


def test_merge_case_when_in_assignment(spark, wh):
    """Review r14: an unparenthesized CASE WHEN inside an assignment
    is not a clause boundary — only WHEN [NOT] MATCHED opens one."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    spark.createDataFrame(
        [("g0", "long-label"), ("g1", "s")], "g string, label string"
    ).createOrReplaceTempView("case_src")
    run(
        "MERGE INTO dims USING case_src AS s ON t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET label = "
        "CASE WHEN length(s.label) > 4 THEN s.label ELSE t.label END "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    assert got == {"g0": "long-label", "g1": "beta", "g2": "gamma"}
    spark.catalog.dropTempView("case_src")


def test_create_table_generated_with_comparison(spark, wh):
    """Review r14: a GENERATED ALWAYS AS expression containing a
    comparison operator must not corrupt the angle-bracket depth of
    the column-list split."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    run(
        "CREATE TABLE gencmp (a int, flag int GENERATED ALWAYS AS "
        "(CASE WHEN a > 5 THEN 1 ELSE 0 END), b int)"
    )
    t = os.path.join(wh, "gencmp")
    m = st._read_manifest(t, 1)
    assert m["generated"] == {"flag": "CASE WHEN a > 5 THEN 1 ELSE 0 END"}
    st.append(spark.createDataFrame([(9, 0)], "a int, b int"), t)
    row = st.read_snapshot(spark, t).collect()[0]
    assert (row.a, row.flag, row.b) == (9, 1, 0)


def test_replace_table_resets_identity(spark, wh):
    """Review r14: CREATE OR REPLACE must clear the parent's identity
    SPEC — a sticky carry would either refuse the new frame's column
    or declare identity on a column absent from the new schema."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    st.enable_row_tracking(t)
    st.enable_identity(t, "row_sk")
    assert st._read_manifest(t, st.current_version(t))["identity"]
    run(
        "CREATE OR REPLACE TABLE dims AS "
        "SELECT 'a' AS g, 7 AS row_sk"  # writer-supplied, now legal
    )
    m = st._read_manifest(t, st.current_version(t))
    assert m.get("identity") is None
    got = st.read_snapshot(spark, t).collect()
    assert [(r.g, r.row_sk) for r in got] == [("a", 7)]


def test_refs_sql_surface(spark, wh):
    """The WAP surface through SQL text: CREATE TAG / CREATE BRANCH /
    SHOW REFS / FAST FORWARD / RESTORE TO TAG / DROP TAG — each
    routed to the existing ref machinery."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "facts")
    r = run("ALTER TABLE facts CREATE TAG v1-audit AS OF VERSION 1")
    assert r.collect()[0].operation == "create_tag"
    run("ALTER TABLE facts CREATE BRANCH wap")
    refs = {
        (r.ref_type, r.name): r.version
        for r in run("SHOW REFS facts").collect()
    }
    assert refs[("tag", "v1-audit")] == 1
    assert ("branch", "wap") in refs
    # write to the branch, then publish it via FAST FORWARD
    bp = os.path.join(t, st.BRANCH_DIR, "wap")
    st.append(
        spark.createDataFrame([(900, "g0", 9.0)], "id int, g string, v double"),
        bp,
    )
    head_before = st.current_version(t)
    r = run("ALTER TABLE facts FAST FORWARD wap")
    assert r.collect()[0].operation == "fast_forward"
    assert st.current_version(t) == head_before + 1
    assert st.read_snapshot(spark, t).count() == 41
    # tag-based restore drops the published rows again
    run("RESTORE TABLE facts TO TAG v1-audit")
    assert st.read_snapshot(spark, t).count() == 40
    run("ALTER TABLE facts DROP TAG v1-audit")
    with pytest.raises(ValueError, match="does not exist"):
        run("RESTORE TABLE facts TO TAG v1-audit")
    # typo'd table: an empty listing would mask the mistake
    with pytest.raises(ValueError, match="does not exist"):
        run("SHOW REFS factz")


# --- property: SQL MERGE clause cascade == row-at-a-time replay ----------
from hypothesis import HealthCheck, given, settings as hsettings
from hypothesis import strategies as hs

_MCL = hs.lists(
    hs.tuples(
        hs.sampled_from([None, "s.v >= 5", "t.v < 3", "s.v = t.v"]),
        hs.sampled_from(["upd", "del"]),
    ),
    min_size=0,
    max_size=2,
)
_NCL = hs.sampled_from([None, "s.v >= 5"])


def _cond_ok(cond, sv, tv):
    if cond is None:
        return True
    if cond == "s.v >= 5":
        return sv >= 5
    if cond == "t.v < 3":
        return tv < 3
    return sv == tv  # "s.v = t.v"


@given(
    tvals=hs.lists(hs.integers(0, 9), min_size=1, max_size=5),
    svals=hs.lists(hs.integers(0, 9), min_size=0, max_size=5),
    mcl=_MCL,
    ncond=_NCL,
)
@hsettings(
    max_examples=8, deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
)
def test_sql_merge_cascade_matches_replay(
    spark, tmp_path_factory, tvals, svals, mcl, ncond
):
    """The conditional / column-level SQL MERGE lowering
    (_lower_merge_clauses) equals a first-match-wins row-at-a-time
    replay, for random MATCHED cascades (conditions over EITHER
    alias; UPDATE references both sides) + a conditional column-list
    INSERT. Unconditional clauses must come last (the
    unreachable-clause check), so the generator appends them."""
    import os as _os

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources import (
        ddl as _ddl,
    )

    wh = str(tmp_path_factory.mktemp("merge_prop"))
    t = _os.path.join(wh, "mp")
    target = [(k, v) for k, v in enumerate(tvals)]
    source = [(k * 2, v) for k, v in enumerate(svals)]  # overlap evens
    st.create_table(
        spark.createDataFrame(target, "k int, v int").coalesce(1), t
    )
    spark.createDataFrame(
        source or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull()).createOrReplaceTempView("mp_src")
    # conditional clauses first; everything after the first
    # UNCONDITIONAL clause is unreachable (the analyzer refuses it),
    # so the cascade truncates there
    spec = []
    for c, a in sorted(mcl, key=lambda x: x[0] is None):
        spec.append((c, a))
        if c is None:
            break
    clauses = "".join(
        f"WHEN MATCHED{' AND ' + c if c else ''} THEN "
        + ("UPDATE SET v = s.v + t.v " if a == "upd" else "DELETE ")
        for c, a in spec
    )
    stmt = (
        f"MERGE INTO `{t}` USING mp_src AS s ON t.k = s.k "
        + clauses
        + f"WHEN NOT MATCHED{' AND ' + ncond if ncond else ''} "
        "THEN INSERT (k, v) VALUES (s.k, s.v * 10)"
    )
    _ddl.execute_sql(spark, stmt, warehouse=wh)
    got = {tuple(r) for r in st.read_snapshot(spark, t).collect()}
    # replay
    srcd = dict(source)
    exp = set()
    for k, tv in target:
        if k in srcd:
            sv = srcd[k]
            first = next(
                (a for c, a in spec if _cond_ok(c, sv, tv)), None
            )
            if first == "del":
                continue
            exp.add((k, sv + tv) if first == "upd" else (k, tv))
        else:
            exp.add((k, tv))
    for k, sv in source:
        if k not in dict(target) and _cond_ok(ncond, sv, None):
            exp.add((k, sv * 10))
    assert got == exp
    spark.catalog.dropTempView("mp_src")


def test_apply_changes_sql_type1(spark, wh):
    """APPLY CHANGES INTO (batch DLT surface), default SCD TYPE 1:
    per-key latest-by-sequence wins, delete rows drop their match,
    sequence/meta columns the target doesn't carry are feed plumbing."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    spark.createDataFrame(
        [
            ("g0", "old", 1, "U"),
            ("g0", "newest", 3, "U"),
            ("g0", "mid", 2, "U"),
            ("g1", "x", 1, "U"),
            ("g1", "gone", 2, "D"),  # latest for g1 is a delete
            ("g7", "fresh", 1, "U"),
        ],
        "g string, label string, seq int, op string",
    ).createOrReplaceTempView("cdc_feed")
    r = run(
        "APPLY CHANGES INTO dims FROM cdc_feed KEYS (g) "
        "SEQUENCE BY seq APPLY AS DELETE WHEN op = 'D'"
    ).collect()[0]
    assert r.operation == "apply_changes"
    got = {r.g: r.label for r in st.read_snapshot(spark, t).collect()}
    # g0 updated to its latest, g1 deleted, g2 untouched, g7 inserted
    assert got == {"g0": "newest", "g2": "gamma", "g7": "fresh"}
    spark.catalog.dropTempView("cdc_feed")


def test_apply_changes_sql_scd2(spark, wh):
    """APPLY CHANGES ... STORED AS SCD TYPE 2 through SQL text: two
    batches applied in sequence — the second carries LATE rows that
    splice into the middle of the first's history — must equal the
    single-shot scd2 build over the whole feed (the shared
    scd2_apply_to_table core, same as the streaming surface)."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.merge import (
        scd2,
    )

    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "hist")
    run(
        "CREATE TABLE hist (k int, attr string, valid_from bigint, "
        "valid_to bigint, is_current boolean)"
    )
    feed = [
        (0, "a", 10), (0, "b", 20), (0, "c", 30),
        (1, "x", 15), (1, "y", 25),
    ]
    first = [p for p in feed if p[2] != 20 and p[2] != 15]
    late = [p for p in feed if p[2] in (20, 15)]
    schema = "k int, attr string, ts long"
    spark.createDataFrame(first, schema).createOrReplaceTempView("scd_b1")
    spark.createDataFrame(late, schema).createOrReplaceTempView("scd_b2")
    for view in ("scd_b1", "scd_b2"):
        r = run(
            f"APPLY CHANGES INTO hist FROM {view} KEYS (k) "
            "SEQUENCE BY ts STORED AS SCD TYPE 2"
        ).collect()[0]
        assert r.operation == "apply_changes_scd2"
    got = {
        tuple(r)
        for r in st.read_snapshot(spark, t)
        .select("k", "attr", "valid_from", "valid_to", "is_current")
        .collect()
    }
    exp = {
        tuple(r)
        for r in scd2(
            spark.createDataFrame(feed, schema), "k", "attr", "ts", "ts"
        )
        .select("k", "attr", "valid_from", "valid_to", "is_current")
        .collect()
    }
    assert got == exp
    for view in ("scd_b1", "scd_b2"):
        spark.catalog.dropTempView(view)


def test_apply_changes_scd2_with_delete_and_plumbing(spark, wh):
    """Review r14c: SCD TYPE 2 attrs derive from the TARGET schema,
    so a feed carrying plumbing columns (the op column the delete
    predicate reads) splices cleanly — tombstones close intervals."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "hist2")
    run(
        "CREATE TABLE hist2 (k int, attr string, valid_from bigint, "
        "valid_to bigint, is_current boolean)"
    )
    spark.createDataFrame(
        [(0, "a", 10, "U"), (0, "b", 20, "U"), (0, None, 30, "D"),
         (1, "x", 15, "U")],
        "k int, attr string, ts long, op string",
    ).createOrReplaceTempView("scd_del_feed")
    r = run(
        "APPLY CHANGES INTO hist2 FROM scd_del_feed KEYS (k) "
        "SEQUENCE BY ts APPLY AS DELETE WHEN op = 'D' "
        "STORED AS SCD TYPE 2"
    ).collect()[0]
    assert r.operation == "apply_changes_scd2"
    got = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in st.read_snapshot(spark, t).collect()
    }
    # k=0: a@[10,20), b@[20,30) closed by the tombstone; k=1 current
    assert got == {
        (0, "a", 10, 20, False),
        (0, "b", 20, 30, False),
        (1, "x", 15, None, True),
    }
    spark.catalog.dropTempView("scd_del_feed")


def test_apply_changes_empty_feed_and_duplicate_seq(spark, wh):
    """Review r14c: an empty feed is a no-op (no version churn, no
    full-table rewrite); duplicate (keys, sequence) pairs raise —
    the winner would be run-to-run nondeterministic (DLT raises on
    non-unique sequencing too)."""
    run = lambda s: ddl.execute_sql(spark, s, warehouse=wh)
    t = os.path.join(wh, "dims")
    head = st.current_version(t)
    spark.createDataFrame([], "g string, label string, seq int")\
        .createOrReplaceTempView("empty_feed")
    r = run(
        "APPLY CHANGES INTO dims FROM empty_feed KEYS (g) "
        "SEQUENCE BY seq"
    ).collect()[0]
    assert r.skipped == "empty feed" and st.current_version(t) == head
    spark.createDataFrame(
        [("g0", "a", 1), ("g0", "b", 1)], "g string, label string, seq int"
    ).createOrReplaceTempView("dup_feed")
    with pytest.raises(ValueError, match="UNIQUE"):
        run(
            "APPLY CHANGES INTO dims FROM dup_feed KEYS (g) "
            "SEQUENCE BY seq"
        )
    for v in ("empty_feed", "dup_feed"):
        spark.catalog.dropTempView(v)
