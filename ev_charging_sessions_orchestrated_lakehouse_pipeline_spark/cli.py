"""CLI runner — the engine's orchestration entry point (reference S13:
Glue job arguments, infra/glue-jobs.tf:21-41, re-expressed as argparse
subcommands over a local/S3 lake root).

    python -m ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.cli \
        silver --input data.csv --lake /tmp/lake
    python -m ... gold --lake /tmp/lake --event-date 2015-03-01
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="evlake")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("silver", help="bronze CSV -> clean silver parquet")
    ps.add_argument("--input", required=True, help="bronze CSV path")
    ps.add_argument("--lake", required=True, help="lake root directory")
    ps.add_argument("--silver-prefix", default="silver/ev_sessions_clean")
    ps.add_argument("--quarantine-prefix", default="bronze/quarantine/ev_sessions_bad")
    ps.add_argument(
        "--secondary-partition",
        default=None,
        help="optional secondary partition column (reference default: stationId; "
        "off here — small-file guard)",
    )
    ps.add_argument("--fail-mode", choices=["quarantine", "fail_job"], default="quarantine")
    ps.add_argument("--precise-timestamps", action="store_true")

    pg = sub.add_parser("gold", help="silver parquet -> gold fact table")
    pg.add_argument("--lake", required=True)
    pg.add_argument("--silver-prefix", default="silver/ev_sessions_clean")
    pg.add_argument("--gold-prefix", default="gold/fact_ev_session")
    pg.add_argument("--event-date", default=None, help="YYYY-MM-DD partition re-run")
    pg.add_argument("--database", default=None, help="register fact table in this DB")
    pg.add_argument(
        "--table-format",
        choices=["parquet", "snapshot"],
        default="parquet",
        help="gold sink: dynamic-overwrite parquet, or the versioned "
        "snapshot table format (time travel per run)",
    )

    pp = sub.add_parser(
        "pipeline",
        help="bronze CSV -> silver -> gold in one run (the in-engine "
        "equivalent of the reference's Step-Functions orchestration)",
    )
    pp.add_argument("--input", required=True)
    pp.add_argument("--lake", required=True)
    pp.add_argument("--silver-prefix", default="silver/ev_sessions_clean")
    pp.add_argument("--quarantine-prefix", default="bronze/quarantine/ev_sessions_bad")
    pp.add_argument("--gold-prefix", default="gold/fact_ev_session")
    pp.add_argument("--event-date", default=None)
    pp.add_argument(
        "--table-format", choices=["parquet", "snapshot"], default="parquet"
    )
    pp.add_argument("--fail-mode", choices=["quarantine", "fail_job"], default="quarantine")

    pl = sub.add_parser(
        "llmprep",
        help="documents table -> dedup/quality/decontam/mixture -> "
        "versioned snapshot corpus",
    )
    pl.add_argument("--sf-dir", required=True, help="fixture dir with documents.parquet")
    pl.add_argument("--table", required=True, help="snapshot table path for survivors")

    pc = sub.add_parser(
        "discover",
        help="crawler-style discovery: infer schema + Hive partitions "
        "from a Parquet prefix and register it as an external table "
        "(re-run to pick up schema evolution)",
    )
    pc.add_argument("--path", required=True, help="parquet prefix to crawl")
    pc.add_argument("--database", required=True)
    pc.add_argument("--table-name", required=True)

    pm = sub.add_parser(
        "maintenance",
        help="policy-driven warehouse sweep: apply each snapshot "
        "table's declared maintenance.* properties (auto-compact, "
        "age-based vacuum, analyze) in one cron-able pass",
    )
    pm.add_argument("--lake", required=True, help="warehouse root directory")
    pm.add_argument(
        "--dry-run", action="store_true",
        help="report compaction plans and vacuum audits, touch nothing",
    )

    pt = sub.add_parser(
        "table",
        help="snapshot-table maintenance (OPTIMIZE / VACUUM / bloom "
        "index / partition evolution / column DDL / history)",
    )
    pt.add_argument("--table", required=True, help="snapshot table path")
    pt.add_argument(
        "action",
        choices=[
            "optimize",
            "auto-compact",
            "vacuum",
            "bloom",
            "evolve",
            "rename-column",
            "drop-column",
            "widen-column",
            "add-columns",
            "count",
            "layout",
            "history",
            "create-tag",
            "drop-tag",
            "create-branch",
            "drop-branch",
            "fast-forward",
            "refs",
            "enable-row-tracking",
            "analyze",
            "stats",
            "refresh-view",
            "register-view",
            "add-constraint",
            "drop-constraint",
            "set-property",
            "unset-property",
            "properties",
            "sql",
            "cluster-by",
            "copy-into",
            "drop-feature",
        ],
    )
    pt.add_argument(
        "--property",
        action="append",
        default=None,
        metavar="K=V",
        help="set-property: property assignment (repeatable)",
    )
    pt.add_argument(
        "--expr", default=None,
        help="add-constraint: boolean SQL expression to enforce",
    )
    pt.add_argument(
        "--if-exists", action="store_true",
        help="drop-constraint: no error when the name is absent",
    )
    pt.add_argument(
        "--sql",
        default=None,
        help="register-view: statement to run against the registered "
        "view (the ad-hoc SQL-on-snapshot endpoint); prints one JSON "
        "object with the view name and a 'rows' array. "
        "sql: the management/query statement to execute (repeatable "
        "via --statement)",
    )
    pt.add_argument(
        "--statement",
        action="append",
        default=None,
        metavar="SQL",
        help="sql: statement to execute (repeatable, run in order); "
        "--table is the WAREHOUSE ROOT bare table names resolve "
        "against — every snapshot table under it is pre-registered "
        "as a view, so statements can query by name. Quoted/"
        "backquoted paths inside statements bypass the root.",
    )
    pt.add_argument(
        "--sink", default=None,
        help="refresh-view: path of the materialized aggregate table",
    )
    pt.add_argument(
        "--keys", default=None,
        help="refresh-view: comma-separated group-by key columns",
    )
    pt.add_argument(
        "--sum-col", default=None, help="refresh-view: column to SUM"
    )
    pt.add_argument(
        "--minmax-col", default=None,
        help="refresh-view: maintain COUNT/MIN/MAX of this column "
        "instead of COUNT/SUM",
    )
    pt.add_argument(
        "--hll-col", default=None,
        help="refresh-view: column whose per-key DISTINCT COUNT the "
        "HLL-register view tracks",
    )
    pt.add_argument(
        "--cluster-columns", default=None,
        help="cluster-by: comma-separated clustering keys (omit to "
        "unset, CLUSTER BY NONE)",
    )
    pt.add_argument(
        "--source", default=None,
        help="copy-into: landing directory to ingest from",
    )
    pt.add_argument(
        "--file-format", default="parquet",
        help="copy-into: source file format (parquet/csv/json)",
    )
    pt.add_argument(
        "--pattern", default=None,
        help="copy-into: glob over source-relative file names",
    )
    pt.add_argument(
        "--force", action="store_true",
        help="copy-into: reload files already in the ledger",
    )
    pt.add_argument(
        "--feature", default=None,
        help="drop-feature: reader/writer feature flag to downgrade",
    )
    pt.add_argument(
        "--app-id", default="ivm",
        help="refresh-view: cursor identity (the sink txn app_id)",
    )
    pt.add_argument("--cluster-by", default=None, help="comma-separated sort cols")
    pt.add_argument("--zorder", action="store_true")
    pt.add_argument("--files-per-partition", type=int, default=1)
    pt.add_argument(
        "--target-file-bytes", type=int, default=None,
        help="optimize/auto-compact: size output files by bytes "
        "(ceil(live_bytes/target) files) instead of a fixed count",
    )
    pt.add_argument("--retain-last", type=int, default=0)
    pt.add_argument(
        "--dry-run", action="store_true",
        help="vacuum: report victims without deleting",
    )
    pt.add_argument(
        "--grace-seconds", type=float, default=None,
        help="vacuum: age threshold below which unreferenced files "
        "survive the sweep (default VACUUM_GRACE_SECONDS; 0 forces "
        "immediate reclamation)",
    )
    pt.add_argument(
        "--column", default=None, help="bloom index / DDL target column"
    )
    pt.add_argument(
        "--columns", default=None,
        help="analyze: comma-separated column subset (default: all "
        "non-partition atomic columns)",
    )
    pt.add_argument("--to", default=None, help="new name for rename-column")
    pt.add_argument(
        "--type", default=None, help="wider Spark type for widen-column"
    )
    pt.add_argument("--name", default=None, help="ref name for tag/branch actions")
    pt.add_argument(
        "--version", type=int, default=None,
        help="version for create-tag/create-branch (default: head)",
    )
    pt.add_argument(
        "--partition-by",
        default=None,
        help="comma-separated new spec for evolve (plain cols or "
        "days(col) / bucket(N,col) transforms)",
    )

    args = p.parse_args(argv)

    if args.cmd == "table" and args.action in (
        "vacuum",
        "evolve",
        "rename-column",
        "drop-column",
        "widen-column",
        "add-columns",
        "count",
        "layout",
        "history",
        "create-tag",
        "drop-tag",
        "create-branch",
        "drop-branch",
        "fast-forward",
        "refs",
        "enable-row-tracking",
        "stats",
        "drop-constraint",
        "set-property",
        "unset-property",
        "properties",
        "cluster-by",
        "drop-feature",
    ):
        # metadata-only actions: no SparkSession needed
        from .sources import snaptable as st

        if args.action == "stats":
            print(
                json.dumps(
                    {
                        "table_stats": st.table_stats(args.table),
                        "analyzed": st.analyzed_stats(args.table),
                    },
                    default=str,
                )
            )
            return 0
        if args.action == "vacuum":
            print(
                json.dumps(
                    st.vacuum(
                        args.table,
                        retain_last=args.retain_last,
                        dry_run=args.dry_run,
                        grace_seconds=args.grace_seconds,
                    )
                )
            )
        elif args.action == "evolve":
            if not args.partition_by:
                p.error("evolve requires --partition-by")
            # paren-aware split: bucket(4,o_custkey) holds a comma
            entries, depth, cur = [], 0, []
            for ch in args.partition_by:
                if ch == "," and depth == 0:
                    entries.append("".join(cur).strip())
                    cur = []
                    continue
                depth += ch == "("
                depth -= ch == ")"
                cur.append(ch)
            if cur:
                entries.append("".join(cur).strip())
            v = st.evolve_partitioning(args.table, entries)
            print(json.dumps({"version": v}))
        elif args.action == "rename-column":
            if not args.column or not args.to:
                p.error("rename-column requires --column and --to")
            v = st.rename_column(args.table, args.column, args.to)
            print(json.dumps({"version": v}))
        elif args.action == "drop-column":
            if not args.column:
                p.error("drop-column requires --column")
            v = st.drop_column(args.table, args.column)
            print(json.dumps({"version": v}))
        elif args.action == "widen-column":
            if not args.column or not args.type:
                p.error("widen-column requires --column and --type")
            v = st.widen_column(args.table, args.column, args.type)
            print(json.dumps({"version": v}))
        elif args.action == "count":
            # exact COUNT(*) from the manifest (stats minus DVs) —
            # no SparkSession, no data I/O at any table size
            print(
                json.dumps(
                    {
                        "rows": st.metadata_count(args.table),
                        "version": st.current_version(args.table),
                    }
                )
            )
        elif args.action == "add-columns":
            # JVM-free metadata action: --columns "name:type,name:type"
            # (atomic types only; complex types go through `table sql`)
            if not args.columns:
                p.error("add-columns requires --columns name:type[,...]")
            # paren/angle-aware split so decimal(10,2) (atomic,
            # JVM-free parseable) survives the comma inside its type
            from .sources.ddl import _split_columns

            pairs = []
            for part in _split_columns(args.columns):
                if ":" not in part:
                    p.error(
                        f"malformed add-columns entry {part!r} "
                        "(expected name:type)"
                    )
                name, type_str = part.split(":", 1)
                pairs.append((name.strip(), type_str.strip()))
            v = st.add_columns(args.table, pairs)
            print(json.dumps({"version": v}))
        elif args.action == "layout":
            print(json.dumps(st.table_layout(args.table)))
        elif args.action in (
            "create-tag",
            "drop-tag",
            "create-branch",
            "drop-branch",
            "fast-forward",
        ):
            if not args.name:
                p.error(f"{args.action} requires --name")
            if args.action == "create-tag":
                v = st.create_tag(args.table, args.name, version=args.version)
                print(json.dumps({"tag": args.name, "version": v}))
            elif args.action == "drop-tag":
                st.drop_tag(args.table, args.name)
                print(json.dumps({"dropped": args.name}))
            elif args.action == "create-branch":
                bp = st.create_branch(args.table, args.name, version=args.version)
                print(json.dumps({"branch": args.name, "path": bp}))
            elif args.action == "drop-branch":
                st.drop_branch(args.table, args.name)
                print(json.dumps({"dropped": args.name}))
            else:
                v = st.fast_forward(args.table, args.name)
                print(json.dumps({"version": v}))
        elif args.action == "refs":
            print(json.dumps(st.list_refs(args.table)))
        elif args.action == "enable-row-tracking":
            v = st.enable_row_tracking(args.table)
            print(json.dumps({"version": v}))
        elif args.action == "set-property":
            if not args.property:
                p.error("set-property requires --property K=V (repeatable)")
            bad = [kv for kv in args.property if "=" not in kv]
            if bad:
                p.error(f"--property expects K=V, got: {', '.join(bad)}")
            props = dict(kv.split("=", 1) for kv in args.property)
            v = st.set_table_properties(args.table, props)
            print(json.dumps({"version": v, "properties": st.table_properties(args.table)}))
        elif args.action == "unset-property":
            if not args.name:
                p.error("unset-property requires --name")
            v = st.unset_table_properties(args.table, [args.name])
            print(json.dumps({"version": v, "properties": st.table_properties(args.table)}))
        elif args.action == "properties":
            print(json.dumps(st.table_properties(args.table)))
        elif args.action == "cluster-by":
            cols = (
                args.cluster_columns.split(",")
                if args.cluster_columns
                else None
            )
            v = st.set_clustering(args.table, cols)
            print(
                json.dumps(
                    {"version": v, "properties": st.table_properties(args.table)}
                )
            )
        elif args.action == "drop-feature":
            if not args.feature:
                p.error("drop-feature requires --feature")
            v = st.drop_feature(args.table, args.feature)
            print(json.dumps({"version": v}))
        elif args.action == "drop-constraint":
            if not args.name:
                p.error("drop-constraint requires --name")
            v = st.drop_constraint(
                args.table, args.name, if_exists=args.if_exists
            )
            print(json.dumps({"version": v}))
        else:
            print(json.dumps(st.history(args.table), default=str))
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"evlake-{args.cmd}")
    try:
        if args.cmd == "silver":
            from .operators.silver import run_silver

            res = run_silver(
                spark,
                input_path=args.input,
                silver_path=f"{args.lake}/{args.silver_prefix}",
                quarantine_path=f"{args.lake}/{args.quarantine_prefix}",
                secondary_partition=args.secondary_partition,
                fail_mode=args.fail_mode,
                precise_timestamps=args.precise_timestamps,
            )
            print(
                json.dumps(
                    {
                        "good": res.good_count,
                        "quarantined": res.bad_count,
                        "verification": res.verification.status.value,
                        "constraints": res.verification.to_dict(),
                    }
                )
            )
        elif args.cmd == "pipeline":
            from .operators.gold import run_gold
            from .operators.silver import run_silver

            res = run_silver(
                spark,
                input_path=args.input,
                silver_path=f"{args.lake}/{args.silver_prefix}",
                quarantine_path=f"{args.lake}/{args.quarantine_prefix}",
                fail_mode=args.fail_mode,
            )
            n = run_gold(
                spark,
                silver_path=f"{args.lake}/{args.silver_prefix}",
                gold_path=f"{args.lake}/{args.gold_prefix}",
                event_date=args.event_date,
                table_format=args.table_format,
            )
            print(
                json.dumps(
                    {
                        "silver": {
                            "good": res.good_count,
                            "quarantined": res.bad_count,
                            "verification": res.verification.status.value,
                        },
                        "gold": {"rows_written": n, "format": args.table_format},
                    }
                )
            )
        elif args.cmd == "llmprep":
            from .operators.llm_prep import llm_prep

            version, funnel = llm_prep(spark, args.sf_dir, args.table)
            print(json.dumps({"version": version, "funnel": funnel}))
        elif args.cmd == "discover":
            from .operators.gold import discover_table

            fqn = discover_table(
                spark, args.path, args.database, args.table_name
            )
            n_parts = len(
                [f for f in spark.table(fqn).schema.fields]
            )
            print(json.dumps({"table": fqn, "n_columns": n_parts}))
        elif args.cmd == "maintenance":
            from .sources.maintenance import run_maintenance

            report = run_maintenance(spark, args.lake, dry_run=args.dry_run)
            print(json.dumps(report, default=str))
            # per-table failures are isolated in the report; exit
            # nonzero only when the sweep achieved nothing at all
            if report and all("error" in r for r in report.values()):
                return 1
        elif args.cmd == "table":
            from .sources import snaptable as st

            if args.action == "optimize":
                v = st.optimize(
                    spark,
                    args.table,
                    files_per_partition=args.files_per_partition,
                    cluster_by=(
                        args.cluster_by.split(",") if args.cluster_by else None
                    ),
                    zorder=args.zorder,
                    target_file_bytes=args.target_file_bytes,
                )
            elif args.action == "analyze":
                v = st.analyze_table(
                    spark,
                    args.table,
                    columns=(
                        args.columns.split(",") if args.columns else None
                    ),
                )
            elif args.action == "auto-compact":
                vs = st.auto_compact(
                    spark,
                    args.table,
                    files_per_partition=args.files_per_partition,
                    target_file_bytes=args.target_file_bytes,
                )
                print(json.dumps({"versions": vs}))
                return 0
            elif args.action == "add-constraint":
                if not (args.name and args.expr):
                    p.error("add-constraint requires --name and --expr")
                v = st.add_constraint(spark, args.table, args.name, args.expr)
                print(json.dumps({"version": v}))
                return 0
            elif args.action == "copy-into":
                if not args.source:
                    p.error("copy-into requires --source")
                rep = st.copy_into(
                    spark,
                    args.table,
                    args.source,
                    file_format=args.file_format,
                    pattern=args.pattern,
                    force=args.force,
                )
                print(json.dumps(rep))
                return 0
            elif args.action == "sql":
                stmts = list(args.statement or [])
                if args.sql:
                    stmts.append(args.sql)
                if not stmts:
                    p.error("sql requires --statement (or --sql)")
                from .sources import ddl as snapddl

                snapddl.register_all_tables(spark, args.table)
                outs = []
                for stmt in stmts:
                    rows = snapddl.execute_sql(
                        spark, stmt, warehouse=args.table
                    ).collect()
                    outs.append(
                        {
                            "statement": stmt,
                            "rows": [r.asDict(recursive=True) for r in rows],
                        }
                    )
                print(json.dumps(outs, default=str))
                return 0
            elif args.action == "register-view":
                if not args.name:
                    p.error("register-view requires --name")
                fqn = st.register_snapshot_view(
                    spark,
                    args.table,
                    args.name,
                    version=args.version,
                )
                out = {"view": fqn, "version": args.version}
                if args.sql:
                    rows = spark.sql(args.sql).collect()
                    out["rows"] = [r.asDict(recursive=True) for r in rows]
                print(json.dumps(out, default=str))
                return 0
            elif args.action == "refresh-view":
                picked = [
                    c for c in (args.sum_col, args.minmax_col, args.hll_col)
                    if c
                ]
                if not (args.sink and args.keys and picked):
                    p.error(
                        "refresh-view requires --sink, --keys and one of "
                        "--sum-col / --minmax-col / --hll-col"
                    )
                if len(picked) > 1:
                    p.error(
                        "--sum-col / --minmax-col / --hll-col are mutually "
                        "exclusive; pick one view kind per sink"
                    )
                if args.hll_col:
                    res = st.refresh_hll_view(
                        spark,
                        args.table,
                        args.sink,
                        args.keys.split(","),
                        args.hll_col,
                        app_id=args.app_id,
                    )
                elif args.minmax_col:
                    res = st.refresh_minmax_view(
                        spark,
                        args.table,
                        args.sink,
                        args.keys.split(","),
                        args.minmax_col,
                        app_id=args.app_id,
                    )
                else:
                    res = st.refresh_count_sum_view(
                        spark,
                        args.table,
                        args.sink,
                        args.keys.split(","),
                        args.sum_col,
                        app_id=args.app_id,
                    )
                print(json.dumps(res))
                return 0
            else:  # bloom
                if not args.column:
                    p.error("bloom requires --column")
                v = st.add_bloom_index(spark, args.table, args.column)
            print(json.dumps({"version": v}))
        else:
            from .operators.gold import run_gold

            n = run_gold(
                spark,
                silver_path=f"{args.lake}/{args.silver_prefix}",
                gold_path=f"{args.lake}/{args.gold_prefix}",
                event_date=args.event_date,
                database=args.database,
                table_format=args.table_format,
            )
            print(json.dumps({"rows_written": n}))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
