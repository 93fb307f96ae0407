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

    args = p.parse_args(argv)

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
