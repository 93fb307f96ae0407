#!/usr/bin/env python3
"""Dump .explain('formatted') for named registered queries to
plans/<dir>/<query>_<tag>.txt — the before/after evidence files the
optimization rounds commit (see OPTIMIZATION_r*.md)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (
    get_queries,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.session import get_spark


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--tag", required=True, help="before | after")
    ap.add_argument("--outdir", default="plans/r15")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    spark = get_spark(app_name="evlake-plandump")
    qs = get_queries()
    for name in args.queries.split(","):
        fn = qs[name]
        df = fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {path} (Exchange x{n_ex})")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
