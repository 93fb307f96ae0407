#!/usr/bin/env python3
"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (canonical since round 3 — BASELINE.md records numbers
from this exact loop):
- Each query is timed end-to-end with a ``noop``-format write, which
  materializes EVERY output column.  A bare ``count()`` lets Catalyst
  prune the projection list, so expression-heavy queries (hashing,
  HOF pipelines) would be under-timed.
- ``spark.catalog.clearCache()`` runs between queries so one query's
  persist (e.g. the LSH shingle cache) can never subsidize or crowd
  out another — every number is a cold-cache, independent measurement.
- A warmup run of the flagship query amortizes JVM/codegen startup
  out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (
    get_queries,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.session import get_spark


def run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    spark.catalog.clearCache()
    return elapsed


def main() -> None:
    import argparse

    # Optional local-iteration flags; the driver invokes with no args
    # and gets the canonical single-pass-over-everything behavior.
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--queries",
        help="comma-separated subset of query names to time",
    )
    ap.add_argument(
        "--repeat",
        type=int,
        default=1,
        help="time each query N times and report the MIN — the box's "
        "periodic external harness can inflate a single pass up to "
        "25x, so minima are the reproducible floor",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="evlake-bench", driver_memory="48g")

    qs = get_queries()
    if args.queries:
        wanted = args.queries.split(",")
        unknown = [w for w in wanted if w not in qs]
        assert not unknown, f"unknown queries: {unknown}"
        qs = {k: qs[k] for k in wanted}

    # warmup: JVM, codegen, parquet footer caches
    run_query(spark, get_queries()["pricing_summary"], sf_dir)

    timings: dict[str, float] = {}
    for name in sorted(qs):
        timings[name] = round(
            min(run_query(spark, qs[name], sf_dir) for _ in range(args.repeat)),
            4,
        )

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    # The driver captures a bounded tail of stdout, which truncated
    # the head of the (alphabetically sorted) per-query dict in
    # BENCH_r03. Persist the complete payload to a file as well so
    # round-over-round comparisons always see all queries.
    if not args.queries:  # subset runs must not clobber the artifact
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
        )
        with open(full_path, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
