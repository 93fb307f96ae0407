#!/usr/bin/env python3
"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-count via a
cheap ``count()`` over the result, so sink cost is excluded but full
compute is paid). A warmup run of the flagship query amortizes JVM/
codegen startup out of the per-query numbers.
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="evlake-bench", driver_memory="48g")

    qs = get_queries()

    # warmup: JVM, codegen, parquet footer caches
    qs["pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
