"""Bench-floor coverage invariant, mechanically enforced.

BASELINE.md states it: every registry query has a committed min-of-4
floor, and any query addition or rewrite lands with its floor in the
same commit. bench.py's adaptive retiming only works when a floor
exists (no floor -> single extra run instead of targeted re-measure),
so a missing floor quietly degrades the benchmark methodology for
that query. This test turns the invariant from discipline into a
failure: add a query without running
``python bench.py --queries <name> --repeat 4`` and recording the
result in FLOORS.json, and the suite goes red.
"""

from __future__ import annotations

import json
import os

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (
    QUERIES,
)

FLOORS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "FLOORS.json",
)

#: floor line items that are deliberately not registry queries
NON_QUERY_LINE_ITEMS = {"shared_cosupply_edges_build"}


def test_every_registry_query_has_a_committed_floor():
    floors = json.load(open(FLOORS_PATH))["queries"]
    missing = sorted(set(QUERIES) - set(floors))
    assert not missing, (
        f"queries without a committed min-of-4 floor: {missing} — run "
        f"`python bench.py --queries {','.join(missing)} --repeat 4` on an "
        f"idle box and record the minima in {os.path.basename(FLOORS_PATH)}"
    )


def test_no_orphan_floors():
    floors = json.load(open(FLOORS_PATH))["queries"]
    orphans = sorted(set(floors) - set(QUERIES) - NON_QUERY_LINE_ITEMS)
    assert not orphans, (
        f"floors for unregistered queries (renamed or removed without "
        f"cleaning the floor file): {orphans}"
    )


def test_floor_total_is_the_sum_of_line_items():
    doc = json.load(open(FLOORS_PATH))
    assert doc["value"] == round(sum(doc["queries"].values()), 4)
    assert all(v > 0 for v in doc["queries"].values())
