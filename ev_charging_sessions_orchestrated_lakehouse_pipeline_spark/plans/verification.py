"""Mechanical driver-verification bookkeeping.

The external correctness harness verifies a bounded prefix of the
query registry each round. Which queries deserve those prefix slots
used to be a hand-maintained demotion list — self-graded coverage
that let a rewritten query coast on stale evidence (round-3 VERDICT
item 2). This module replaces judgment with a committed fact file:

``verification_state.json`` records, per query, the latest round the
driver saw it green and a digest of the query *at that round's
source* (function body + oracle SQL). ``registry._build()`` orders
queries by comparing each query's CURRENT digest against the
recorded one:

* never recorded, or digest mismatch -> "stale" -> registers FIRST
  (gets a driver row this round);
* digest match -> verified at current source -> registers last,
  oldest evidence first (so old rows are refreshed as slots free up).

The digest covers the oracle SQL too, so adding/strengthening an
oracle (e.g. ``approx_distinct`` gaining a bounds oracle after two
rows-only rounds) automatically re-queues the query for a real
driver row. Helper-function edits below the ``q_`` body are the one
blind spot; the full local parity suite (tests/test_oracle_parity.py)
still runs every query every time and covers that.

The file is regenerated mechanically by
``tools/refresh_verification_state.py`` from CORRECTNESS_r{N}.json +
the git snapshot commit the driver verified — never edited by hand.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import textwrap
from collections.abc import Callable

STATE_PATH = os.path.join(os.path.dirname(__file__), "verification_state.json")


def source_digest(fn: Callable, oracle_sql: str = "") -> str:
    """Digest of a query's observable definition: its function source
    plus its DuckDB oracle SQL (empty string for rows-only queries).
    Either side changing invalidates prior driver evidence."""
    src = textwrap.dedent(inspect.getsource(fn))
    return hashlib.sha256((src + "\x00" + oracle_sql).encode()).hexdigest()[:16]


def load_state() -> dict[str, dict]:
    """{query: {"round": int, "digest": str, "mode": "oracled"|"rows_only"}}
    for driver-verified queries, or {"pending_since": int, "mode":
    "pending"} for queries that existed in some round's registry
    without earning a green row. Missing file -> empty (every query
    counts as never-verified)."""
    try:
        with open(STATE_PATH, encoding="utf-8") as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


# Sentinel for queries with no state record at all: they were added
# after the last recorded round, i.e. they are the NEWEST waiters and
# must not jump ahead of queries that have already waited a round+.
_NEVER_SEEN = 1 << 30


def verification_order(
    queries: dict[str, Callable],
    oracles: dict[str, str],
    state: dict[str, dict] | None = None,
) -> list[str]:
    """Registry order derived purely from the committed state file.

    Prefix = stale-or-never-verified, AGE-WEIGHTED: sorted by how
    long the query has been waiting (earliest pending/verified round
    first), so a query can never starve behind alphabetically-earlier
    newcomers the way `unpivot_measures`/`value_outliers` waited two
    rounds behind round-4's surface additions (round-4 VERDICT item
    3). Within the same waiting age, oracled queries come first — a
    full value-hash row beats a rows-only row — then name for
    determinism. Suffix = verified-at-current-source, oldest round
    first so long-unrefreshed evidence rotates back into the window
    before recent evidence does.

    ``state`` defaults to the committed file; tests inject synthetic
    states to pin the starvation-resistance property.
    """
    if state is None:
        state = load_state()

    def key(name: str):
        rec = state.get(name)
        cur = source_digest(queries[name], oracles.get(name, ""))
        if rec is not None and rec.get("digest") == cur:
            return (1, 0, rec.get("round", 0), name)
        if rec is None:
            waiting_since = _NEVER_SEEN
        else:
            # pending record -> round it first appeared unverified;
            # stale green record -> round of the now-invalid evidence.
            waiting_since = rec.get("pending_since", rec.get("round", _NEVER_SEEN))
        return (0, waiting_since, 0 if name in oracles else 1, name)

    return sorted(queries, key=key)
