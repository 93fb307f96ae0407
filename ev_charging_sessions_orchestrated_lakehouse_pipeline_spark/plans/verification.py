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
driver row. It also covers the transitive source of repo-local
helpers the ``q_`` body references (module-level names and
body-local ``from .. import`` bindings that resolve to package
functions or string constants — e.g. ``hash60_sql``,
``NORMALIZE_EXPR``), expanded RECURSIVELY through package functions
up to ``_HELPER_DEPTH`` (4) hops and ``_HELPER_CAP`` (60) fragments:
editing a helper anywhere on such a chain re-queues every query
built on it (round-10 VERDICT's digest blind spot). Whole-MODULE
references (``from ..sources import snaptable as st``) are
deliberately NOT expanded — folding a 4,000-line engine module into
every snapshot query's digest would flood the driver window on any
engine edit; the full local parity suite
(tests/test_oracle_parity.py) still runs every query every time and
covers those edits (and the rare chain deeper than the cap).

The file is regenerated mechanically by
``tools/refresh_verification_state.py`` from CORRECTNESS_r{N}.json +
the git snapshot commit the driver verified — never edited by hand.
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import json
import os
import textwrap
from collections.abc import Callable

STATE_PATH = os.path.join(os.path.dirname(__file__), "verification_state.json")

_PKG_PREFIX = __name__.split(".")[0] + "."


_SRC_CACHE: dict[object, str | None] = {}


def _helper_part(label: str, obj) -> str | None:
    """A digestable fragment for a helper the query body references:
    package-local functions contribute their source (memoized — the
    same few dozen helpers recur across 300 queries), string
    constants (SQL/expr templates) their value. Modules, classes,
    and foreign objects contribute nothing (see module docstring)."""
    if inspect.isfunction(obj) and (
        (getattr(obj, "__module__", "") or "").startswith(_PKG_PREFIX)
    ):
        if obj not in _SRC_CACHE:
            try:
                _SRC_CACHE[obj] = textwrap.dedent(inspect.getsource(obj))
            except (OSError, TypeError):
                _SRC_CACHE[obj] = None
        src = _SRC_CACHE[obj]
        return None if src is None else label + "\x01" + src
    if isinstance(obj, str):
        return label + "\x01" + obj
    return None


# memo keyed by the function OBJECT (module-level functions live for
# the process; a reloaded module produces new objects, so edits can
# never serve stale entries)
_REF_CACHE: dict[object, dict[str, object]] = {}


def _referenced_helpers(fn: Callable) -> dict[str, object]:
    """Helpers a function's body references: every module-level name
    (resolved through ``fn.__globals__``) and every body-local
    ``from X import y`` binding that resolves to a package function
    or string constant. Best-effort — introspection failures degrade
    to the body-only digest, never crash. Memoized per function
    object: 300 queries share a few dozen helpers, and the driver
    recomputes the registry order on every start."""
    hit = _REF_CACHE.get(fn)
    if hit is not None:
        return hit
    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError):
        _REF_CACHE[fn] = {}
        return {}
    g = getattr(fn, "__globals__", {}) or {}
    fn_mod = getattr(fn, "__module__", "") or ""
    out: dict[str, object] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            if node.id in g:
                out.setdefault(node.id, g[node.id])
        elif isinstance(node, ast.ImportFrom):
            try:
                mod = importlib.import_module(
                    "." * node.level + (node.module or ""),
                    package=fn_mod.rsplit(".", 1)[0] if "." in fn_mod else fn_mod,
                )
            except Exception:  # noqa: BLE001 — best-effort resolution
                continue
            if not (getattr(mod, "__name__", "") or "").startswith(_PKG_PREFIX):
                continue
            for alias in node.names:
                obj = getattr(mod, alias.name, None)
                if obj is not None:
                    out.setdefault(alias.asname or alias.name, obj)
    _REF_CACHE[fn] = out
    return out


# expansion bounds: helper graphs inside an operators module are a
# handful of functions; the caps only guard against a pathological
# cycle or an accidental whole-module pull
_HELPER_DEPTH = 4
_HELPER_CAP = 60


def _helper_parts(fn: Callable) -> list[str]:
    """Transitive digest fragments: package functions and string
    constants reachable from the query body through direct name
    references, expanded RECURSIVELY through package functions (e.g.
    ``q_dedup_minhash_signatures`` → ``minhash_signatures_md5`` →
    ``hash60_sql``) so an edit anywhere on the chain re-queues the
    query. Modules are never expanded (see module docstring)."""
    parts: dict[str, str] = {}
    seen: set[int] = {id(fn)}
    frontier: list[tuple[str, Callable]] = [("", fn)]
    for _ in range(_HELPER_DEPTH):
        nxt: list[tuple[str, Callable]] = []
        for _label, f in frontier:
            for name, obj in sorted(
                _referenced_helpers(f).items(), key=lambda kv: kv[0]
            ):
                p = _helper_part(name, obj)
                if p is None:
                    continue
                key = name
                if key in parts and parts[key] != p:
                    # same bare name, DIFFERENT helper (another
                    # module's same-named function/constant reachable
                    # through the expansion): disambiguate so both
                    # contribute — silently dropping the second would
                    # re-open the blind spot for edits to it. Keyed
                    # beyond the name only in this rare case so
                    # collision-free queries keep their digests.
                    if inspect.isfunction(obj):
                        key = (
                            f"{name}\x02{getattr(obj, '__module__', '')}"
                            f".{getattr(obj, '__qualname__', '')}"
                        )
                    else:
                        key = (
                            name
                            + "\x02"
                            + hashlib.sha256(p.encode()).hexdigest()[:8]
                        )
                if key in parts:
                    continue
                parts[key] = p
                if len(parts) >= _HELPER_CAP:
                    return [parts[k] for k in sorted(parts)]
                if inspect.isfunction(obj) and id(obj) not in seen:
                    seen.add(id(obj))
                    nxt.append((name, obj))
        if not nxt:
            break
        frontier = nxt
    return [parts[k] for k in sorted(parts)]


def source_digest(fn: Callable, oracle_sql: str = "") -> str:
    """Digest of a query's observable definition: its function source,
    its DuckDB oracle SQL (empty string for rows-only queries), and
    the source of repo-local helpers reachable from the body
    (recursive through package functions, see :func:`_helper_parts`).
    Any of them changing invalidates prior driver evidence."""
    src = textwrap.dedent(inspect.getsource(fn))
    blob = src + "\x00" + oracle_sql + "\x00" + "\x00".join(_helper_parts(fn))
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


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
