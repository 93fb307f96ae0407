#!/usr/bin/env python3
"""Regenerate plans/verification_state.json mechanically.

For each (round, snapshot-commit, CORRECTNESS_r{N}.json) triple, this
script checks out the snapshot into a temporary git worktree, imports
THAT commit's registry in a subprocess, computes every query's digest
(function source + oracle SQL — the same definition as
plans/verification.py:source_digest), and merges the round's green
rows into the state file. Later rounds override earlier ones, so each
query's record is its latest driver-green evidence and the digest of
the code that evidence applies to.

Usage (run after each round once CORRECTNESS_r{N}.json lands):

    python tools/refresh_verification_state.py 4 CORRECTNESS_r04.json <commit>

or rebuild from scratch with the built-in round->commit table:

    python tools/refresh_verification_state.py --rebuild

"Green" means: full match (rows+schema+hash all true, no err) ->
mode "oracled"; or err == "no_oracle" with a recorded row count ->
mode "rows_only" (the driver's weaker check for non-SQL ops). Rows
with any real mismatch or error are NOT recorded, so a failing query
stays at the front of the verification order until it passes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "ev_charging_sessions_orchestrated_lakehouse_pipeline_spark"
STATE = os.path.join(REPO, PKG, "plans", "verification_state.json")

# Snapshot commit the driver verified each round (end-of-round state).
ROUND_COMMITS = {
    1: "f1f194b",
    2: "8f3afb2",
    3: "6c379b6",
    4: "565e982",
    5: "19bb0ad",
}

# Registry renames: old name -> new name. Applied after all rounds
# merge, so green evidence earned under the old name carries over
# (its digest won't match the renamed source, keeping it correctly
# stale until re-verified) and the orphaned record disappears.
RENAMES = {
    # round 5: the fully-oracled md5 LSH twin became the canonical
    # registry entry; the xxhash64 scale path left the registry.
    "dedup_minhash_lsh_md5": "dedup_minhash_lsh",
}

# Runs inside a worktree subprocess; must be self-contained and use
# the exact digest definition from plans/verification.py.
_DIGEST_SNIPPET = r"""
import sys, json, inspect, hashlib, textwrap
sys.path.insert(0, sys.argv[1])
from {pkg}.plans.registry import get_queries, get_oracles
qs, ors = get_queries(), get_oracles()
try:
    # Use the snapshot commit's OWN digest definition (it gained
    # transitive-helper coverage in round 11); falling back to the
    # body+oracle form only for pre-r11 snapshots that predate it.
    from {pkg}.plans.verification import source_digest
    out = {{n: source_digest(fn, ors.get(n, "")) for n, fn in qs.items()}}
except ImportError:
    out = {{}}
    for name, fn in qs.items():
        src = textwrap.dedent(inspect.getsource(fn))
        out[name] = hashlib.sha256(
            (src + "\x00" + ors.get(name, "")).encode()
        ).hexdigest()[:16]
print(json.dumps(out))
""".format(pkg=PKG)


def digests_at(commit: str) -> dict[str, str]:
    with tempfile.TemporaryDirectory() as tmp:
        wt = os.path.join(tmp, "wt")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, commit],
            cwd=REPO, check=True, capture_output=True,
        )
        try:
            out = subprocess.run(
                [sys.executable, "-c", _DIGEST_SNIPPET, wt],
                check=True, capture_output=True, text=True,
            )
            return json.loads(out.stdout)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, check=True, capture_output=True,
            )


def merge_round(state: dict, round_n: int, correctness_path: str,
                commit: str) -> None:
    digests = digests_at(commit)
    with open(correctness_path, encoding="utf-8") as f:
        rows = json.load(f)
    for name, row in rows.items():
        if name not in digests:
            continue
        if (row.get("rows_match") and row.get("schema_match")
                and row.get("hash_match") and row.get("err") is None):
            mode = "oracled"
        elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
            mode = "rows_only"
        else:
            continue
        state[name] = {"round": round_n, "digest": digests[name], "mode": mode}
    # Queries that existed in this round's registry but have no record
    # yet (green or pending) start their waiting clock here — the
    # age-weighted ordering (plans/verification.py) uses pending_since
    # so long-waiting queries outrank alphabetically-earlier newcomers.
    for name in digests:
        if name not in state:
            state[name] = {"pending_since": round_n, "mode": "pending"}


def main() -> None:
    if "--rebuild" in sys.argv:
        state: dict = {}
        for r, commit in sorted(ROUND_COMMITS.items()):
            path = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
            print(f"round {r} @ {commit} ...", file=sys.stderr)
            merge_round(state, r, path, commit)
    else:
        round_n = int(sys.argv[1])
        path = sys.argv[2]
        commit = sys.argv[3] if len(sys.argv) > 3 else "HEAD"
        try:
            with open(STATE, encoding="utf-8") as f:
                state = json.load(f)
        except OSError:
            state = {}
        merge_round(state, round_n, path, commit)
    for old, new in RENAMES.items():
        if old not in state:
            continue
        moved = state.pop(old)
        # Never clobber fresher evidence earned under the NEW name:
        # after the rename round merges, the new name has its own
        # (higher-round) record and the orphaned old one must lose.
        if new not in state or state[new].get(
            "round", state[new].get("pending_since", -1)
        ) < moved.get("round", moved.get("pending_since", -1)):
            state[new] = moved
    with open(STATE, "w", encoding="utf-8") as f:
        json.dump(dict(sorted(state.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {STATE}: {len(state)} records", file=sys.stderr)


if __name__ == "__main__":
    main()
