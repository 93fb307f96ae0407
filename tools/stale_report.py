#!/usr/bin/env python3
"""Print the driver-verification window composition for this round:
which queries are stale (never verified / digest changed) and which
verified queries occupy the refresh slots, in exact registry order.

Usage:  python tools/stale_report.py [window_size]

Run before the end of a round to sanity-check that the queries you
expect the driver to verify actually sit inside the window.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (  # noqa: E402
    get_oracles,
    get_queries,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.verification import (  # noqa: E402
    load_state,
    source_digest,
)


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    qs, ors, st = get_queries(), get_oracles(), load_state()
    names = list(qs)
    print(f"{len(names)} registered; window = {window}\n")
    for pos, name in enumerate(names[:window]):
        rec = st.get(name)
        cur = source_digest(qs[name], ors.get(name, ""))
        if rec is None:
            status = "NEW (no record)"
        elif rec.get("mode") == "pending":
            status = f"pending since r{rec['pending_since']}"
        elif rec.get("digest") != cur:
            status = f"STALE (green r{rec['round']}, source changed)"
        else:
            status = f"refresh (green r{rec['round']})"
        print(f"{pos + 1:3d}. {name:36s} {status}")
    n_stale = sum(
        1
        for n in names
        if st.get(n) is None
        or st[n].get("digest") != source_digest(qs[n], ors.get(n, ""))
    )
    print(f"\nstale total: {n_stale}; refresh slots in window: {window - n_stale}")
    outside = [n for n in names[window:]]
    if outside:
        oldest = min(
            (st[n].get("round", 0) for n in outside if n in st and "round" in st[n]),
            default=None,
        )
        age = "n/a" if oldest is None else f"r{oldest}"
        print(f"outside window: {len(outside)} (oldest evidence round: {age})")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. `stale_report.py | head`
        import os
        import sys

        # reopen stdout on devnull so the interpreter's shutdown
        # flush doesn't raise a second time
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
