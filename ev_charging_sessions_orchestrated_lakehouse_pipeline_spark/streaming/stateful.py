"""Custom stateful streaming operator via ``applyInPandasWithState``
(the arbitrary-state API — the Spark-idiomatic way to express
operators that windowed aggregation can't, per the build brief).

``stateful_user_totals`` keeps one running (count, sum) per user
across micro-batches: the streaming twin of ``groupBy(user).agg``,
but with explicit state you could extend to custom logic (decay,
per-user quotas, anomaly counters) that has no built-in equivalent.

Scale notes:
- State lives in the state store keyed by user — partitioned by the
  grouping key, so it scales horizontally with shuffle partitions.
- Each micro-batch touches only the keys present in that batch.
- With real event-time bounds you'd add a timeout
  (``GroupStateTimeout.EventTimeTimeout``) so idle users' state is
  evicted; NoTimeout here because the fixture replay is finite.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user totals over a streaming (or batch-replayed)
    events frame with columns (user_id, value, ...)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4.x arbitrary-state API): typed state
# variables (ValueState/ListState/MapState), optional TTL, timers —
# the successor to applyInPandasWithState above. Demonstrated with a
# streaming per-key top-k: bounded ListState (k values per user, not
# the event history), a ValueState event counter, and an
# ORDER-INSENSITIVE result — max-k is a commutative/associative fold,
# so the final answer is independent of how events interleave across
# micro-batches (which is also what makes it honestly testable).
# ---------------------------------------------------------------------------
TOPK_OUTPUT_SCHEMA = "user_id long, top_values array<double>, n_events long"


def make_topk_processor(k: int):
    """Build a StatefulProcessor keeping the k largest ``value``s and
    an event count per grouping key. Imported lazily so the module
    stays importable on Spark versions without the API."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n long")
            self._top = handle.getListState("top", "v double")

        def handleInputRows(self, key, rows, timerValues):
            vals: list[float] = []
            n_new = 0
            for pdf in rows:
                n_new += len(pdf)
                vals.extend(float(v) for v in pdf["value"])
            prev = [t[0] for t in self._top.get()] if self._top.exists() else []
            merged = sorted(prev + vals, reverse=True)[:k]
            n = (self._n.get()[0] if self._n.exists() else 0) + n_new
            self._top.put([(v,) for v in merged])
            self._n.update((n,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "top_values": [merged],
                    "n_events": [n],
                }
            )

        def close(self) -> None:
            pass

    return TopKProcessor()


def streaming_topk_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Streaming per-user top-k values over (user_id, value, ...)
    via ``transformWithStateInPandas``. State is O(k) per key (the
    state store holds the current top-k, never the event history);
    each micro-batch touches only the keys it contains. Emits the
    updated (top_values, n_events) row per key per batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_topk_processor(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
