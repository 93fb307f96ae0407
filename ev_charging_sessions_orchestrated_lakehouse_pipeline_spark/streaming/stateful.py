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
