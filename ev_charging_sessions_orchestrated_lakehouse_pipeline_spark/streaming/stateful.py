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


# ---------------------------------------------------------------------------
# Streaming rolling z-score — the stateful twin of
# operators/analytics.q_rolling_zscore: each event scored against the
# SAME user's trailing window, |z| > threshold emitted as an anomaly,
# with the identical warm-up guard. The interesting part is that the
# batch query's numbers are reproduced BIT-EXACTLY: the batch side
# sums the frame through DECIMAL(25,10)-via-shortest-string
# (functions/oracle.py), and Python's decimal module can replay that
# cast exactly — Spark's double->decimal cast goes through the
# double's shortest decimal representation (BigDecimal.valueOf), which
# is what ``Decimal(repr(v))`` produces — so a streaming deployment
# and a batch backfill of the same detector agree to the last bit
# (pinned in tests/test_streaming.py).
#
# State is a bounded ring of the last ROLLING_Z_PRIOR values per user
# (an array of doubles in the state store — O(window) per key, never
# the event history). Order contract: micro-batches must respect
# per-user event-time order (the file-source replay in the test
# arranges this; a production deployment keys it to a sorted-upstream
# or watermark-reordered feed) — the operator sorts WITHIN each batch
# by (ts, event_id), so only cross-batch order is the caller's job.
# ---------------------------------------------------------------------------
ZSCORE_OUTPUT_SCHEMA = (
    "event_id long, user_id long, value double, n_prior long, z double"
)
ZSCORE_STATE_SCHEMA = "vals array<double>"


def _update_zscore(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from ..operators.analytics import (
        ROLLING_Z,
        ROLLING_Z_MIN_PRIOR,
        ROLLING_Z_PRIOR,
    )

    quantum = Decimal("1e-10")

    def dec(v: float) -> Decimal:
        # Spark's double->DECIMAL(25,10) cast: shortest decimal repr
        # of the double (BigDecimal.valueOf), then HALF_UP at scale 10
        return Decimal(repr(v)).quantize(quantum, ROUND_HALF_UP)

    vals: list[float] = list(state.get[0]) if state.exists else []
    pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out: list[tuple[int, int, float, int, float]] = []
    for row in pdf.itertuples():
        n = len(vals)
        if n >= ROLLING_Z_MIN_PRIOR:
            # exact decimal frame sums, read back through the string
            # round-trip — identical to dsum()'s decimal->varchar->
            # double route, then the batch query's IEEE expression
            s1 = float(str(sum(dec(v) for v in vals)))
            s2 = float(str(sum(dec(v * v) for v in vals)))
            value = float(row.value)
            # A constant window has zero variance (possibly a tiny
            # negative float) — the batch twin's division yields
            # NULL/NaN and the row is filtered, so skip it here
            # rather than kill the streaming query on sqrt/zero-div.
            var = (s2 - s1 * s1 / n) / (n - 1)
            if var > 0.0:
                z = (value - s1 / n) / math.sqrt(var)
                if abs(z) > ROLLING_Z:
                    out.append(
                        (int(row.event_id), int(key[0]), value, n, z)
                    )
        vals.append(float(row.value))
        if len(vals) > ROLLING_Z_PRIOR:
            vals.pop(0)
    state.update((vals,))
    yield pd.DataFrame(
        out, columns=["event_id", "user_id", "value", "n_prior", "z"]
    )


def streaming_zscore(events: DataFrame) -> DataFrame:
    """Streaming per-user rolling z-score anomalies over
    (user_id, ts, event_id, value, ...); emits only flagged events.
    Bit-exact twin of ``q_rolling_zscore`` given in-order replay."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_zscore,
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming peak concurrency — the stateful twin of the batch
# sweep-line (operators/stats.py q_concurrent_peak): the state per
# event_type is just (current concurrency, peak, peak_at) — three
# longs, O(1) regardless of stream length — updated by folding the
# session-boundary deltas in total order. Each micro-batch emits the
# running (peak, peak_at_epoch) so a dashboard always has the
# high-water mark; the final emission equals the batch query exactly.
#
# Order contract (same stance as streaming_zscore): the DELTA feed
# must respect the (t, delta, event_id) total order across
# micro-batches — the operator sorts within each batch; cross-batch
# order is the caller's (in production, a watermark-reordered
# upstream; in tests, a pre-sorted file replay). Deltas, not raw
# sessions, are the stream: an end event becomes visible at
# start + duration, which is exactly what a watermarked session
# tracker emits.
# ---------------------------------------------------------------------------
CONC_OUTPUT_SCHEMA = "event_type string, peak long, peak_at_epoch long"
CONC_STATE_SCHEMA = "conc long, peak long, peak_at long"


def _update_concurrency(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    conc, peak, peak_at = state.get if state.exists else (0, 0, 0)
    pdf = pd.concat(list(pdfs)).sort_values(["t", "delta", "event_id"])
    for row in pdf.itertuples():
        conc += int(row.delta)
        if conc > peak:
            peak, peak_at = conc, int(row.t)
    state.update((conc, peak, peak_at))
    yield pd.DataFrame(
        {"event_type": [key[0]], "peak": [peak], "peak_at_epoch": [peak_at]}
    )


def streaming_concurrent_peak(deltas: DataFrame) -> DataFrame:
    """Running per-type peak concurrency over a session-boundary
    delta stream (event_type, t, delta, event_id); emits the current
    high-water mark each micro-batch. Final emission is the exact
    twin of the batch ``concurrent_peak`` query given in-order
    replay."""
    return deltas.groupBy("event_type").applyInPandasWithState(
        _update_concurrency,
        outputStructType=CONC_OUTPUT_SCHEMA,
        stateStructType=CONC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming time-weighted average — the stateful twin of the batch
# TWAP (operators/stats.py q_time_weighted_avg): state per event_type
# is (last observation, exact running sums) — O(1) regardless of
# stream length. Each arriving observation closes the PREVIOUS one's
# hold interval, exactly like the batch lead() window; the running
# value-time sum accumulates in decimal (stored as a string in state
# so no float error ever compounds), mirroring the batch query's
# per-row DECIMAL(38,10) route bit for bit.
#
# Order contract (same stance as streaming_zscore /
# streaming_concurrent_peak): the feed must respect the
# (t_us, event_id) total order across micro-batches; the operator
# sorts within each batch.
# ---------------------------------------------------------------------------
TWAP_OUTPUT_SCHEMA = (
    "event_type string, n_intervals long, twap double, span_days double"
)
TWAP_STATE_SCHEMA = (
    "last_t long, last_value double, vw string, w long, n long"
)


def _update_twap(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from decimal import ROUND_HALF_UP, Decimal

    quantum = Decimal("1e-10")

    def dec(v: float) -> Decimal:
        # Spark's double -> DECIMAL(38,10) cast: shortest decimal
        # repr (BigDecimal.valueOf), then HALF_UP at scale 10
        return Decimal(repr(v)).quantize(quantum, ROUND_HALF_UP)

    if state.exists:
        last_t, last_value, vw_str, w_sum, n = state.get
        vw = Decimal(vw_str)
        have_prev = True
    else:
        last_t, last_value, vw, w_sum, n = 0, 0.0, Decimal(0), 0, 0
        have_prev = False
    pdf = pd.concat(list(pdfs)).sort_values(["t_us", "event_id"])
    for row in pdf.itertuples():
        t = int(row.t_us)
        if have_prev:
            dt = t - last_t
            # batch twin: (value * CAST(dt AS DOUBLE))::DECIMAL(38,10)
            vw += dec(last_value * float(dt))
            w_sum += dt
            n += 1
        last_t, last_value, have_prev = t, float(row.value), True
    state.update((last_t, last_value, str(vw), w_sum, n))
    if w_sum > 0:
        # decimal -> varchar -> double, the dsum() route
        twap = float(str(vw)) / float(str(w_sum))
        span = float(str(w_sum)) / 86400000000.0
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_intervals": [n],
                "twap": [twap],
                "span_days": [span],
            }
        )
    else:
        yield pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_intervals": pd.Series([], dtype="int64"),
                "twap": pd.Series([], dtype="float64"),
                "span_days": pd.Series([], dtype="float64"),
            }
        )


def streaming_twap(events: DataFrame) -> DataFrame:
    """Running per-type time-weighted average over an observation
    stream (event_type, t_us, event_id, value); emits the current
    TWAP each micro-batch. Final emission is the exact twin of the
    batch ``time_weighted_avg`` query given in-order replay."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_twap,
        outputStructType=TWAP_OUTPUT_SCHEMA,
        stateStructType=TWAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
