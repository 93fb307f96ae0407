"""Structured Streaming surface (SURVEY.md §7.2 step 7 stretch goal).

The reference is batch-only; its incremental unit is the partition
re-run (§2.7). This package adds the streaming twin: file-source
ingest through the SAME silver transform/quality chain via
``foreachBatch``, and watermarked windowed aggregation for the
events stream.
"""

from .cdf_source import (
    SnapshotStreamDataSource,
    read_snapshot_stream,
    register_snapshot_stream,
    write_snapshot_stream,
)
from .ingest import (
    cdc_merge_stream,
    cdc_scd2_stream,
    corpus_prep_stream,
    dedup_stream,
    gold_stream,
    gold_stream_snapshot,
    silver_stream,
    silver_stream_snapshot,
    stream_stream_attribution,
    session_windows,
    windowed_event_counts,
)
from .stateful import (
    stateful_user_totals,
    streaming_concurrent_peak,
    streaming_twap,
    streaming_topk_per_user,
    streaming_zscore,
)

__all__ = [
    "cdc_merge_stream",
    "cdc_scd2_stream",
    "SnapshotStreamDataSource",
    "read_snapshot_stream",
    "register_snapshot_stream",
    "write_snapshot_stream",
    "stream_stream_attribution",
    "corpus_prep_stream",
    "dedup_stream",
    "gold_stream",
    "gold_stream_snapshot",
    "silver_stream",
    "silver_stream_snapshot",
    "windowed_event_counts",
    "session_windows",
    "stateful_user_totals",
    "streaming_concurrent_peak",
    "streaming_twap",
    "streaming_topk_per_user",
    "streaming_zscore",
]
