"""Z-order (Morton) interleaving for multi-dimensional file
clustering.

Sorting a dataset by ``zorder_key(a, b, ...)`` before writing gives
every output file a tight min/max range on ALL the interleaved
columns at once, so Parquet row-group stats (and Delta file stats)
can skip files for predicates on any of them — the same layout
Delta's ``OPTIMIZE ... ZORDER BY`` produces, built here from plain
bit arithmetic so it composes with ``sources.writers.compact_dataset``
(pass ``cluster_by=[zorder_key(...)]``).

The key interleaves the low ``bits`` bits of each column
(bit i of column j lands at position ``i * ncols + j``), after
clamping negatives to 0 — a rank-preserving approximation that is
plenty for file-level clustering. Pure codegen expressions
(shift/and/or), no UDF.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleaved long key over ``cols`` (each clamped to
    [0, 2^bits)). ``bits * len(cols)`` must be <= 63."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"zorder_key: {bits} bits x {n} cols exceeds int64")
    terms: list[Column] = []
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        clamped = F.greatest(
            F.lit(0).cast("long"),
            F.least(col.cast("long"), F.lit((1 << bits) - 1).cast("long")),
        )
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftrightunsigned(clamped, i).bitwiseAND(1), i * n + j)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zkey")


def zorder_key_sql(exprs: list[str], bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` for oracle strings."""
    n = len(exprs)
    terms = []
    for j, e in enumerate(exprs):
        clamped = f"GREATEST(0, LEAST(CAST({e} AS BIGINT), {(1 << bits) - 1}))"
        for i in range(bits):
            terms.append(f"((({clamped} >> {i}) & 1) << {i * n + j})")
    return "(" + " | ".join(terms) + ")"
