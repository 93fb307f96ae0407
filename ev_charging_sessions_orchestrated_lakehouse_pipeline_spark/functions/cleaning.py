"""Cleaning expression macros (reference F1-F12, SURVEY.md §2.3).

These are Python functions returning Columns — expression macros, not
UDFs (the reference's deliberate pattern,
jobs/ev_sessions_silver_etl_clean.py:83-87). Zero serialization cost;
everything stays inside WholeStageCodegen.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def fix_year(col: Column | str, precise: bool = False) -> Column:
    """Repair two-zero-prefixed years: ``"0015-03-01 10:22:33"`` ->
    ``"2015-03-01 10:22"`` (reference F2/F3,
    jobs/ev_sessions_silver_etl_clean.py:83-87).

    The reference takes ``substring(col, 3, 14)`` — 14 chars from
    position 3 of a 19-char ``yyyy-MM-dd HH:mm:ss`` — which drops the
    seconds; repaired timestamps are minute-granular. ``precise=True``
    keeps the seconds (``substring(col, 3, 17)``) for callers that
    don't need golden parity with the reference.
    """
    c = F.col(col) if isinstance(col, str) else col
    width = 17 if precise else 14
    return F.when(
        F.substring(c, 1, 2) == "00", F.concat(F.lit("20"), F.substring(c, 3, width))
    ).otherwise(c)


def decode_map(
    col: Column | str, mapping: Mapping[object, str], passthrough: bool = True
) -> Column:
    """Literal-map categorical decode (reference F8,
    jobs/ev_sessions_silver_etl_clean.py:98-128): build
    ``F.create_map`` from the literal pairs and index it with the
    column. Unmapped values pass through unchanged when
    ``passthrough`` (the reference's ``otherwise`` branch), else null.

    Scale note: a literal map is evaluated per-row inside codegen — no
    join, no shuffle; for large dimension tables use a broadcast join
    instead (operators/analytics.py shows that pattern).
    """
    c = F.col(col) if isinstance(col, str) else col
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*pairs)
    decoded = m[c]
    if passthrough:
        return F.when(decoded.isNotNull(), decoded).otherwise(c)
    return decoded


def safe_div(num: Column | str, den: Column | str) -> Column:
    """Guarded division (reference F7,
    jobs/ev_sessions_gold_etl.py:113-117): null when the denominator
    is not strictly positive."""
    n = F.col(num) if isinstance(num, str) else num
    d = F.col(den) if isinstance(den, str) else den
    return F.when(d > 0, n / d).otherwise(F.lit(None))
