"""Cross-engine deterministic hashing + tokenization expression macros.

The dedup/text operators need hash functions that produce IDENTICAL
values in Spark and in the DuckDB oracle. Spark's native ``hash``/
``xxhash64`` have no DuckDB twin, so the common primitive is md5
(byte-identical everywhere) reinterpreted as an integer:

    hash60(x)  = first 15 hex chars of md5(x) as a non-negative int64
    Spark:  conv(substring(md5(x), 1, 15), 16, 10) :: long
    DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

15 hex digits = 60 bits < 2^63, so the value is always a valid
positive BIGINT in both engines. Seeded families come from prefixing:
``hash60(concat('s<i>|', x))``.

Scale note: md5 is slower than xxhash64 but still JVM-side codegen
(no Python). Operators that don't need oracle parity (LSH variants)
can pass ``spark_native=True`` to use xxhash64 instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash60(c: Column | str, seed: int | None = None, spark_native: bool = False) -> Column:
    """Deterministic 60-bit non-negative hash of a string column."""
    col = _col(c)
    if seed is not None:
        col = F.concat(F.lit(f"s{seed}|"), col)
    if spark_native:
        # Mask to 60 bits rather than abs(): abs(Long.MIN_VALUE) is
        # Long.MIN_VALUE (two's complement has no positive twin), so
        # abs(xxhash64(..)) goes negative ~once per 2^64 rows and
        # poisons downstream modulo bucketing. The mask is branch-free
        # and keeps the documented [0, 2^60) range.
        return F.xxhash64(col).bitwiseAND(F.lit((1 << 60) - 1))
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB twin of :func:`hash60`."""
    if seed is not None:
        expr = f"('s{seed}|' || {expr})"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization (single-space split — matches DuckDB's
    ``string_split(x, ' ')`` element-for-element, including empties)."""
    return F.split(_col(c), " ")


TOKENS_SQL = "string_split({expr}, ' ')"


def let_sql(binding: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate ``binding`` ONCE per row and expose
    it to ``body`` as the lambda variable ``var``.

    Spark neither CSEs inside higher-order-function lambdas nor keeps
    intermediate columns materialized — CollapseProject inlines a
    ``withColumn`` straight into every use site, so an expression
    referenced per array element re-executes per element (measured
    12x slowdown on shingling at sf0.1, where the inlined
    ``split(text)`` re-tokenized the doc ~130x per row). Wrapping the
    value in a single-element array and binding it as a transform
    lambda variable forces one evaluation: lambda variables hold
    values, not expressions."""
    return f"transform(array({binding}), {var} -> {body})[0]"


def word_shingles_expr(tokens_expr: str, n: int = 3) -> Column:
    """Word n-gram shingles from a token-array SQL expression, joined
    by spaces. Pure array expression — no explode, no shuffle; the
    token array is let-bound (see :func:`let_sql`) so callers can
    pass ``split(text, ' ')`` inline without per-element
    re-tokenization. Empty array when the doc has < n tokens."""
    picks = ", ".join(f"t[i + {k}]" for k in range(n))
    body = (
        f"CASE WHEN size(t) >= {n} THEN "
        f"transform(sequence(0, size(t) - {n}), i -> concat_ws(' ', {picks})) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    return F.expr(let_sql(tokens_expr, "t", body))


def word_shingles_sql(tokens_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`word_shingles_expr` (1-indexed lists)."""
    joined = " || ' ' || ".join(f"({tokens_expr})[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({tokens_expr}) - {n - 1}), "
        f"i -> {joined}) ELSE [] END"
    )
