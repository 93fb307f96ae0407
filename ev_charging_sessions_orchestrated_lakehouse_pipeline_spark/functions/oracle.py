"""Deterministic (oracle-stable) aggregate expressions.

Floating-point SUM/AVG over a distributed dataset is
order-dependent: Spark accumulates per partition then merges, DuckDB
accumulates in its own order, so the low bits of a 600k-row double
sum differ run to run and engine to engine. To make results
hash-comparable (and honestly deterministic at any cluster size), the
engine's aggregate surface routes double sums through
``DECIMAL(25,10)``: the per-row cast is order-independent, decimal
addition is exact, and the final cast back to double is a pure
function of the exact total.

The final decimal->double conversion goes through a string
(``dec -> varchar -> double``) rather than a direct cast: DuckDB's
wide-decimal (int128) -> double cast double-rounds (int128->double,
then /10^scale) and can be 1 ULP off Spark's correctly-rounded
BigDecimal.doubleValue(), while string->double parsing is correctly
rounded in both engines (verified bit-identical on the fixtures).
Decimal narrowing is no alternative — DuckDB truncates when reducing
decimal scale, Spark rounds HALF_UP.

The DuckDB-side twin of ``dsum(c)`` is
``CAST(CAST(SUM(CAST(c AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)``
and of ``davg(c)`` is ``<dsum(c)> / COUNT(c)``.

Cost note: decimal aggregation is a few times slower than double
aggregation in the hot loop, but it stays inside WholeStageCodegen
and is map-side combinable, so it does not change the shuffle shape.
Callers that prefer raw-double speed over reproducibility can pass
plain ``F.sum``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,10)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(_col(c).cast(DEC)).cast("string").cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent mean of a double column, returned as double.

    Exact decimal sum divided (in IEEE double) by the non-null count —
    both operands deterministic, so the quotient is too.
    """
    col = _col(c)
    return F.sum(col.cast(DEC)).cast("string").cast("double") / F.count(col)


def dsum_sql(expr: str) -> str:
    """DuckDB twin of ``dsum`` for oracle strings."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB twin of ``davg``."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def dsum_spark_sql(expr: str) -> str:
    """Spark-SQL-string twin of ``dsum`` for ``spark.sql`` queries."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,10))) AS STRING) AS DOUBLE)"
