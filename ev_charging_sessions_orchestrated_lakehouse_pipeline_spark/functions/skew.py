"""Skew-mitigation helpers: salted two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) handles skewed
JOINS at runtime; skewed AGGREGATION keys need the salting recipe
when a handful of keys dominate (the classic null-key / hot-tenant /
stop-word problem). ``salted_agg`` spreads each hot key over
``n_salts`` shuffle partitions in a partial-aggregate phase, then
merges the partials — two small shuffles instead of one shuffle with
a straggler task holding the hot key.

Results are EXACTLY equal to the direct ``groupBy().agg()`` for any
decomposable aggregate (count/sum/min/max) — pinned by the
``skew_salted_agg`` query's oracle, which is the plain GROUP BY.

The salt is deterministic (hash of a row-distinguishing column, not
``rand()``) so reruns and retried tasks produce identical
partitioning — required for speculative execution and for exactly
reproducible plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name -> (partial_agg_expr,
    merge_agg_expr over the partial column of the same name), e.g.::

        {"n": (F.count(F.lit(1)), F.sum("n")),
         "total": (F.sum("x"), F.sum("total"))}
    """
    salted = df.withColumn(_SALT, F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof shuffled equi-join by dim replication.

    For the case AQE can't fix and broadcast can't reach: the dim
    side is too large to broadcast, the fact side is skewed on the
    join key, and the join must shuffle (shuffled-hash/sort-merge —
    e.g. under static planning or in Structured Streaming where AQE
    is unavailable). Each dim row is replicated across ``n_salts``
    salt values; fact rows take a deterministic salt from
    ``salt_on`` (a row-distinguishing fact column, same contract as
    :func:`salted_agg`), so a hot key's rows spread over ``n_salts``
    shuffle partitions instead of one straggler task. Join result is
    EXACTLY the plain inner join — the dim side carries every salt
    value, so no pair is lost or duplicated.

    Cost: the dim shuffle volume multiplies by ``n_salts`` — worth
    it only when the hot key dominates task time; keep n_salts small
    (4-16).
    """
    replicated = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    salted_fact = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
    )
    return salted_fact.join(replicated, on=[key, _SALT], how="inner").drop(_SALT)
