"""Broadcast Bloom-filter semi-join pruning — the runtime-filter
pattern made explicit and testable.

At 100 TB the dominant cost of ``big SEMI JOIN small-filtered`` is
shuffling the big side; Spark's own runtime row-group filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects exactly
this shape when statistics allow. This module builds the same
machinery out of public, plannable DataFrame expressions so the
pruning is guaranteed (not statistics-dependent), observable in the
plan, and unit-testable:

1. BUILD (small side): the filtered key set is hashed K ways with
   ``xxhash64(key, seed)``; each hash maps to a bit in an M_BITS
   bitmap stored as a ``map<long, long>`` of 64-bit words
   (``bit_or`` aggregate per word). The whole bitmap is a single row
   of at most M_BITS/64 entries — kilobytes — broadcast to every
   executor.
2. PRUNE (big side): a map-side conjunction of K bit-probes drops
   most non-matching rows BEFORE any exchange. Whole-stage codegen,
   no Python, no shuffle.
3. EXACT RESIDUAL: the surviving candidates flow into the real
   semi-join, which removes bloom false positives. The final answer
   is therefore EXACT — the oracle is the plain semi-join SQL, and
   the bloom stage only changes the plan, never the result (no
   false negatives by construction: every inserted key turns on all
   K of its bits).

Sizing: with n keys, m bits, k hashes the false-positive rate is
``(1 - e^(-kn/m))^k``; M_BITS = 2^18 holds ~20k keys at <1% fp with
K = 3. At larger build sides, scale m linearly (the bitmap stays
map-side-combinable and broadcastable up to hundreds of MB) or use
partition-wise blooms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ORACLE: dict[str, str] = {}

M_BITS = 1 << 18
N_HASHES = 3
#: the build-side predicate: urgent finished orders above a price bar
PRICE_BAR = 150_000.0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, name)


def _positions(key: Column) -> list[tuple[Column, Column]]:
    """K (word-index, bit-mask) pairs for a key."""
    out = []
    for seed in range(N_HASHES):
        pos = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(M_BITS))
        out.append(
            (
                (pos / 64).cast("long"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
                ),
            )
        )
    return out


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """One-row DataFrame ``{bloom: map<long,long>}`` — the bitmap of
    the distinct key set, built with one map-side-combinable
    ``bit_or`` aggregation."""
    pos = _positions(F.col(key_col))
    bits = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(w.alias("word"), m.alias("mask"))
                    for w, m in pos
                ]
            )
        ).alias("p")
    ).select("p.word", "p.mask")
    words = bits.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))
    return words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("word", "bits")))
        ).alias("bloom")
    )


def bloom_might_contain(key: Column, bloom: Column) -> Column:
    """Conjunction of the K bit probes — true for every inserted key,
    true for a false-positive fraction of the rest."""
    cond = F.lit(True)
    for w, m in _positions(key):
        word = F.coalesce(F.element_at(bloom, w), F.lit(0).cast("long"))
        cond = cond & (word.bitwiseAND(m) == m)
    return cond


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of lineitems belonging to urgent, finished, high-value
    orders: bloom-pruned map-side, then exact semi-join (the bloom
    never changes the answer — the oracle is the plain semi-join)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    keys = orders.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > PRICE_BAR)
    ).select("o_orderkey")

    bloom = bloom_build(keys, "o_orderkey")
    candidates = li.join(F.broadcast(bloom)).filter(
        bloom_might_contain(F.col("l_orderkey"), F.col("bloom"))
    )
    matched = candidates.join(
        F.broadcast(keys),
        candidates["l_orderkey"] == keys["o_orderkey"],
        "left_semi",
    )
    from ..functions.oracle import dsum

    return (
        matched.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(
                F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


from ..functions.oracle import dsum_sql  # noqa: E402

ORACLE["bloom_semi_join"] = f"""
SELECT l_returnflag, COUNT(*) AS n_lines,
       {dsum_sql("l_extendedprice * (1.0 - l_discount)")} AS revenue
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
        AND o_totalprice > {PRICE_BAR}
)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""
