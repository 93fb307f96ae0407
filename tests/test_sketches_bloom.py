"""Invariants of the bloom semi-join and the count-min sketch beyond
the full value parity the oracle suite already checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators import (
    bloom as B,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators import (
    sketches as S,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
    read_fixture,
)


def _keys(spark, sf_dir):
    return (
        read_fixture(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > B.PRICE_BAR)
        )
        .select("o_orderkey")
    )


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every inserted key must pass the probe — the property that
    makes the bloom stage answer-preserving."""
    keys = _keys(spark, sf_dir)
    bloom = B.bloom_build(keys, "o_orderkey")
    probed = keys.join(F.broadcast(bloom)).select(
        B.bloom_might_contain(F.col("o_orderkey"), F.col("bloom")).alias("hit")
    )
    n_keys = keys.count()
    assert n_keys > 0
    assert probed.filter("hit").count() == n_keys


def test_bloom_prunes_superset_with_low_fp(spark, sf_dir):
    keys = _keys(spark, sf_dir)
    li = read_fixture(spark, sf_dir, "lineitem")
    bloom = B.bloom_build(keys, "o_orderkey")
    cand = li.join(F.broadcast(bloom)).filter(
        B.bloom_might_contain(F.col("l_orderkey"), F.col("bloom"))
    )
    exact = li.join(
        F.broadcast(keys), li.l_orderkey == keys.o_orderkey, "left_semi"
    )
    n_cand, n_exact, n_total = cand.count(), exact.count(), li.count()
    assert n_cand >= n_exact  # superset (no false negatives)
    # fp rate among true negatives stays under the sizing target
    assert (n_cand - n_exact) / max(n_total - n_exact, 1) < 0.01


def test_bloom_bitmap_is_kilobytes(spark, sf_dir):
    keys = _keys(spark, sf_dir)
    row = B.bloom_build(keys, "o_orderkey").collect()[0]
    n_keys = keys.count()
    assert 0 < len(row.bloom) <= min(B.N_HASHES * n_keys, B.M_BITS // 64)


def test_cms_counters_conserve_mass(spark, sf_dir):
    """Each input row increments exactly one bucket per hash row, so
    every row d of the sketch sums to N."""
    ev = read_fixture(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user")
    )
    n = ev.count()
    sketch = S.cms_build(ev, "user")
    sums = {
        r.d: r.s
        for r in sketch.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
    }
    assert set(sums) == set(range(S.CMS_D))
    assert all(v == n for v in sums.values())


def test_cms_is_mergeable(spark, sf_dir):
    """sketch(A union B) == sketch(A) + sketch(B), counter-wise — the
    property that lets 1000 executors sketch independently and merge."""
    ev = read_fixture(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user")
    )
    a = ev.filter(F.crc32(F.col("user")) % 2 == 0)
    b = ev.filter(F.crc32(F.col("user")) % 2 == 1)
    merged = (
        S.cms_build(a, "user")
        .unionAll(S.cms_build(b, "user"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = S.cms_build(ev, "user")
    diff = merged.join(whole, ["d", "bucket"], "full").filter(
        merged["cnt"].eqNullSafe(whole["cnt"]) == False  # noqa: E712
    )
    assert diff.count() == 0


def test_cms_estimates_never_undercount(spark, sf_dir):
    rows = S.q_cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    assert all(r.never_undercounts for r in rows)
    assert all(r.cms_est >= r.exact_cnt for r in rows)
