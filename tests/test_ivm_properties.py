"""Property-based tests (hypothesis) for incremental view
maintenance and the binary deletion-vector codec.

maintain_minmax's contract is maintenance == recompute on EVERY
churn shape; the handcrafted edge tests pin the known-tricky paths
(duplicate extremes, insert+delete in one window), this sweep
searches for shapes nobody thought of. The DV codec's contract is a
lossless round-trip for any sorted position set.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hs
from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources import (
    snaptable as st,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# (group 0-2, value drawn from a tiny grid so duplicate extremes and
# exact collisions between base / insert / delete values are LIKELY)
_ROW = hs.tuples(hs.integers(0, 2), hs.sampled_from([1.0, 2.0, 5.0, 9.0]))
_BASE = hs.lists(_ROW, min_size=1, max_size=8)
_INSERTS = hs.lists(_ROW, min_size=0, max_size=5)
# delete predicate: drop rows with value >= threshold in one group,
# the shape that removes extremes (sometimes all rows of a group)
_DEL = hs.tuples(hs.integers(0, 2), hs.sampled_from([1.0, 5.0, 9.0, 99.0]))


@given(base=_BASE, inserts=_INSERTS, dele=_DEL)
@_SETTINGS
def test_maintain_minmax_equals_recompute(spark, tmp_path_factory, base, inserts, dele):
    tmp = tmp_path_factory.mktemp("mmprop")
    t = str(tmp / "t")

    def frame(rows):
        return spark.createDataFrame(
            [(i, g, v) for i, (g, v) in enumerate(rows)],
            "id int, g int, v double",
        ).coalesce(1)

    st.create_table(frame(base), t, [])
    base_agg = (
        st.read_snapshot(spark, t, version=1)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
    )
    g_del, thr = dele
    st.delete_where(spark, t, [("g", "=", g_del), ("v", ">=", thr)])
    if inserts:
        st.append(frame(inserts), t)
    got = {
        r.g: (r.n, r.mn, r.mx)
        for r in st.maintain_minmax(
            spark, t, base_agg, ["g"], "v", from_version=1
        ).collect()
    }
    want = {
        r.g: (r.n, r.mn, r.mx)
        for r in st.read_snapshot(spark, t)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


@given(
    positions=hs.lists(
        hs.integers(0, 10**7), min_size=1, max_size=400, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_dv_binary_codec_roundtrip(positions):
    assert st._decode_dv_binary(st._encode_dv_binary(positions)) == sorted(
        positions
    )


# same churn grammar as minmax, but the tracked aggregate is the HLL
# register sketch: tiny key grid so register collisions, duplicate
# witnesses, and base/insert/delete overlaps are LIKELY
_HROW = hs.tuples(hs.integers(0, 2), hs.sampled_from(["a", "b", "c", "d", "e", None]))
_HBASE = hs.lists(_HROW, min_size=1, max_size=8)
_HINSERTS = hs.lists(_HROW, min_size=0, max_size=5)
_HDEL = hs.tuples(hs.integers(0, 2), hs.sampled_from(["a", "c", "e", "zz"]))
# None keys ride along: hll_regs must EXCLUDE them (count-distinct
# semantics) on both the maintained and recomputed sides


@given(base=_HBASE, inserts=_HINSERTS, dele=_HDEL)
@_SETTINGS
def test_maintain_hll_equals_recompute(
    spark, tmp_path_factory, base, inserts, dele
):
    """maintain_hll == hll_regs recompute on every churn shape —
    register sets compared EXACTLY (sparse (g, idx, r) tuples), the
    same bit-equality contract as minmax. Deletes drop every row of
    one group at-or-above a key threshold, the shape that removes
    register witnesses (sometimes the whole group)."""
    tmp = tmp_path_factory.mktemp("hllprop")
    t = str(tmp / "t")

    def frame(rows):
        return spark.createDataFrame(
            [(i, g, k) for i, (g, k) in enumerate(rows)],
            "id int, g int, k string",
        ).coalesce(1)

    st.create_table(frame(base), t, [])
    base_regs = st.hll_regs(st.read_snapshot(spark, t, version=1), ["g"], "k")
    g_del, kthr = dele
    st.delete_where(spark, t, [("g", "=", g_del), ("k", ">=", kthr)])
    if inserts:
        st.append(frame(inserts), t)
    got = sorted(
        (r.g, r.idx, r.r)
        for r in st.maintain_hll(
            spark, t, base_regs, ["g"], "k", from_version=1
        ).collect()
    )
    want = sorted(
        (r.g, r.idx, r.r)
        for r in st.hll_regs(st.read_snapshot(spark, t), ["g"], "k").collect()
    )
    assert got == want
