"""Properties of the deterministic sampling/splitting/packing ops
that the oracle hash-compare can't see: stability under physical
layout changes (the reason they exist) and structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.sampling import (
    mixture_keep,
    pack_sequences,
    split_assign,
    stratified_sample_k,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
    read_fixture,
)


def _docs(spark, sf_dir):
    return read_fixture(spark, sf_dir, "documents")


def test_split_is_layout_invariant(spark, sf_dir):
    """The split label of every doc must be identical at 1 partition
    and 13 partitions — randomSplit/sample fail this; hash-assign
    must not."""
    docs = _docs(spark, sf_dir).select("doc_id")
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {
        r.doc_id: r.split
        for r in docs.coalesce(1).select("doc_id", split_assign("doc_id", fr)).collect()
    }
    b = {
        r.doc_id: r.split
        for r in docs.repartition(13)
        .select("doc_id", split_assign("doc_id", fr))
        .collect()
    }
    assert a == b
    # fractions approximately honored (hash uniformity)
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.8 * n < train < 0.97 * n


def test_split_covers_all_rows_disjointly(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    counts = dict(
        docs.select(split_assign("doc_id", fr))
        .groupBy("split")
        .count()
        .collect()
    )
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}


def test_mixture_seed_independent_of_split_seed(spark, sf_dir):
    """Mixture keep-decisions use a different seed than the split, so
    kept rows are not correlated with a particular split bucket."""
    docs = _docs(spark, sf_dir)
    w = {"web": 0.5, "books": 1.0, "code": 0.25}
    kept = docs.filter(mixture_keep("doc_id", "source", w))
    books = kept.filter(F.col("source") == "books").count()
    all_books = docs.filter(F.col("source") == "books").count()
    assert books == all_books  # weight 1.0 keeps everything
    unknown = kept.filter(~F.col("source").isin(*w)).count()
    assert unknown == 0  # unlisted sources dropped


def test_packing_offsets_are_contiguous(spark, sf_dir):
    """Within each source, start_offsets must tile the token stream
    exactly: next.start == prev.start + prev.n_tokens, and chunk_id
    == start // capacity."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    packed = pack_sequences(docs, F.col("n_tokens"), 1024, "source", ["doc_id"])
    rows = packed.orderBy("source", "doc_id").collect()
    by_src: dict[str, int] = {}
    for r in rows:
        expect = by_src.get(r.source, 0)
        assert r.start_offset == expect, (r.source, r.doc_id)
        assert r.chunk_id == r.start_offset // 1024
        by_src[r.source] = expect + r.n_tokens


def test_stratified_sample_size_and_stability(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    s1 = stratified_sample_k(docs, "lang", "doc_id", 10)
    per_lang = dict(s1.groupBy("lang").count().collect())
    totals = dict(docs.groupBy("lang").count().collect())
    for lang, n in per_lang.items():
        assert n == min(10, totals[lang])
    # stable across physical layout
    s2 = stratified_sample_k(docs.repartition(7), "lang", "doc_id", 10)
    assert {tuple(r) for r in s1.collect()} == {tuple(r) for r in s2.collect()}


def test_hash60_native_nonnegative_60bit(spark):
    """hash60(spark_native=True) must stay in [0, 2^60) — the old
    abs(xxhash64) impl returned values up to 2^63 and went NEGATIVE on
    a Long.MIN_VALUE hash, which would put ~1-per-2^64 rows on the
    wrong side of every downstream modulo bucket at 100 TB scale."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.functions.hashing import (
        hash60,
    )
    from pyspark.sql import functions as F

    df = spark.range(20000).select(F.col("id").cast("string").alias("s"))
    stats = df.select(hash60("s", spark_native=True).alias("h")).agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    ).collect()[0]
    assert stats.lo >= 0
    assert stats.hi < 1 << 60
    # xxhash64 is negative for ~half of inputs; 20k rows guarantee the
    # mask handled negative hashes (abs() would have left hi >= 2^60
    # with probability 1 - (1/8)^20000)

    # the mask maps the adversarial Long.MIN_VALUE correctly too
    row = spark.range(1).select(
        F.lit(-(2**63)).cast("long").bitwiseAND(F.lit((1 << 60) - 1)).alias("m")
    ).collect()[0]
    assert row.m == 0
