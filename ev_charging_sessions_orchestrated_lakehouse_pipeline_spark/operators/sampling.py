"""Deterministic sampling / splitting / packing for training-data
pipelines.

A 100 TB pretraining corpus needs reproducible answers to four
questions — which rows are train/val/test, how much of each source
goes into the mix, how documents pack into fixed-size context
windows, and what a fixed-size per-stratum sample looks like. All
four are implemented here as pure expression-level operators on top
of the cross-engine ``hash60`` (functions/hashing.py), so every
decision is a deterministic function of the row key: re-running the
pipeline, adding executors, or changing partition counts never moves
a document between splits.

Scale properties:
- ``split_assign`` and ``mixture_sample`` are map-side only (a hash
  and a comparison per row — no shuffle, no state, no sampling RNG
  whose draw order depends on partitioning, which is exactly the flaw
  of ``df.sample``/``randomSplit`` for reproducible corpus curation).
- ``pack_sequences`` is the concat-then-chunk packing used by LLM
  pretraining loaders: one window cumsum per source partition (one
  shuffle on the partition column; at scale each source streams
  independently).
- ``stratified_sample_k`` is one window rank per stratum (one
  shuffle on the stratum key), deterministic because the order is a
  hash, not an RNG.

The reference pipeline has no sampling surface (SURVEY.md §2 —
batch-ETL only); these operators are part of the LLM-pipeline
extension tier (BASELINE.json north star), same as dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql

ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Library surface
# ---------------------------------------------------------------------------
def split_assign(
    key: Column | str,
    fractions: dict[str, float],
    seed: int = 0,
    buckets: int = 10_000,
) -> Column:
    """Split-label expression: assigns each row to a named split with
    probability ``fractions[name]``, deterministically by key hash.

    ``hash60(key, seed) % buckets`` is uniform over [0, buckets); the
    cumulative fraction boundaries carve it into contiguous ranges.
    Changing ``seed`` re-rolls the assignment; changing nothing keeps
    every row in its split forever (the property that keeps eval sets
    uncontaminated across pipeline re-runs).
    """
    bucket = hash60(_as_str(key), seed=seed) % buckets
    acc = 0.0
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    return (F.lit(last) if expr is None else expr.otherwise(last)).alias("split")


def split_assign_sql(
    key_expr: str,
    fractions: dict[str, float],
    seed: int = 0,
    buckets: int = 10_000,
) -> str:
    """DuckDB twin of :func:`split_assign`."""
    bucket = f"({hash60_sql(key_expr, seed=seed)} % {buckets})"
    acc = 0.0
    cases = []
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cases.append(f"WHEN {bucket} < {int(round(acc * buckets))} THEN '{name}'")
    if not cases:
        return f"'{names[-1]}'"
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


def mixture_keep(
    key: Column | str,
    source: Column | str,
    weights: dict[str, float],
    seed: int = 1,
    buckets: int = 10_000,
) -> Column:
    """Boolean keep-expression for weighted dataset mixing: a row from
    source ``s`` survives with probability ``weights[s]`` (sources
    absent from ``weights`` are dropped). Deterministic per key, so
    the mixture is stable across runs and cluster layouts."""
    bucket = hash60(_as_str(key), seed=seed) % buckets
    src = F.col(source) if isinstance(source, str) else source
    expr = F.lit(False)
    for name, w in weights.items():
        expr = F.when(src == name, bucket < int(round(w * buckets))).otherwise(expr)
    return expr


def mixture_keep_sql(
    key_expr: str,
    source_expr: str,
    weights: dict[str, float],
    seed: int = 1,
    buckets: int = 10_000,
) -> str:
    """DuckDB twin of :func:`mixture_keep`."""
    bucket = f"({hash60_sql(key_expr, seed=seed)} % {buckets})"
    cases = " ".join(
        f"WHEN {source_expr} = '{name}' THEN {bucket} < {int(round(w * buckets))}"
        for name, w in weights.items()
    )
    return f"CASE {cases} ELSE FALSE END"


def pack_sequences(
    df: DataFrame,
    token_col: Column,
    capacity: int,
    part_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Concat-then-chunk sequence packing (the standard pretraining
    loader layout): per ``part_col`` stream, documents are laid out in
    ``order_cols`` order into one contiguous token stream, and each
    document is assigned to the ``capacity``-sized chunk where it
    STARTS. Adds ``start_offset`` and ``chunk_id``.

    One window cumsum per partition — a single shuffle on
    ``part_col``; no Python, no state. (True first-fit bin packing is
    inherently sequential per bin; concat-then-chunk is what training
    loaders actually do, and it wastes no tokens.)"""
    w = W.partitionBy(part_col).orderBy(*order_cols)
    start = (F.sum(token_col).over(w) - token_col).alias("start_offset")
    out = df.withColumn("start_offset", start)
    return out.withColumn(
        "chunk_id", (F.col("start_offset") / capacity).cast("long")
    )


def stratified_sample_k(
    df: DataFrame,
    stratum: str,
    key: Column | str,
    k: int,
    seed: int = 2,
) -> DataFrame:
    """Deterministic fixed-size sample: the ``k`` rows with the
    smallest key-hash per stratum. Hash order is uniform, so this is
    a uniform without-replacement sample that is stable across runs —
    unlike ``sampleBy`` whose output depends on row order. Ties are
    impossible while keys are unique (60-bit hash, collision odds
    ~n²/2⁶¹)."""
    h = hash60(_as_str(key), seed=seed)
    w = W.partitionBy(stratum).orderBy(h.asc())
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def _as_str(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("string")


# ---------------------------------------------------------------------------
# Registered queries over the documents fixture
# ---------------------------------------------------------------------------
def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, "documents")


_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}
# Mixture weights over the fixture's actual sources (src0..src19),
# cycling through four sampling rates so the mixture both keeps and
# drops real rows. (The first cut used {"web","books","code"} — names
# absent from the fixture — which made every mixture query vacuously
# keep ZERO rows while still hash-matching its equally-vacuous
# oracle. Weights must bite to test anything.)
_WEIGHTS = {f"src{i}": (1.0, 0.75, 0.5, 0.25)[i % 4] for i in range(20)}


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split document and char counts for a 90/5/5 split."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            split_assign("doc_id", _FRACTIONS),
            F.col("n_chars"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


ORACLE["train_split"] = f"""
SELECT {split_assign_sql('doc_id', _FRACTIONS)} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY split
ORDER BY split
"""


def q_dataset_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source kept/total counts under a weighted mixture policy."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            "source",
            mixture_keep("doc_id", "source", _WEIGHTS).alias("keep"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .orderBy("source")
    )


ORACLE["dataset_mixture"] = f"""
SELECT source,
       COUNT(*) AS n_total,
       CAST(SUM(CAST({mixture_keep_sql('doc_id', 'source', _WEIGHTS)} AS BIGINT))
            AS BIGINT) AS n_kept
FROM documents
GROUP BY source
ORDER BY source
"""


_CAPACITY = 1024


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-layout summary: per source, how many 1024-token context
    windows the corpus packs into, and the document count."""
    docs = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(F.col("text"), " "))
    packed = pack_sequences(
        docs.select("doc_id", "source", n_tokens.alias("n_tokens")),
        F.col("n_tokens"),
        _CAPACITY,
        "source",
        ["doc_id"],
    )
    return (
        packed.groupBy("source")
        .agg(
            F.countDistinct("chunk_id").alias("n_chunks"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )


ORACLE["sequence_packing"] = f"""
WITH toks AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
), laid AS (
  SELECT source,
         CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
               - n_tokens) // {_CAPACITY} AS BIGINT) AS chunk_id,
         n_tokens
  FROM toks
)
SELECT source,
       COUNT(DISTINCT chunk_id) AS n_chunks,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM laid
GROUP BY source
ORDER BY source
"""


_SAMPLE_K = 25


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic 25-doc-per-language sample (doc ids)."""
    docs = _docs(spark, sf_dir)
    return (
        stratified_sample_k(
            docs.select("doc_id", "lang"), "lang", "doc_id", _SAMPLE_K
        )
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


ORACLE["stratified_sample"] = f"""
SELECT lang, doc_id
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {hash60_sql("CAST(doc_id AS VARCHAR)", seed=2)}
         ) AS rk
  FROM documents
)
WHERE rk <= {_SAMPLE_K}
ORDER BY lang, doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic training order — the corpus "shuffle" a training run
# needs: an ordering that is uniform-random-like but a pure function
# of the key (re-runs, resumes, and re-partitions see the SAME order;
# df.orderBy(rand()) cannot promise that). At 100 TB the order is
# materialized by repartitionByRange(hash) + sortWithinPartitions —
# globally ordered files, no single-point sort; the query surfaces
# the head of that order via TakeOrderedAndProject (per-partition
# heaps, no full sort).
# ---------------------------------------------------------------------------
_ORDER_N = 200


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            "doc_id", hash60(_as_str("doc_id"), seed=3).alias("order_key")
        )
        .orderBy("order_key", "doc_id")
        .limit(_ORDER_N)
    )


ORACLE["training_order"] = f"""
SELECT doc_id, {hash60_sql("CAST(doc_id AS VARCHAR)", seed=3)} AS order_key
FROM documents
ORDER BY order_key, doc_id
LIMIT {_ORDER_N}
"""


# ---------------------------------------------------------------------------
# Temperature-based mixture planning: the multilingual/multi-source
# sampling recipe — target share ∝ tokens^(1/τ) with τ=2 (sqrt)
# flattens the natural distribution so small sources aren't drowned.
# epochs_needed = target_share / natural_share is how many passes
# over a source one training run makes under the reweighted mixture.
# Engine parity: the sqrt weights are floored to integer milli-units
# before summing (IEEE sqrt is correctly rounded -> identical
# doubles; integer sums are order-independent), the shares divide
# those exact integers.
# ---------------------------------------------------------------------------
def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    per_source = docs.groupBy("source").agg(
        F.sum(F.expr("size(split(text, ' '))")).alias("n_tokens")
    )
    w = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000).cast("long")
    weighted = per_source.select("source", "n_tokens", w.alias("w_e3"))
    totals = weighted.agg(
        F.sum("n_tokens").alias("total_tokens"), F.sum("w_e3").alias("total_w")
    )
    nat = F.col("n_tokens").cast("double") / F.col("total_tokens")
    tgt = F.col("w_e3").cast("double") / F.col("total_w")
    return (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            nat.alias("natural_share"),
            tgt.alias("target_share"),
            (tgt / nat).alias("epochs_needed"),
        )
        .orderBy("source")
    )


ORACLE["mixture_epochs"] = """
WITH per_source AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), weighted AS (
  SELECT source, n_tokens,
         CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT) AS w_e3
  FROM per_source
), totals AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(w_e3) AS BIGINT) AS total_w
  FROM weighted
)
SELECT source, n_tokens,
       CAST(n_tokens AS DOUBLE) / total_tokens AS natural_share,
       CAST(w_e3 AS DOUBLE) / total_w AS target_share,
       (CAST(w_e3 AS DOUBLE) / total_w)
         / (CAST(n_tokens AS DOUBLE) / total_tokens) AS epochs_needed
FROM weighted, totals
ORDER BY source
"""


def temperature_rates(
    counts: DataFrame, source_col: str = "source", n_col: str = "n_s"
) -> DataFrame:
    """Per-source keep-rates for temperature-scaled mixing at
    alpha = 0.5: sample source ``s`` at rate
    ``sqrt(min_n / n_s)`` so post-sampling shares follow
    ``n_s^alpha`` — the exponential-smoothing scheme multilingual
    pretraining uses to stop head sources drowning tail sources
    (mBERT/XLM-style; the smallest source keeps 100%).

    alpha is pinned to 0.5 because ``sqrt`` is correctly rounded in
    IEEE 754 — Spark's java.lang.Math.sqrt and DuckDB's libm produce
    bit-identical doubles, so the rate (and every keep decision
    derived from it) is exactly reproducible cross-engine. A general
    ``pow(x, alpha)`` carries no such guarantee.

    ``counts`` is the tiny per-source rollup (one row per source);
    everything here is driver-free column algebra on it and the
    result broadcasts into the corpus-side filter."""
    mn = counts.agg(F.min(n_col).alias("_min_n"))
    return counts.crossJoin(F.broadcast(mn)).select(
        source_col,
        F.col(n_col),
        F.sqrt(F.col("_min_n").cast("double") / F.col(n_col)).alias("rate"),
    )


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (alpha = 0.5): per-source
    totals, the sqrt-smoothed keep-rate, and how many documents the
    deterministic hash gate actually keeps at that rate.

    Plan shape: one map-side-combined rollup for the counts (tiny),
    rates broadcast back into the corpus scan, keep decision is a
    per-row hash compare — the corpus is scanned once and never
    shuffled. The oracle recomputes the identical algebra in DuckDB;
    sqrt's IEEE exactness is what makes the rate (and the hash-gate
    threshold) bit-comparable."""
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    rates = temperature_rates(counts)
    bucket = hash60(_as_str(F.col("doc_id")), seed=7) % 10_000
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("rate") * 10_000)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            F.col("n_s").alias("n_total"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            "rate",
        )
        .orderBy("source")
    )


ORACLE["temperature_mixture"] = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
), rates AS (
  SELECT source, n_s,
         SQRT(CAST((SELECT MIN(n_s) FROM counts) AS DOUBLE) / n_s) AS rate
  FROM counts
), kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE ({hash60_sql('CAST(doc_id AS VARCHAR)', seed=7)} % 10000) < r.rate * 10000
  GROUP BY d.source
)
SELECT r.source, r.n_s AS n_total,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept, r.rate
FROM rates r LEFT JOIN kept k ON r.source = k.source
ORDER BY r.source
"""


# ---------------------------------------------------------------------------
# Systematic PPS (probability-proportional-to-size) sampling — the
# deterministic weighted subsample: within each source, documents are
# walked in doc_id order, character mass accumulates, and a row is
# selected whenever its weight interval crosses one of PPS_K equal
# thresholds of the source's total mass. Longer (higher-weight)
# documents are proportionally likelier to straddle a threshold —
# classic systematic PPS — with ZERO randomness: the sample is a pure
# function of the data, reproducible across engines, runs, and
# layouts (the cumsum order is the explicit doc_id sort, not arrival
# order).
#
# Exactness: selection is pure int64 arithmetic — a row is taken iff
# (PPS_K * cum_w) div W > (PPS_K * (cum_w - w)) div W. No decimal
# division, no libm, so Spark and DuckDB agree bit-for-bit.
#
# Scale: both windows partition by source, so the cumsum
# parallelizes across sources and shuffles only (source, doc_id, w).
# The per-source total ordering is inherent to systematic sampling;
# at 100 TB you run it per source/shard exactly like this, never over
# one global order.
# ---------------------------------------------------------------------------
PPS_K = 10


def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("source", "doc_id", "n_chars")
    wcum = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    wtot = W.partitionBy("source")
    cum = docs.select(
        "source",
        "doc_id",
        F.col("n_chars").alias("w"),
        F.sum("n_chars").over(wcum).alias("cum_w"),
        F.sum("n_chars").over(wtot).alias("total_w"),
    )
    crossed = F.expr(
        f"total_w > 0 AND ({PPS_K}L * cum_w) div total_w "
        f"> ({PPS_K}L * (cum_w - w)) div total_w"
    )
    return (
        cum.where(crossed)
        .select(
            "source",
            "doc_id",
            "w",
            "cum_w",
            F.expr(f"({PPS_K}L * cum_w) div total_w").alias("bucket"),
        )
        .orderBy("source", "doc_id")
    )


ORACLE["pps_sample"] = f"""
WITH cum AS (
  SELECT source, doc_id, n_chars AS w,
         SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_w,
         SUM(n_chars) OVER (PARTITION BY source) AS total_w
  FROM documents
)
SELECT source, doc_id, w, CAST(cum_w AS BIGINT) AS cum_w,
       CAST(({PPS_K} * cum_w) // total_w AS BIGINT) AS bucket
FROM cum
WHERE total_w > 0
  AND ({PPS_K} * cum_w) // total_w > ({PPS_K} * (cum_w - w)) // total_w
ORDER BY source, doc_id
"""


# ---------------------------------------------------------------------------
# Exact-proportion stratified split — the ranked complement of the
# hash-gate split above. split_assign gives each row an INDEPENDENT
# biased-coin assignment (proportions hold only in expectation, so a
# 40-document stratum can land 7 test docs instead of 4);
# exact_stratified_split instead RANKS each stratum by document hash
# and cuts at floor(frac * n): every stratum gets exactly its quota,
# still fully deterministic — the rank order is the hash order, so
# membership never depends on ingest order or layout. The price is a
# per-stratum window (one narrow shuffle) instead of a map-side
# gate; at 100 TB both run per source shard.
#
# Note the different stability contract: split_assign keeps a
# document's split fixed FOREVER (membership depends only on its own
# hash); the ranked split keeps proportions exact but adding corpus
# can move the cut line. Eval sets that must never drift use the
# gate; budget-exact experiment splits use this.
# ---------------------------------------------------------------------------
TEST_FRAC_EXACT = 0.2


def q_exact_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("source", "doc_id")
    h = hash60(_as_str(F.col("doc_id")), seed=11).alias("h")
    win = W.partitionBy("source").orderBy("h", "doc_id")
    ranked = docs.select("source", "doc_id", h).select(
        "source",
        "doc_id",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("n"),
    )
    quota = F.floor(F.lit(TEST_FRAC_EXACT) * F.col("n")).cast("bigint")
    return (
        ranked.select(
            "source",
            "doc_id",
            F.when(F.col("rn") <= quota, F.lit("test"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        .orderBy("source", "doc_id")
    )


ORACLE["exact_stratified_split"] = f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {hash60_sql('CAST(doc_id AS VARCHAR)', seed=11)}, doc_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source, doc_id,
       CASE WHEN rn <= CAST(FLOOR({TEST_FRAC_EXACT} * n) AS BIGINT)
            THEN 'test' ELSE 'train' END AS split
FROM ranked ORDER BY source, doc_id
"""


# ---------------------------------------------------------------------------
# Importance weights for domain rebalancing — the reweighting half of
# dataset_mixture's subsampling: instead of DROPPING documents to hit
# a target mixture, assign each source a sampling weight
# target_share / observed_share (uniform target across sources, the
# DoReMi-style baseline), clip at IW_CLIP to bound the variance a
# rare domain could inject, and report the effective counts the
# clipped weights realize. Training loaders consume exactly this
# table to oversample rare domains without duplicating bytes.
#
# Exactness: every share/weight is a deterministic double ratio of
# exact int64 counts; clipping is a comparison. Scale: one combinable
# groupBy over |sources| keys + a 1-row total broadcast — nothing
# else moves, at any corpus size.
# ---------------------------------------------------------------------------
IW_CLIP = 3.0


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_docs").alias("n"),
    )
    share = F.col("n_docs").cast("double") / F.col("n").cast("double")
    raw = (F.lit(1.0) / F.col("k").cast("double")) / share
    clipped = F.least(raw, F.lit(IW_CLIP))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            share.alias("source_share"),
            raw.alias("raw_weight"),
            clipped.alias("weight"),
            (F.col("n_docs").cast("double") * clipped).alias("effective_n"),
        )
        .orderBy("source")
    )


ORACLE["importance_weights"] = f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), tot AS (
  SELECT COUNT(*) AS k, SUM(n_docs) AS n FROM per
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE) AS source_share,
       (1.0 / CAST(k AS DOUBLE))
         / (CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)) AS raw_weight,
       LEAST((1.0 / CAST(k AS DOUBLE))
         / (CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)), {IW_CLIP}) AS weight,
       CAST(n_docs AS DOUBLE) * LEAST((1.0 / CAST(k AS DOUBLE))
         / (CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)), {IW_CLIP})
         AS effective_n
FROM per, tot
ORDER BY source
"""
