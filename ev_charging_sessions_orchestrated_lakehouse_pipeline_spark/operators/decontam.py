"""Benchmark decontamination: flag training documents that share
word n-grams with an evaluation/benchmark set.

The canonical LLM-pipeline hygiene op (reference has no equivalent —
batch-ETL only; this is part of the training-data extension tier):
before pretraining, every document that overlaps the eval benchmarks
must be found, because even a single leaked eval question inflates
downstream scores. The standard detector is n-gram overlap: a doc is
contaminated if any of its word n-grams appears in any benchmark
document.

Scale design (100 TB corpus, MB-scale benchmark):
- The benchmark shingle set is TINY relative to the corpus (eval sets
  are thousands of documents; corpora are billions), so it is
  broadcast — the corpus-side join is map-side, no shuffle of corpus
  shingles ever happens.
- Corpus shingles are hashed to 60-bit ints (:func:`hash60` family)
  before the join: the broadcast hash set and the join keys are 8
  bytes each, not multi-word strings.
- The per-doc aggregation that counts overlapping shingles is
  map-side combinable (count per doc_id) — the only shuffle carries
  (doc_id, partial count) for CONTAMINATED docs only, a vanishing
  fraction of the corpus.

The eval set here is carved deterministically from the documents
fixture (``doc_id % 97 = 0``) so the query is self-contained and
oracle-checkable; a real pipeline would read the benchmark table
instead (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql, word_shingles_sql
from .dedup import SHINGLE_N, _shingled

ORACLE: dict[str, str] = {}

EVAL_MOD = 97  # doc_id % EVAL_MOD == 0 -> benchmark/eval member


def decontaminate(
    corpus_shingled: DataFrame, eval_shingled: DataFrame
) -> DataFrame:
    """(doc_id, n_shingles, n_overlap_shingles) for every corpus doc
    sharing >= 1 shingle with the eval set.

    Inputs carry ``(doc_id, shingles: array<string>)`` with distinct
    shingles per doc (the :func:`..operators.dedup._shingled` shape).
    The eval side is reduced to a distinct 60-bit hash set and
    broadcast; corpus rows explode to (doc_id, hash) and semi-match
    map-side.
    """
    ev = (
        eval_shingled.select(F.explode("shingles").alias("s"))
        .select(hash60("s").alias("h"))
        .distinct()
    )
    corpus = corpus_shingled.select(
        "doc_id",
        F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("s"),
    ).select("doc_id", "n_shingles", hash60("s").alias("h"))
    return (
        corpus.join(F.broadcast(ev), "h")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_overlap_shingles"))
    )


def q_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contaminated training docs vs the doc_id%97 pseudo-benchmark."""
    sh = _shingled(spark, sf_dir)
    ev = sh.filter(F.col("doc_id") % EVAL_MOD == 0)
    train = sh.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (
        decontaminate(train, ev)
        .select("doc_id", "n_shingles", "n_overlap_shingles")
        .orderBy("doc_id")
    )


_SH_SQL = word_shingles_sql("string_split(text, ' ')", SHINGLE_N)

ORACLE["decontam_overlap"] = f"""
WITH sh AS (
  SELECT doc_id, list_distinct({_SH_SQL}) AS shingles
  FROM documents
), shf AS (
  SELECT * FROM sh WHERE len(shingles) > 0
), ev AS (
  SELECT DISTINCT {hash60_sql('s')} AS h
  FROM (SELECT unnest(shingles) AS s FROM shf WHERE doc_id % {EVAL_MOD} = 0)
), tr AS (
  SELECT doc_id, CAST(len(shingles) AS INTEGER) AS n_shingles,
         {hash60_sql('s')} AS h
  FROM (
    SELECT doc_id, shingles, unnest(shingles) AS s
    FROM shf WHERE doc_id % {EVAL_MOD} <> 0
  )
)
SELECT tr.doc_id, tr.n_shingles, COUNT(*) AS n_overlap_shingles
FROM tr JOIN ev ON tr.h = ev.h
GROUP BY tr.doc_id, tr.n_shingles
ORDER BY tr.doc_id
"""
