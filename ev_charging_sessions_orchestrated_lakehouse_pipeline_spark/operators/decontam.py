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


# ---------------------------------------------------------------------------
# Span-level decontamination: surgically remove the contaminated
# n-gram WINDOWS from a training document instead of dropping the
# whole doc — the higher-yield variant real pipelines use when the
# corpus is expensive (a 10k-token doc with one leaked eval sentence
# keeps its other ~9.99k tokens).
#
# Semantics: token t is removed iff some contaminated shingle
# starting at position i covers it (i <= t <= i + n - 1); the clean
# text is the remaining tokens re-joined. Same broadcast-eval-hashes
# design as `decontaminate` — plus the contaminated-position lists
# (doc_id -> [pos]) are a vanishing fraction of the corpus, so the
# join attaching them back to contaminated docs is broadcast too; at
# a contamination rate where that map outgrows the broadcast
# threshold, drop the hint and let AQE shuffle it (plan unchanged
# otherwise). Token masking is pure higher-order expressions — no
# Python touches any row.
# ---------------------------------------------------------------------------
def q_decontam_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import let_sql
    from .dedup import _docs

    n = SHINGLE_N
    # every tokens-consuming expression LET-BINDS the split (module
    # rule: CollapseProject would otherwise inline split(text) into
    # each element_at — O(tokens^2) re-tokenization per row; measured
    # 2.6x on this query at sf0.1, min-of-3: 4.54s inlined -> 1.72s)
    shingle_of = "concat_ws(' ', " + ", ".join(
        f"element_at(xs, ii + {k})" for k in range(n)
    ) + ")"
    pos_shingles_sql = let_sql(
        "split(text, ' ')",
        "xs",
        f"transform(sequence(1, size(xs) - {n - 1}), "
        f"ii -> struct(ii AS pos, {shingle_of} AS s))",
    )
    docs = _docs(spark, sf_dir).filter(
        F.size(F.split(F.col("text"), " ")) >= n
    )
    ev_hashes = (
        docs.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode(F.expr(pos_shingles_sql)).alias("ps"))
        .select(hash60("ps.s").alias("h"))
        .distinct()
    )
    train = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    pos_shingles = train.select(
        "doc_id", F.explode(F.expr(pos_shingles_sql)).alias("ps")
    ).select("doc_id", F.col("ps.pos").alias("pos"), hash60("ps.s").alias("h"))
    bad_pos = (
        pos_shingles.join(F.broadcast(ev_hashes), "h")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("bad"))
    )
    kept_sql = (
        f"filter(sequence(1, size(xs)), ti -> "
        f"size(filter(bad, ii -> ii <= ti AND ti <= ii + {n - 1})) = 0)"
    )
    result_sql = let_sql(
        "split(text, ' ')",
        "xs",
        let_sql(
            kept_sql,
            "ks",
            "struct(CAST(size(xs) AS INT) AS n_tokens, "
            "CAST(size(xs) - size(ks) AS INT) AS n_removed_tokens, "
            "concat_ws(' ', transform(ks, ti -> element_at(xs, ti))) AS clean_text)",
        ),
    )
    return (
        train.join(F.broadcast(bad_pos), "doc_id")
        .select("doc_id", F.expr(result_sql).alias("r"))
        .select("doc_id", "r.n_tokens", "r.n_removed_tokens", "r.clean_text")
        .orderBy("doc_id")
    )


def _span_sql() -> str:
    n = SHINGLE_N
    shingle = " || ' ' || ".join(f"T[i + {k}]" for k in range(n))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS T
  FROM documents
  WHERE len(string_split(text, ' ')) >= {n}
), ev AS (
  SELECT DISTINCT {hash60_sql('s')} AS h
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(T) - {n - 1}),
                                 i -> {shingle})) AS s
    FROM toks WHERE doc_id % {EVAL_MOD} = 0
  )
), pos AS (
  SELECT doc_id, i, {hash60_sql('s')} AS h
  FROM (
    SELECT doc_id,
           unnest(generate_series(1, len(T) - {n - 1})) AS i,
           unnest(list_transform(generate_series(1, len(T) - {n - 1}),
                                 i -> {shingle})) AS s
    FROM toks WHERE doc_id % {EVAL_MOD} <> 0
  )
), bad AS (
  SELECT doc_id, list_sort(list(i)) AS bad
  FROM pos JOIN ev USING (h)
  GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(T) AS INTEGER) AS n_tokens,
       CAST(len(T) - len(kept) AS INTEGER) AS n_removed_tokens,
       COALESCE(array_to_string(list_transform(kept, t -> T[t]), ' '), '')
         AS clean_text
FROM (
  SELECT b.doc_id, T,
         list_filter(generate_series(1, len(T)),
                     t -> len(list_filter(bad, i -> i <= t AND t <= i + {n - 1})) = 0)
           AS kept
  FROM bad b JOIN toks t USING (doc_id)
) t
ORDER BY t.doc_id
"""


ORACLE["decontam_span_removal"] = _span_sql()
