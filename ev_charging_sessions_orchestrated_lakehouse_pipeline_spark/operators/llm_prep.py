"""End-to-end LLM corpus preparation: the tiers composed into ONE
pipeline — normalized exact dedup -> quality gate -> benchmark
decontamination -> weighted mixture sampling -> versioned snapshot
sink. This is the "switch from the reference" showcase: the same
medallion discipline (stage gates, quarantine-style funnel
accounting, idempotent versioned sink) applied to training-data
curation instead of EV sessions.

Funnel design: every stage is a FLAG on the corpus row, not a
materialized intermediate, folded by one map-side-combinable
aggregation into cumulative stage counts. The plan is four
column-pruned scans of the corpus — (1) digest->min-doc_id keep map,
(2) eval shingle hashes, (3) contaminated doc ids, (4) the flag
pass — and the payload column is never shuffled: the only Exchanges
carry 16-byte digests, 8-byte shingle hashes, and doc ids.

Scale honesty (100 TB): the contaminated-id set is a vanishing
fraction and always broadcastable; the dedup keep map is
corpus-sized, so its join is NOT hinted — AQE broadcasts it at test
scale and degrades to a shuffle join on the 16-byte digest at full
scale (pair that with a corpus bucketed on the digest via
sources/writers.write_bucketed to make the join exchange-free).

Stage semantics (all deterministic, all SQL-replayable):
1. corpus    — docs not in the eval carve-out (doc_id % 97 != 0).
2. dedup     — keep the min-doc_id row per md5(normalized text).
3. quality   — word count in [5, 5000] and mean word length in
               [2, 12] (a minimal Gopher-style gate; the full rule
               set lives in operators/corpus_filter.py).
4. decontam  — drop docs sharing any word 3-gram with the eval set.
5. mixture   — weighted source sampling (operators/sampling.py
               weights), deterministic per doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql, word_shingles_sql
from .decontam import EVAL_MOD
from .dedup import SHINGLE_N
from .sampling import _WEIGHTS, mixture_keep, mixture_keep_sql
from .text import NORMALIZE_EXPR, NORMALIZE_SQL

ORACLE: dict[str, str] = {}

WC_MIN, WC_MAX = 5, 5000
MWL_MIN, MWL_MAX = 2.0, 12.0


def _flagged_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus with one boolean per stage: is_kept_dedup,
    quality_ok, contaminated, mixture_kept."""
    from .dedup import _docs

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % EVAL_MOD != 0)

    keep_ids = (
        corpus.select(F.md5(F.expr(NORMALIZE_EXPR)).alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_id"))
    )

    ev_hashes = (
        docs.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(
            F.explode(F.array_distinct(_word_shingles_expr_cached())).alias("s")
        )
        .select(hash60("s").alias("h"))
        .distinct()
    )
    contaminated_ids = (
        corpus.select("doc_id", F.explode(
            F.array_distinct(_word_shingles_expr_cached())
        ).alias("s"))
        .select("doc_id", hash60("s").alias("h"))
        .join(F.broadcast(ev_hashes), "h")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )

    wc = F.size(F.split(F.col("text"), " "))
    mwl = (F.length("text") - (wc - F.lit(1))) / wc
    quality_ok = wc.between(WC_MIN, WC_MAX) & mwl.between(MWL_MIN, MWL_MAX)

    return (
        corpus.withColumn("digest", F.md5(F.expr(NORMALIZE_EXPR)))
        # no broadcast hint: AQE broadcasts the keep map at test scale
        # and falls back to a digest-key shuffle at corpus scale
        .join(keep_ids, "digest")
        .join(F.broadcast(contaminated_ids), "doc_id", "left")
        .select(
            "doc_id",
            "text",
            "source",
            (F.col("doc_id") == F.col("keep_id")).alias("is_kept_dedup"),
            quality_ok.alias("quality_ok"),
            F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"),
            mixture_keep("doc_id", "source", _WEIGHTS).alias("mixture_kept"),
        )
    )


def _word_shingles_expr_cached():
    from ..functions.hashing import word_shingles_expr

    return word_shingles_expr("split(text, ' ')", SHINGLE_N)


def survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs that pass every stage — the prepared training corpus."""
    f = _flagged_corpus(spark, sf_dir)
    return f.filter(
        F.col("is_kept_dedup")
        & F.col("quality_ok")
        & ~F.col("contaminated")
        & F.col("mixture_kept")
    ).select("doc_id", "text", "source")


def llm_prep(
    spark: SparkSession, sf_dir: str, table: str
) -> tuple[int, dict[str, int]]:
    """Run the pipeline and land survivors in a snapshot table
    (versioned, time-travelable — every prep run is auditable).
    Returns (committed version, funnel counts)."""
    from ..sources import snaptable

    row = q_llm_corpus_prep(spark, sf_dir).collect()[0]
    out = survivors(spark, sf_dir)
    if snaptable.current_version(table) is None:
        v = snaptable.create_table(out, table, ["source"])
    else:
        v = snaptable.overwrite_table(out, table)
    return v, row.asDict()


def q_llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative funnel of the full prep pipeline, one row: how many
    docs survive each successive gate. Four column-pruned scans + one
    agg (see module docstring); every stage is SQL-replayed by the
    oracle, so the driver hash-checks the composed pipeline
    end-to-end."""
    f = _flagged_corpus(spark, sf_dir)
    d = F.col("is_kept_dedup")
    q = d & F.col("quality_ok")
    c = q & ~F.col("contaminated")
    m = c & F.col("mixture_kept")
    as_cnt = lambda cond, name: F.sum(cond.cast("long")).cast("bigint").alias(name)  # noqa: E731
    return f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_corpus"),
        as_cnt(d, "n_after_dedup"),
        as_cnt(q, "n_after_quality"),
        as_cnt(c, "n_after_decontam"),
        as_cnt(m, "n_after_mixture"),
    )


_SH_SQL = word_shingles_sql("string_split(text, ' ')", SHINGLE_N)

ORACLE["llm_corpus_prep"] = f"""
WITH corpus AS (
  SELECT * FROM documents WHERE doc_id % {EVAL_MOD} <> 0
), dig AS (
  SELECT doc_id, md5({NORMALIZE_SQL}) AS digest FROM corpus
), keep_ids AS (
  SELECT digest, MIN(doc_id) AS keep_id FROM dig GROUP BY digest
), ev AS (
  SELECT DISTINCT {hash60_sql('s')} AS h
  FROM (
    SELECT unnest(list_distinct({_SH_SQL})) AS s
    FROM documents WHERE doc_id % {EVAL_MOD} = 0
  )
), contaminated AS (
  SELECT DISTINCT doc_id
  FROM (
    SELECT doc_id, {hash60_sql('s')} AS h
    FROM (SELECT doc_id, unnest(list_distinct({_SH_SQL})) AS s FROM corpus)
  ) t JOIN ev USING (h)
), flags AS (
  SELECT c.doc_id,
         (c.doc_id = k.keep_id) AS is_kept_dedup,
         (len(string_split(c.text, ' ')) BETWEEN {WC_MIN} AND {WC_MAX}
          AND (length(c.text) - (len(string_split(c.text, ' ')) - 1))
              / CAST(len(string_split(c.text, ' ')) AS DOUBLE)
              BETWEEN {MWL_MIN} AND {MWL_MAX}) AS quality_ok,
         (ct.doc_id IS NOT NULL) AS contaminated,
         {mixture_keep_sql('c.doc_id', 'c.source', _WEIGHTS)} AS mixture_kept
  FROM corpus c
  JOIN dig d USING (doc_id)
  JOIN keep_ids k USING (digest)
  LEFT JOIN contaminated ct ON ct.doc_id = c.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus,
       CAST(SUM(CAST(is_kept_dedup AS BIGINT)) AS BIGINT) AS n_after_dedup,
       CAST(SUM(CAST((is_kept_dedup AND quality_ok) AS BIGINT)) AS BIGINT)
         AS n_after_quality,
       CAST(SUM(CAST((is_kept_dedup AND quality_ok AND NOT contaminated)
                     AS BIGINT)) AS BIGINT) AS n_after_decontam,
       CAST(SUM(CAST((is_kept_dedup AND quality_ok AND NOT contaminated
                      AND mixture_kept) AS BIGINT)) AS BIGINT)
         AS n_after_mixture
FROM flags
"""


def eval_hashes_for(eval_docs: DataFrame) -> DataFrame:
    """Distinct 60-bit shingle hashes of a benchmark/eval corpus —
    build once, reuse across batches (tiny; rides broadcast joins)."""
    return (
        eval_docs.select(
            F.explode(F.array_distinct(_word_shingles_expr_cached())).alias("s")
        )
        .select(hash60("s").alias("h"))
        .distinct()
    )


def prep_batch(
    batch: DataFrame,
    ev_hashes: DataFrame,
    history_digests: DataFrame | None = None,
) -> DataFrame:
    """Prep ONE ingest batch: intra-batch normalized dedup (keep min
    doc_id), quality gate, decontamination against ``ev_hashes``,
    mixture sampling — then drop anything whose digest already exists
    in ``history_digests`` (the incremental-dedup shape of
    operators/dedup.q_dedup_incremental: only 16-byte digests of the
    history move, never its payloads). Returns survivors carrying
    their digest so the caller can append them to the history.

    The batch side of every join is the small side (ingest batches
    are bounded); the history side is a column-pruned digest scan —
    at 100 TB keep the corpus snapshot bucketed on digest and the
    anti join is exchange-free on the history side."""
    dig = batch.withColumn("digest", F.md5(F.expr(NORMALIZE_EXPR)))
    keep_ids = dig.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    contaminated_ids = (
        batch.select(
            "doc_id",
            F.explode(F.array_distinct(_word_shingles_expr_cached())).alias("s"),
        )
        .select("doc_id", hash60("s").alias("h"))
        .join(F.broadcast(ev_hashes), "h")
        .select("doc_id")
        .distinct()
    )
    wc = F.size(F.split(F.col("text"), " "))
    mwl = (F.length("text") - (wc - F.lit(1))) / wc
    out = (
        dig.join(keep_ids, "digest")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .join(contaminated_ids, "doc_id", "left_anti")
        .filter(
            wc.between(WC_MIN, WC_MAX)
            & mwl.between(MWL_MIN, MWL_MAX)
            & mixture_keep("doc_id", "source", _WEIGHTS)
        )
        .select("doc_id", "text", "source", "digest")
    )
    if history_digests is not None:
        out = out.join(history_digests, "digest", "left_anti")
    return out
