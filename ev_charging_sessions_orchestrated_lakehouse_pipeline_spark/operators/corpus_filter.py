"""Corpus-level quality filtering for LLM training data: Gopher-style
per-document heuristic gates, boilerplate (high document-frequency
n-gram) flagging, and the token-length histogram that drives packing
and bucketing decisions.

These are the filtering passes a pretraining pipeline runs between raw
ingest and dedup (reference has no equivalent — it is a batch-ETL
pipeline; this module is part of the training-data extension tier,
alongside operators/dedup.py and operators/text.py). The rule set
follows the publicly documented MassiveText/Gopher filters (word-count
bounds, mean-word-length bounds, alphabetic-word ratio, stopword
presence) re-expressed as Spark built-in expressions.

Scale design (100 TB):

- **Gopher rules** are a single map-side projection — every metric is
  a higher-order fold over the token array (let-bound, one
  tokenization per row), zero Python, zero shuffle. Filtering 100 TB
  is embarrassingly parallel scan work.
- **Boilerplate flagging** is the textbook heavy-hitters shape: the
  document-frequency aggregation shuffles 8-byte shingle hashes
  (map-side combinable counts), and only the tiny high-DF survivor
  set (boilerplate is, by definition, the extreme tail) is broadcast
  back against the corpus — the corpus itself is never shuffled. At
  petabyte scale the DF pass can be replaced by a sketch
  (count-min / approx heavy hitters) without changing the join shape.
- **Length histogram** is one map-side-combinable groupBy on a
  derived bucket key (tiny cardinality) plus a window over the
  bucket dimension (rows = number of buckets, not documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql, let_sql, word_shingles_sql
from ..functions.oracle import davg, davg_sql
from .dedup import SHINGLE_N, _shingled
from .text import STOPWORDS, _in_list_expr

ORACLE: dict[str, str] = {}

# Gopher-style gate bounds, adapted to the fixture corpus scale (the
# published bounds are 50..100k words for web pages; the fixture docs
# are 10..99 words, so the lower bound is scaled to keep both branches
# of every gate populated).
MIN_WORDS = 20
MAX_WORDS = 1000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_WORD_RATIO = 0.8
MIN_STOPWORD_HITS = 2


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Gopher-style quality gates: one projection, all folds over a single
# let-bound token array.
# ---------------------------------------------------------------------------
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    n_words = F.expr(let_sql("split(text, ' ')", "w", "size(w)")).alias("n_words")
    char_sum = F.expr(
        let_sql(
            "split(text, ' ')",
            "w",
            "aggregate(w, 0L, (acc, t) -> acc + length(t))",
        )
    )
    alpha_words = F.expr(
        let_sql(
            "split(text, ' ')",
            "w",
            "size(filter(w, t -> t rlike '[a-z]'))",
        )
    )
    stopword_hits = F.expr(
        let_sql(
            "split(text, ' ')",
            "w",
            "size(filter(w, t -> " + _in_list_expr("t", STOPWORDS["en"]) + "))",
        )
    )
    scored = docs.select(
        "doc_id",
        n_words,
        char_sum.alias("char_sum"),
        alpha_words.alias("n_alpha_words"),
        stopword_hits.alias("n_stopword_hits"),
    ).select(
        "doc_id",
        "n_words",
        (F.col("char_sum").cast("double") / F.col("n_words")).alias("mean_word_len"),
        (F.col("n_alpha_words").cast("double") / F.col("n_words")).alias(
            "alpha_word_ratio"
        ),
        "n_stopword_hits",
    )
    pass_words = (F.col("n_words") >= MIN_WORDS) & (F.col("n_words") <= MAX_WORDS)
    pass_len = (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN) & (
        F.col("mean_word_len") <= MAX_MEAN_WORD_LEN
    )
    pass_alpha = F.col("alpha_word_ratio") >= MIN_ALPHA_WORD_RATIO
    pass_stop = F.col("n_stopword_hits") >= MIN_STOPWORD_HITS
    return scored.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_ratio",
        "n_stopword_hits",
        pass_words.alias("pass_word_count"),
        pass_len.alias("pass_mean_word_len"),
        pass_alpha.alias("pass_alpha_ratio"),
        pass_stop.alias("pass_stopwords"),
        (pass_words & pass_len & pass_alpha & pass_stop).alias("keep"),
    )


def _gopher_oracle() -> str:
    toks = "string_split(text, ' ')"
    stop_pred = _in_list_expr("t", STOPWORDS["en"])
    return f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len({toks}) AS INT) AS n_words,
         CAST(list_sum(list_transform({toks}, t -> CAST(length(t) AS BIGINT))) AS DOUBLE)
           / len({toks}) AS mean_word_len,
         CAST(len(list_filter({toks}, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
           / len({toks}) AS alpha_word_ratio,
         CAST(len(list_filter({toks}, t -> {stop_pred})) AS INT) AS n_stopword_hits
  FROM documents
)
SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, n_stopword_hits,
       (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}) AS pass_word_count,
       (mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN}) AS pass_mean_word_len,
       (alpha_word_ratio >= {MIN_ALPHA_WORD_RATIO}) AS pass_alpha_ratio,
       (n_stopword_hits >= {MIN_STOPWORD_HITS}) AS pass_stopwords,
       ((n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS})
        AND (mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN})
        AND (alpha_word_ratio >= {MIN_ALPHA_WORD_RATIO})
        AND (n_stopword_hits >= {MIN_STOPWORD_HITS})) AS keep
FROM scored
"""


ORACLE["gopher_rules"] = _gopher_oracle()


# ---------------------------------------------------------------------------
# Boilerplate n-gram flagging: shingles that occur in many documents
# (navigation chrome, license headers, templated spans) are corpus
# boilerplate; documents dominated by them are flagged.
# ---------------------------------------------------------------------------
BOILERPLATE_MIN_DF = 5  # shingle present in >= this many docs
BOILERPLATE_RATIO = 0.10  # doc flagged when this share of its shingles is hot


def boilerplate_shingles(shingled: DataFrame) -> DataFrame:
    """(h) 60-bit hashes of shingles whose document frequency is >=
    BOILERPLATE_MIN_DF. The aggregation shuffles hashed keys with
    map-side partial counts; the survivor set is the broadcastable
    heavy-hitter tail."""
    return (
        shingled.select(F.explode("shingles").alias("s"))
        .select(hash60("s").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= BOILERPLATE_MIN_DF)
        .select("h")
    )


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The shingle projection is computed TWICE (once under the DF agg,
    # once under the hit join) — deliberate: recomputing a map-side
    # projection costs CPU only, while materializing the exploded
    # (doc_id, hash) frame to reuse it would either persist corpus-
    # scale state or shuffle it. At 100 TB, re-scan beats re-shuffle;
    # pipelines that already maintain a shingle table can pass it in
    # via boilerplate_shingles() directly.
    sh = _shingled(spark, sf_dir)
    hot = boilerplate_shingles(sh)
    per_doc = sh.select("doc_id", F.size("shingles").alias("n_shingles"))
    hits = (
        sh.select("doc_id", F.explode("shingles").alias("s"))
        .select("doc_id", hash60("s").alias("h"))
        .join(F.broadcast(hot), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boilerplate"))
    )
    ratio = F.col("n_boilerplate").cast("double") / F.col("n_shingles")
    return (
        per_doc.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_boilerplate", F.lit(0)).alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_boilerplate",
            ratio.alias("boilerplate_ratio"),
            (ratio >= BOILERPLATE_RATIO).alias("flagged"),
        )
        .orderBy("doc_id")
    )


def _boilerplate_oracle() -> str:
    from ..functions.hashing import word_shingles_sql

    sh_sql = word_shingles_sql("string_split(text, ' ')", SHINGLE_N)
    return f"""
WITH sh AS (
  SELECT doc_id, list_distinct({sh_sql}) AS shingles FROM documents
), shf AS (
  SELECT * FROM sh WHERE len(shingles) > 0
), ex AS (
  SELECT doc_id, {hash60_sql('s')} AS h
  FROM (SELECT doc_id, unnest(shingles) AS s FROM shf)
), hot AS (
  SELECT h FROM (SELECT h, COUNT(*) AS df FROM ex GROUP BY h)
  WHERE df >= {BOILERPLATE_MIN_DF}
), hits AS (
  SELECT ex.doc_id, COUNT(*) AS n_boilerplate
  FROM ex JOIN hot ON ex.h = hot.h
  GROUP BY ex.doc_id
)
SELECT shf.doc_id,
       CAST(len(shf.shingles) AS INT) AS n_shingles,
       CAST(COALESCE(hits.n_boilerplate, 0) AS BIGINT) AS n_boilerplate,
       CAST(COALESCE(hits.n_boilerplate, 0) AS DOUBLE) / len(shf.shingles)
         AS boilerplate_ratio,
       (CAST(COALESCE(hits.n_boilerplate, 0) AS DOUBLE) / len(shf.shingles)
         >= {BOILERPLATE_RATIO}) AS flagged
FROM shf LEFT JOIN hits ON shf.doc_id = hits.doc_id
ORDER BY shf.doc_id
"""


ORACLE["boilerplate_ngrams"] = _boilerplate_oracle()


# ---------------------------------------------------------------------------
# Token-length histogram: the distribution that sizes sequence-packing
# bins and length-bucketed batching.
# ---------------------------------------------------------------------------
LENGTH_BUCKET = 16  # tokens per histogram bucket


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bucketed = docs.select(
        (
            F.floor(F.expr("size(split(text, ' '))") / F.lit(LENGTH_BUCKET))
            * LENGTH_BUCKET
        )
        .cast("long")
        .alias("bucket_start"),
        F.expr("size(split(text, ' '))").alias("n_tokens"),
    )
    per_bucket = bucketed.groupBy("bucket_start").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    w = W.orderBy("bucket_start").rowsBetween(W.unboundedPreceding, W.currentRow)
    total = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        per_bucket.withColumn("cum_docs", F.sum("n_docs").over(w))
        .withColumn(
            "cum_doc_share",
            F.col("cum_docs").cast("double") / F.sum("n_docs").over(total),
        )
        .select(
            "bucket_start", "n_docs", "total_tokens", "cum_docs", "cum_doc_share"
        )
        .orderBy("bucket_start")
    )


ORACLE["length_histogram"] = f"""
WITH bucketed AS (
  SELECT CAST(FLOOR(len(string_split(text, ' ')) / {LENGTH_BUCKET})
           * {LENGTH_BUCKET} AS BIGINT) AS bucket_start,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), per_bucket AS (
  SELECT bucket_start, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM bucketed GROUP BY bucket_start
)
SELECT bucket_start, n_docs, total_tokens,
       CAST(SUM(n_docs) OVER (ORDER BY bucket_start
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
       CAST(SUM(n_docs) OVER (ORDER BY bucket_start
            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / SUM(n_docs) OVER () AS cum_doc_share
FROM per_bucket
ORDER BY bucket_start
"""


# ---------------------------------------------------------------------------
# Cross-source overlap matrix: for every source pair, how many
# distinct shingles they share — the corpus-level contamination /
# diversity diagnostic (mirrors the doc-level decontam op one level
# up). Plan shape: distinct (source, shingle-hash) pairs, inverted
# self-join on the hash, pair-count aggregation. The same
# sum(df²)-not-n² bound as n-gram dedup applies, and ultra-hot
# shingles are capped out (they carry no signal about SPECIFIC
# source affinity — every source has them).
# ---------------------------------------------------------------------------
OVERLAP_MAX_SOURCES = 15  # drop shingles present in more sources than this


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    from ..functions.hashing import word_shingles_expr

    sh = docs.select(
        "source",
        F.explode(
            F.array_distinct(
                word_shingles_expr("split(text, ' ')", SHINGLE_N)
            )
        ).alias("s"),
    ).select("source", hash60("s").alias("h")).distinct()
    capped = (
        sh.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.collect_set("source").alias("sources"),
        )
        .filter(F.col("n_sources") <= OVERLAP_MAX_SOURCES)
    )
    pairs = capped.select(
        F.explode("sources").alias("s1"), F.col("sources").alias("rest")
    ).select("s1", F.explode("rest").alias("s2")).filter(F.col("s1") < F.col("s2"))
    return (
        pairs.groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .orderBy(F.col("shared_shingles").desc(), "s1", "s2")
    )


def _source_overlap_oracle() -> str:
    from ..functions.hashing import word_shingles_sql

    sh_sql = word_shingles_sql("string_split(text, ' ')", SHINGLE_N)
    return f"""
WITH sh AS (
  SELECT DISTINCT source, {hash60_sql('s')} AS h
  FROM (
    SELECT source, unnest(list_distinct({sh_sql})) AS s FROM documents
  )
), capped AS (
  SELECT h FROM (SELECT h, COUNT(*) AS n_sources FROM sh GROUP BY h)
  WHERE n_sources <= {OVERLAP_MAX_SOURCES}
)
SELECT a.source AS s1, b.source AS s2, COUNT(*) AS shared_shingles
FROM sh a
JOIN capped USING (h)
JOIN sh b ON a.h = b.h AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY shared_shingles DESC, s1, s2
"""


ORACLE["source_overlap"] = _source_overlap_oracle()


# ---------------------------------------------------------------------------
# Language-ID confusion matrix: predicted vs labeled language counts
# plus per-cell share of the label's row count — the eval view of
# the lang_id heuristic (operators/text.py). Composition: the
# classifier projection is map-side; the matrix agg shuffles
# (label, prediction) pairs — at most n_langs² groups.
# ---------------------------------------------------------------------------
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import q_lang_id

    pred = q_lang_id(spark, sf_dir).select("doc_id", "lang", "predicted_lang")
    counts = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    per_label = W.partitionBy("lang")
    return (
        counts.withColumn(
            "label_share",
            F.col("n_docs").cast("double") / F.sum("n_docs").over(per_label),
        )
        .orderBy("lang", "predicted_lang")
    )


def _lang_confusion_oracle() -> str:
    from .text import ORACLE as TEXT_ORACLE

    lang_id_body = TEXT_ORACLE["lang_id"].strip()
    return f"""
WITH pred AS (
{lang_id_body}
), counts AS (
  SELECT lang, predicted_lang, COUNT(*) AS n_docs
  FROM pred GROUP BY lang, predicted_lang
)
SELECT lang, predicted_lang, n_docs,
       CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY lang)
         AS label_share
FROM counts
ORDER BY lang, predicted_lang
"""


ORACLE["lang_confusion"] = _lang_confusion_oracle()


# ---------------------------------------------------------------------------
# Per-source quality summary: the corpus-curation dashboard — for
# each source, how many docs pass each Gopher gate and overall.
# Composition of q_gopher_rules; one tiny shuffle on source.
# ---------------------------------------------------------------------------
def q_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    gates = q_gopher_rules(spark, sf_dir)
    joined = gates.join(docs, "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("pass_word_count").cast("long")).alias("n_pass_words"),
            F.sum(F.col("pass_mean_word_len").cast("long")).alias("n_pass_len"),
            F.sum(F.col("pass_alpha_ratio").cast("long")).alias("n_pass_alpha"),
            F.sum(F.col("pass_stopwords").cast("long")).alias("n_pass_stop"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
        )
        .withColumn(
            "keep_rate", F.col("n_keep").cast("double") / F.col("n_docs")
        )
        .orderBy("source")
    )


def _source_quality_oracle() -> str:
    gopher_body = ORACLE["gopher_rules"].strip()
    return f"""
WITH gates AS (
{gopher_body}
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN pass_word_count THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_words,
       CAST(SUM(CASE WHEN pass_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_len,
       CAST(SUM(CASE WHEN pass_alpha_ratio THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_alpha,
       CAST(SUM(CASE WHEN pass_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_stop,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS keep_rate
FROM gates JOIN documents USING (doc_id)
GROUP BY source
ORDER BY source
"""


ORACLE["source_quality"] = _source_quality_oracle()


# ---------------------------------------------------------------------------
# Rarity scoring — the engine-parity form of unigram-LM "perplexity"
# quality filtering. A pretraining pipeline scores each document by
# how surprising its tokens are under a corpus-wide unigram model and
# drops the tails (gibberish scores high, boilerplate scores low).
# The log-prob formulation needs ln(), whose last-ulp behavior is
# libm-specific (see text.py BM25 note), so the surfaced score is the
# MEAN INVERSE TOKEN FREQUENCY: for token t with corpus count c(t)
# out of T total tokens, surprisal proxy = T / c(t) (the reciprocal
# unigram probability; arithmetic mean over the doc instead of the
# geometric mean the log form would give — same tails, pure +,*,/).
#
# Scale design: token counts are one map-side-combinable groupBy; the
# per-occurrence join back to the count table is a shuffle join that
# AQE converts to broadcast whenever the (post-cap) vocabulary fits —
# vocab grows sublinearly in corpus size, so at 100 TB this is a
# broadcast of a few hundred MB at worst; per-doc aggregation rides
# the DECIMAL route (functions/oracle.py) so scores are
# partition-count-invariant.
# ---------------------------------------------------------------------------
RARITY_BAR = 40.0  # vocab ~31 => typical score ~31; rare-term docs spike


def q_rarity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = tok.agg(F.count(F.lit(1)).alias("t"))
    per = (
        tok.join(counts, "term")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            (F.col("t").cast("double") / F.col("c").cast("double")).alias(
                "inv"
            ),
        )
    )
    return (
        per.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            davg("inv").alias("rarity"),
        )
        .withColumn("is_rare", F.col("rarity") > RARITY_BAR)
        .orderBy("doc_id")
    )


ORACLE["rarity_filter"] = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
counts AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
total AS (SELECT COUNT(*) AS t FROM tok),
per AS (
  SELECT doc_id, CAST(t AS DOUBLE) / CAST(c AS DOUBLE) AS inv
  FROM tok JOIN counts USING (term), total
)
SELECT doc_id, COUNT(*) AS n_tokens,
       {{davg_inv}} AS rarity,
       {{davg_inv}} > {RARITY_BAR} AS is_rare
FROM per
GROUP BY doc_id
ORDER BY doc_id
""".format(davg_inv=davg_sql("inv"))


# ---------------------------------------------------------------------------
# Per-source document quota (domain balancing). Web-scale corpora are
# dominated by a handful of high-volume sources; the standard fix
# (C4/RefinedWeb-style) is a hard per-domain cap so no source
# contributes more than CAP documents, keeping the best ones by a
# deterministic rank.
#
# Scale design (100 TB): the ranking window shuffles ONLY
# (doc_id, source, n_chars) — ids and two small columns, never text
# payloads (kept ids semi-join back for payload fetch downstream, the
# same ids-only stance as operators/llm_prep.py). A skewed source
# costs one hot partition bounded by that source's ID-ROW count, not
# its payload bytes; at extreme skew the two-phase top-K (salted
# partial rank, then global rank over <= CAP x salt survivors)
# composes with functions/skew.py without changing this contract.
# ---------------------------------------------------------------------------
SOURCE_CAP = 15  # < docs-per-source at every fixture SF, so the cap bites


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota audit: for each source, how many documents
    exist, how many survive the CAP (ranked by n_chars desc, doc_id
    tiebreak), the chars kept, and the admission cutoff (n_chars of
    the last admitted document)."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = docs.withColumn("rk", F.row_number().over(w))
    kept = F.col("rk") <= SOURCE_CAP
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum((~kept).cast("long")).alias("n_dropped"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
            F.min(F.when(kept, F.col("n_chars"))).alias("cutoff_chars"),
        )
        .orderBy("source")
    )


ORACLE["source_cap"] = f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rk <= {SOURCE_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rk > {SOURCE_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(SUM(CASE WHEN rk <= {SOURCE_CAP} THEN n_chars ELSE 0 END) AS BIGINT)
         AS kept_chars,
       MIN(CASE WHEN rk <= {SOURCE_CAP} THEN n_chars END) AS cutoff_chars
FROM ranked
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Per-source distribution drift: chi-square distance between each
# source's document-length histogram and the corpus-wide one — the
# "did this crawl/feed change shape" monitor that catches a source
# whose scraper broke (truncated pages, boilerplate floods) even when
# its row COUNT looks normal (count drift is snapshot_metric_drift's
# job). PSI is the textbook choice but needs log(); the chi-square
# statistic sum (p-q)^2/(p+q) ranks drift identically and uses only
# +,*,/ — folded in sorted bin order on both engines, so the oracle
# hash is bit-exact (same reasoning as token_diversity / BM25).
#
# Scale: histograms only — two map-side-combinable groupBys on
# (source, bin) / (bin) whose output is |sources| x NBINS rows, a
# broadcast join of the tiny global histogram, and a fold over
# <= NBINS terms per source. The corpus is scanned once, never
# shuffled; the global total rides a window over the NBINS-row
# histogram, not a second scan.
# ---------------------------------------------------------------------------
DRIFT_BIN_WIDTH = 100
DRIFT_NBINS = 10
DRIFT_CHI2 = 0.1


def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bin_col = (
        F.least(
            F.floor(F.col("n_chars") / DRIFT_BIN_WIDTH),
            F.lit(DRIFT_NBINS - 1),
        )
        .cast("int")
        .alias("bin")
    )
    per = docs.select("source", bin_col).groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_sb")
    )
    src_tot = per.groupBy("source").agg(F.sum("n_sb").alias("n_s"))
    glob = (
        per.groupBy("bin")
        .agg(F.sum("n_sb").alias("n_b"))
        .withColumn("n_total", F.sum("n_b").over(W.partitionBy()))
    )
    p = F.col("n_sb").cast("double") / F.col("n_s")
    q = F.col("n_b").cast("double") / F.col("n_total")
    term = (p - q) * (p - q) / (p + q)
    chi2 = F.expr(
        "aggregate(array_sort(collect_list(bt)), CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + x.t)"
    )
    return (
        per.join(src_tot, "source")
        .join(F.broadcast(glob), "bin")
        .select("source", "n_s", F.struct("bin", term.alias("t")).alias("bt"))
        .groupBy("source")
        .agg(
            F.first("n_s").alias("n_docs"),
            chi2.alias("chi2"),
        )
        .select(
            "source",
            "n_docs",
            "chi2",
            (F.col("chi2") > DRIFT_CHI2).alias("drifted"),
        )
        .orderBy("source")
    )


ORACLE["source_drift"] = f"""
WITH binned AS (
  SELECT source,
         CAST(least(floor(n_chars / {DRIFT_BIN_WIDTH}), {DRIFT_NBINS - 1})
              AS INT) AS bin
  FROM documents
), per AS (
  SELECT source, bin, COUNT(*) AS n_sb FROM binned GROUP BY source, bin
), st AS (
  SELECT source, SUM(n_sb) AS n_s FROM per GROUP BY source
), gl AS (
  SELECT bin, SUM(n_sb) AS n_b,
         SUM(SUM(n_sb)) OVER () AS n_total
  FROM per GROUP BY bin
), terms AS (
  SELECT p.source, CAST(s.n_s AS BIGINT) AS n_docs, p.bin,
         (CAST(p.n_sb AS DOUBLE) / s.n_s) AS pp,
         (CAST(g.n_b AS DOUBLE) / g.n_total) AS qq
  FROM per p JOIN st s USING (source) JOIN gl g USING (bin)
)
SELECT source, n_docs,
       list_reduce(list_transform(
         list_sort(list({{'bin': bin,
                          't': (pp - qq) * (pp - qq) / (pp + qq)}})),
         x -> x.t), (a, b) -> a + b) AS chi2,
       list_reduce(list_transform(
         list_sort(list({{'bin': bin,
                          't': (pp - qq) * (pp - qq) / (pp + qq)}})),
         x -> x.t), (a, b) -> a + b) > {DRIFT_CHI2} AS drifted
FROM terms
GROUP BY source, n_docs ORDER BY source
"""


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov drift — the bin-free companion
# to q_source_drift's chi-square: for every source, the KS distance
# between its doc-length distribution and the REST of the corpus,
# evaluated exactly (no binning, no approximation). KS is the
# standard "did this feed's shape move" test; the chi-square above
# needs a bin width chosen in advance, KS does not.
#
# Exactness: the CDF difference at grid value x is
# |cum_a*n_b - cum_b*n_a| / (n_a*n_b); numerator and both counts are
# int64, so the argmax is computed entirely in integers and the ONE
# double division happens after the max — bit-identical cross-engine
# (same pattern as pps_sample).
#
# Scale: two map-side-combinable groupBys (per-(source,len) and
# per-len histograms), then a |sources| x |distinct lengths| dense
# grid via a broadcast cross join of two TINY aggregates (doc length
# has bounded support; the corpus itself is scanned once and never
# shuffled). Window cumsums run per source over the small grid.
# ---------------------------------------------------------------------------
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("source", "n_chars")
    per = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c_a"))
    glob = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c_tot"))
    sources = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_a"))
    grid = glob.select("n_chars", "c_tot")
    n_total = docs.count()  # one scalar; the grid is derived, not re-scanned

    dense = (
        sources.crossJoin(F.broadcast(grid))
        .join(per, ["source", "n_chars"], "left")
        .select(
            "source",
            "n_chars",
            "n_a",
            F.coalesce(F.col("c_a"), F.lit(0)).alias("c_a"),
            "c_tot",
        )
    )
    wcum = W.partitionBy("source").orderBy("n_chars").rowsBetween(
        W.unboundedPreceding, 0
    )
    diffs = dense.select(
        "source",
        "n_chars",
        "n_a",
        F.sum("c_a").over(wcum).alias("cum_a"),
        F.sum("c_tot").over(wcum).alias("cum_t"),
    ).select(
        "source",
        "n_chars",
        "n_a",
        (F.lit(n_total) - F.col("n_a")).alias("n_b"),
        F.abs(
            F.col("cum_a") * (F.lit(n_total) - F.col("n_a"))
            - (F.col("cum_t") - F.col("cum_a")) * F.col("n_a")
        ).alias("num"),
    )
    best = diffs.groupBy("source", "n_a", "n_b").agg(F.max("num").alias("max_num"))
    return (
        best.join(diffs, ["source", "n_a", "n_b"])
        .where(F.col("num") == F.col("max_num"))
        .groupBy("source", "n_a", "n_b", "max_num")
        .agg(F.min("n_chars").alias("at_length"))
        .select(
            "source",
            "n_a",
            "n_b",
            (
                F.col("max_num").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("ks_stat"),
            "at_length",
        )
        .orderBy("source")
    )


ORACLE["ks_drift"] = """
WITH per AS (
  SELECT source, n_chars, COUNT(*) AS c_a
  FROM documents GROUP BY source, n_chars
), lens AS (
  SELECT n_chars, COUNT(*) AS c_tot FROM documents GROUP BY n_chars
), srcs AS (
  SELECT source, COUNT(*) AS n_a FROM documents GROUP BY source
), tot AS (SELECT COUNT(*) AS n FROM documents),
dense AS (
  SELECT s.source, g.n_chars, s.n_a, COALESCE(p.c_a, 0) AS c_a, g.c_tot
  FROM srcs s CROSS JOIN lens g
  LEFT JOIN per p ON p.source = s.source AND p.n_chars = g.n_chars
), diffs AS (
  SELECT source, n_chars, n_a,
         CAST((SELECT n FROM tot) - n_a AS BIGINT) AS n_b,
         ABS(SUM(c_a) OVER w * ((SELECT n FROM tot) - n_a)
             - (SUM(c_tot) OVER w - SUM(c_a) OVER w) * n_a) AS num
  FROM dense
  WINDOW w AS (PARTITION BY source ORDER BY n_chars ROWS UNBOUNDED PRECEDING)
), best AS (
  SELECT source, n_a, n_b, MAX(num) AS max_num
  FROM diffs GROUP BY source, n_a, n_b
)
SELECT b.source, b.n_a, b.n_b,
       CAST(b.max_num AS DOUBLE) / (CAST(b.n_a AS DOUBLE) * b.n_b) AS ks_stat,
       CAST(MIN(d.n_chars) AS BIGINT) AS at_length
FROM best b JOIN diffs d
  ON d.source = b.source AND d.num = b.max_num
GROUP BY b.source, b.n_a, b.n_b, b.max_num
ORDER BY b.source
"""


# ---------------------------------------------------------------------------
# N-gram novelty profile — per-source memorization risk: what share
# of each document's word shingles appears NOWHERE else in the
# corpus? A source full of corpus-unique n-grams contributes fresh
# text; one whose shingles all recur elsewhere is boilerplate or
# near-duplicate mass (and trains a model toward memorization). The
# source-level report that complements per-pair dedup: dedup finds
# WHICH docs collide, novelty measures HOW MUCH of a feed is
# recycled.
#
# Exactness: per-doc novelty = unique/total is one int64 division;
# the per-source mean routes through the exact decimal path. Scale:
# reuses the shingle derivation (one tokenize projection), one
# map-side-combinable groupBy on 8-byte-hashable shingles for
# document frequency, one equi-join of (shingle -> df) back onto the
# exploded pairs — text never shuffles, only shingles do, same as
# every dedup path in operators/dedup.py.
# ---------------------------------------------------------------------------
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _shingled

    pairs = _shingled(spark, sf_dir).select(
        "doc_id", F.explode("shingles").alias("sh")
    )
    # shingles are distinct per doc, so COUNT(*) per shingle IS the
    # document frequency
    df_tbl = pairs.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        pairs.join(df_tbl, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
        .select(
            "doc_id",
            (F.col("n_unique").cast("double") / F.col("n_sh").cast("double")).alias(
                "novelty"
            ),
        )
    )
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    return (
        docs.join(per_doc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("novelty").alias("mean_novelty"),
            F.min("novelty").alias("min_novelty"),
            F.max("novelty").alias("max_novelty"),
        )
        .orderBy("source")
    )


ORACLE["ngram_novelty"] = f"""
WITH sh AS (
  SELECT doc_id,
         UNNEST(list_distinct(
           {word_shingles_sql("string_split(text, ' ')", SHINGLE_N)}
         )) AS s
  FROM documents
), dfs AS (
  SELECT s, COUNT(*) AS df FROM sh GROUP BY s
), per_doc AS (
  SELECT sh.doc_id,
         CAST(SUM(CASE WHEN dfs.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS novelty
  FROM sh JOIN dfs USING (s)
  GROUP BY sh.doc_id
)
SELECT d.source, COUNT(*) AS n_docs,
       {davg_sql('p.novelty')} AS mean_novelty,
       MIN(p.novelty) AS min_novelty,
       MAX(p.novelty) AS max_novelty
FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
GROUP BY d.source
ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# Hellinger term-distribution drift — per-source divergence of the
# TERM (unigram) distribution from the corpus-wide one, the lexical
# complement of q_source_drift's length-histogram chi-square: a feed
# that keeps its length profile but floods one phrase (boilerplate,
# spam templates) moves here first. Hellinger distance
# H^2 = 1/2 * sum_t (sqrt(p_t) - sqrt(q_t))^2 is the textbook
# f-divergence that needs NO log() (repo parity rule — KL/PSI do):
# IEEE sqrt is correctly rounded, so every term's contribution is
# bit-identical across engines. Terms absent from a source still
# contribute q_t; folding only the PRESENT (source, term) cells via
# H^2 = 1/2 * (1 + sum_present((sqrt(p)-sqrt(q))^2 - q)) keeps the
# aggregation sparse. Per-cell double terms route through the exact
# DECIMAL(25,10) sum — order-independent, no sorted-fold collect.
#
# Scale (100 TB): one tokenize+explode pass aggregated per
# (source, term) with map-side combine (|sources| x |vocab| rows);
# marginals derive from THAT frame — no second corpus scan — and
# broadcast back. Unlike the chi-square fold in q_source_drift
# (sorted collect_list over NBINS rows), the decimal-sum route here
# stays distributed even when |vocab| is millions.
# ---------------------------------------------------------------------------
def q_hellinger_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.oracle import dsum
    from ..functions.hashing import tokens

    docs = _docs(spark, sf_dir)
    st = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c_ts"))
    )
    per_source = st.groupBy("source").agg(F.sum("c_ts").alias("tokens_s"))
    per_term = (
        st.groupBy("term")
        .agg(F.sum("c_ts").alias("c_t"))
        .withColumn("c_total", F.sum("c_t").over(W.partitionBy()))
    )
    p = F.col("c_ts").cast("double") / F.col("tokens_s").cast("double")
    q = F.col("c_t").cast("double") / F.col("c_total").cast("double")
    contrib = (F.sqrt(p) - F.sqrt(q)) * (F.sqrt(p) - F.sqrt(q)) - q
    h2 = (F.lit(1.0) + F.col("s_contrib")) / F.lit(2.0)
    return (
        st.join(F.broadcast(per_source), "source")
        .join(F.broadcast(per_term), "term")
        .groupBy("source")
        .agg(
            F.first("tokens_s").alias("n_tokens"),
            dsum(contrib).alias("s_contrib"),
        )
        .select(
            "source",
            "n_tokens",
            h2.alias("hellinger_sq"),
            F.sqrt(h2).alias("hellinger"),
        )
        .orderBy("source")
    )


ORACLE["hellinger_drift"] = f"""
WITH st AS (
  SELECT source, term, COUNT(*) AS c_ts
  FROM (
    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
  )
  WHERE term <> ''
  GROUP BY source, term
), ps AS (
  SELECT source, SUM(c_ts) AS tokens_s FROM st GROUP BY source
), pt AS (
  SELECT term, SUM(c_ts) AS c_t,
         SUM(SUM(c_ts)) OVER () AS c_total
  FROM st GROUP BY term
), agg AS (
  SELECT source, MIN(tokens_s) AS n_tokens,
         CAST(CAST(SUM(CAST((sqrt(CAST(c_ts AS DOUBLE) / CAST(tokens_s AS DOUBLE)) - sqrt(CAST(c_t AS DOUBLE) / CAST(c_total AS DOUBLE))) * (sqrt(CAST(c_ts AS DOUBLE) / CAST(tokens_s AS DOUBLE)) - sqrt(CAST(c_t AS DOUBLE) / CAST(c_total AS DOUBLE))) - CAST(c_t AS DOUBLE) / CAST(c_total AS DOUBLE) AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS s_contrib
  FROM st JOIN ps USING (source) JOIN pt USING (term)
  GROUP BY source
)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       (1.0 + s_contrib) / 2.0 AS hellinger_sq,
       sqrt((1.0 + s_contrib) / 2.0) AS hellinger
FROM agg
ORDER BY source
"""
