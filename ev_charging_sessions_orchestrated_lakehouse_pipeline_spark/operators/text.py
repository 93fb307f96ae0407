"""Text-analysis operators over the ``documents`` table — the
language-ID / quality-scoring / token-counting / fingerprinting layer
a large-scale training-data pipeline needs (BASELINE.json north star;
beyond the reference's own surface).

Everything here is built-in-expression work (split / transform /
filter / aggregate higher-order functions) — zero Python UDFs, so the
whole module rides WholeStageCodegen and scales linearly with input
splits: no shuffle in any per-document metric, making these safe at
100 TB (pure map-side).

Every query has a DuckDB oracle twin (md5-based hashing from
functions/hashing.py keeps fingerprints engine-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.localframe import local_df
from ..functions.hashing import hash60, hash60_sql, tokens, word_shingles_sql

ORACLE: dict[str, str] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, "documents")


# Stopword sets for the n-gram/stopword language heuristic. Tiny on
# purpose: they broadcast inside the expression tree as literals.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "en"],
}


def _in_list_expr(var: str, values: list[str]) -> str:
    quoted = ", ".join(f"'{v}'" for v in values)
    return f"{var} IN ({quoted})"


# ---------------------------------------------------------------------------
# Per-document statistics: lengths, token counts, ratios.
# ---------------------------------------------------------------------------
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_observed"),
        F.expr("size(split(text, ' '))").alias("n_tokens"),
        F.expr("size(array_distinct(split(text, ' ')))").alias("n_distinct_tokens"),
        (F.length(F.regexp_replace("text", "[^a-z]", "")).cast("double") / F.length("text")).alias("alpha_ratio"),
        F.expr(
            "size(filter(split(text, ' '), t -> "
            + _in_list_expr("t", STOPWORDS["en"])
            + "))"
        ).alias("n_stopwords"),
    )


ORACLE["text_stats"] = f"""
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars_observed,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens,
       CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
       CAST(len(list_filter(string_split(text, ' '), t -> {_in_list_expr('t', STOPWORDS['en'])})) AS INT) AS n_stopwords
FROM documents
"""


# ---------------------------------------------------------------------------
# Language ID: argmax of per-language stopword hit ratios (n-gram
# heuristic). Deterministic tie-break by fixed language order.
# ---------------------------------------------------------------------------
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    out = docs
    langs = list(STOPWORDS)
    for lang in langs:
        out = out.withColumn(
            f"score_{lang}",
            F.expr(
                "size(filter(split(text, ' '), t -> "
                + _in_list_expr("t", STOPWORDS[lang])
                + "))"
            ),
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return out.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        *[F.col(f"score_{lang}") for lang in langs],
    )


def _lang_id_oracle() -> str:
    score = {
        lang: f"CAST(len(list_filter(string_split(text, ' '), t -> {_in_list_expr('t', words)})) AS INT)"
        for lang, words in STOPWORDS.items()
    }
    scores_sql = ",\n       ".join(f"{expr} AS score_{lang}" for lang, expr in score.items())
    langs = list(STOPWORDS)
    greatest = f"greatest({', '.join('score_' + lang for lang in langs)})"
    case = "CASE WHEN " + greatest + " = 0 THEN 'und' "
    for lang in langs:
        case += f"WHEN score_{lang} = {greatest} THEN '{lang}' "
    case += "END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang, {scores_sql}
  FROM documents
)
SELECT doc_id, lang, {case} AS predicted_lang,
       {', '.join('score_' + lang for lang in langs)}
FROM scored
"""


ORACLE["lang_id"] = _lang_id_oracle()


# ---------------------------------------------------------------------------
# Token counting, BPE-ish: regex token classes (letter runs, digit
# runs, single punctuation) — the pre-tokenizer shape real BPE uses.
# ---------------------------------------------------------------------------
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all(text, '{BPE_PATTERN}', 0))").alias("n_bpe_tokens"),
        F.expr("size(split(text, ' '))").alias("n_ws_tokens"),
    )


ORACLE["token_count"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS INT) AS n_bpe_tokens,
       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# Document fingerprinting: whole-text digest + 60-bit integer
# fingerprint of the normalized text (lower, trim, collapse spaces).
# ---------------------------------------------------------------------------
NORMALIZE_EXPR = "trim(regexp_replace(lower(text), ' +', ' '))"
NORMALIZE_SQL = "trim(regexp_replace(lower(text), ' +', ' ', 'g'))"


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    norm = F.expr(NORMALIZE_EXPR)
    return docs.select(
        "doc_id",
        F.md5(norm).alias("digest"),
        hash60(norm).alias("fingerprint"),
    )


ORACLE["fingerprint"] = f"""
SELECT doc_id,
       md5({NORMALIZE_SQL}) AS digest,
       {hash60_sql(NORMALIZE_SQL)} AS fingerprint
FROM documents
"""


# ---------------------------------------------------------------------------
# Quality scoring: composite of length, alpha ratio, stopword density
# (the heuristics used to filter web-scraped training data).
# ---------------------------------------------------------------------------
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    n_tokens = F.expr("size(split(text, ' '))").cast("double")
    alpha = F.length(F.regexp_replace("text", "[^a-z]", "")).cast("double") / F.length("text")
    stop_ratio = (
        F.expr(
            "size(filter(split(text, ' '), t -> "
            + _in_list_expr("t", STOPWORDS["en"])
            + "))"
        ).cast("double")
        / n_tokens
    )
    length_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_score + F.lit(0.4) * alpha + F.lit(0.2) * stop_ratio
    )
    return docs.select(
        "doc_id",
        score.alias("quality_score"),
        (score >= 0.35).alias("keep"),
    )


ORACLE["quality_score"] = f"""
WITH feats AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha,
         CAST(len(list_filter(string_split(text, ' '), t -> {_in_list_expr('t', STOPWORDS['en'])})) AS DOUBLE) AS n_stop
  FROM documents
)
SELECT doc_id,
       0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * alpha + 0.2 * (n_stop / n_tokens) AS quality_score,
       (0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * alpha + 0.2 * (n_stop / n_tokens)) >= 0.35 AS keep
FROM feats
"""


# ---------------------------------------------------------------------------
# Rolling-hash document fingerprint (Rabin-Karp polynomial over the
# token stream — ORDER-SENSITIVE, unlike the digest fingerprint
# above: reordering tokens changes it). One aggregate fold over a
# materialized hash array, pure map-side. Arithmetic is carried
# mod 2^40 so the identical formula is exact in both engines
# (Spark wraps int64 silently; DuckDB raises on overflow).
# ---------------------------------------------------------------------------
_RH_MOD = 1 << 40


def q_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn(
        "th",
        F.expr(
            "transform(split(text, ' '), t -> "
            "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS LONG))"
        ),
    )
    rolling = F.expr(
        f"aggregate(th, 0L, (acc, h) -> (acc * 31 + h % {_RH_MOD}) % {_RH_MOD})"
    )
    return docs.select("doc_id", rolling.alias("rolling_hash"))


ORACLE["fingerprint_rolling"] = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          t -> {hash60_sql('t')})),
         (acc, h) -> (acc * 31 + h % {_RH_MOD}) % {_RH_MOD}
       ) AS rolling_hash
FROM documents
"""


# ---------------------------------------------------------------------------
# JSON scalar functions over events.props (SURVEY.md §7.2 step 5's
# json family): per-row extraction stays in codegen
# (get_json_object), aggregated per event type. At scale, parse JSON
# ONCE into a materialized column before multiple extractions —
# from_json per field re-parses the document each time.
# ---------------------------------------------------------------------------
def q_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_fixture

    ev = read_fixture(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


ORACLE["json_functions"] = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary statistics (tokenizer-training input): document
# frequency and collection frequency per term. One explode + one
# groupBy — the groupBy is map-side combinable so the shuffle carries
# (term, partial df, partial tf) not raw tokens; at 100 TB add a
# frequency floor (HAVING) before any driver-side consumption. Counts
# are integers — bit-exact across engines, no float hazard.
# ---------------------------------------------------------------------------
def q_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 terms by document frequency (ties broken by term)."""
    docs = _docs(spark, sf_dir)
    term = F.explode(tokens(F.col("text"))).alias("term")
    return (
        docs.select("doc_id", term)
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
        )
        .orderBy(F.desc("df"), F.desc("tf"), "term")
        .limit(100)
    )


ORACLE["vocabulary"] = """
SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
)
WHERE term <> ''
GROUP BY term
ORDER BY df DESC, tf DESC, term
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Adjacent-bigram counts (language-model corpus statistics). The
# bigram array is built with a zip of the token array against its own
# tail — pure array expressions, no self-join, no second explode.
# ---------------------------------------------------------------------------
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent word bigrams across the corpus."""
    docs = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


ORACLE["top_bigrams"] = """
SELECT t[i] || ' ' || t[i + 1] AS bigram, COUNT(*) AS n
FROM (
  SELECT string_split(text, ' ') AS t,
         unnest(range(1, len(string_split(text, ' ')))) AS i
  FROM documents
)
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 50
"""


# ---------------------------------------------------------------------------
# BM25 relevance scoring against a fixed query — the retrieval-side
# primitive of a data-curation pipeline (rank a 100 TB corpus by
# relevance to a probe query, e.g. for domain up-sampling).
#
# Scale design: term frequencies for a FIXED small query need no
# explode and no inverted index — tf per term is one higher-order
# ``size(filter(tokens, t -> t = term))`` expression, so the whole
# scoring pass is map-side codegen over the corpus. The global
# scalars (N, df per term, avgdl) are ONE aggregate job whose
# single-row result broadcast-joins back (Spark picks
# BroadcastNestedLoopJoin for the 1-row cross join). Top-k is
# TakeOrderedAndProject — no full sort materializes.
#
# Engine-parity note: the idf uses the RATIONAL form
# (N - df + 0.5)/(df + 0.5) WITHOUT the usual log() — Math.log and
# libm log may differ in the last ulp across engines, which would
# break the bit-exact oracle hash. The rational idf is a monotone
# transform of the log form, so rankings are preserved; every
# remaining operation is IEEE +,*,/ evaluated in identical textual
# order on both engines.
# ---------------------------------------------------------------------------
BM25_QUERY_TERMS = ["spark", "query", "filter"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 100


def _bm25_score_sql(dialect: str) -> tuple[list[str], str]:
    """(per-doc tf column exprs, score expr over tf/dl/scalar cols).
    The score text is IDENTICAL for both engines so IEEE evaluation
    order matches; only the tf extraction differs per dialect."""
    tf_fn = (
        "size(filter(split(text, ' '), t -> t = '{w}'))"
        if dialect == "spark"
        else "len(list_filter(string_split(text, ' '), t -> t = '{w}'))"
    )
    tfs = [tf_fn.format(w=w) for w in BM25_QUERY_TERMS]
    parts = []
    for i in range(len(BM25_QUERY_TERMS)):
        idf = (
            f"((CAST(n_docs - df{i} AS DOUBLE) + 0.5) / "
            f"(CAST(df{i} AS DOUBLE) + 0.5))"
        )
        norm = (
            f"(CAST(tf{i} AS DOUBLE) + {BM25_K1} * "
            f"(1.0 - {BM25_B} + {BM25_B} * CAST(dl AS DOUBLE) / avgdl))"
        )
        parts.append(
            f"({idf} * (CAST(tf{i} AS DOUBLE) * {BM25_K1 + 1}) / {norm})"
        )
    return tfs, " + ".join(parts)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tfs, score = _bm25_score_sql("spark")
    base = docs.select(
        "doc_id",
        F.expr("size(split(text, ' '))").alias("dl"),
        *[F.expr(t).alias(f"tf{i}") for i, t in enumerate(tfs)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(tfs))
        ],
    ).withColumn("avgdl", F.expr("CAST(sum_dl AS DOUBLE) / n_docs"))
    return (
        base.join(F.broadcast(stats))
        .select("doc_id", F.expr(score).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


def _bm25_oracle() -> str:
    tfs, score = _bm25_score_sql("duckdb")
    tf_cols = ", ".join(
        f"CAST({t} AS BIGINT) AS tf{i}" for i, t in enumerate(tfs)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(tfs))
    )
    return f"""
WITH base AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         {tf_cols}
  FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM base
), stats2 AS (
  SELECT *, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl FROM stats
)
SELECT doc_id, {score} AS bm25
FROM base, stats2
WHERE {score} > 0
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOPK}
"""


ORACLE["bm25_topk"] = _bm25_oracle()


# ---------------------------------------------------------------------------
# Intra-document repetition scoring — the Gopher/MassiveText-family
# quality filter (high duplicate-n-gram fraction marks boilerplate /
# spam / generation loops). Pure array-expression work: token and
# n-gram arrays are built once per row (let-bound), sizes compared —
# zero shuffle, the filter is map-side at any corpus size.
# Counts are exact ints; the two fractions are single divisions of
# those ints, bit-identical across engines.
# ---------------------------------------------------------------------------
def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import let_sql, word_shingles_expr

    docs = _docs(spark, sf_dir)
    tri = word_shingles_expr("split(text, ' ')", 3)
    base = docs.select(
        "doc_id",
        F.expr("size(split(text, ' '))").alias("n_tokens"),
        F.expr(
            let_sql("split(text, ' ')", "t", "size(array_distinct(t))")
        ).alias("n_distinct_tokens"),
        F.size(tri).alias("n_trigrams"),
        F.size(F.array_distinct(tri)).alias("n_distinct_trigrams"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "n_trigrams",
        "n_distinct_trigrams",
        (
            (F.col("n_tokens") - F.col("n_distinct_tokens")).cast("double")
            / F.col("n_tokens")
        ).alias("dup_token_frac"),
        F.when(
            F.col("n_trigrams") > 0,
            (F.col("n_trigrams") - F.col("n_distinct_trigrams")).cast("double")
            / F.col("n_trigrams"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    ).orderBy("doc_id")


def _repetition_oracle() -> str:
    from ..functions.hashing import word_shingles_sql

    tri = word_shingles_sql("string_split(text, ' ')", 3)
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
           AS n_distinct_tokens,
         CAST(len({tri}) AS INTEGER) AS n_trigrams,
         CAST(len(list_distinct({tri})) AS INTEGER) AS n_distinct_trigrams
  FROM documents
)
SELECT doc_id, n_tokens, n_distinct_tokens, n_trigrams, n_distinct_trigrams,
       CAST(n_tokens - n_distinct_tokens AS DOUBLE) / n_tokens
         AS dup_token_frac,
       CASE WHEN n_trigrams > 0
            THEN CAST(n_trigrams - n_distinct_trigrams AS DOUBLE) / n_trigrams
            ELSE 0.0 END AS dup_trigram_frac
FROM base ORDER BY doc_id
"""


ORACLE["repetition_scores"] = _repetition_oracle()


# ---------------------------------------------------------------------------
# PII-style masking audit over the events.props JSON payloads — the
# scrubbing pass a training pipeline runs before text ever reaches a
# tokenizer. Masks digit runs (the stand-in detectable class in this
# synthetic fixture; production adds email/phone/ID regexes to the
# same plan) and reports per-event-type masking volume. regexp work
# is JVM codegen; the rollup shuffles 3 small aggregate columns.
# DuckDB needs the 'g' flag for global replacement to match Spark's
# replace-all regexp_replace semantics.
# ---------------------------------------------------------------------------
PII_DIGIT_RUN = "[0-9]+"
PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"


def q_pii_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_fixture

    ev = read_fixture(spark, sf_dir, "events")
    masked = F.regexp_replace("props", PII_DIGIT_RUN, "#")
    n_digit_chars = F.length("props") - F.length(
        F.regexp_replace("props", "[0-9]", "")
    )
    has_email = F.col("props").rlike(PII_EMAIL)
    return (
        ev.select(
            "event_type",
            n_digit_chars.alias("n_digit_chars"),
            F.length(masked).alias("masked_len"),
            has_email.cast("long").alias("has_email"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("n_digit_chars").alias("total_digit_chars"),
            F.sum("masked_len").alias("total_masked_len"),
            F.sum("has_email").alias("n_email_like"),
        )
        .orderBy("event_type")
    )


ORACLE["pii_masking"] = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(length(props) -
                length(regexp_replace(props, '[0-9]', '', 'g'))) AS BIGINT)
         AS total_digit_chars,
       CAST(SUM(length(regexp_replace(props, '{PII_DIGIT_RUN}', '#', 'g')))
         AS BIGINT) AS total_masked_len,
       CAST(SUM(CASE WHEN regexp_matches(props,
                '{PII_EMAIL}') THEN 1 ELSE 0 END) AS BIGINT) AS n_email_like
FROM events
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Corpus report card — the "dataset card" rollup every training run
# records: per (source, lang) document/char/token volumes and mean
# lengths. One map-side-combinable groupBy; integer totals are exact,
# the two means are single divisions of those exact ints.
# ---------------------------------------------------------------------------
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            "source",
            "lang",
            F.col("n_chars"),
            F.expr("size(split(text, ' '))").alias("n_tokens"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "*",
            (F.col("total_chars").cast("double") / F.col("n_docs")).alias(
                "mean_chars"
            ),
            (F.col("total_tokens").cast("double") / F.col("n_docs")).alias(
                "mean_tokens"
            ),
        )
        .orderBy("source", "lang")
    )


ORACLE["corpus_report"] = """
WITH base AS (
  SELECT source, lang, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), agg AS (
  SELECT source, lang,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM base GROUP BY source, lang
)
SELECT source, lang, n_docs, total_chars, total_tokens,
       CAST(total_chars AS DOUBLE) / n_docs AS mean_chars,
       CAST(total_tokens AS DOUBLE) / n_docs AS mean_tokens
FROM agg ORDER BY source, lang
"""


# ---------------------------------------------------------------------------
# Document chunking — the 1->N window transform feeding embedding /
# retrieval indexes: fixed-size token windows with overlap
# (size 50, stride 40 => 10-token overlap). The chunk list is built
# in ONE let-bound array expression and exploded — no shuffle, the
# output is chunk METADATA + digest (chunk text re-materializes
# downstream only where needed; shipping md5 instead of text keeps
# the explode output narrow at 100 TB).
# Chunk starts are 0, stride, 2*stride, ... while start < n_tokens
# (ceil(n/stride) chunks; the tail chunk may be short) — the rule is
# mirrored exactly in the oracle.
# ---------------------------------------------------------------------------
CHUNK_SIZE = 50
CHUNK_STRIDE = 40


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import let_sql

    docs = _docs(spark, sf_dir)
    chunks = let_sql(
        "split(text, ' ')",
        "t",
        f"transform(sequence(0, CAST(ceil(size(t) / {CHUNK_STRIDE}.0D) AS INT) - 1), "
        f"i -> struct(i AS chunk_idx, "
        f"size(slice(t, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})) AS n_chunk_tokens, "
        f"md5(concat_ws(' ', slice(t, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}))) "
        f"AS chunk_digest))",
    )
    return (
        docs.select("doc_id", F.explode(F.expr(chunks)).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.n_chunk_tokens", "c.chunk_digest")
        .orderBy("doc_id", "chunk_idx")
    )


ORACLE["doc_chunking"] = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
), idx AS (
  SELECT doc_id, t, n,
         unnest(generate_series(0,
                CAST(ceil(n / {CHUNK_STRIDE}.0) AS INTEGER) - 1)) AS chunk_idx
  FROM toks
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(len(list_slice(t, chunk_idx * {CHUNK_STRIDE} + 1,
                           least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}, n)))
            AS INTEGER) AS n_chunk_tokens,
       md5(array_to_string(list_slice(t, chunk_idx * {CHUNK_STRIDE} + 1,
                           least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}, n)),
                           ' ')) AS chunk_digest
FROM idx
ORDER BY doc_id, chunk_idx
"""


# ---------------------------------------------------------------------------
# Lexical diversity — the repetitiveness signal quality pipelines
# gate on (templated / spun text has few distinct tokens). Two
# rational measures per document: type-token ratio (distinct/total)
# and the Simpson diversity index 1 - sum(p_i^2). Shannon entropy is
# the textbook choice but needs log(), and Math.log vs libm log can
# differ in the last ulp across engines (same reasoning as the BM25
# rational idf above); Simpson is a monotone-equivalent concentration
# measure using only +,*,/ folded in array_sort order — identical
# IEEE evaluation on both engines, bit-exact oracle hash.
#
# Scale: pure map-side expression (one let-bound token array per
# row, O(k·n) per doc for k distinct tokens), zero shuffle — the
# filter column comes for free with the scan at 100 TB.
# ---------------------------------------------------------------------------
def q_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import let_sql

    docs = _docs(spark, sf_dir)
    div = let_sql(
        "split(text, ' ')",
        "t",
        "named_struct("
        "'n_tokens', size(t), "
        "'n_distinct', size(array_distinct(t)), "
        "'simpson', CAST(1 AS DOUBLE) - aggregate("
        "array_sort(array_distinct(t)), CAST(0 AS DOUBLE), "
        "(acc, c) -> acc + transform("
        "array(CAST(size(filter(t, x -> x = c)) AS DOUBLE) / size(t)), "
        "p -> p * p)[0]))",
    )
    return (
        docs.select("doc_id", F.expr(div).alias("d"))
        .select(
            "doc_id",
            "d.n_tokens",
            "d.n_distinct",
            (F.col("d.n_distinct").cast("double") / F.col("d.n_tokens")).alias("ttr"),
            "d.simpson",
        )
        .orderBy("doc_id")
    )


ORACLE["token_diversity"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
       CAST(len(list_distinct(t)) AS INT) AS n_distinct,
       CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
       CAST(1 AS DOUBLE) - list_reduce(
         list_transform(list_sort(list_distinct(t)),
           c -> (CAST(len(list_filter(t, x -> x = c)) AS DOUBLE) / len(t))
              * (CAST(len(list_filter(t, x -> x = c)) AS DOUBLE) / len(t))),
         (a, b) -> a + b) AS simpson
FROM toks ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# C4-style within-document span dedup — a TRANSFORMATION, not a score:
# repetition_scores measures duplicate-span fraction, this removes the
# repeats. C4 drops duplicate lines / three-sentence spans inside each
# page; this fixture's documents have no line breaks, so the span unit
# is the non-overlapping 3-token chunk. First occurrence of each span
# is kept IN ORDER (indexed-lambda filter + first-position probe), the
# survivors are re-joined into the trimmed text. Pure per-row array
# work — no shuffle, rides WholeStageCodegen, safe at 100 TB. The
# O(spans^2) position probe is bounded by document length, the same
# bound repetition scoring already accepts.
# ---------------------------------------------------------------------------
def q_span_dedup_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import let_sql

    docs = _docs(spark, sf_dir)
    chunks = (
        "transform(sequence(0, ((size(t) + 2) div 3) - 1), "
        "i -> array_join(slice(t, i * 3 + 1, 3), ' '))"
    )
    body = let_sql(
        chunks,
        "c",
        "named_struct("
        "'n_spans', size(c), "
        "'kept', filter(c, (x, i) -> array_position(c, x) = i + 1))",
    )
    return (
        docs.select("doc_id", F.expr(let_sql("split(text, ' ')", "t", body)).alias("d"))
        .select(
            "doc_id",
            "d.n_spans",
            F.size("d.kept").alias("n_kept"),
            F.array_join("d.kept", " ").alias("trimmed_text"),
            (
                (F.col("d.n_spans") - F.size("d.kept")).cast("double")
                / F.col("d.n_spans")
            ).alias("span_dup_frac"),
        )
        .orderBy("doc_id")
    )


ORACLE["span_dedup_trim"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
chunked AS (
  SELECT doc_id,
         list_transform(generate_series(0, ((len(t) + 2) // 3) - 1),
           i -> array_to_string(list_slice(t, i * 3 + 1, i * 3 + 3), ' ')) AS c
  FROM toks
),
kept AS (
  SELECT doc_id, c,
         list_filter(c, (x, i) -> list_position(c, x) = i) AS k
  FROM chunked
)
SELECT doc_id,
       CAST(len(c) AS INT) AS n_spans,
       CAST(len(k) AS INT) AS n_kept,
       array_to_string(k, ' ') AS trimmed_text,
       CAST(len(c) - len(k) AS DOUBLE) / len(c) AS span_dup_frac
FROM kept ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Distinctive terms per source — contrastive term extraction: which
# words characterize THIS source against the rest of the corpus?
# Scored by share-lift, the rational form of log-odds keyness
# (monotone transform, so rankings agree while avoiding cross-engine
# libm log):
#   lift(t, s) = (c_ts / tokens_s) / (c_t / tokens_total)
#              = c_ts * tokens_total / (tokens_s * c_t)
# exact int64 products, one double division. The corpus-curation
# probe behind mixture design and source-quality review ("this feed
# is all boilerplate legalese").
#
# Scale: one tokenize+explode pass aggregated per (source, term) with
# map-side combine; global term counts and per-source token totals
# derive from THAT aggregate (no second corpus scan) and broadcast
# back. Top-k per source is a window over the filtered candidate set
# (min-count gate first, so the ranked frame is small).
# ---------------------------------------------------------------------------
DISTINCT_TERMS_MIN_COUNT = 10
DISTINCT_TERMS_TOPK = 10


def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    st = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c_ts"))
    )
    per_source = st.groupBy("source").agg(F.sum("c_ts").alias("tokens_s"))
    per_term = st.groupBy("term").agg(F.sum("c_ts").alias("c_t"))
    total = F.sum("c_ts").over(W.partitionBy())
    lift = (
        F.col("c_ts").cast("double") * F.col("tokens_total").cast("double")
    ) / (F.col("tokens_s").cast("double") * F.col("c_t").cast("double"))
    ranked = (
        st.select("source", "term", "c_ts", total.alias("tokens_total"))
        .where(F.col("c_ts") >= DISTINCT_TERMS_MIN_COUNT)
        .join(F.broadcast(per_source), "source")
        .join(F.broadcast(per_term), "term")
        .select("source", "term", "c_ts", "c_t", lift.alias("lift"))
    )
    wr = W.partitionBy("source").orderBy(F.desc("lift"), "term")
    return (
        ranked.select(
            "source", "term", "c_ts", "c_t", "lift",
            F.row_number().over(wr).cast("bigint").alias("rank"),
        )
        .where(F.col("rank") <= DISTINCT_TERMS_TOPK)
        .orderBy("source", "rank")
    )


ORACLE["distinctive_terms"] = f"""
WITH st AS (
  SELECT source, term, COUNT(*) AS c_ts
  FROM (
    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
  )
  WHERE term <> ''
  GROUP BY source, term
), per_source AS (
  SELECT source, SUM(c_ts) AS tokens_s FROM st GROUP BY source
), per_term AS (
  SELECT term, SUM(c_ts) AS c_t FROM st GROUP BY term
), tot AS (
  -- total over the UNFILTERED aggregate, like the Spark side's
  -- pre-filter window
  SELECT SUM(c_ts) AS n FROM st
), cand AS (
  SELECT s.source, s.term, s.c_ts, CAST(t.c_t AS BIGINT) AS c_t,
         CAST(s.c_ts AS DOUBLE) * CAST((SELECT n FROM tot) AS DOUBLE)
           / (CAST(p.tokens_s AS DOUBLE) * CAST(t.c_t AS DOUBLE)) AS lift
  FROM st s JOIN per_source p USING (source) JOIN per_term t USING (term)
  WHERE s.c_ts >= {DISTINCT_TERMS_MIN_COUNT}
)
SELECT source, term, c_ts, c_t, lift,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY lift DESC, term) AS rank
  FROM cand
)
WHERE rank <= {DISTINCT_TERMS_TOPK}
ORDER BY source, rank
"""


# ---------------------------------------------------------------------------
# Character-bigram merge candidates — the first iteration of BPE
# tokenizer training: count adjacent character pairs WITHIN words
# across the corpus and rank the top merge candidates. (Real BPE
# iterates merge-and-recount; the first round's counts are the
# expensive distributed part — later rounds work on the shrinking
# merged vocabulary — so this is the Spark-shaped kernel a tokenizer
# trainer calls in a loop.)
#
# Scale: one tokenize+explode to words (no shuffle yet), pairs
# emitted map-side with a higher-order transform over character
# positions (zero Python), then ONE map-side-combinable groupBy on
# the tiny pair key space (|alphabet|^2 bounded). All counts int64.
# ---------------------------------------------------------------------------
CHAR_MERGE_TOPK = 30


def q_char_bigram_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = docs.select(
        F.explode(tokens(F.col("text"))).alias("w")
    ).where(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(w) - 1), "
                "i -> substring(w, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(CHAR_MERGE_TOPK)
    )


ORACLE["char_bigram_merges"] = f"""
SELECT substr(w, i, 2) AS pair, COUNT(*) AS n
FROM (
  SELECT w, UNNEST(range(1, length(w))) AS i
  FROM (
    SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
  )
  WHERE length(w) >= 2
)
GROUP BY pair
ORDER BY n DESC, pair
LIMIT {CHAR_MERGE_TOPK}
"""


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps' law) — distinct-vocabulary size as
# the corpus grows, measured at document-count deciles: the
# corpus-planning statistic behind "how much new text until the
# tokenizer stops learning new types". Sub-linear growth is healthy;
# a curve that keeps climbing linearly means the corpus is full of
# unique noise (IDs, hashes), one that flatlines early means it's
# recycled boilerplate.
#
# Exact and one-pass over the payloads: terms are exploded against
# the RAW doc_id (no rank attached), aggregated term -> min(doc_id)
# (map-side combinable, shuffle bounded by |vocab|), and only then
# joined against a slim (doc_id, rank) frame. row_number() over a
# global ORDER BY doc_id is monotonic in doc_id, so
# min(rank) == rank(min(doc_id)) — the join-after-aggregate plan is
# value-identical to ranking before the explode, but the single-
# partition Exchange the global window needs carries 8-byte doc_ids
# only, never the text payload (the 100 TB constraint; the payload
# column stays in map-side explode/aggregate stages). n_docs comes
# from a 1-row broadcast aggregate instead of an eager driver count,
# so the query is a single job. At petabyte scale the same query runs
# on the (term, first_doc) aggregate a tokenizer pipeline already
# maintains.
# ---------------------------------------------------------------------------
HEAPS_BUCKETS = 10


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    firsts = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    ranked = docs.select("doc_id").select(
        "doc_id",
        F.row_number().over(W.orderBy("doc_id")).alias("first_rank"),
    )
    totals = ranked.agg(F.count(F.lit(1)).alias("n_docs"))
    firsts = (
        firsts.join(ranked, firsts.first_doc == ranked.doc_id)
        .crossJoin(F.broadcast(totals))
        .select("term", "first_rank", "n_docs")
    )
    bucket = F.least(
        F.lit(HEAPS_BUCKETS),
        F.ceil(
            F.col("first_rank")
            * F.lit(HEAPS_BUCKETS)
            / F.col("n_docs")
        ).cast("int"),
    )
    per_bucket = firsts.select(
        bucket.cast("bigint").alias("decile")
    ).groupBy("decile").agg(
        F.count(F.lit(1)).alias("new_terms")
    )
    wcum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return (
        per_bucket.select(
            "decile",
            "new_terms",
            F.sum("new_terms").over(wcum).alias("vocab_size"),
        )
        .orderBy("decile")
    )


ORACLE["vocab_growth"] = f"""
WITH ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rank, text
  FROM documents
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
firsts AS (
  SELECT term, MIN(rank) AS first_rank
  FROM (
    SELECT rank, UNNEST(string_split(text, ' ')) AS term FROM ranked
  )
  WHERE term <> ''
  GROUP BY term
), per_bucket AS (
  SELECT LEAST({HEAPS_BUCKETS},
               CAST(CEIL(first_rank * {HEAPS_BUCKETS}
                         / CAST((SELECT n_docs FROM n) AS DOUBLE)) AS INT))
           AS decile,
         COUNT(*) AS new_terms
  FROM firsts GROUP BY 1
)
SELECT decile, new_terms,
       CAST(SUM(new_terms) OVER (ORDER BY decile
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS vocab_size
FROM per_bucket
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Bigram language-model fluency score — the model-based quality gate
# (CCNet/RefinedWeb-style "LM perplexity filter") re-expressed with
# the corpus itself as the model: train an add-k-smoothed bigram LM
# from corpus counts, then score every document by its mean smoothed
# conditional probability avg(p(w_i | w_{i-1})). Templated/degenerate
# documents (repeating rare transitions) sink; fluent ones rise.
#
# Engine-parity: production LM filters use mean log-prob; log() is
# not bit-stable across engines (repo-wide rule), so the score is the
# arithmetic mean of the probabilities themselves — a deterministic
# rational statistic with the same "typical transitions score high"
# gradient. Each p is ONE double division of exact int64 counts, and
# the per-doc mean routes through the exact DECIMAL(25,10) sum, so
# the fold is order-independent.
#
# Scale (100 TB): one explode pass produces slim (doc_id, w1, w2)
# rows; the count model derives from THAT frame (no second corpus
# scan) and its size is bounded by observed bigram types, dwarfed by
# the corpus — AQE broadcasts it when small, else the join shuffles
# only slim key/count rows. The vocabulary size is a 1-row broadcast
# (the pinned BNLJ). Top-k is TakeOrderedAndProject.
# ---------------------------------------------------------------------------
LM_ADD_K = 0.5
LM_TOPK = 100


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = docs.select("doc_id", F.explode(bigrams).alias("b")).select(
        "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = c12.agg(F.countDistinct("w2").alias("v"))
    p = (F.col("c12").cast("double") + F.lit(LM_ADD_K)) / (
        F.col("c1").cast("double")
        + F.lit(LM_ADD_K) * F.col("v").cast("double")
    )
    from ..functions.oracle import DEC

    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum(p.cast(DEC)).cast("string").cast("double")
                / F.count(F.lit(1))
            ).alias("lm_score"),
        )
    )
    return scored.orderBy(F.desc("lm_score"), "doc_id").limit(LM_TOPK)


ORACLE["bigram_lm_score"] = f"""
WITH bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (
    SELECT doc_id, string_split(text, ' ') AS t,
           unnest(range(1, len(string_split(text, ' ')))) AS i
    FROM documents
  )
), c12 AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY w1
), vocab AS (
  SELECT COUNT(DISTINCT w2) AS v FROM c12
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(CAST(SUM(CAST(
         (CAST(c12.c12 AS DOUBLE) + {LM_ADD_K})
           / (CAST(c1.c1 AS DOUBLE) + {LM_ADD_K} * CAST(vocab.v AS DOUBLE))
         AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS lm_score
FROM bg
JOIN c12 USING (w1, w2)
JOIN c1 USING (w1)
CROSS JOIN vocab
GROUP BY doc_id
ORDER BY lm_score DESC, doc_id
LIMIT {LM_TOPK}
"""


# ---------------------------------------------------------------------------
# TF-IDF cosine near-duplicate pairs — the WEIGHTED complement of
# dedup_ngram_jaccard's set-overlap: documents are sparse TF-IDF
# vectors over word 3-shingle dimensions, and the top-k most-similar
# pairs by cosine surface soft rewrites that exact/minhash dedup
# misses (same rare shingles, different counts). The retrieval-side
# sibling of bm25_topk (which scores docs against a fixed query;
# this scores docs against each other).
#
# Engine-parity: idf uses the rational (N - df + 0.5)/(df + 0.5)
# form (no log(), same reasoning as BM25). Dot products and squared
# norms are DIM-SORTED IEEE folds (the source_drift pattern), NOT
# decimal sums: a tf-idf product's fractional tail is dense at the
# 10th decimal, where Spark's double->DECIMAL cast (via the shortest
# string representation) and DuckDB's (exact binary expansion) can
# round a half case apart — observed as 1-ulp cosine drift at sf0.1.
# A fold over the same doubles in the same (dim-hash) order is
# bit-identical with no decimal cast at all; the final cosine is ONE
# fixed-structure division dot / (norm_a * norm_b), and IEEE sqrt is
# correctly rounded.
#
# Scale (100 TB): the classic inverted-index self-join — candidate
# volume is sum(df^2) over shingle dimensions, NOT docs^2; dimensions
# hotter than TFIDF_DF_CAP are dropped from PAIR GENERATION only
# (their mass still counts in the norms), the same DF-cap recall
# contract as dedup_ngram_jaccard (MAX_SHINGLE_DF). Only slim
# (doc_id, dim-hash, weight) rows shuffle; text never leaves the
# scan. Top-k is TakeOrderedAndProject.
# ---------------------------------------------------------------------------
TFIDF_DF_CAP = 50
TFIDF_TOPK = 100


def _tfidf_weights(spark: SparkSession, sf_dir: str):
    from ..functions.hashing import word_shingles_expr

    docs = _docs(spark, sf_dir)
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                word_shingles_expr("split(text, ' ')", 3)
            ).alias("sh"),
        )
        .groupBy("doc_id", hash60("sh").alias("dim"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("dim").agg(F.count(F.lit(1)).alias("df"))
    n = _docs(spark, sf_dir).agg(F.count(F.lit(1)).alias("n"))
    w = F.col("tf").cast("double") * (
        (F.col("n").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    return (
        tf.join(df_, "dim")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "dim", "df", w.alias("w"))
    )


def q_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persisted: the weights frame feeds the norms aggregate AND the
    # posting-list index — unpersisted, the tokenize+shingle+tf+df
    # subtree (three shuffles) replays once per consumer.
    # Caller-clears-cache discipline as in dedup_ngram_jaccard.
    wts = _tfidf_weights(spark, sf_dir).persist()
    # Bit-exact double sums: collect (dim, term) structs, sort by the
    # dim hash, fold with IEEE + in that fixed order on both engines.
    fold = (
        "aggregate(array_sort(collect_list(dt)), CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + x.t)"
    )
    norms = (
        wts.select(
            "doc_id",
            F.struct(F.col("dim"), (F.col("w") * F.col("w")).alias("t")).alias("dt"),
        )
        .groupBy("doc_id")
        .agg(F.sqrt(F.expr(fold)).alias("norm"))
    )
    # ONE shuffle (groupBy dim) builds the inverted index; pairs and
    # their weight products generate MAP-SIDE from each posting list
    # via higher-order functions (the dedup_ngram_jaccard shape) —
    # no index self-join. sort_array orders by doc_id, so d1 < d2
    # comes free from the triangular slice.
    buckets = (
        wts.where(F.col("df") <= TFIDF_DF_CAP)
        .groupBy("dim")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "w"))).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = buckets.select(
        "dim",
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids) - i - 1), "
                "y -> struct(x.doc_id AS d1, y.doc_id AS d2, "
                "x.w * y.w AS prod))))"
            )
        ).alias("p"),
    ).select(
        F.col("p.d1").alias("d1"),
        F.col("p.d2").alias("d2"),
        F.struct(F.col("dim"), F.col("p.prod").alias("t")).alias("dt"),
    )
    inter = pairs.groupBy("d1", "d2").agg(F.expr(fold).alias("dot"))
    na = norms.select(F.col("doc_id").alias("d1"), F.col("norm").alias("norm1"))
    nb = norms.select(F.col("doc_id").alias("d2"), F.col("norm").alias("norm2"))
    return (
        inter.join(na, "d1")
        .join(nb, "d2")
        .select(
            "d1",
            "d2",
            (F.col("dot") / (F.col("norm1") * F.col("norm2"))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "d1", "d2")
        .limit(TFIDF_TOPK)
    )


ORACLE["tfidf_pairs"] = f"""
WITH tf AS (
  SELECT doc_id, {hash60_sql("sh")} AS dim, COUNT(*) AS tf
  FROM (
    SELECT doc_id, unnest({word_shingles_sql("t", 3)}) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  )
  GROUP BY doc_id, dim
), dfreq AS (
  SELECT dim, COUNT(*) AS df FROM tf GROUP BY dim
), n AS (
  SELECT COUNT(*) AS n FROM documents
), wts AS (
  SELECT doc_id, dim, df,
         CAST(tf AS DOUBLE)
           * ((CAST(n.n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5)) AS w
  FROM tf JOIN dfreq USING (dim) CROSS JOIN n
), norms AS (
  SELECT doc_id,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(
           list_sort(list({{'dim': dim, 't': w * w}})), x -> x.t)),
           (acc, x) -> acc + x)) AS norm
  FROM wts GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(
           list_sort(list({{'dim': a.dim, 't': a.w * b.w}})), x -> x.t)),
           (acc, x) -> acc + x) AS dot
  FROM wts a JOIN wts b ON a.dim = b.dim AND a.doc_id < b.doc_id
  WHERE a.df <= {TFIDF_DF_CAP} AND b.df <= {TFIDF_DF_CAP}
  GROUP BY d1, d2
)
SELECT d1, d2, dot / (na.norm * nb.norm) AS cosine
FROM pairs
JOIN norms na ON na.doc_id = d1
JOIN norms nb ON nb.doc_id = d2
ORDER BY cosine DESC, d1, d2
LIMIT {TFIDF_TOPK}
"""


# ---------------------------------------------------------------------------
# Iterative BPE merge table — K full byte-pair-encoding training
# iterations (the sequel to char_bigram_merges, which is iteration
# 1's count only): each round counts adjacent SYMBOL pairs across the
# corpus weighted by word frequency, merges the most frequent pair
# everywhere, and recounts. The output is the ordered merge table a
# tokenizer trainer ships.
#
# Scale (the Sennrich trick): the corpus collapses to the DISTINCT
# word-frequency table first — one shuffle on the word — and every
# iteration runs on that vocab-bounded frame (|vocab| rows, never the
# corpus). Segmentations ride as delimiter-encoded strings
# ("|c||a||t|"), so a merge is ONE JVM-side replace('|a||b|' ->
# '|ab|') — left-to-right non-overlapping, exactly greedy BPE, and
# bit-identical in DuckDB. The K best-pair picks are 1-row collects
# (the bounded-iteration Lloyd's pattern of kmeans_clusters).
# ---------------------------------------------------------------------------
BPE_MERGE_ITERS = 5


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Run BPE_MERGE_ITERS merge iterations; returns (persisted
    word-frequency base, final segmented frame, merge list). Caller
    must unpersist the base — after materializing anything derived
    from the final frame."""
    docs = _docs(spark, sf_dir)
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .where(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.lit("|"), F.concat_ws("||", F.split("w", "")), F.lit("|")
            ).alias("seq"),
            "cnt",
        )
        .persist()
    )
    cur = wf
    merges: list[tuple] = []
    for it in range(1, BPE_MERGE_ITERS + 1):
        pc = (
            cur.select(
                F.expr(
                    "split(substring(seq, 2, length(seq) - 2), "
                    "'\\\\|\\\\|')"
                ).alias("s"),
                "cnt",
            )
            .where(F.size("s") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1), "
                        "i -> struct(element_at(s, i) AS lhs, "
                        "element_at(s, i + 1) AS rhs))"
                    )
                ).alias("p"),
                "cnt",
            )
        )
        best = (
            pc.groupBy("p.lhs", "p.rhs")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "lhs", "rhs")
            .limit(1)
            .collect()  # bounded: exactly one row per iteration
        )
        if not best:
            break
        b = best[0]
        merges.append((it, b.lhs, b.rhs, b.lhs + b.rhs, int(b.n)))
        cur = cur.select(
            F.replace(
                "seq",
                F.lit(f"|{b.lhs}||{b.rhs}|"),
                F.lit(f"|{b.lhs}{b.rhs}|"),
            ).alias("seq"),
            "cnt",
        )
    return wf, cur, merges


def q_bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    wf, _cur, merges = _bpe_train(spark, sf_dir)
    wf.unpersist()
    return local_df(spark, 
        merges,
        "iteration int, lhs string, rhs string, merged string, n bigint",
    ).orderBy("iteration")


def _bpe_ctes(k: int) -> str:
    """The same K bounded iterations, unrolled as a CTE chain (the
    oracle may enumerate what the engine loops over)."""
    parts = [
        """wf0 AS MATERIALIZED (
  SELECT substr(x, 1, length(x) - 1) AS seq, cnt FROM (
    SELECT '|' || regexp_replace(w, '(.)', '\\1||', 'g') AS x, cnt FROM (
      SELECT w, COUNT(*) AS cnt FROM (
        SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
      ) WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
      GROUP BY w
    )
  )
)"""
    ]
    for i in range(1, k + 1):
        prev = f"wf{i - 1}"
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT s[j] AS lhs, s[j + 1] AS rhs, CAST(SUM(cnt) AS BIGINT) AS n
  FROM (
    SELECT string_split(substr(seq, 2, length(seq) - 2), '||') AS s,
           cnt, UNNEST(range(1, length(string_split(substr(seq, 2,
             length(seq) - 2), '||')))) AS j
    FROM {prev}
  ) GROUP BY lhs, rhs
), b{i} AS MATERIALIZED (
  SELECT lhs, rhs, n FROM p{i} ORDER BY n DESC, lhs, rhs LIMIT 1
), wf{i} AS MATERIALIZED (
  SELECT replace(seq,
                 '|' || (SELECT lhs FROM b{i}) || '||' ||
                   (SELECT rhs FROM b{i}) || '|',
                 '|' || (SELECT lhs FROM b{i}) ||
                   (SELECT rhs FROM b{i}) || '|') AS seq, cnt
  FROM {prev}
)"""
        )
    return "WITH " + ",\n".join(parts)


def _bpe_oracle_sql(k: int) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS iteration, lhs, rhs, lhs || rhs AS merged, n FROM b{i}"
        for i in range(1, k + 1)
    )
    return _bpe_ctes(k) + "\n" + union + "\nORDER BY iteration"


ORACLE["bpe_merge_table"] = _bpe_oracle_sql(BPE_MERGE_ITERS)


# ---------------------------------------------------------------------------
# BPE tokenizer application — the apply half of the train->apply
# cycle: segment the corpus with the K merges bpe_merge_table just
# learned and report the tokenizer's corpus-level statistics (symbol
# vocabulary size, total tokens, tokens-per-character compression).
# The number every tokenizer-training run watches: each merge round
# must shrink total_tokens while growing n_symbols by one.
#
# Scale: identical to training — everything runs on the vocab-bounded
# word-frequency frame; the corpus is touched once by the word count.
# ---------------------------------------------------------------------------
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    wf, cur, _merges = _bpe_train(spark, sf_dir)
    seg = cur.select(
        F.expr(
            "split(substring(seq, 2, length(seq) - 2), '\\\\|\\\\|')"
        ).alias("s"),
        F.length(F.replace("seq", F.lit("|"), F.lit(""))).alias("chars"),
        "cnt",
    )
    stats = seg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("cnt").cast("bigint").alias("total_words"),
        F.sum(F.col("cnt") * F.size("s")).cast("bigint").alias("total_tokens"),
        F.sum(F.col("cnt") * F.col("chars")).cast("bigint").alias("total_chars"),
    )
    nsym = seg.select(F.explode("s").alias("sym")).agg(
        F.countDistinct("sym").cast("bigint").alias("n_symbols")
    )
    row = stats.crossJoin(nsym).collect()  # bounded: 1x1 rows
    wf.unpersist()
    if not row or row[0].n_words == 0:
        return local_df(spark, 
            [],
            "n_words bigint, total_words bigint, total_tokens bigint, "
            "total_chars bigint, n_symbols bigint, tokens_per_char double",
        )
    r = row[0]
    return local_df(spark, 
        [
            (
                r.n_words,
                r.total_words,
                r.total_tokens,
                r.total_chars,
                r.n_symbols,
                float(r.total_tokens) / float(r.total_chars)
                if r.total_chars
                else None,
            )
        ],
        "n_words bigint, total_words bigint, total_tokens bigint, "
        "total_chars bigint, n_symbols bigint, tokens_per_char double",
    )


ORACLE["bpe_tokenize"] = (
    _bpe_ctes(BPE_MERGE_ITERS)
    + f"""
, seg AS MATERIALIZED (
  SELECT string_split(substr(seq, 2, length(seq) - 2), '||') AS s,
         length(replace(seq, '|', '')) AS chars, cnt
  FROM wf{BPE_MERGE_ITERS}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(cnt) AS BIGINT) AS total_words,
       CAST(SUM(cnt * len(s)) AS BIGINT) AS total_tokens,
       CAST(SUM(cnt * chars) AS BIGINT) AS total_chars,
       (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT)
        FROM (SELECT UNNEST(s) AS sym FROM seg)) AS n_symbols,
       CAST(CAST(SUM(cnt * len(s)) AS BIGINT) AS DOUBLE)
         / CAST(CAST(SUM(cnt * chars) AS BIGINT) AS DOUBLE) AS tokens_per_char
FROM seg
HAVING COUNT(*) > 0
"""
)
