"""Deduplication operators over ``documents`` — exact, fuzzy
(MinHash+LSH, n-gram Jaccard), and SimHash fingerprints
(BASELINE.json north star; SURVEY.md §7.2 step 6).

Scale design (the part that matters at 100 TB):

- **Exact dedup** hashes the normalized text and groupBys the digest —
  one shuffle on a 16-byte key, map-side combinable. Never
  ``dropDuplicates`` on the full text column: shuffling multi-KB
  payloads when a digest suffices is wasted network.
- **n-gram Jaccard** uses an inverted-index self-join (explode
  distinct shingles -> join on shingle -> count per pair). This is
  the classic candidate-generation shape: cost scales with
  sum(docs-per-shingle²), NOT docs² — no crossJoin anywhere.
- **MinHash+LSH**: fully map-side signatures (zero shuffle until the
  band bucket join); docs meet only in band buckets, and only
  surviving candidate PAIRS (ids, no payloads) fetch their shingle
  sets for the exact-Jaccard verify. Two families: the registered
  ``dedup_minhash_lsh`` uses windowed-md5 seeds (two 60-bit hex
  windows per digest, DuckDB-replayable, b=4 x r=2 with S-curve
  midpoint (1/4)^(1/2) = 0.5) and is fully value-oracled; the
  xxhash64 k=32 ``minhash_lsh_pairs_xxhash`` (b=8 x r=4, midpoint
  ≈ 0.59) is the faster scale path, pinned by the LSH ⊆ exact
  recall property test. ``dedup_incremental_near`` probes a
  batch against the historical band index — the daily-ingest shape.
- **SimHash** hashes each distinct token ONCE into an integer array,
  then takes 16 bit-vote aggregates over that array — one projection,
  no shuffle.

Expression-level rule learned from profiling: Spark neither CSEs
inside higher-order-function lambdas nor preserves intermediate
columns (CollapseProject inlines them into every use site), so
token/shingle/hash arrays consumed by multiple lambda sites are
LET-BOUND via ``functions.hashing.let_sql`` — one evaluation per
row, measured 12x at sf0.1 on shingling alone.

MinHash/SimHash use the md5-based :func:`hash60` family so signature
values are reproducible in the DuckDB oracle where one exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60_sql, word_shingles_expr, word_shingles_sql
from .text import NORMALIZE_EXPR, NORMALIZE_SQL

ORACLE: dict[str, str] = {}

N_MINHASH = 32
LSH_BANDS = 8
LSH_ROWS = 4  # N_MINHASH = LSH_BANDS * LSH_ROWS
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.5

_TOKENS_SQL = "string_split(text, ' ')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, "documents")


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingles: array<string>) with distinct word n-grams.
    The tokenization is let-bound inside the shingle expression
    (functions/hashing.let_sql) — one split per row, one projection,
    no shuffle."""
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.array_distinct(
                word_shingles_expr("split(text, ' ')", SHINGLE_N)
            ).alias("shingles"),
        )
        .filter(F.size("shingles") > 0)
    )


# ---------------------------------------------------------------------------
# Exact dedup: digest of raw text, keep lowest doc_id per group.
# ---------------------------------------------------------------------------
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.md5("text").alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("keep_doc_id")
    )


ORACLE["dedup_exact"] = """
SELECT md5(text) AS digest, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
HAVING COUNT(*) > 1
ORDER BY keep_doc_id
"""


# ---------------------------------------------------------------------------
# Normalized exact dedup: case/whitespace-insensitive digest.
# ---------------------------------------------------------------------------
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.md5(F.expr(NORMALIZE_EXPR)).alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .agg(
            F.count(F.lit(1)).alias("n_unique_docs"),
            F.sum(F.col("n_copies") - 1).alias("n_duplicates_removed"),
        )
    )


ORACLE["dedup_normalized"] = f"""
SELECT COUNT(*) AS n_unique_docs,
       CAST(SUM(n_copies - 1) AS BIGINT) AS n_duplicates_removed
FROM (
  SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
  FROM documents
  GROUP BY md5({NORMALIZE_SQL})
)
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs via inverted-index join.
# ---------------------------------------------------------------------------
MAX_SHINGLE_DF = 200  # drop shingles hotter than this from candidate gen


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs scale with sum(df(shingle)^2), so one stop-word
    shingle shared by 1M docs would alone generate 10^12 pairs. The
    frequency cap drops shingles with document frequency >
    MAX_SHINGLE_DF from the inverted index — the standard
    frequency-filter trade: intersections involving ultra-hot shingles
    undercount slightly (exact whenever no shingle exceeds the cap;
    max observed DF on the fixtures is 25). The cap is mirrored in the
    DuckDB oracle, so parity holds even if data gets hotter.

    Undercount bound: dropping hot shingles reduces a pair's
    intersection by exactly h = |shared hot shingles|, never its
    union, so capped_jaccard >= exact_jaccard - h/|union| — only
    pairs within h/|union| of JACCARD_THRESHOLD can be lost, and
    the result is always a subset of the uncapped exact pairs.
    Property-tested in tests/test_llm_ops.py (adversarial corpus,
    DF 226 > cap: oracle parity still hash-matches, recall 20/23
    vs uncapped exact, floor asserted at 0.85)."""
    # ONE shuffle (groupBy shingle), then pairs generate map-side from
    # each posting list via higher-order functions — strictly better
    # than the self-join formulation, which shuffles the inverted
    # index twice and hash-joins 1M+ string keys. The frequency cap
    # drops posting lists longer than MAX_SHINGLE_DF right where
    # they're built; sort_array (doc_id leads the struct) gives
    # doc_a < doc_b for free. Each doc's shingle-set SIZE rides the
    # posting list (4 bytes per posting), so the union-size
    # denominator falls out of the pair aggregate itself — no join
    # back to a sizes table (r14: the two size joins this replaced
    # were two extra exchanges per run, and dropping them also drops
    # the only second consumer of the shingle projection, so the
    # .persist() went too).
    shingled = _shingled(spark, sf_dir)
    inv = shingled.select(
        "doc_id",
        F.size("shingles").alias("n"),
        F.explode("shingles").alias("shingle"),
    )
    buckets = (
        inv.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_SHINGLE_DF))
    )
    # CHUNKED pair emission (r15): posexplode the posting list, then
    # explode each member's tail slice — the same triangular pair
    # multiset as the flatten(transform(...)) HOF it replaces, but
    # fully WholeStageCodegen'd (Catalyst higher-order lambdas are
    # interpreted per element; the generate/slice/generate chain
    # measured ~3x faster on the ~9M-pair co-supply build, see
    # OPTIMIZATION_r15.md) and with no O(df^2) single-array pair blow
    # up per bucket (guide §5).
    pairs = buckets.select(
        "ids", F.posexplode("ids").alias("i", "x")
    ).select(
        "x",
        F.explode(
            F.expr("slice(ids, i + 2, size(ids) - i - 1)")
        ).alias("y"),
    ).select(
        F.col("x.doc_id").alias("doc_a"),
        F.col("y.doc_id").alias("doc_b"),
        F.col("x.n").alias("na"),
        F.col("y.n").alias("nb"),
    )
    # na/nb are functionally determined by doc_a/doc_b — max() is just
    # the order-insensitive way to surface the constant per group
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    return (
        inter.select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


ORACLE["dedup_ngram_jaccard"] = f"""
WITH shingled AS (
  SELECT doc_id, list_distinct({word_shingles_sql(_TOKENS_SQL, SHINGLE_N)}) AS shingles
  FROM documents
  WHERE len({word_shingles_sql(_TOKENS_SQL, SHINGLE_N)}) > 0
),
inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingled),
hot AS (
  SELECT shingle FROM inv0 GROUP BY shingle HAVING COUNT(*) > {MAX_SHINGLE_DF}
),
inv AS (SELECT * FROM inv0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM shingled),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# Asymmetric shingle containment: |A ∩ B| / min(|A|, |B|).
# ---------------------------------------------------------------------------
CONTAINMENT_THRESHOLD = 0.8


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate pairs by shingle CONTAINMENT, the asymmetric
    companion to ``q_dedup_ngram_jaccard``: a short document quoted
    verbatim inside a much longer one has Jaccard ≈ |A|/|B| (tiny)
    but containment |A∩B|/min(|A|,|B|) ≈ 1. Training-data pipelines
    need both — symmetric Jaccard for true near-copies, containment
    for quote-expansion / boilerplate-wrapping duplicates the
    symmetric measure structurally cannot see (Broder's original
    resemblance-vs-containment distinction).

    Same single-shuffle inverted-index shape as the Jaccard query:
    one groupBy(shingle), pairs emitted map-side from posting lists
    capped at MAX_SHINGLE_DF (identical undercount bound — dropping
    a hot shingle lowers the intersection by at most h, never
    min(|A|,|B|), so capped containment >= exact - h/min and the
    output is a subset of the uncapped exact pairs). Candidate
    volume is bounded by sum(df^2) with df <= cap, independent of
    corpus row count — the 100 TB story is the Jaccard query's.

    Output: (doc_a < doc_b, containment, contained_doc) where
    contained_doc is the smaller-shingle-set side (ties -> doc_a).
    """
    # shingle-set sizes ride the posting lists exactly as in
    # q_dedup_ngram_jaccard (r14): the min-size denominator and the
    # contained-doc pick fall out of the pair aggregate, removing
    # both size joins and the persist
    shingled = _shingled(spark, sf_dir)
    inv = shingled.select(
        "doc_id",
        F.size("shingles").alias("n"),
        F.explode("shingles").alias("shingle"),
    )
    buckets = (
        inv.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_SHINGLE_DF))
    )
    # CHUNKED pair emission (r15): posexplode the posting list, then
    # explode each member's tail slice — the same triangular pair
    # multiset as the flatten(transform(...)) HOF it replaces, but
    # fully WholeStageCodegen'd (Catalyst higher-order lambdas are
    # interpreted per element; the generate/slice/generate chain
    # measured ~3x faster on the ~9M-pair co-supply build, see
    # OPTIMIZATION_r15.md) and with no O(df^2) single-array pair blow
    # up per bucket (guide §5).
    pairs = buckets.select(
        "ids", F.posexplode("ids").alias("i", "x")
    ).select(
        "x",
        F.explode(
            F.expr("slice(ids, i + 2, size(ids) - i - 1)")
        ).alias("y"),
    ).select(
        F.col("x.doc_id").alias("doc_a"),
        F.col("y.doc_id").alias("doc_b"),
        F.col("x.n").alias("na"),
        F.col("y.n").alias("nb"),
    )
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    return (
        inter.select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / F.least(F.col("na"), F.col("nb"))
            ).alias("containment"),
            F.when(F.col("na") <= F.col("nb"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained_doc"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


ORACLE["dedup_containment"] = f"""
WITH shingled AS (
  SELECT doc_id, list_distinct({word_shingles_sql(_TOKENS_SQL, SHINGLE_N)}) AS shingles
  FROM documents
  WHERE len({word_shingles_sql(_TOKENS_SQL, SHINGLE_N)}) > 0
),
inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingled),
hot AS (
  SELECT shingle FROM inv0 GROUP BY shingle HAVING COUNT(*) > {MAX_SHINGLE_DF}
),
inv AS (SELECT * FROM inv0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM shingled),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / least(sa.n_shingles, sb.n_shingles) AS containment,
       CASE WHEN sa.n_shingles <= sb.n_shingles THEN doc_a ELSE doc_b END AS contained_doc
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / least(sa.n_shingles, sb.n_shingles) >= {CONTAINMENT_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# MinHash signatures — fully MAP-SIDE, zero shuffle.
#
# One base hash per distinct shingle (xxhash64, JVM intrinsic), then k
# signature components derived by universal hashing h_i = a_i*h + b_i
# (64-bit wrap-around multiply-add — 2 ALU ops per component) inside
# array_min(transform(...)). The old explode -> 32×md5 -> groupBy-min
# shape shuffled 32 longs per shingle occurrence and string-hashed
# every (shingle, seed) pair; this computes each doc's signature in
# its own scan partition. At 100 TB the signature stage touches the
# network exactly zero times.
# ---------------------------------------------------------------------------
def _mh_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic odd multiplier / addend pairs (splitmix-style
    constants), wrapped to signed 64-bit as Spark long literals."""

    def s64(x: int) -> int:
        x &= (1 << 64) - 1
        return x - (1 << 64) if x >= 1 << 63 else x

    return [
        (s64((2 * i + 1) * 0x9E3779B97F4A7C15), s64(i * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB))
        for i in range(k)
    ]


def minhash_signatures(shingled: DataFrame, k: int = N_MINHASH) -> DataFrame:
    """(doc_id, sig: array<long>[k]) — one nested higher-order
    expression instead of k separate column expressions: codegen size
    (and first-run JIT compile time) stays O(1) in k."""
    from ..functions.hashing import let_sql

    coeffs = _mh_coeffs(k)
    a_arr = "array(" + ", ".join(f"{a}L" for a, _ in coeffs) + ")"
    b_arr = "array(" + ", ".join(f"{b}L" for _, b in coeffs) + ")"
    # let-bind the base-hash array: without it, CollapseProject
    # inlines the xxhash64 transform into the zip_with lambda and the
    # corpus is re-hashed once per signature component (k times).
    sig = let_sql(
        "transform(shingles, s -> xxhash64(s))",
        "hs",
        f"zip_with({a_arr}, {b_arr}, (a, b) -> array_min(transform(hs, h -> h * a + b)))",
    )
    return shingled.select("doc_id", F.expr(sig).alias("sig"))


def minhash_signatures_md5(shingled: DataFrame, k: int) -> DataFrame:
    """md5-based variant (hash60 family) — slower but reproducible in
    DuckDB, so the oracled signature query uses it. Still map-side:
    array_min over a per-seed transform, no explode/shuffle."""
    return shingled.select(
        "doc_id",
        *[
            F.expr(
                "array_min(transform(shingles, s -> "
                f"CAST(conv(substring(md5(concat('s{i}|', s)), 1, 15), 16, 10) AS LONG)))"
            ).alias(f"mh{i}")
            for i in range(k)
        ],
    )


def q_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8 md5-seeded minhash components per doc (DuckDB-reproducible;
    the LSH query uses the 32-component xxhash64 family instead)."""
    sigs = minhash_signatures_md5(_shingled(spark, sf_dir), k=8)
    return sigs.select("doc_id", *[f"mh{i}" for i in range(8)])


def _minhash_sql_exprs(k: int) -> list[str]:
    shingle_arr = f"list_distinct({word_shingles_sql(_TOKENS_SQL, SHINGLE_N)})"
    return [
        f"list_min(list_transform({shingle_arr}, s -> {hash60_sql('s', seed=i)})) AS mh{i}"
        for i in range(k)
    ]


ORACLE["dedup_minhash_signatures"] = f"""
SELECT doc_id, {', '.join(_minhash_sql_exprs(8))}
FROM documents
WHERE len({_TOKENS_SQL}) >= {SHINGLE_N}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup pairs with exact-Jaccard verification.
# This xxhash64 k=32 variant is the SCALE path; it is a library
# function (not registry-registered) because xxhash64 has no DuckDB
# twin, so it can never carry a value-hash oracle. The REGISTERED
# `dedup_minhash_lsh` query below is the md5/hash60-family twin of
# this exact pipeline shape and carries the full cross-engine check;
# tests/test_llm_ops.py pins this variant's LSH ⊆ exact-Jaccard
# recall property directly.
# ---------------------------------------------------------------------------
def minhash_lsh_pairs_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The persist is load-bearing (shingles feed band-gen once and the
    # exact-verify join twice; recomputing re-tokenizes the corpus 3x)
    # but it cannot be unpersisted here — the frame must stay cached
    # until the CALLER's action runs. Query-suite runners are
    # responsible for spark.catalog.clearCache() between queries
    # (bench.py and tests/oracle_compare.py both do) so the cache
    # never outlives the query that built it.
    shingled = _shingled(spark, sf_dir).persist()
    sigs = minhash_signatures(shingled)

    # band hash = wrap-around polynomial hash of r consecutive
    # signature components (pure long ALU ops, one compact HOF);
    # banded rows carry ONLY (doc_id, band) — no payloads.
    bands = (
        f"transform(sequence(0, {LSH_BANDS - 1}), b -> "
        f"aggregate(slice(sig, b * {LSH_ROWS} + 1, {LSH_ROWS}), "
        f"-7046029254386353131L, (acc, x) -> (acc + x) * 6364136223846793005L))"
    )
    banded = sigs.select(
        "doc_id", F.posexplode(F.expr(bands)).alias("band_id", "band_hash")
    ).persist()  # both self-join sides; avoids running sig-gen twice

    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # exact verify: only candidate pairs fetch their shingle sets
    sh_a = shingled.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sh_b = shingled.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select("doc_a", "doc_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash fingerprint (oracled): 16-bit bit-vote over distinct tokens.
# Tokens hashed once into an int array; 16 aggregates over that array.
# ---------------------------------------------------------------------------
N_SIMHASH_BITS = 16


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 16 bit-votes fold inside ONE let-bound expression: the
    distinct-token hash array materializes once per row (a 16-column
    formulation would re-hash every token 16x after CollapseProject
    inlines the intermediate column)."""
    from ..functions.hashing import let_sql

    th = (
        "transform(array_distinct(split(text, ' ')), "
        "t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS LONG))"
    )
    simhash = let_sql(
        th,
        "th",
        f"aggregate(sequence(0, {N_SIMHASH_BITS - 1}), 0L, (acc, b) -> acc + "
        "CASE WHEN aggregate(th, 0L, (vacc, h) -> vacc + "
        "CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END) >= 0 "
        "THEN shiftleft(1L, b) ELSE 0L END)",
    )
    return _docs(spark, sf_dir).select(
        "doc_id", F.expr(simhash).cast("long").alias("simhash")
    )


def _simhash_oracle() -> str:
    h = f"{hash60_sql('t')}"
    votes = ", ".join(
        f"list_sum(list_transform(list_distinct(string_split(text, ' ')), "
        f"t -> CASE WHEN (({h} >> {b}) & 1) = 1 THEN 1 ELSE -1 END)) AS vote{b}"
        for b in range(N_SIMHASH_BITS)
    )
    total = " + ".join(
        f"(CASE WHEN vote{b} >= 0 THEN {2**b} ELSE 0 END)" for b in range(N_SIMHASH_BITS)
    )
    return f"""
WITH votes AS (SELECT doc_id, {votes} FROM documents)
SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM votes
"""


ORACLE["dedup_simhash"] = _simhash_oracle()


# ---------------------------------------------------------------------------
# Near-dup CLUSTERING: connected components over the Jaccard pair
# graph, each doc labeled with the min doc_id of its component (the
# canonical representative a dedup pass would keep).
#
# Spark-first design: iterative min-label propagation entirely in
# DataFrame ops — per round, push each vertex's current label to its
# neighbors (one shuffle join on vertex id) and take the min of
# (own label, neighbor labels) (one map-side-combinable groupBy).
# Rounds needed = graph diameter; near-dup components are tiny dense
# clusters (diameter 1-3), so 3-5 rounds close the fixpoint. Each
# round ends in localCheckpoint() — without it the plan doubles per
# iteration and Catalyst analysis time, not the data, becomes the
# bottleneck. For adversarial long-chain graphs at 100 TB the
# upgrade path is the alternating large-star/small-star algorithm
# (Kiveris et al., "Connected Components in MapReduce and Beyond"),
# which converges in O(log^2 n) rounds with the same two-primitive
# round body; the fixpoint loop below is the right trade for dedup
# workloads where components are near-cliques by construction.
#
# The result is a deterministic fixpoint (min is idempotent,
# commutative, associative), so parity with the DuckDB
# recursive-CTE oracle holds no matter how many rounds ran.
# ---------------------------------------------------------------------------
def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(id, cluster_id) for every vertex of the undirected edge list;
    cluster_id = min vertex id reachable. Raises if the fixpoint is
    not reached within ``max_iter`` rounds (diameter bound)."""
    # materialize the edge list ONCE before symmetrizing: both union
    # branches then read the same checkpointed partitions instead of
    # re-deriving the (expensive) candidate-pair pipeline per branch
    base = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=False)
    sym = base.union(
        base.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    sym = sym.repartition("u").localCheckpoint()

    # round-1 FUSED into init: the first propagation round's result
    # min(id, min(neighbors)) falls out of the same groupBy that
    # enumerates the vertices, so the loop starts one round closer to
    # the fixpoint for the same init cost (for the diameter-1
    # near-clique components that dominate dedup graphs, the loop
    # then runs exactly one confirming round). _label_sum both
    # materializes the lazy checkpoint and records the convergence
    # probe's baseline in the same single job.
    labels = (
        sym.groupBy("u")
        .agg(F.least(F.min("v"), F.col("u")).alias("label"))
        .select(F.col("u").alias("id"), "label")
        .localCheckpoint(eager=False)
    )
    # Convergence probe: min-propagation only ever DECREASES labels,
    # so the (exact, decimal — no int64 overflow at any vertex count)
    # label sum strictly decreases while anything changes and is
    # stable exactly at the fixpoint. Comparing sums costs one scan
    # of new_labels — no join against the previous round — and that
    # same action materializes the lazy checkpoint, so each round is
    # ONE Spark job instead of three (checkpoint + join-count).
    def _label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0].s

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        msgs = sym.join(labels, sym.u == labels.id).select(
            F.col("v").alias("id"), "label"
        )
        new_labels = (
            labels.union(msgs).groupBy("id").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=False)
        cur_sum = _label_sum(new_labels)
        labels = new_labels
        if cur_sum == prev_sum:
            return labels.select("id", F.col("label").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical dedup clusters: docs that share a >=0.5-Jaccard edge,
    grouped into components, labeled by min doc_id."""
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return (
        connected_components(pairs, "doc_a", "doc_b")
        .select(F.col("id").alias("doc_id"), "cluster_id")
        .orderBy("doc_id")
    )


def _clusters_oracle() -> str:
    """Same component semantics as a recursive reachability CTE: from
    every vertex, walk the (symmetrized) pair graph to closure and
    take the min reached id. UNION (not UNION ALL) dedups the
    frontier, which is what terminates the recursion."""
    pairs_body = ORACLE["dedup_ngram_jaccard"].strip().rstrip()
    # reuse the pair query verbatim as a CTE
    return f"""
WITH RECURSIVE pairs AS (
{pairs_body}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(src, node) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node
)
SELECT src AS doc_id, MIN(node) AS cluster_id
FROM reach GROUP BY src ORDER BY doc_id
"""


ORACLE["dedup_clusters"] = _clusters_oracle()


# ---------------------------------------------------------------------------
# Alternating large-star/small-star connected components — the
# documented scale-path upgrade for the label-propagation loop above
# (Kiveris et al., "Connected Components in MapReduce and Beyond").
# Min-label propagation needs diameter-many rounds, which is the
# wrong bound for adversarial long-chain graphs at 100 TB; the star
# operations contract every component to a star in O(log^2 n) rounds
# regardless of diameter.
#
# Round body (all DataFrame ops, same primitives as one propagation
# round — one groupBy min + one join per star op):
#   large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
#   small-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u) ∪ {u}, v ≤ u
# Self-loops drop; convergence = edge-set fixpoint, probed by a
# (count, xxhash64-sum) set fingerprint — one scan, no join against
# the previous round. At the fixpoint every edge is (node, root).
# ---------------------------------------------------------------------------
def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    adj = edges.select("a", "b").union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = adj.groupBy("a").agg(F.min("b").alias("mb")).select(
        "a", F.least("mb", F.col("a")).alias("m")
    )
    joined = adj.join(mins, "a")
    if large:
        out = joined.filter(F.col("b") > F.col("a")).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
    else:
        out = joined.filter(F.col("b") <= F.col("a")).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        ).union(mins.select(F.col("a"), F.col("m").alias("b")))
    return out.filter(F.col("a") != F.col("b")).distinct()


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """(id, cluster_id) for every vertex of the undirected edge list,
    cluster_id = min vertex id of the component. Same contract as
    :func:`connected_components`, diameter-independent round bound."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # lazy: the first fingerprint below materializes it in the
        # same job instead of a separate blocking one (r15)
        .localCheckpoint(eager=False)
    )

    def _fingerprint(df: DataFrame):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(F.least("a", "b"), F.greatest("a", "b")).cast(
                    "decimal(38,0)"
                )
            ).alias("h"),
        ).collect()[0]
        return (r.n, r.h)

    prev = _fingerprint(e)
    for _ in range(max_iter):
        # the LARGE round's output is lazily checkpointed too (r15):
        # the small round references it FOUR times (two symmetrize
        # union branches, each feeding both the mins groupBy and the
        # join's probe side), so without the checkpoint every
        # fingerprint job re-ran the large star 4x. The lazy
        # checkpoint materializes it once inside the same job and the
        # other three references read the persisted partitions.
        e = _star_round(e, large=True).localCheckpoint(eager=False)
        e = _star_round(e, large=False).localCheckpoint(eager=False)
        cur = _fingerprint(e)  # materializes the lazy checkpoints
        if cur == prev:
            labels = e.select(F.col("a").alias("id"), F.col("b").alias("label"))
            roots = e.select(F.col("b").alias("id"), F.col("b").alias("label"))
            return (
                labels.union(roots)
                .groupBy("id")
                .agg(F.min("label").alias("cluster_id"))
            )
        prev = cur
    raise RuntimeError(f"connected_components_star: no fixpoint in {max_iter} rounds")


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clusters as q_dedup_clusters, computed by the star
    algorithm — both are exact CC, so they share the recursive-CTE
    oracle; a driver-green row here certifies the scale-path variant."""
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return (
        connected_components_star(pairs, "doc_a", "doc_b")
        .select(F.col("id").alias("doc_id"), "cluster_id")
        .orderBy("doc_id")
    )


ORACLE["dedup_clusters_star"] = _clusters_oracle()


# ---------------------------------------------------------------------------
# End-to-end dedup KEEP LIST — the artifact a curation pipeline
# actually emits: one (doc_id, keep, reason) row per document,
# combining exact-digest dedup and near-dup clustering with a fixed
# precedence (exact_dup > near_dup > keep; the canonical survivor of
# any group/component is its min doc_id).
#
# Plan shape at scale: the exact pass shuffles 16-byte digests once;
# the near-dup component labels come from the bounded candidate
# pipeline above; both join back to the corpus on doc_id. The corpus
# text never shuffles — only (doc_id, digest-min) and
# (doc_id, cluster_id) pairs move.
# ---------------------------------------------------------------------------
def q_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    dig = docs.select("doc_id", F.md5("text").alias("digest"))
    dig_min = dig.groupBy("digest").agg(F.min("doc_id").alias("exact_keep_id"))
    exact = dig.join(dig_min, "digest").select("doc_id", "exact_keep_id")

    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    clusters = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )

    reason = (
        F.when(F.col("doc_id") != F.col("exact_keep_id"), "exact_dup")
        .when(
            F.col("cluster_id").isNotNull()
            & (F.col("doc_id") != F.col("cluster_id")),
            "near_dup",
        )
        .otherwise("keep")
    )
    return (
        exact.join(clusters, "doc_id", "left")
        .select("doc_id", reason.alias("reason"))
        .select("doc_id", "reason", (F.col("reason") == "keep").alias("keep"))
        .orderBy("doc_id")
    )


def _keep_list_oracle() -> str:
    pairs_body = ORACLE["dedup_ngram_jaccard"].strip()
    return f"""
WITH RECURSIVE pairs AS (
{pairs_body}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(src, node) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (
  SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY src
),
dig AS (
  SELECT doc_id, md5(text) AS digest FROM documents
),
exact AS (
  SELECT d.doc_id, m.exact_keep_id
  FROM dig d JOIN (
    SELECT digest, MIN(doc_id) AS exact_keep_id FROM dig GROUP BY digest
  ) m USING (digest)
),
labeled AS (
  SELECT e.doc_id,
         CASE WHEN e.doc_id <> e.exact_keep_id THEN 'exact_dup'
              WHEN c.cluster_id IS NOT NULL AND e.doc_id <> c.cluster_id
                THEN 'near_dup'
              ELSE 'keep' END AS reason
  FROM exact e LEFT JOIN comp c USING (doc_id)
)
SELECT doc_id, reason, reason = 'keep' AS keep
FROM labeled ORDER BY doc_id
"""


ORACLE["dedup_keep_list"] = _keep_list_oracle()


# ---------------------------------------------------------------------------
# INCREMENTAL exact dedup — the daily-ingest shape: dedup a new batch
# against the historical corpus without re-reading (or re-shuffling)
# history payloads. Only digests move: the historical side reduces to
# (digest, first_seen_doc_id) — at 100 TB this is a bucketed digest
# INDEX table maintained across runs (write_bucketed on digest), so
# the per-batch join is shuffle-free on the history side and the new
# batch (small by definition) shuffles 16-byte keys only.
# The batch here is carved deterministically (doc_id % 10 = 9) so the
# query is self-contained and oracled.
# ---------------------------------------------------------------------------
BATCH_MOD = 10  # doc_id % BATCH_MOD == BATCH_MOD-1 -> "today's batch"


def incremental_dedup(batch: DataFrame, history_index: DataFrame) -> DataFrame:
    """Rows of ``batch`` (doc_id, digest) whose digest already exists
    in ``history_index`` (digest, first_seen_doc_id). Inner join on
    the digest — the survivors (anti join) are what a pipeline would
    append to the corpus and to the index."""
    return batch.join(history_index, "digest").select(
        "doc_id", "first_seen_doc_id"
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    dig = docs.select("doc_id", F.md5("text").alias("digest"))
    is_batch = F.col("doc_id") % BATCH_MOD == BATCH_MOD - 1
    history = (
        dig.filter(~is_batch)
        .groupBy("digest")
        .agg(F.min("doc_id").alias("first_seen_doc_id"))
    )
    batch = dig.filter(is_batch)
    return incremental_dedup(batch, history).orderBy("doc_id", "first_seen_doc_id")


ORACLE["dedup_incremental"] = f"""
WITH dig AS (SELECT doc_id, md5(text) AS digest FROM documents),
history AS (
  SELECT digest, MIN(doc_id) AS first_seen_doc_id
  FROM dig WHERE doc_id % {BATCH_MOD} <> {BATCH_MOD - 1}
  GROUP BY digest
)
SELECT d.doc_id, h.first_seen_doc_id
FROM dig d JOIN history h USING (digest)
WHERE d.doc_id % {BATCH_MOD} = {BATCH_MOD - 1}
ORDER BY d.doc_id, h.first_seen_doc_id
"""




# ---------------------------------------------------------------------------
# Best-representative selection: real pipelines don't keep the
# MIN-id member of a dup cluster — they keep the best one. Reuses
# the connected-components clustering and ranks members by a quality
# key (here word count, id tiebreak); the representative is a
# row_number over the (tiny) cluster-membership table, not the
# corpus.
# ---------------------------------------------------------------------------
def q_dedup_best_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    clusters = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    from pyspark.sql import Window as W  # local: dedup module has no W import

    scored = clusters.join(
        docs.select("doc_id", F.expr("size(split(text, ' '))").alias("n_words")),
        "doc_id",
    )
    w = W.partitionBy("cluster_id").orderBy(
        F.col("n_words").desc(), F.col("doc_id")
    )
    ranked = scored.withColumn("rn", F.row_number().over(w))
    reps = ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("rep_doc_id"),
        F.col("n_words").alias("rep_n_words"),
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        reps.join(sizes, "cluster_id")
        .select("cluster_id", "rep_doc_id", "rep_n_words", "n_members")
        .orderBy("cluster_id")
    )


def _best_rep_oracle() -> str:
    pairs_body = ORACLE["dedup_ngram_jaccard"].strip()
    return f"""
WITH RECURSIVE pairs AS (
{pairs_body}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(src, node) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (
  SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY src
),
scored AS (
  SELECT c.doc_id, c.cluster_id,
         CAST(len(string_split(d.text, ' ')) AS INT) AS n_words
  FROM comp c JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
             ORDER BY n_words DESC, doc_id) AS rn
  FROM scored
)
SELECT r.cluster_id, r.doc_id AS rep_doc_id, r.n_words AS rep_n_words,
       s.n_members
FROM ranked r
JOIN (SELECT cluster_id, COUNT(*) AS n_members FROM comp GROUP BY cluster_id) s
  USING (cluster_id)
WHERE r.rn = 1
ORDER BY r.cluster_id
"""


ORACLE["dedup_best_rep"] = _best_rep_oracle()


# ---------------------------------------------------------------------------
# MinHash calibration: estimated vs exact Jaccard for the verified
# near-dup pairs. E[matching components / k] = J, so this query IS
# the sketch-quality dashboard — with k=8 the estimator is coarse
# (multiples of 1/8), and the abs_err column shows exactly how
# coarse. Fully oracled (md5 signature family on both engines).
# Cost: the candidate pairs are few (post-threshold), so the
# signature joins are broadcast; signatures themselves are map-side.
# ---------------------------------------------------------------------------
CALIBRATION_K = 8


def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q_dedup_ngram_jaccard(spark, sf_dir)
    # persisted: both join sides (sa, sb) read the signature frame —
    # unpersisted, the k md5 transforms run twice over the corpus
    sigs = minhash_signatures_md5(
        _shingled(spark, sf_dir), k=CALIBRATION_K
    ).persist()
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(CALIBRATION_K)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(CALIBRATION_K)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(CALIBRATION_K)
    )
    est = matches.cast("double") / CALIBRATION_K
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("jaccard").alias("jaccard_exact"),
            est.alias("jaccard_est"),
            F.abs(est - F.col("jaccard")).alias("abs_err"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _calibration_oracle() -> str:
    pairs_body = ORACLE["dedup_ngram_jaccard"].strip()
    sig_exprs = ", ".join(_minhash_sql_exprs(CALIBRATION_K))
    match_sum = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
        for i in range(CALIBRATION_K)
    )
    return f"""
WITH pairs AS (
{pairs_body}
),
sigs AS (
  SELECT doc_id, {sig_exprs}
  FROM documents
  WHERE len({_TOKENS_SQL}) >= {SHINGLE_N}
)
SELECT doc_a, doc_b, jaccard AS jaccard_exact,
       CAST(({match_sum}) AS DOUBLE) / {CALIBRATION_K} AS jaccard_est,
       abs(CAST(({match_sum}) AS DOUBLE) / {CALIBRATION_K} - jaccard) AS abs_err
FROM pairs
JOIN sigs sa ON pairs.doc_a = sa.doc_id
JOIN sigs sb ON pairs.doc_b = sb.doc_id
ORDER BY doc_a, doc_b
"""


ORACLE["minhash_calibration"] = _calibration_oracle()


# ---------------------------------------------------------------------------
# The registered MinHash-LSH query: md5-seeded k=8 signatures (the
# DuckDB-reproducible hash60 family) banded as b=4 x r=2, with the
# band key being the TUPLE of r signature components rather than a
# polynomial hash — tuple equality is exactly replayable cross-engine,
# where Java long arithmetic wraps but DuckDB BIGINT errors on
# overflow. S-curve midpoint (1/b)^(1/r) = 0.5 = JACCARD_THRESHOLD.
# The xxhash64 k=32 `minhash_lsh_pairs_xxhash` above remains the
# scale path (md5 is ~5x the per-shingle hashing cost); THIS one is
# the registry entry so the whole signatures -> banding ->
# bucket-join -> exact-verify chain carries a full value-hash driver
# check. (Registered as `dedup_minhash_lsh_md5` through round 4;
# renamed in round 5 when it replaced the rows-only xxhash entry.)
# ---------------------------------------------------------------------------
LSH_MD5_BANDS = 4
LSH_MD5_ROWS = 2
#: seed family for the oracled LSH: TWO 60-bit hex windows per md5
#: digest (chars 1-15 and 16-30 of the 32-char digest), so k seeds
#: cost k/2 md5 evaluations per shingle instead of k. Seed i uses
#: digest group i//2 (salt 'g<i//2>|') and window i%2 — mirrored
#: textually in the DuckDB oracle.
_LSH_MD5_GROUPS = (LSH_MD5_BANDS * LSH_MD5_ROWS) // 2


def _mh_window_sql(i: int, duck: bool, digest: str | None = None) -> str:
    """Seed i of the windowed family as a SQL expression. ``digest``
    references an already-computed md5 string (Spark fused path);
    otherwise the md5 call is inlined (oracle CTE path)."""
    g, w = divmod(i, 2)
    start = 1 + 15 * w
    if duck:
        return (
            f"CAST(('0x' || substr(md5('g{g}|' || s), {start}, 15)) AS BIGINT)"
        )
    d = digest if digest is not None else f"md5(concat('g{g}|', s))"
    return f"CAST(conv(substring({d}, {start}, 15), 16, 10) AS LONG)"


def _md5_bands_expr() -> str:
    """The fused signatures -> band-structs expression over a
    ``shingles`` column. Per shingle: ONE evaluation of the
    _LSH_MD5_GROUPS digests (let-bound as ds — HOF lambda bodies are
    interpreted, so without the binding each window would re-run its
    md5), then k windowed 60-bit values. Signature mins and the band
    structs all fold into the same single expression: the whole
    chain is map-side, one projection, no intermediate columns for
    CollapseProject to duplicate."""
    from ..functions.hashing import let_sql

    k = LSH_MD5_BANDS * LSH_MD5_ROWS
    digests = ", ".join(
        f"md5(concat('g{g}|', s))" for g in range(_LSH_MD5_GROUPS)
    )
    windows = ", ".join(
        _mh_window_sql(i, duck=False, digest=f"ds[{i // 2}]")
        for i in range(k)
    )
    per_shingle = (
        f"transform(shingles, s -> "
        f"transform(array(array({digests})), ds -> array({windows}))[0])"
    )
    return let_sql(
        per_shingle,
        "hs",
        let_sql(
            f"transform(sequence(0, {k - 1}), "
            f"i -> array_min(transform(hs, h -> h[i])))",
            "sig",
            f"transform(sequence(0, {LSH_MD5_BANDS - 1}), b -> "
            f"struct(b AS band_id, sig[b * {LSH_MD5_ROWS}] AS k1, "
            f"sig[b * {LSH_MD5_ROWS} + 1] AS k2))",
        ),
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    shingled = _shingled(spark, sf_dir).persist()
    banded = shingled.select(
        "doc_id", F.explode(F.expr(_md5_bands_expr())).alias("bk")
    ).select("doc_id", "bk.band_id", "bk.k1", "bk.k2")
    # candidate pairs via the posting-list shape (one groupBy on the
    # band key, pairs emitted MAP-SIDE from each sorted bucket) instead
    # of the band self-join, which shuffled `banded` twice and needed
    # it persisted; one exchange and no cache do the same work, and a
    # doc appears once per band so bucket ids are distinct with
    # doc_a < doc_b free from the sort (r14). Unlike the shingle
    # queries there is NO df cap here (the oracle has none), so a
    # degenerate band bucket of B near-identical docs is possible at
    # scale — pair emission is therefore CHUNKED (r15): posexplode
    # each bucket to one row per member, then explode that member's
    # tail slice. No expression ever materializes the B*(B-1)/2 pair
    # structs as one array the way flatten(transform(...)) did; peak
    # per-row memory is O(B), and the generated pairs stream through
    # the pipeline exactly like the old self-join's output did
    # (guide §5 — no single aggregation buffer holds the quadratic
    # blowup; the O(B) collect_list itself is the posting-list
    # design's floor).
    buckets = (
        banded.groupBy("band_id", "k1", "k2")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    candidates = (
        buckets.select("ids", F.posexplode("ids").alias("i", "doc_a"))
        .select(
            "doc_a",
            F.explode(
                F.expr("slice(ids, i + 2, size(ids) - i - 1)")
            ).alias("doc_b"),
        )
        .distinct()
    )
    sh_a = shingled.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sh_b = shingled.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select("doc_a", "doc_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


def _lsh_md5_oracle() -> str:
    shingle_arr = f"list_distinct({word_shingles_sql(_TOKENS_SQL, SHINGLE_N)})"
    k = LSH_MD5_BANDS * LSH_MD5_ROWS
    mh = ", ".join(
        f"list_min(list_transform(shingles, s -> "
        f"{_mh_window_sql(i, duck=True)})) AS mh{i}"
        for i in range(k)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, mh{b * LSH_MD5_ROWS} AS k1, "
        f"mh{b * LSH_MD5_ROWS + 1} AS k2 FROM sigs"
        for b in range(LSH_MD5_BANDS)
    )
    return f"""
WITH shingled AS (
  SELECT doc_id, {shingle_arr} AS shingles
  FROM documents
  WHERE len({_TOKENS_SQL}) >= {SHINGLE_N}
), sigs AS (
  SELECT doc_id, {mh} FROM shingled
), banded AS (
  {band_rows}
), candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b
    ON a.band_id = b.band_id AND a.k1 = b.k1 AND a.k2 = b.k2
   AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         / len(list_distinct(sa.shingles || sb.shingles)) AS jaccard
FROM candidates c
JOIN shingled sa ON sa.doc_id = c.doc_a
JOIN shingled sb ON sb.doc_id = c.doc_b
WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / len(list_distinct(sa.shingles || sb.shingles)) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


ORACLE["dedup_minhash_lsh"] = _lsh_md5_oracle()


# ---------------------------------------------------------------------------
# INCREMENTAL near-dup dedup — the daily-ingest twin of
# q_dedup_incremental for NEAR duplicates: find batch documents whose
# MinHash-LSH bands collide with a historical document's bands, then
# exact-verify the candidate pairs by Jaccard. At 100 TB the
# historical side is a persisted BAND INDEX table — (band_id, k1, k2,
# doc_id), 4 longs/row, bucketed on the band key (sources/writers.
# write_bucketed) so the per-batch probe join is shuffle-free on the
# history side; the batch (small by definition) shuffles 32-byte band
# keys only, and document shingles are fetched solely for surviving
# candidate pairs. That deployment shape is pinned by a plan test —
# tests/test_plans.py::
# test_incremental_near_history_band_index_probe_is_shuffle_free
# materializes the band index bucketed on (band_id, k1, k2) and
# asserts the probe join has exactly ONE Exchange (batch side only). Mirrors the reference's incremental-partition
# ingest stance (gold_etl.py:90-92,156: process today's slice against
# standing state, never recompute history).
# ---------------------------------------------------------------------------
def q_dedup_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    shingled = _shingled(spark, sf_dir).persist()
    banded = (
        shingled.select(
            "doc_id", F.explode(F.expr(_md5_bands_expr())).alias("bk")
        )
        .select("doc_id", "bk.band_id", "bk.k1", "bk.k2")
        .persist()  # read twice: history index side + batch probe side
    )
    is_batch = F.col("doc_id") % BATCH_MOD == BATCH_MOD - 1
    hist_index = banded.filter(~is_batch)  # at scale: bucketed snapshot table
    batch_bands = banded.filter(is_batch)
    b, h = batch_bands.alias("b"), hist_index.alias("h")
    candidates = (
        b.join(
            h,
            (F.col("b.band_id") == F.col("h.band_id"))
            & (F.col("b.k1") == F.col("h.k1"))
            & (F.col("b.k2") == F.col("h.k2")),
        )
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("h.doc_id").alias("matched_doc_id"),
        )
        .distinct()
    )
    sh_b = shingled.select("doc_id", F.col("shingles").alias("sh_b"))
    sh_h = shingled.select(
        F.col("doc_id").alias("matched_doc_id"), F.col("shingles").alias("sh_h")
    )
    jaccard = F.size(F.array_intersect("sh_b", "sh_h")).cast("double") / F.size(
        F.array_union("sh_b", "sh_h")
    )
    return (
        candidates.join(sh_b, "doc_id")
        .join(sh_h, "matched_doc_id")
        .select("doc_id", "matched_doc_id", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_id", "matched_doc_id")
    )


def _incremental_near_oracle() -> str:
    shingle_arr = f"list_distinct({word_shingles_sql(_TOKENS_SQL, SHINGLE_N)})"
    k = LSH_MD5_BANDS * LSH_MD5_ROWS
    mh = ", ".join(
        f"list_min(list_transform(shingles, s -> "
        f"{_mh_window_sql(i, duck=True)})) AS mh{i}"
        for i in range(k)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, mh{b * LSH_MD5_ROWS} AS k1, "
        f"mh{b * LSH_MD5_ROWS + 1} AS k2 FROM sigs"
        for b in range(LSH_MD5_BANDS)
    )
    return f"""
WITH shingled AS (
  SELECT doc_id, {shingle_arr} AS shingles
  FROM documents
  WHERE len({_TOKENS_SQL}) >= {SHINGLE_N}
), sigs AS (
  SELECT doc_id, {mh} FROM shingled
), banded AS (
  {band_rows}
), candidates AS (
  SELECT DISTINCT b.doc_id AS doc_id, h.doc_id AS matched_doc_id
  FROM banded b
  JOIN banded h
    ON b.band_id = h.band_id AND b.k1 = h.k1 AND b.k2 = h.k2
  WHERE b.doc_id % {BATCH_MOD} = {BATCH_MOD - 1}
    AND h.doc_id % {BATCH_MOD} <> {BATCH_MOD - 1}
)
SELECT c.doc_id, c.matched_doc_id,
       CAST(len(list_intersect(sb.shingles, sh.shingles)) AS DOUBLE)
         / len(list_distinct(sb.shingles || sh.shingles)) AS jaccard
FROM candidates c
JOIN shingled sb ON sb.doc_id = c.doc_id
JOIN shingled sh ON sh.doc_id = c.matched_doc_id
WHERE CAST(len(list_intersect(sb.shingles, sh.shingles)) AS DOUBLE)
        / len(list_distinct(sb.shingles || sh.shingles)) >= {JACCARD_THRESHOLD}
ORDER BY c.doc_id, c.matched_doc_id
"""


ORACLE["dedup_incremental_near"] = _incremental_near_oracle()


# ---------------------------------------------------------------------------
# Leakage-free train/test split — contamination-safe data splitting:
# a TRAIN document that near-duplicates any TEST document is excluded,
# because near-copies of held-out data inside the training set defeat
# the held-out evaluation (memorization leaks through paraphrase-level
# duplication; this is the split-time counterpart of eval-set
# decontamination, operators/decontam.py).
#
# Scale shape: the split is a map-side deterministic hash
# (sampling.split_assign — no RNG, stable under repartitioning);
# cluster labels come from the bounded near-dup candidate pipeline;
# the leak check joins id-sized (doc_id, cluster_id) labels against
# the broadcast DISTINCT set of clusters containing a test doc. Text
# payloads never shuffle.
# ---------------------------------------------------------------------------
LEAKFREE_FRACTIONS = {"test": 0.2, "train": 0.8}
LEAKFREE_SEED = 0


def q_leakfree_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sampling import split_assign

    assigned = _docs(spark, sf_dir).select(
        "doc_id", split_assign("doc_id", LEAKFREE_FRACTIONS, seed=LEAKFREE_SEED)
    )
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    clusters = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    lab = assigned.join(clusters, "doc_id", "left")
    test_clusters = (
        lab.filter((F.col("split") == "test") & F.col("cluster_id").isNotNull())
        .select("cluster_id")
        .distinct()
        .withColumn("has_test", F.lit(True))
    )
    joined = lab.join(F.broadcast(test_clusters), "cluster_id", "left")
    excluded = (F.col("split") == "train") & F.coalesce(
        F.col("has_test"), F.lit(False)
    )
    return joined.select(
        "doc_id",
        "split",
        excluded.alias("excluded"),
        F.when(excluded, "excluded").otherwise(F.col("split")).alias(
            "final_split"
        ),
    ).orderBy("doc_id")


def _leakfree_oracle() -> str:
    from .sampling import split_assign_sql

    pairs_body = ORACLE["dedup_ngram_jaccard"].strip()
    split_case = split_assign_sql(
        "CAST(doc_id AS VARCHAR)", LEAKFREE_FRACTIONS, seed=LEAKFREE_SEED
    )
    return f"""
WITH RECURSIVE pairs AS (
{pairs_body}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(src, node) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (
  SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY src
),
assigned AS (
  SELECT doc_id, {split_case} AS split FROM documents
),
lab AS (
  SELECT a.doc_id, a.split, c.cluster_id
  FROM assigned a LEFT JOIN comp c USING (doc_id)
),
testc AS (
  SELECT DISTINCT cluster_id FROM lab
  WHERE split = 'test' AND cluster_id IS NOT NULL
)
SELECT l.doc_id, l.split,
       (l.split = 'train' AND l.cluster_id IS NOT NULL
        AND l.cluster_id IN (SELECT cluster_id FROM testc)) AS excluded,
       CASE WHEN l.split = 'train' AND l.cluster_id IS NOT NULL
                 AND l.cluster_id IN (SELECT cluster_id FROM testc)
            THEN 'excluded' ELSE l.split END AS final_split
FROM lab l ORDER BY l.doc_id
"""


ORACLE["leakfree_split"] = _leakfree_oracle()


# ---------------------------------------------------------------------------
# Passage-level dedup (CCNet/Gopher-style sub-document dedup): split
# each document into non-overlapping PASSAGE_TOKENS-token passages,
# find passages shared verbatim across documents, and score each
# document by its duplicated-passage fraction. Doc-level dedup above
# misses boilerplate shared INSIDE otherwise-distinct pages (headers,
# license blocks, navigation chrome); this is the granularity CCNet
# dedupes at before anything else runs.
#
# Scale (100 TB): the explode emits (doc_id, md5) pairs ONLY — the
# passage text reduces to a 16-byte digest map-side, so the two
# aggregations (distinct-docs per digest, per-doc rollup) shuffle
# narrow rows whose volume is ~n_tokens/PASSAGE_TOKENS per doc, never
# the corpus. Pinned by test_dedup_family_never_shuffles_payload.
# ---------------------------------------------------------------------------
PASSAGE_TOKENS = 20
#: keep a document while at most this fraction of its passages is
#: shared verbatim with any other document.
PASSAGE_DUP_MAX = 0.5


def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import let_sql

    P = PASSAGE_TOKENS
    docs = _docs(spark, sf_dir)
    digests = let_sql(
        "split(text, ' ')",
        "t",
        f"transform(sequence(0, CAST(ceil(size(t) / {P}.0D) AS INT) - 1), "
        f"i -> md5(concat_ws(' ', slice(t, i * {P} + 1, {P}))))",
    )
    ex = docs.select("doc_id", F.explode(F.expr(digests)).alias("digest"))
    n_docs = ex.groupBy("digest").agg(F.count_distinct("doc_id").alias("n_docs"))
    dup_frac = F.col("n_dup_passages").cast("double") / F.col("n_passages")
    return (
        ex.join(n_docs, "digest")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias(
                "n_dup_passages"
            ),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup_passages",
            dup_frac.alias("dup_frac"),
            (dup_frac <= PASSAGE_DUP_MAX).alias("keep"),
        )
        .orderBy("doc_id")
    )


ORACLE["passage_dedup"] = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
), idx AS (
  SELECT doc_id, t, n,
         unnest(generate_series(0,
                CAST(ceil(n / {PASSAGE_TOKENS}.0) AS INTEGER) - 1)) AS i
  FROM toks
), ex AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(t, i * {PASSAGE_TOKENS} + 1,
             least(i * {PASSAGE_TOKENS} + {PASSAGE_TOKENS}, n)), ' ')) AS digest
  FROM idx
), nd AS (
  SELECT digest, COUNT(DISTINCT doc_id) AS n_docs FROM ex GROUP BY digest
)
SELECT ex.doc_id, COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_passages,
       CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS dup_frac,
       CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         <= {PASSAGE_DUP_MAX} AS keep
FROM ex JOIN nd USING (digest)
GROUP BY ex.doc_id ORDER BY ex.doc_id
"""


# ---------------------------------------------------------------------------
# SimHash near-duplicate PAIRS — the join the fingerprint above
# exists for. Hamming distance <= SIMHASH_MAX_HAMMING over the
# 16-bit signature, with pigeonhole banding for candidate
# generation: split the signature into SIMHASH_BANDS byte-bands —
# two signatures within hamming distance 1 must agree EXACTLY on at
# least one band (d+1 bands guarantee recall for distance d), so the
# self-join runs on (band_id, band_value) equality and only
# colliding pairs pay the bit_count(xor) verification. DISTINCT
# dedupes pairs that collide on both bands.
#
# Scale: the corpus never self-joins all-pairs — band buckets bound
# the candidate count exactly like MinHash-LSH banding above, and
# the joined payload is (doc_id, 8-byte signature). The verification
# is two integer ops per candidate.
# ---------------------------------------------------------------------------
SIMHASH_BANDS = 2  # 8 bits each; guarantees recall for hamming <= 1
SIMHASH_MAX_HAMMING = 1


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Posting-list candidate generation (r15), replacing the band
    # SELF-JOIN: the join evaluated the md5-heavy simhash expression
    # over the corpus on BOTH sides — and on each side twice more,
    # because the band join key's isnotnull pushdown wraps the whole
    # expression in a Filter that CollapseProject won't share with the
    # Project (4 full corpus hashings, see
    # plans/r15/dedup_simhash_pairs_before.txt nodes 2/3/8/9). One
    # groupBy on the band key hashes the corpus ONCE and emits pairs
    # map-side. Emission is CHUNKED (posexplode member + explode tail
    # slice) rather than one flatten(transform(...)) array: 8-bit
    # bands mean bucket sizes are ~corpus/512, so at scale the
    # quadratic pair set must stream as rows, never materialize as a
    # single per-bucket array (guide §5).
    sh = q_dedup_simhash(spark, sf_dir)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright("simhash", 8 * b)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("band_val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band_id", "b.band_val")
    # sort_array on struct(doc_id, simhash) orders by doc_id (unique),
    # so doc_a < doc_b falls out of each bucket's sort as before
    buckets = (
        bands.groupBy("band_id", "band_val")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias(
                "ids"
            )
        )
        .filter(F.size("ids") >= 2)
    )
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        buckets.select("ids", F.posexplode("ids").alias("i", "a"))
        .select(
            "a",
            F.explode(
                F.expr("slice(ids, i + 2, size(ids) - i - 1)")
            ).alias("b"),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _simhash_pairs_oracle() -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_id, "
        f"(simhash >> {8 * b}) & 255 AS band_val FROM sh"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH sh AS ({_simhash_oracle().strip()}),
bands AS ({band_rows})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_val = b.band_val
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


ORACLE["dedup_simhash_pairs"] = _simhash_pairs_oracle()


# ---------------------------------------------------------------------------
# Global passage dedup — the C4/CCNet TRANSFORMATION passage_dedup
# only scores: every PASSAGE_TOKENS-token passage is deduped across
# the WHOLE corpus, first occurrence (lowest (doc_id, pos)) kept,
# every later instance — cross-document boilerplate or within-doc
# repetition alike — cut, and the surviving passages reassembled in
# order into the cleaned text.
#
# Scale: this is the one dedup op that MUST shuffle passage payloads
# — a global text rewrite can't avoid moving the text — but it does
# it the cheap way: one window shuffle keyed on the passage's md5
# (fixed-width key, ~n_tokens/PASSAGE_TOKENS rows per doc), one
# groupBy(doc_id) to reassemble, no self-join and no all-pairs
# stage. At 100 TB this is CCNet's exact paragraph-hash layout.
# Within a doc the window's (doc_id, pos) ordering makes keep-first
# deterministic under any partitioning.
# ---------------------------------------------------------------------------
def q_passage_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.hashing import let_sql

    P = PASSAGE_TOKENS
    docs = _docs(spark, sf_dir)
    chunks = let_sql(
        "split(text, ' ')",
        "t",
        f"transform(sequence(0, CAST(ceil(size(t) / {P}.0D) AS INT) - 1), "
        f"i -> concat_ws(' ', slice(t, i * {P} + 1, {P})))",
    )
    ex = docs.select(
        "doc_id", F.posexplode(F.expr(chunks)).alias("pos", "passage")
    )
    rn = F.row_number().over(
        W.partitionBy(F.md5("passage")).orderBy("doc_id", "pos")
    )
    ranked = ex.select("doc_id", "pos", "passage", rn.alias("rn"))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct("pos", "passage")
    )  # collect_list drops the nulls for rn > 1
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_removed"),
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "CASE WHEN rn = 1 THEN struct(pos, passage) END)), "
                "s -> s.passage), ' ')"
            ).alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )


ORACLE["passage_dedup_global"] = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
), idx AS (
  SELECT doc_id, t, n,
         unnest(generate_series(0,
                CAST(ceil(n / {PASSAGE_TOKENS}.0) AS INTEGER) - 1)) AS i
  FROM toks
), ex AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(t, i * {PASSAGE_TOKENS} + 1,
             least(i * {PASSAGE_TOKENS} + {PASSAGE_TOKENS}, n)), ' ')
           AS passage
  FROM idx
), ranked AS (
  SELECT doc_id, pos, passage,
         row_number() OVER (PARTITION BY md5(passage)
                            ORDER BY doc_id, pos) AS rn
  FROM ex
)
SELECT doc_id,
       COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(array_to_string(
         list(passage ORDER BY pos) FILTER (WHERE rn = 1), ' '), '')
         AS cleaned_text
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


def q_dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram — the dedup REPORT every
    corpus curation run ends with: how many near-dup clusters of each
    size exist, how many documents they absorb, and the dedup excess
    (docs removable if each cluster keeps one representative). Rides
    the canonical q_dedup_clusters components; the aggregation is two
    bounded groupBys over the (doc, cluster) frame — at 100 TB the
    histogram fits in a hand."""
    clusters = q_dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias(
                "dup_excess"
            ),
        )
        .orderBy("cluster_size")
    )


def _cluster_size_hist_oracle() -> str:
    body = ORACLE["dedup_clusters"].strip()
    return f"""
WITH clusters AS (
{body}
),
sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM clusters GROUP BY cluster_id
)
SELECT cluster_size, COUNT(*) AS n_clusters,
       cluster_size * COUNT(*) AS n_docs,
       (cluster_size - 1) * COUNT(*) AS dup_excess
FROM sizes
GROUP BY cluster_size
ORDER BY cluster_size
"""


ORACLE["dedup_cluster_size_hist"] = _cluster_size_hist_oracle()


def q_dedup_pair_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup family's SCALE CONTRACT as an oracled query: the
    candidate-pair budget of the MAX_SHINGLE_DF-capped inverted index.
    Generation cost is EXACTLY sum over kept posting lists of
    C(df, 2) — the quantity the cap bounds (every df <= the cap), and
    what tests/test_llm_ops.py measures equal to the physically
    generated pair count at sf0.1. Surfacing it as a query makes the
    budget checkable per-corpus before running the quadratic stage —
    the planning probe a 100 TB dedup pass runs first."""
    shingled = _shingled(spark, sf_dir)
    inv = shingled.select("doc_id", F.explode("shingles").alias("shingle"))
    lists = (
        inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= MAX_SHINGLE_DF))
    )
    return lists.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.sum(F.col("df") * (F.col("df") - F.lit(1)) / F.lit(2))
        .cast("bigint")
        .alias("pair_budget"),
        F.max("df").cast("bigint").alias("max_df"),
        F.lit(MAX_SHINGLE_DF).cast("bigint").alias("cap"),
    )


ORACLE["dedup_pair_budget"] = f"""
WITH shingled AS (
  SELECT doc_id, list_distinct({word_shingles_sql(_TOKENS_SQL, SHINGLE_N)}) AS shingles
  FROM documents
  WHERE len({word_shingles_sql(_TOKENS_SQL, SHINGLE_N)}) > 0
),
inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingled),
lists AS (
  SELECT shingle, COUNT(*) AS df FROM inv0 GROUP BY shingle
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {MAX_SHINGLE_DF}
)
SELECT COUNT(*) AS n_lists,
       CAST(SUM(df * (df - 1) / 2) AS BIGINT) AS pair_budget,
       CAST(MAX(df) AS BIGINT) AS max_df,
       CAST({MAX_SHINGLE_DF} AS BIGINT) AS cap
FROM lists
"""
