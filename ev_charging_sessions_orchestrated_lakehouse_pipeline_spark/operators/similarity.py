"""Similarity search over the ``embeddings`` table (array<float>,
64-dim): brute-force cosine top-k as the exact baseline, plus a
random-hyperplane LSH bucketed variant as the scale path
(BASELINE.json north star).

Scale design:

- **Brute force** broadcasts the (tiny) query set and computes dot
  products inside one codegen projection — ``zip_with`` +
  ``aggregate`` fold, all JVM-side, no Python. Cost is
  O(corpus x queries x dim) FLOPs streamed map-side; top-k uses
  TakeOrderedAndProject (per-partition heaps), never a full sort.
  This is the right plan when the query set is small; the corpus is
  never shuffled.
- **LSH** computes a 16-bit random-hyperplane signature per vector in
  one projection (hyperplane components derived deterministically
  from md5 — reproducible across runs and engines), then joins
  corpus to queries on the signature bucket so only colliding pairs
  pay the exact-cosine verification. At 100 TB the bucket join
  shuffles 8-byte signatures, not 256-byte vectors.

Float math note: element products are computed in double via a
sequential left fold, which both Spark and DuckDB evaluate in the
same order -> bit-identical cosines (verified), so the brute-force
query is fully oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.localframe import local_df

ORACLE: dict[str, str] = {}

TOP_K = 10
N_PLANES = 16
COSINE_THRESHOLD = 0.2


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, "embeddings")


def _dot(a: str, b: str) -> F.Column:
    """Sequential-fold double dot product of two float arrays."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k for one query vector (vec_id = 0).
# ---------------------------------------------------------------------------
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cosine = _dot("embedding", "qv") / (
        F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("qv", "qv"))
    )
    return (
        emb.crossJoin(F.broadcast(query))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "label", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


ORACLE["similarity_topk"] = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       {_dot_sql('embedding', 'qv')} /
       (sqrt({_dot_sql('embedding', 'embedding')}) * sqrt({_dot_sql('qv', 'qv')})) AS cosine
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT {TOP_K}
"""


# ---------------------------------------------------------------------------
# k-NN join: top-k neighbors for each of several query vectors
# (vec_id < 5), ranked per query via window.
# ---------------------------------------------------------------------------
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # norms fold once per ROW on each side (not once per pair): the
    # per-pair expression is a single dot + multiply, bit-identical
    # to the folded-per-pair form (sqrt and the self-dot fold are
    # deterministic), so the oracle keeps the textbook formulation
    emb = _emb(spark, sf_dir).withColumn(
        "norm", F.sqrt(_dot("embedding", "embedding"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qn"),
    )
    cosine = _dot("embedding", "qv") / (F.col("norm") * F.col("qn"))
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "rank", "vec_id", "cosine")
    )


ORACLE["knn_join"] = f"""
WITH queries AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT query_id, vec_id,
         {_dot_sql('embedding', 'qv')} /
         (sqrt({_dot_sql('embedding', 'embedding')}) * sqrt({_dot_sql('qv', 'qv')})) AS cosine
  FROM embeddings, queries
  WHERE vec_id <> query_id
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (dedup family): a probe
# sample scanned against the full corpus. The corpus side never
# shuffles — probes broadcast, dot products fold map-side, and the
# threshold filter runs inside the same projection. At 100 TB the
# probe set is whatever dedup batch arrived; cost is
# O(|probes| x corpus x dim) FLOPs streamed, no pair materialization.
# ---------------------------------------------------------------------------
NEAR_DUP_COSINE = 0.4  # fixtures are random vectors (max pair ~0.51)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same per-row-norm treatment as q_knn_join/semantic_dedup: the
    # corpus x probes pair stage pays ONE O(dim) fold per pair
    emb = _emb(spark, sf_dir).withColumn(
        "norm", F.sqrt(_dot("embedding", "embedding"))
    )
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qn"),
    )
    cosine = _dot("embedding", "qv") / (F.col("norm") * F.col("qn"))
    return (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", cosine.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
        .orderBy("probe_id", "vec_id")
    )


ORACLE["dedup_embedding_cosine"] = f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0
)
SELECT probe_id, vec_id,
       {_dot_sql('embedding', 'qv')} /
       (sqrt({_dot_sql('embedding', 'embedding')}) * sqrt({_dot_sql('qv', 'qv')})) AS cosine
FROM embeddings, probes
WHERE vec_id <> probe_id
  AND {_dot_sql('embedding', 'qv')} /
      (sqrt({_dot_sql('embedding', 'embedding')}) * sqrt({_dot_sql('qv', 'qv')})) >= {NEAR_DUP_COSINE}
ORDER BY probe_id, vec_id
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: the other classic scale path next to LSH.
# Cells are defined by a small centroid set; every vector is assigned
# to its max-cosine centroid map-side (centroids broadcast, argmax
# via one max(struct) aggregation — map-side combinable); queries
# then search ONLY their own cell. Fully deterministic, so unlike
# most ANN this one is exactly oracled in SQL.
# At scale: assignment is one broadcast + one combinable agg, the
# cell join shuffles only (vec_id, cell) pairs, and recall/cost is
# tuned by n_centroids (and n_probe cells, here 1).
# ---------------------------------------------------------------------------
N_CENTROIDS = 16
IVF_TOP_K = 3


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, cell) — max-cosine centroid per vector.
    Ties break toward the larger cent_id (max over (cos, cent_id)
    structs), mirrored in the oracle's ORDER BY ... DESC."""
    cos = _dot("embedding", "cv") / (
        F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("cv", "cv"))
    )
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "embedding", F.struct(cos.alias("c"), F.col("cent_id")).alias("sc")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.max("sc").alias("best"), F.first("embedding").alias("embedding"))
        .select("vec_id", "embedding", F.col("best.cent_id").alias("cell"))
    )


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    assigned = ivf_assign(emb, centroids)
    queries = assigned.filter(
        (F.col("vec_id") >= N_CENTROIDS) & (F.col("vec_id") < N_CENTROIDS + 5)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("cell").alias("qcell"),
    )
    cos = _dot("embedding", "qv") / (
        F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("qv", "qv"))
    )
    scored = (
        assigned.join(F.broadcast(queries), F.col("cell") == F.col("qcell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVF_TOP_K)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cosine")
    )


_IVF_COS = (
    f"{_dot_sql('e.embedding', 'c.cv')} / "
    f"(sqrt({_dot_sql('e.embedding', 'e.embedding')}) * sqrt({_dot_sql('c.cv', 'c.cv')}))"
)
ORACLE["similarity_ivf"] = f"""
WITH centroids AS (
  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_IVF_COS} DESC, c.cent_id DESC) AS rn
    FROM embeddings e, centroids c
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS qv, cell AS qcell
  FROM assigned
  WHERE vec_id >= {N_CENTROIDS} AND vec_id < {N_CENTROIDS + 5}
),
scored AS (
  SELECT query_id, a.vec_id,
         {_dot_sql('a.embedding', 'qv')} /
         (sqrt({_dot_sql('a.embedding', 'a.embedding')}) * sqrt({_dot_sql('qv', 'qv')})) AS cosine
  FROM assigned a JOIN queries q ON a.cell = q.qcell
  WHERE a.vec_id <> q.query_id
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
WHERE rank <= {IVF_TOP_K}
"""


def ivf_search(
    emb: DataFrame,
    centroids: DataFrame,
    query_filter: F.Column,
    top_k: int = IVF_TOP_K,
    n_probe: int = 1,
) -> DataFrame:
    """n_probe-generalized IVF search: every vector sits in its
    max-cosine cell (``ivf_assign``); each query probes its
    ``n_probe`` highest-cosine cells and ranks candidates by exact
    cosine. ``n_probe=1`` reproduces ``q_similarity_ivf``'s shape;
    ``n_probe=N_CENTROIDS`` degenerates to exact brute force (every
    cell probed — the property the recall test anchors on). Cells are
    disjoint, so probing distinct cells can never duplicate a
    candidate pair. Shuffle profile is unchanged from the 1-probe
    path: centroids and the (query, probe-cell) list broadcast, the
    corpus never re-partitions."""
    assigned = ivf_assign(emb, centroids)
    queries = assigned.filter(query_filter).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    qcos = _dot("qv", "cv") / (
        F.sqrt(_dot("qv", "qv")) * F.sqrt(_dot("cv", "cv"))
    )
    wq = W.partitionBy("query_id").orderBy(
        F.col("qc").desc(), F.col("cent_id").desc()
    )
    probe_cells = (
        queries.crossJoin(F.broadcast(centroids))
        .select("query_id", "qv", qcos.alias("qc"), "cent_id")
        .withColumn("probe_rank", F.row_number().over(wq))
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "qv", F.col("cent_id").alias("qcell"))
    )
    cos = _dot("embedding", "qv") / (
        F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("qv", "qv"))
    )
    scored = (
        assigned.join(F.broadcast(probe_cells), F.col("cell") == F.col("qcell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "vec_id", "cosine")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path; rows-only driver check).
# ---------------------------------------------------------------------------
EMB_DIM = 64


def _plane_weights(plane: int, dim: int = EMB_DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane weights in [-1000, 1000],
    derived from md5(plane, dim-index) ON THE DRIVER — the weights
    depend only on (plane, d), so they are embedded as literal arrays
    instead of re-hashing per row (1024 md5 calls/vector otherwise)."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"p{plane}|{d}".encode()).hexdigest()[:15], 16)
        out.append(float(h % 2001 - 1000))
    return out


def _hyperplane_sign(plane: int) -> F.Column:
    """Sign bit of <v, h_plane>: fold of the embedding against the
    literal weight array — one projection, no shuffle, no per-row
    hashing."""
    weights = ", ".join(f"CAST({w} AS DOUBLE)" for w in _plane_weights(plane))
    return F.expr(
        f"CASE WHEN aggregate(zip_with(embedding, array({weights}), "
        f"(x, w) -> CAST(x AS DOUBLE) * w), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) >= 0 THEN {2**plane} ELSE 0 END"
    )


LSH_PLANE_BANDS = 4  # bands of 4 hyperplanes each (16 planes total)
LSH_PLANES_PER_BAND = 4


def lsh_band_signatures(emb: DataFrame) -> DataFrame:
    """Banded hyperplane signatures: one row per (vector, band) with a
    4-bit band value. A pair is a candidate if ANY band matches —
    the OR-of-ANDs S-curve that trades bucket selectivity for recall
    (single 16-bit buckets have near-zero collision rates even for
    similar vectors)."""
    bands = []
    for b in range(LSH_PLANE_BANDS):
        val = None
        for r in range(LSH_PLANES_PER_BAND):
            term = _hyperplane_sign(b * LSH_PLANES_PER_BAND + r)
            val = term if val is None else val + term
        bands.append(val.cast("long"))
    return emb.select(
        "*", F.posexplode(F.array(*bands)).alias("band_id", "band_val")
    )


def q_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via band-bucket collision + exact cosine verify. Returns
    (query_id, vec_id, cosine) for colliding pairs above the
    threshold — a recall-bounded subset of the brute-force result."""
    emb = _emb(spark, sf_dir)
    banded = lsh_band_signatures(emb)
    queries = banded.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("band_id").alias("q_band_id"),
        F.col("band_val").alias("q_band_val"),
    )
    cosine = _dot("embedding", "qv") / (
        F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("qv", "qv"))
    )
    return (
        banded.join(
            F.broadcast(queries),
            (F.col("band_id") == F.col("q_band_id"))
            & (F.col("band_val") == F.col("q_band_val")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "qv", "embedding")
        .dropDuplicates(["query_id", "vec_id"])
        .select("query_id", "vec_id", cosine.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
        .orderBy("query_id", "vec_id")
    )


def _plane_sql(plane: int) -> str:
    """DuckDB twin of :func:`_plane_weights`: regenerates the literal
    hyperplane from md5('p{plane}|{d}') — the same driver-side recipe,
    so the oracle derives identical weights without embedding 1024
    literals in the SQL string."""
    return (
        "list_transform(range(0, 64), d -> "
        f"CAST(CAST(('0x' || substr(md5('p{plane}|' || CAST(d AS VARCHAR)), 1, 15)) "
        "AS BIGINT) % 2001 - 1000 AS DOUBLE))"
    )


def _band_val_sql(band: int) -> str:
    terms = []
    for r in range(LSH_PLANES_PER_BAND):
        plane = band * LSH_PLANES_PER_BAND + r
        terms.append(
            f"(CASE WHEN {_dot_sql('embedding', _plane_sql(plane))} >= 0 "
            f"THEN {2 ** plane} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


ORACLE["similarity_lsh"] = f"""
WITH banded AS (
  SELECT vec_id, embedding,
         unnest([0, 1, 2, 3]) AS band_id,
         unnest([{_band_val_sql(0)},
                 {_band_val_sql(1)},
                 {_band_val_sql(2)},
                 {_band_val_sql(3)}]) AS band_val
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         band_id AS q_band_id, band_val AS q_band_val
  FROM banded WHERE vec_id < 5
), pairs AS (
  SELECT DISTINCT b.vec_id AS vec_id, q.query_id AS query_id,
                  b.embedding AS embedding, q.qv AS qv
  FROM banded b
  JOIN q ON b.band_id = q.q_band_id AND b.band_val = q.q_band_val
  WHERE b.vec_id <> q.query_id
), scored AS (
  SELECT query_id, vec_id,
         {_dot_sql('embedding', 'qv')} /
         (sqrt({_dot_sql('embedding', 'embedding')}) *
          sqrt({_dot_sql('qv', 'qv')})) AS cosine
  FROM pairs
)
SELECT query_id, vec_id, cosine FROM scored WHERE cosine >= {COSINE_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Per-group centroids: dimension-wise mean vector per label — the
# k-means "M step" / IVF codebook-training primitive. posexplode
# turns (label, vec[64]) into (label, dim, val) rows; the groupBy on
# (label, dim) is ONE map-side-combinable shuffle carrying 64
# partial sums per label per partition, not raw vectors. At 100 TB
# with d dims and k labels the shuffle payload is k*d*partitions
# longs — independent of row count, which is what makes distributed
# k-means iterations cheap.
#
# Components are accumulated in FIXED POINT (floor(x*1000) milli
# units): float sums are order-dependent and decimal quantization of
# arbitrary doubles is engine-dependent (Spark rounds the shortest
# string repr, DuckDB the binary value — they disagree at the last
# decimal digit), but integer accumulation is exact, associative,
# and layout-invariant, so the centroid is a pure function of the
# data on any cluster and matches the oracle bit-for-bit. The final
# mean = (sum/count)/1000 is two IEEE double ops on exact integers.
# ---------------------------------------------------------------------------
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point dimension-wise mean embedding per label."""
    emb = _emb(spark, sf_dir)
    q = F.floor(F.col("val").cast("double") * 1000)
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(
            (F.sum(q).cast("double") / F.count(q) / 1000).alias("mean_val"),
            F.count(q).alias("n"),
        )
        .orderBy("label", "dim")
    )


ORACLE["embedding_centroids"] = """
SELECT label, dim,
       CAST(SUM(q) AS DOUBLE) / COUNT(q) / 1000 AS mean_val,
       COUNT(q) AS n
FROM (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM embeddings
)
GROUP BY label, dim
ORDER BY label, dim
"""


# ---------------------------------------------------------------------------
# Int8 embedding quantization quality report — the storage-side op of
# an embedding pipeline (int8 cuts a 100 TB float corpus 4x before
# ANN indexing; the question is always "how much error").
#
# Per vector: symmetric scale = max|x|/127, q_i = floor(x_i/scale +
# 0.5) in [-127, 127], reconstruction x̂_i = q_i * scale. The whole
# quantize/dequantize/error pass is ONE let-bound higher-order
# expression per row — no explode, no shuffle; the per-label rollup
# shuffles only (label, partial-sum, partial-max) longs.
#
# Engine parity: errors are folded in FIXED POINT (floor(|err|*1e7)
# as int64 — same rationale as the centroid op above: integer
# accumulation is exact and layout-invariant, float sums are not).
# floor/abs/division evaluate identically under IEEE on both engines.
# ---------------------------------------------------------------------------
_Q_ERR_BODY = (
    "aggregate(embedding, 0L, (acc, x) -> acc + floor(abs("
    "CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / s + 0.5D) * s"
    ") * 10000000.0D))"
)
_Q_MAX_BODY = (
    "aggregate(embedding, 0L, (acc, x) -> greatest(acc, floor(abs("
    "CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / s + 0.5D) * s"
    ") * 10000000.0D)))"
)
_SCALE_EXPR = (
    "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0D"
)


def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label int8 reconstruction-error rollup (fixed-point 1e-7
    units). Vectors with all-zero norm (scale 0) are skipped — there
    is nothing to quantize."""
    from ..functions.hashing import let_sql

    emb = _emb(spark, sf_dir)
    per_vec = emb.select(
        "label",
        F.expr(let_sql(_SCALE_EXPR, "s", _Q_ERR_BODY)).alias("err_e7"),
        F.expr(let_sql(_SCALE_EXPR, "s", _Q_MAX_BODY)).alias("max_e7"),
        F.expr(f"({_SCALE_EXPR}) > 0.0D").alias("nonzero"),
    ).filter("nonzero")
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("err_e7").alias("total_abs_err_e7"),
            F.max("max_e7").alias("max_dim_err_e7"),
        )
        .orderBy("label")
    )


def _quant_oracle() -> str:
    scale = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0"
    err_list = (
        "list_transform(embedding, x -> CAST(floor(abs("
        "CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / s + 0.5) * s"
        ") * 10000000.0) AS BIGINT))"
    )
    return f"""
WITH scaled AS (
  SELECT label, embedding, {scale} AS s FROM embeddings
), per_vec AS (
  SELECT label,
         list_reduce(list_prepend(CAST(0 AS BIGINT), {err_list}),
                     (acc, e) -> acc + e) AS err_e7,
         list_reduce(list_prepend(CAST(0 AS BIGINT), {err_list}),
                     (acc, e) -> greatest(acc, e)) AS max_e7
  FROM scaled WHERE s > 0.0
)
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(err_e7) AS BIGINT) AS total_abs_err_e7,
       CAST(MAX(max_e7) AS BIGINT) AS max_dim_err_e7
FROM per_vec GROUP BY label ORDER BY label
"""


ORACLE["embedding_quantization"] = _quant_oracle()


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): prune embedding-level near-
# duplicates inside deterministic hyperplane buckets. The published
# recipe clusters the corpus (k-means), then drops all-but-one of
# every intra-cluster group whose pairwise cosine exceeds a
# threshold. Here the bucketing stage is a 4-bit deterministic
# hyperplane signature (md5-derived literal weights — same family as
# the LSH above) so the whole query is exactly reproducible in the
# SQL oracle; swapping the bucket column for an IVF/k-means cell
# (ivf_assign / operators.clustering) changes no other line.
#
# Scale design: the signature is one map-side projection; the
# self-join meets rows only within a bucket (shuffle key = 8-byte
# bucket id; with k buckets the pair count is sum(bucket²), not n²);
# the keep/remove verdict is a groupBy over surviving pairs only.
# At 100 TB, bucket count scales with corpus size (more planes or
# k-means cells), holding per-bucket pair generation bounded.
# ---------------------------------------------------------------------------
SEMANTIC_PLANES = 4
SEMANTIC_TAU = 0.3


def semantic_buckets(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding, bucket): 4-bit hyperplane signature."""
    sig = None
    for p in range(SEMANTIC_PLANES):
        term = _hyperplane_sign(p)
        sig = term if sig is None else sig + term
    return emb.select("vec_id", "embedding", sig.cast("long").alias("bucket"))


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(removed_vec_id, keep_vec_id, best_cosine) — every vector with
    an intra-bucket neighbor of smaller id at cosine >= SEMANTIC_TAU
    is removed; keep_vec_id is its smallest such neighbor and
    best_cosine the strongest one.

    Per-pair work is ONE dot product: each vector's norm is computed
    once per ROW before the join (sqrt and the self-dot fold are
    deterministic, so cosine = dot/(norm_a*norm_b) is bit-identical
    to folding both self-dots per pair — the oracle is unchanged),
    and the bucketed+normed frame persists so the signature
    projection isn't evaluated once per join side. Against the
    per-pair-norms formulation this cuts the pair-stage HOF work
    ~3x (one O(dim) fold per pair instead of three)."""
    b = semantic_buckets(_emb(spark, sf_dir)).withColumn(
        "norm", F.sqrt(_dot("embedding", "embedding"))
    )
    b = b.persist()
    left = b.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("ea"),
        F.col("norm").alias("na"),
        "bucket",
    )
    right = b.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("eb"),
        F.col("norm").alias("nb"),
        "bucket",
    )
    cos = _dot("ea", "eb") / (F.col("na") * F.col("nb"))
    pairs = (
        left.join(right, "bucket")
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", cos.alias("cosine"))
        .filter(F.col("cosine") >= SEMANTIC_TAU)
    )
    return (
        pairs.groupBy("ib")
        .agg(F.min("ia").alias("keep_vec_id"), F.max("cosine").alias("best_cosine"))
        .select(
            F.col("ib").alias("removed_vec_id"), "keep_vec_id", "best_cosine"
        )
        .orderBy("removed_vec_id")
    )


def _semantic_oracle() -> str:
    terms = []
    for p in range(SEMANTIC_PLANES):
        w = ", ".join(f"CAST({x} AS DOUBLE)" for x in _plane_weights(p))
        terms.append(
            f"CASE WHEN {_dot_sql('embedding', f'[{w}]')} >= 0 "
            f"THEN {2 ** p} ELSE 0 END"
        )
    sig = " + ".join(terms)
    cos = (
        f"{_dot_sql('a.embedding', 'b.embedding')} / "
        f"(sqrt({_dot_sql('a.embedding', 'a.embedding')}) * "
        f"sqrt({_dot_sql('b.embedding', 'b.embedding')}))"
    )
    return f"""
WITH sig AS (
  SELECT vec_id, embedding, CAST({sig} AS BIGINT) AS bucket FROM embeddings
), pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {cos} AS cosine
  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT ib AS removed_vec_id, MIN(ia) AS keep_vec_id, MAX(cosine) AS best_cosine
FROM pairs WHERE cosine >= {SEMANTIC_TAU}
GROUP BY ib
ORDER BY removed_vec_id
"""


ORACLE["semantic_dedup"] = _semantic_oracle()


# ---------------------------------------------------------------------------
# Arrow-vectorized Pandas-UDF cosine — the Python-tier twin of the
# JVM fold in _dot. The JVM expression is the default hot path (no
# serialization); this exists for pipelines whose scoring function
# genuinely needs numpy/Python (learned rerankers, custom metrics),
# and demonstrates the correct Python tier: Arrow-batched columnar
# transfer + numpy vectorization, never row-at-a-time Python UDFs.
# tests/test_llm_ops.py pins it equal to the JVM fold.
# ---------------------------------------------------------------------------
def cosine_pandas_udf(query_vec: list[float]):
    """Returns a pandas_udf computing cosine(embedding, query_vec)
    per row, vectorized over Arrow batches."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum())

    # no type hints: `from __future__ import annotations` turns them
    # into strings that pandas_udf's hint resolver can't evaluate
    # against the closure's local imports
    @pandas_udf("double")
    def _cos(emb):
        m = np.stack(emb.to_numpy())  # (batch, dim) float32
        m = m.astype(np.float64)
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return _cos


# ---------------------------------------------------------------------------
# MMR (maximal marginal relevance) diversified re-ranking — the
# standard retrieve-then-rerank shape of a RAG/similarity pipeline:
# stage 1 retrieves a relevance pool DISTRIBUTEDLY (the corpus scan +
# top-N, identical plan to q_similarity_topk), stage 2 greedily picks
# k results trading relevance against redundancy:
#   pick = argmax over remaining  lam*rel(d) - (1-lam)*max_{s in S} sim(d, s)
# Stage 2 runs driver-side over the POOL ONLY (pool x dim floats,
# bounded by construction — the k-means-centroid treatment): the
# greedy recurrence is sequential in k and each step touches just the
# pool, so distributing it would shuffle more than it computes. At
# 100 TB the corpus cost is stage 1, which stays a full distributed
# scan + TakeOrderedAndProject.
# ---------------------------------------------------------------------------
MMR_LAMBDA = 0.7
MMR_K = 10
MMR_POOL = 50


def mmr_rerank(
    pool: list[tuple[int, list[float], float]],
    k: int = MMR_K,
    lam: float = MMR_LAMBDA,
) -> list[tuple[int, int, float]]:
    """Greedy MMR over a retrieved pool of (vec_id, embedding,
    relevance), highest-relevance-first tiebreak by vec_id. Returns
    (rank, vec_id, relevance). Pure function — unit-testable without
    Spark."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return num / den if den else 0.0

    remaining = {vid: (vec, rel) for vid, vec, rel in pool}
    selected: list[tuple[int, int, float]] = []
    sel_vecs: list[list[float]] = []
    while remaining and len(selected) < k:
        best_id, best_score = None, None
        for vid in sorted(remaining):
            vec, rel = remaining[vid]
            redundancy = max((cos(vec, s) for s in sel_vecs), default=0.0)
            score = lam * rel - (1.0 - lam) * redundancy
            if best_score is None or score > best_score:
                best_id, best_score = vid, score
        vec, rel = remaining.pop(best_id)
        sel_vecs.append(vec)
        selected.append((len(selected) + 1, best_id, rel))
    return selected


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract audit of the MMR selection for query vec_id=0 (the
    kmeans_clusters treatment: the greedy recurrence is not
    SQL-replayable, so the oracle checks LIVE invariants computed
    from the actual selection — n_selected, ranks forming 1..k,
    every pick drawn from the relevance pool, the first pick being
    the relevance argmax, and diversity_gain (selection's mean
    pairwise cosine strictly below the plain top-k's, asserted
    non-vacuously in tests/test_llm_ops.py). Detailed greedy-step
    optimality is pinned by the pure-python property test."""
    emb = _emb(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cosine = _dot("embedding", "qv") / (
        F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("qv", "qv"))
    )
    pool_df = (
        emb.crossJoin(F.broadcast(query))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding", cosine.alias("rel"))
        .orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(MMR_POOL)
    )
    pool = [
        (r.vec_id, [float(x) for x in r.embedding], float(r.rel))
        for r in pool_df.collect()  # bounded: MMR_POOL x dim
    ]
    audit_schema = (
        "n_selected int, k int, ranks_contiguous boolean, "
        "all_from_pool boolean, first_is_top1 boolean"
    )
    if not pool:
        # empty partition: no query vector, no pool — no audit row
        return local_df(spark, [], audit_schema)
    sel = mmr_rerank(pool)
    pool_ids = {vid for vid, _, _ in pool}
    top1 = pool[0][0]  # pool is relevance-ordered
    return local_df(spark, 
        [
            (
                len(sel),
                MMR_K,
                sorted(r for r, _, _ in sel) == list(range(1, len(sel) + 1)),
                all(vid in pool_ids for _, vid, _ in sel),
                sel[0][1] == top1,
            )
        ],
        audit_schema,
    )


ORACLE["mmr_rerank"] = f"""
SELECT CAST({MMR_K} AS INT) AS n_selected,
       CAST({MMR_K} AS INT) AS k,
       TRUE AS ranks_contiguous,
       TRUE AS all_from_pool,
       TRUE AS first_is_top1
"""


# ---------------------------------------------------------------------------
# Cross-modal curation: the only place the documents and embeddings
# tables meet. Each document joins its embedding's semantic bucket
# (the deterministic hyperplane signature above — at scale the
# k-means/IVF cell), and the profile aggregates quality signals per
# semantic neighborhood: size, text length, language and source
# diversity. This is the SemDeDup-era curation dashboard — "which
# semantic regions of the corpus are big, short-doc, single-source
# monocultures" — and the pruning decisions (cap, rebalance, drop)
# key off exactly these rows.
#
# Scale: the equi-join is doc_id = vec_id (one shuffle, or zero with
# both tables bucketed by id via sources.writers.write_bucketed);
# the profile output is |buckets| rows. Text payloads are never
# shuffled — only ids, buckets, and the three profiled columns move.
# ---------------------------------------------------------------------------
def q_cluster_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.oracle import davg

    from ..sources.readers import read_fixture

    docs = read_fixture(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    b = semantic_buckets(_emb(spark, sf_dir)).select("vec_id", "bucket")
    return (
        b.join(docs, b.vec_id == docs.doc_id)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            davg("n_chars").alias("avg_chars"),
            F.count_distinct("lang").alias("n_langs"),
            F.count_distinct("source").alias("n_sources"),
        )
        .orderBy("bucket")
    )


def _cluster_profile_oracle() -> str:
    from ..functions.oracle import davg_sql

    terms = []
    for p in range(SEMANTIC_PLANES):
        w = ", ".join(f"CAST({x} AS DOUBLE)" for x in _plane_weights(p))
        terms.append(
            f"CASE WHEN {_dot_sql('embedding', f'[{w}]')} >= 0 "
            f"THEN {2 ** p} ELSE 0 END"
        )
    sig = " + ".join(terms)
    return f"""
WITH b AS (
  SELECT vec_id, CAST({sig} AS BIGINT) AS bucket FROM embeddings
)
SELECT bucket, COUNT(*) AS n_docs,
       {davg_sql('n_chars')} AS avg_chars,
       COUNT(DISTINCT lang) AS n_langs,
       COUNT(DISTINCT source) AS n_sources
FROM b JOIN documents d ON b.vec_id = d.doc_id
GROUP BY bucket ORDER BY bucket
"""


ORACLE["cluster_quality_profile"] = _cluster_profile_oracle()


# ---------------------------------------------------------------------------
# Hard-negative mining — the contrastive-training data op: for each
# anchor vector, its most similar SAME-label neighbor (the positive)
# and its most similar DIFFERENT-label neighbor (the hard negative —
# the confusable example that actually teaches the margin), plus the
# margin between them. Negative margins flag anchors whose nearest
# neighbor crosses the label boundary: exactly the samples a
# metric-learning curriculum surfaces first.
#
# Shape follows q_knn_join: anchors broadcast against the corpus,
# norms folded once per row, per-pair work a single dot+multiply,
# then one window per (anchor, side) ranking. At scale the anchor
# side is a sampled batch (bounded broadcast) and the corpus side
# streams — payload vectors never shuffle; mining the FULL corpus
# swaps the broadcast for the LSH/IVF candidate generation already
# in this module without changing this ranking contract.
# ---------------------------------------------------------------------------
HARDNEG_ANCHORS = 8


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn(
        "norm", F.sqrt(_dot("embedding", "embedding"))
    )
    anchors = emb.filter(F.col("vec_id") < HARDNEG_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qn"),
    )
    cosine = _dot("embedding", "qv") / (F.col("norm") * F.col("qn"))
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "vec_id",
            "label",
            cosine.alias("cosine"),
        )
    )
    w = W.partitionBy(
        "anchor_id", F.col("label") == F.col("anchor_label")
    ).orderBy(F.col("cosine").desc(), F.col("vec_id"))
    ranked = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    # one conditional aggregation instead of a pos/neg self-join —
    # the scored subtree (corpus x broadcast anchors) evaluates ONCE;
    # each (anchor, side) group has exactly one rk=1 row, so the MAX
    # picks it
    same = F.col("label") == F.col("anchor_label")
    return (
        ranked.groupBy("anchor_id", "anchor_label")
        .agg(
            F.max(F.when(same, F.col("vec_id"))).alias("positive_id"),
            F.max(F.when(same, F.col("cosine"))).alias("positive_cos"),
            F.max(F.when(~same, F.col("vec_id"))).alias("hard_negative_id"),
            F.max(F.when(~same, F.col("cosine"))).alias("negative_cos"),
        )
        .select(
            "anchor_id",
            "anchor_label",
            "positive_id",
            "positive_cos",
            "hard_negative_id",
            "negative_cos",
            (F.col("positive_cos") - F.col("negative_cos")).alias("margin"),
        )
        .orderBy("anchor_id")
    )


ORACLE["hard_negatives"] = f"""
WITH anchors AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS qv
  FROM embeddings WHERE vec_id < {HARDNEG_ANCHORS}
),
scored AS (
  SELECT a.anchor_id, a.anchor_label, e.vec_id, e.label,
         {_dot_sql('e.embedding', 'a.qv')} /
         (sqrt({_dot_sql('e.embedding', 'e.embedding')})
          * sqrt({_dot_sql('a.qv', 'a.qv')})) AS cosine
  FROM embeddings e, anchors a
  WHERE e.vec_id <> a.anchor_id
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY anchor_id, (label = anchor_label)
      ORDER BY cosine DESC, vec_id) AS rk
  FROM scored
),
best AS (
  SELECT anchor_id, anchor_label,
         MAX(CASE WHEN label = anchor_label THEN vec_id END) AS positive_id,
         MAX(CASE WHEN label = anchor_label THEN cosine END) AS positive_cos,
         MAX(CASE WHEN label <> anchor_label THEN vec_id END)
           AS hard_negative_id,
         MAX(CASE WHEN label <> anchor_label THEN cosine END)
           AS negative_cos
  FROM ranked WHERE rk = 1
  GROUP BY anchor_id, anchor_label
)
SELECT anchor_id, anchor_label, positive_id, positive_cos,
       hard_negative_id, negative_cos,
       positive_cos - negative_cos AS margin
FROM best
ORDER BY anchor_id
"""


# ---------------------------------------------------------------------------
# Embedding outlier audit — per-label robust (median-relative)
# squared-distance screen against the label centroid: the "mislabeled
# or corrupted vector" detector an embedding pipeline runs before
# training retrieval heads. Complements cluster_quality_profile
# (bucket composition) and kmeans_clusters (unsupervised structure)
# with a SUPERVISED per-vector verdict; the robust threshold is the
# mad_outliers discipline applied in embedding space — a label whose
# cluster is wide raises its own bar.
#
# Engine parity: centroids use the exact fixed-point integer mean
# (q_embedding_centroids' floor(val*1000) rationale); each distance
# is ONE sequential IEEE fold over the dimension order (the _dot
# discipline), and the median threshold PICKS order statistics
# (_exact_median) — no double summation across rows anywhere.
#
# Scale (100 TB): centroids aggregate map-side to |labels| x dims
# rows and broadcast back as arrays; distances are map-side folds;
# the only row-scale shuffle is the (label, dist2) rank pass of the
# exact median, swappable for the approx_percentile sketch at
# petabyte scale without changing the join shape.
# ---------------------------------------------------------------------------
EMB_OUTLIER_K = 4.0


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .stats import _exact_median

    emb = _emb(spark, sf_dir)
    centroids = (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.floor(F.col("val").cast("double") * 1000))
                .cast("double")
                / F.count(F.lit(1))
                / 1000
            ).alias("mean_val")
        )
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, mean_val))), "
                "x -> x.mean_val)"
            ).alias("cvec")
        )
    )
    dist2 = F.expr(
        "aggregate(zip_with(embedding, cvec, "
        "(x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    devs = emb.join(F.broadcast(centroids), "label").select(
        "vec_id", "label", dist2.alias("dist2")
    )
    med = _exact_median(devs, "label", "dist2", "med_dist2").select(
        "label", "med_dist2"
    )
    return (
        devs.join(F.broadcast(med), "label")
        .where(F.col("dist2") > F.lit(EMB_OUTLIER_K) * F.col("med_dist2"))
        .select(
            "vec_id",
            "label",
            "dist2",
            (F.col("dist2") / F.col("med_dist2")).alias("med_ratio"),
        )
        .orderBy("label", "vec_id")
    )


def _emb_outliers_oracle() -> str:
    from .stats import _median_sql

    return f"""
WITH centroid_dims AS (
  SELECT label, dim, CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000 AS mean_val
  FROM (
    SELECT label,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
    FROM embeddings
  )
  GROUP BY label, dim
), centroids AS (
  SELECT label,
         list_transform(list_sort(list({{'dim': dim,
                                         'mean_val': mean_val}})),
                        x -> x.mean_val) AS cvec
  FROM centroid_dims GROUP BY label
), devs AS (
  SELECT vec_id, e.label,
         list_sum(list_transform(list_zip(embedding, cvec),
           p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])))
           AS dist2
  FROM embeddings e JOIN centroids c ON e.label = c.label
),
med AS ({_median_sql("devs", "label", "dist2", "med_dist2")})
SELECT vec_id, label, dist2, dist2 / med_dist2 AS med_ratio
FROM devs JOIN med USING (label)
WHERE dist2 > {EMB_OUTLIER_K} * med_dist2
ORDER BY label, vec_id
"""


ORACLE["embedding_outliers"] = _emb_outliers_oracle()


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion — merge two retrieval rankings (cosine
# similarity to two probe vectors, the multi-query retrieval shape)
# into one list via RRF: score(d) = sum over rankings of
# 1 / (60 + rank_d). The standard ensemble trick for combining
# lexical + dense (or multi-probe) retrieval without score
# calibration.
#
# Determinism: each ranking is a row_number over (cosine DESC,
# vec_id); each RRF term is ONE correctly-rounded IEEE division of
# integers, and the final score adds at most two doubles (a single
# commutative addition — no multi-row float sum exists anywhere).
#
# Scale: cosines are map-side projections against broadcast 1-row
# probes; the two global rank windows order slim (vec_id, cosine)
# pairs only; the fusion join is pool-sized (2 x RRF_POOL rows).
# ---------------------------------------------------------------------------
RRF_K = 60
RRF_POOL = 50
RRF_TOPK = 20


def _rrf_ranking(emb: DataFrame, probe_id: int) -> DataFrame:
    query = emb.filter(F.col("vec_id") == probe_id).select(
        F.col("embedding").alias("qv")
    )
    cosine = _dot("embedding", "qv") / (
        F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("qv", "qv"))
    )
    scored = (
        emb.filter(F.col("vec_id") > 1)
        .crossJoin(F.broadcast(query))
        .select("vec_id", cosine.alias("cos"))
    )
    rk = F.row_number().over(W.orderBy(F.desc("cos"), "vec_id"))
    return scored.select("vec_id", rk.alias("rk")).where(F.col("rk") <= RRF_POOL)


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    ra = _rrf_ranking(emb, 0).withColumnRenamed("rk", "rank_a")
    rb = _rrf_ranking(emb, 1).withColumnRenamed("rk", "rank_b")
    fused = ra.join(rb, "vec_id", "full_outer")
    term_a = F.when(
        F.col("rank_a").isNotNull(),
        F.lit(1.0) / (F.lit(RRF_K).cast("double") + F.col("rank_a").cast("double")),
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("rank_b").isNotNull(),
        F.lit(1.0) / (F.lit(RRF_K).cast("double") + F.col("rank_b").cast("double")),
    ).otherwise(F.lit(0.0))
    return (
        fused.select("vec_id", "rank_a", "rank_b", (term_a + term_b).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), "vec_id")
        .limit(RRF_TOPK)
    )


def _rrf_ranking_sql(probe_id: int) -> str:
    return f"""
  SELECT vec_id, rk FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY cos DESC, vec_id) AS rk
    FROM (
      SELECT e.vec_id,
             {_dot_sql('e.embedding', 'q.qv')} /
             (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')})) AS cos
      FROM embeddings e,
           (SELECT embedding AS qv FROM embeddings WHERE vec_id = {probe_id}) q
      WHERE e.vec_id > 1
    )
  ) WHERE rk <= {RRF_POOL}"""


ORACLE["rrf_fusion"] = f"""
WITH ra AS ({_rrf_ranking_sql(0)}),
rb AS ({_rrf_ranking_sql(1)})
SELECT COALESCE(ra.vec_id, rb.vec_id) AS vec_id,
       CAST(ra.rk AS BIGINT) AS rank_a,
       CAST(rb.rk AS BIGINT) AS rank_b,
       (CASE WHEN ra.rk IS NOT NULL
             THEN 1.0 / (CAST({RRF_K} AS DOUBLE) + CAST(ra.rk AS DOUBLE))
             ELSE 0.0 END
        + CASE WHEN rb.rk IS NOT NULL
               THEN 1.0 / (CAST({RRF_K} AS DOUBLE) + CAST(rb.rk AS DOUBLE))
               ELSE 0.0 END) AS rrf_score
FROM ra FULL OUTER JOIN rb ON ra.vec_id = rb.vec_id
ORDER BY rrf_score DESC, vec_id
LIMIT {RRF_TOPK}
"""


# ---------------------------------------------------------------------------
# Centroid drift — pairwise cosine between per-label mean embeddings:
# the embedding-space drift monitor (did source B's vectors move away
# from source A's?) that complements embedding_centroids (the means
# themselves) and semantic_dedup (row-level pairs). Quantized-int
# dimension sums make the centroids exact; the cross-dimension dot
# products fold in sorted-dim order (the tfidf_pairs fixed-order IEEE
# trick) so the doubles sum identically on both engines.
#
# Scale: centroids are a map-side-combinable (label, dim) aggregate —
# the only thing shuffled is |labels| x |dims| slim rows; the pair
# join runs on that tiny frame, never on vectors.
# ---------------------------------------------------------------------------
def q_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = F.floor(F.col("val").cast("double") * 1000)
    cents = (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg((F.sum(q).cast("double") / F.count(q) / 1000).alias("m"))
    )
    a = cents.select(F.col("label").alias("la"), "dim", F.col("m").alias("ma"))
    b = cents.select(F.col("label").alias("lb"), "dim", F.col("m").alias("mb"))
    pairs = a.join(b, "dim").where(F.col("la") < F.col("lb"))

    def fold(col: str) -> Column:
        return F.expr(
            f"aggregate(array_sort(collect_list({col})), CAST(0 AS DOUBLE), "
            "(acc, x) -> acc + x.t)"
        )

    sums = (
        pairs.select(
            "la",
            "lb",
            F.struct("dim", (F.col("ma") * F.col("mb")).alias("t")).alias("dt"),
            F.struct("dim", (F.col("ma") * F.col("ma")).alias("t")).alias("da"),
            F.struct("dim", (F.col("mb") * F.col("mb")).alias("t")).alias("db"),
        )
        .groupBy("la", "lb")
        .agg(
            fold("dt").alias("dot"),
            fold("da").alias("na2"),
            fold("db").alias("nb2"),
        )
    )
    cos = F.col("dot") / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2")))
    return (
        sums.where((F.col("na2") > 0) & (F.col("nb2") > 0))
        .select(
            "la",
            "lb",
            cos.alias("cosine"),
            (F.lit(1.0) - cos).alias("drift"),
        )
        .orderBy("la", "lb")
    )


def _drift_fold_sql(expr: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform("
        f"list_sort(list({{'dim': dim, 't': {expr}}})), x -> x.t)), "
        "(p, c) -> p + c)"
    )


ORACLE["centroid_drift"] = f"""
WITH cents AS (
  SELECT label, dim, CAST(SUM(q) AS DOUBLE) / COUNT(q) / 1000 AS m
  FROM (
    SELECT label,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
    FROM embeddings
  )
  GROUP BY label, dim
), pairs AS (
  SELECT a.label AS la, b.label AS lb, a.dim AS dim, a.m AS ma, b.m AS mb
  FROM cents a JOIN cents b ON a.dim = b.dim AND a.label < b.label
), s AS (
  SELECT la, lb,
         {_drift_fold_sql('ma * mb')} AS dot,
         {_drift_fold_sql('ma * ma')} AS na2,
         {_drift_fold_sql('mb * mb')} AS nb2
  FROM pairs GROUP BY la, lb
)
SELECT la, lb,
       dot / (sqrt(na2) * sqrt(nb2)) AS cosine,
       1.0 - dot / (sqrt(na2) * sqrt(nb2)) AS drift
FROM s
WHERE na2 > 0 AND nb2 > 0
ORDER BY la, lb
"""


# ---------------------------------------------------------------------------
# ANN recall evaluation — the quality gate every approximate index
# needs before it replaces the exact path: for each query, brute-force
# cosine top-K is the ground truth, the banded-LSH candidate set
# (exact-cosine-verified, top-K of the collisions) is the contender,
# and recall@K = |truth ∩ lsh| / K. Run this after retuning bands /
# planes / thresholds; a recall drop means the S-curve moved.
#
# Exactness: both rankings are deterministic (cosines are sequential
# folds, ties break on vec_id), so the intersection count — and the
# one recall division — are exact. Scale: the brute half is the
# documented small-query-set plan (corpus never shuffles, queries
# broadcast); the LSH half shuffles only band signatures; the
# intersection joins two <= K*|queries|-row frames.
# ---------------------------------------------------------------------------
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn(
        "norm", F.sqrt(_dot("embedding", "embedding"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qn"),
    )
    cosine = _dot("embedding", "qv") / (F.col("norm") * F.col("qn"))
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    truth = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id")
        # consumed twice (hit semi-join + per-query totals); without
        # materialization the corpus-wide brute-force scan would run
        # twice. <= K * |queries| rows.
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    banded = lsh_band_signatures(_emb(spark, sf_dir))
    q_banded = banded.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("band_id").alias("q_band_id"),
        F.col("band_val").alias("q_band_val"),
    )
    pair_cos = _dot("embedding", "qv") / (
        F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("qv", "qv"))
    )
    candidates = (
        banded.join(
            F.broadcast(q_banded),
            (F.col("band_id") == F.col("q_band_id"))
            & (F.col("band_val") == F.col("q_band_val")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
        .select("query_id", "vec_id", pair_cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    hits = truth.join(
        candidates,
        (truth.query_id == candidates.query_id)
        & (truth.vec_id == candidates.cand_id),
        "left_semi",
    )
    per_q = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    n_truth = truth.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_truth")
    )
    return (
        n_truth.join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.col("n_truth").cast("bigint").alias("n_truth"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_truth").cast("double")
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


ORACLE["ann_recall_eval"] = f"""
WITH queries AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT query_id, vec_id,
         {_dot_sql('embedding', 'qv')} /
         (sqrt({_dot_sql('embedding', 'embedding')}) *
          sqrt({_dot_sql('qv', 'qv')})) AS cosine
  FROM embeddings, queries
  WHERE vec_id <> query_id
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
  ) WHERE rank <= {TOP_K}
),
banded AS (
  SELECT vec_id, embedding,
         unnest([0, 1, 2, 3]) AS band_id,
         unnest([{_band_val_sql(0)},
                 {_band_val_sql(1)},
                 {_band_val_sql(2)},
                 {_band_val_sql(3)}]) AS band_val
  FROM embeddings
), qb AS (
  SELECT vec_id AS query_id, embedding AS qv,
         band_id AS q_band_id, band_val AS q_band_val
  FROM banded WHERE vec_id < 5
), cand_pairs AS (
  SELECT DISTINCT b.vec_id AS vec_id, q.query_id AS query_id,
                  b.embedding AS embedding, q.qv AS qv
  FROM banded b
  JOIN qb q ON b.band_id = q.q_band_id AND b.band_val = q.q_band_val
  WHERE b.vec_id <> q.query_id
), cand_scored AS (
  SELECT query_id, vec_id,
         {_dot_sql('embedding', 'qv')} /
         (sqrt({_dot_sql('embedding', 'embedding')}) *
          sqrt({_dot_sql('qv', 'qv')})) AS cosine
  FROM cand_pairs
), candidates AS (
  SELECT query_id, vec_id AS cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, vec_id) AS rank
    FROM cand_scored
  ) WHERE rank <= {TOP_K}
),
per_q AS (
  SELECT t.query_id, COUNT(*) AS n_hit
  FROM truth t
  JOIN candidates c ON c.query_id = t.query_id AND c.cand_id = t.vec_id
  GROUP BY t.query_id
),
n_truth AS (
  SELECT query_id, COUNT(*) AS n_truth FROM truth GROUP BY query_id
)
SELECT n_truth.query_id, CAST(n_truth AS BIGINT) AS n_truth,
       CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(n_hit, 0) AS DOUBLE)
         / CAST(n_truth AS DOUBLE) AS recall_at_k
FROM n_truth LEFT JOIN per_q ON per_q.query_id = n_truth.query_id
ORDER BY n_truth.query_id
"""
