"""Distributed k-means over the embeddings table — the iterative
sibling of the one-shot centroid/IVF primitives in similarity.py.

Classic Lloyd's algorithm in Spark's model-parallel form (the same
shape as MLlib KMeans): centroids are MODEL state (k x d doubles —
kilobytes), so each round broadcasts them into a map-side
assignment expression and reduces new centroids with ONE
map-side-combinable shuffle of (cluster, dim, partial sums). The
corpus is never collected and never shuffled by vector payload; per
round the shuffle carries k*d*partitions longs, independent of row
count — the property that makes the loop viable at 100 TB.

Determinism: distances are sequential double folds (same IEEE op
order everywhere), ties break to the lowest cluster id via struct
ordering, and centroid updates accumulate FIXED-POINT milli-units
(see similarity.q_embedding_centroids for why float/decimal sums are
not layout- or engine-invariant). The whole fit is therefore a pure
function of the data: re-running on 1 or 1000 partitions yields
bit-identical centroids (pinned in tests/test_clustering.py). Most
k-means implementations cannot promise this; a training-data
pipeline that wants reproducible cluster assignments needs it.

Init is the first k vectors by vec_id — deterministic; k-means++
would need a sequential sampling pass and buys little on
well-separated corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ORACLE: dict[str, str] = {}

K = 8
MAX_ITER = 10


def _sqdist(vec_col: str, centroid: list[float]) -> F.Column:
    """Sequential-fold double squared distance to a literal centroid."""
    lit = "array(" + ", ".join(f"CAST({c!r} AS DOUBLE)" for c in centroid) + ")"
    return F.expr(
        f"aggregate(zip_with({vec_col}, {lit}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


# The literal-expression path codegens one distance fold PER centroid
# (k copies of the zip_with/aggregate body), which is fast while the
# generated method stays small but grows the compiled class linearly
# in k*d — beyond ~64 centroids it risks the JIT's 8 KB inlining
# cliff and, eventually, the 64 KB JVM method limit. Past this
# threshold assignment switches to a single array-of-arrays literal
# with ONE transform-lambda fold: codegen size O(1) in k, same
# double-fold arithmetic, same lowest-id tie-break, so the two paths
# are bit-identical (pinned by test_kmeans_assign_paths_agree).
LITERAL_K_MAX = 16


def assign_clusters(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Adds ``cluster``: argmin squared distance (ties -> lowest id).
    Pure projection — centroids are literals, nothing shuffles."""
    if len(centroids) > LITERAL_K_MAX:
        return _assign_clusters_array(emb, centroids)
    return _assign_clusters_literal(emb, centroids)


def _assign_clusters_literal(
    emb: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    choices = F.array(
        *[
            F.struct(
                _sqdist("embedding", c).alias("d"), F.lit(i).alias("cid")
            )
            for i, c in enumerate(centroids)
        ]
    )
    return emb.withColumn("cluster", F.array_min(choices)["cid"])


def _assign_clusters_array(
    emb: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """Large-k assignment: centroids as one array<array<double>>
    literal, distances via a single transform lambda (codegen does
    not grow with k)."""
    cents = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )

    def dist_to(c: F.Column, i: F.Column) -> F.Column:
        d = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.struct(d.alias("d"), i.cast("int").alias("cid"))

    choices = F.transform(cents, dist_to)
    return emb.withColumn("cluster", F.array_min(choices)["cid"])


def update_centroids(
    assigned: DataFrame, k: int, dim: int, quant: int = 1000
) -> list[list[float]]:
    """New centroids as fixed-point dimension means; one combinable
    shuffle of (cluster, dim) partial integer sums. Empty clusters
    keep a zero vector (they stay empty — acceptable for dedup-style
    corpora; reseeding would break determinism)."""
    sums = (
        assigned.select(
            "cluster", F.posexplode("embedding").alias("d", "v")
        )
        .groupBy("cluster", "d")
        .agg(
            F.sum(F.floor(F.col("v").cast("double") * quant)).alias("q"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    out = [[0.0] * dim for _ in range(k)]
    for r in sums:
        out[r.cluster][r.d] = (r.q / r.n) / quant
    return out


def kmeans(
    emb: DataFrame,
    k: int = K,
    max_iter: int = MAX_ITER,
    dim: int = 64,
    persist: bool = True,
) -> tuple[DataFrame, list[list[float]], int]:
    """(assigned_df, centroids, iterations_run). Stops when the
    (exact, fixed-point) centroids repeat — a true fixpoint, not a
    float-tolerance heuristic.

    By default the input is persisted for the loop (the standard
    iterative-ML input cache — MLlib does the same): every
    iteration's assign + centroid update re-reads it, and so does the
    seed collect. The cached blocks outlive the call — the returned
    assigned_df depends on them — so callers follow the
    clearCache-between-queries discipline (bench.py / oracle_compare
    do). Library embedders in a long-lived session that cannot adopt
    that discipline should pass ``persist=False``: each iteration
    then recomputes the input lineage, trading iteration time for
    zero retained storage."""
    if persist:
        emb = emb.persist()
    first = emb.orderBy("vec_id").limit(k).select("embedding").collect()
    centroids = [[float(x) for x in r.embedding] for r in first]
    if not centroids:
        # empty partition (routine in a daily-partitioned lake):
        # nothing to seed from — return the zero-row assignment with
        # the same schema instead of building array_min(array()).
        return emb.withColumn("cluster", F.lit(0).cast("int")), [], 0
    for it in range(1, max_iter + 1):
        assigned = assign_clusters(emb, centroids)
        new = update_centroids(assigned, k, dim)
        if new == centroids:
            return assigned, centroids, it
        centroids = new
    return assign_clusters(emb, centroids), centroids, max_iter


def cluster_sizes(assigned: DataFrame) -> DataFrame:
    """Per-cluster membership counts of a fitted assignment."""
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster")
    )


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant audit of the converged k-means fit. The fit itself is
    iterative/model-carrying — no SQL engine can replay it — so the
    oracle checks its CONTRACT (the approx_distinct treatment). Live
    assertions (computed from the actual assignment, can fail if the
    fit breaks): n_points — every point assigned exactly once,
    matches the engine-independent table count; clusters_used_within_k
    — the number of DISTINCT cluster labels produced never exceeds K;
    ids_in_range — min/max of the produced labels within [0, K).
    NOT live (constants restating code structure, kept for schema
    self-description): k, iters_within_budget (kmeans() returns at
    most max_iter by construction). The data-dependent details
    (per-cluster sizes, bit-exact determinism across partition
    layouts, fixpoint convergence) are pinned by
    tests/test_clustering.py property tests."""
    from ..sources.readers import read_fixture

    emb = read_fixture(spark, sf_dir, "embeddings")
    assigned, _, iters = kmeans(emb)
    return cluster_sizes(assigned).agg(
        F.sum("n_members").cast("bigint").alias("n_points"),
        F.lit(K).cast("int").alias("k"),
        (F.count(F.lit(1)) <= K).alias("clusters_used_within_k"),
        ((F.min("cluster") >= 0) & (F.max("cluster") < K)).alias("ids_in_range"),
        F.lit(iters <= MAX_ITER).alias("iters_within_budget"),
    )


ORACLE["kmeans_clusters"] = """
SELECT CAST(count(*) AS BIGINT) AS n_points,
       CAST(8 AS INT) AS k,
       TRUE AS clusters_used_within_k,
       TRUE AS ids_in_range,
       TRUE AS iters_within_budget
FROM embeddings
"""
