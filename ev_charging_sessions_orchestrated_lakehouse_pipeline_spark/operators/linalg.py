"""Distributed linear algebra over the embedding corpus: the one-pass
Gram/covariance pattern, and PCA built on top of it.

The scalable shape for second-moment statistics over n x d data
(n = corpus rows, d = 64 here) is: emit (i, j, x_i*x_j) per row for
the upper triangle, ONE map-side-combinable groupBy over d*(d+1)/2
keys. The shuffle carries O(d^2 * partitions) partials — independent
of n — and the result is a d x d matrix measured in kilobytes. This
is how covariance/Gram matrices are computed at any corpus size; the
eigendecomposition of that kilobyte-sized matrix is driver-side math
(numpy), after which the projection back onto the corpus is a pure
map-side expression with the eigenvectors as literals (the same
broadcast-model shape as operators/clustering.py k-means).

``q_embedding_covariance`` surfaces the distributed pass for the
first COV_DIMS dimensions, fully DuckDB-oracled: per-row products are
plain IEEE doubles, cross-row sums ride DECIMAL(25,10)
(functions/oracle.py) so every covariance entry is bit-identical at
any partition count and engine. ``pca_embeddings`` is the library
composition (full-d covariance -> eigh -> literal-matrix projection);
its guarantees are pinned by tests/test_linalg.py rather than a SQL
oracle (eigensolves are not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.oracle import dsum, dsum_sql

ORACLE: dict[str, str] = {}

#: dimensions surfaced by the oracled covariance query (upper
#: triangle of the leading COV_DIMS x COV_DIMS block).
COV_DIMS = 8
EMB_DIM = 64


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, name)


def second_moments(emb: DataFrame, dims: int) -> DataFrame:
    """Upper-triangle product sums ``(i, j, sxy)`` plus per-dimension
    sums/counts ``(i, sx, n)`` for the leading ``dims`` block, in two
    bounded-key aggregations (d^2/2 and d group keys)."""
    head = F.expr(f"slice(embedding, 1, {dims})")
    # 1-based (i, j) to match SQL generate_subscripts convention
    prods = emb.select(
        F.explode(
            F.expr(
                f"flatten(transform(slice(embedding, 1, {dims}), (x, i) -> "
                f"transform(slice(embedding, i + 1, {dims} - i), (y, j) -> "
                "struct(i + 1 AS i, i + j + 1 AS j, "
                "CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS p))))"
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    sxy = prods.groupBy("i", "j").agg(dsum("p").alias("sxy"))
    sums = (
        emb.select(F.posexplode(head).alias("i0", "x"))
        .select((F.col("i0") + 1).alias("i"), "x")
        .groupBy("i")
        .agg(
            dsum(F.col("x").cast("double")).alias("sx"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return sxy, sums


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance entries cov(i, j) = (sxy - sx*sy/n)/n for the
    leading COV_DIMS block — the oracled distributed pass."""
    emb = _t(spark, sf_dir, "embeddings")
    sxy, sums = second_moments(emb, COV_DIMS)
    si = sums.select(
        F.col("i"), F.col("sx").alias("sx_i"), F.col("n")
    )
    sj = sums.select(F.col("i").alias("j"), F.col("sx").alias("sx_j"))
    return (
        sxy.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            (
                (
                    F.col("sxy")
                    - F.col("sx_i") * F.col("sx_j") / F.col("n").cast("double")
                )
                / F.col("n").cast("double")
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


ORACLE["embedding_covariance"] = f"""
WITH el AS (
  SELECT vec_id, i, CAST(x AS DOUBLE) AS x
  FROM (
    SELECT vec_id, UNNEST(embedding) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
  )
  WHERE i <= {COV_DIMS}
),
prods AS (
  SELECT a.i AS i, b.i AS j, a.x * b.x AS p
  FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
),
sxy AS (
  SELECT i, j, {dsum_sql("p")} AS sxy FROM prods GROUP BY i, j
),
sums AS (
  SELECT i, {dsum_sql("x")} AS sx, COUNT(*) AS n FROM el GROUP BY i
)
SELECT CAST(sxy.i AS INT) AS i, CAST(sxy.j AS INT) AS j,
       (sxy - si.sx * sj.sx / CAST(si.n AS DOUBLE)) / CAST(si.n AS DOUBLE)
         AS cov
FROM sxy
JOIN sums si ON si.i = sxy.i
JOIN sums sj ON sj.i = sxy.j
ORDER BY i, j
"""


def covariance_matrix(emb: DataFrame, dims: int = EMB_DIM):
    """Full dims x dims covariance as a numpy array — the driver-side
    endpoint of the distributed pass (d^2 scalars collected, never
    corpus rows)."""
    import numpy as np

    sxy, sums = second_moments(emb, dims)
    s = {r.i: (r.sx, r.n) for r in sums.collect()}
    n = next(iter(s.values()))[1]
    cov = np.zeros((dims, dims))
    for r in sxy.collect():
        i, j = r.i - 1, r.j - 1
        c = (r.sxy - s[r.i][0] * s[r.j][0] / n) / n
        cov[i, j] = cov[j, i] = c
    return cov, n


def pca_embeddings(
    spark: SparkSession, sf_dir: str, k: int = 8
) -> tuple[DataFrame, "object"]:
    """PCA: distributed covariance -> driver eigh -> map-side literal
    projection. Returns (projected DataFrame with ``pc`` array<double>
    column, explained-variance ndarray, descending)."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    sxy, sums = second_moments(emb, EMB_DIM)
    s = {r.i: (r.sx, r.n) for r in sums.collect()}
    n = next(iter(s.values()))[1]
    cov = np.zeros((EMB_DIM, EMB_DIM))
    for r in sxy.collect():
        i, j = r.i - 1, r.j - 1
        c = (r.sxy - s[r.i][0] * s[r.j][0] / n) / n
        cov[i, j] = cov[j, i] = c
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    components = vecs[:, order].T  # k x d
    comp_lit = F.array(
        *[
            F.array(*[F.lit(float(v)) for v in row])
            for row in components
        ]
    )
    means = [s[i + 1][0] / n for i in range(EMB_DIM)]
    mean_lit = F.array(*[F.lit(m) for m in means])
    centered = F.zip_with(
        F.col("embedding").cast("array<double>"), mean_lit, lambda x, m: x - m
    )
    proj = F.transform(
        comp_lit,
        lambda row: F.aggregate(
            F.zip_with(centered, row, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return (
        emb.select("vec_id", proj.alias("pc")),
        vals[order],
    )
