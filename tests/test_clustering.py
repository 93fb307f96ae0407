"""k-means properties: layout-invariant determinism, convergence to
a true fixpoint, and non-increasing inertia across iterations."""

from __future__ import annotations

from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.clustering import (
    assign_clusters,
    kmeans,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
    read_fixture,
)


def _emb(spark, sf_dir):
    return read_fixture(spark, sf_dir, "embeddings")


def test_kmeans_layout_invariant(spark, sf_dir):
    """Bit-identical centroids and assignments at 1 vs 11 partitions
    — the fixed-point accumulation contract."""
    emb = _emb(spark, sf_dir)
    a1, c1, _ = kmeans(emb.coalesce(1), k=4, max_iter=5)
    a2, c2, _ = kmeans(emb.repartition(11), k=4, max_iter=5)
    assert c1 == c2
    m1 = {r.vec_id: r.cluster for r in a1.select("vec_id", "cluster").collect()}
    m2 = {r.vec_id: r.cluster for r in a2.select("vec_id", "cluster").collect()}
    assert m1 == m2


def test_kmeans_converges_to_fixpoint(spark, sf_dir):
    """Once converged, one more assignment round changes nothing."""
    emb = _emb(spark, sf_dir)
    assigned, centroids, iters = kmeans(emb, k=4, max_iter=20)
    assert iters < 20, "did not converge"
    again = assign_clusters(emb, centroids)
    a = {r.vec_id: r.cluster for r in assigned.select("vec_id", "cluster").collect()}
    b = {r.vec_id: r.cluster for r in again.select("vec_id", "cluster").collect()}
    assert a == b


def test_kmeans_inertia_non_increasing(spark, sf_dir):
    """Lloyd's guarantee, checked on the quantized objective."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.clustering import (
        _sqdist,
        update_centroids,
    )

    emb = _emb(spark, sf_dir)
    first = emb.orderBy("vec_id").limit(4).select("embedding").collect()
    centroids = [[float(x) for x in r.embedding] for r in first]
    last = None
    for _ in range(4):
        assigned = assign_clusters(emb, centroids)
        inertia = (
            assigned.select(
                F.array(
                    *[_sqdist("embedding", c).alias(f"d{i}") for i, c in enumerate(centroids)]
                )[F.col("cluster")].alias("d")
            )
            .agg(F.sum("d").alias("s"))
            .collect()[0]
            .s
        )
        if last is not None:
            assert inertia <= last + 1e-9, "inertia increased"
        last = inertia
        centroids = update_centroids(assigned, 4, 64)


def test_kmeans_partitions_all_rows(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    assigned, _, _ = kmeans(emb, k=4, max_iter=5)
    assert assigned.count() == emb.count()
    assert assigned.filter(F.col("cluster").isNull()).count() == 0
    assert assigned.select("cluster").distinct().count() <= 4


def test_kmeans_assign_paths_agree_k32(spark, sf_dir):
    """k=32 exercises the large-k array-literal assignment path; it
    must be bit-identical to the per-centroid literal codegen path
    (same double fold, same lowest-id tie-break)."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.clustering import (
        LITERAL_K_MAX,
        _assign_clusters_array,
        _assign_clusters_literal,
    )

    emb = _emb(spark, sf_dir)
    seeds = emb.orderBy("vec_id").limit(32).select("embedding").collect()
    centroids = [[float(x) for x in r.embedding] for r in seeds]
    assert len(centroids) == 32 > LITERAL_K_MAX

    lit_map = {
        r.vec_id: r.cluster
        for r in _assign_clusters_literal(emb, centroids)
        .select("vec_id", "cluster")
        .collect()
    }
    arr_map = {
        r.vec_id: r.cluster
        for r in _assign_clusters_array(emb, centroids)
        .select("vec_id", "cluster")
        .collect()
    }
    assert lit_map == arr_map
    assert set(arr_map.values()) <= set(range(32))

    # and the public entry point routes k=32 through the array path
    assigned, _, _ = kmeans(emb, k=32, max_iter=2)
    assert assigned.filter(F.col("cluster").isNull()).count() == 0


def test_kmeans_persist_false_same_result_no_retained_cache(spark, sf_dir):
    """The persist=False escape hatch (for library embedders that
    can't run clearCache between calls) must produce bit-identical
    results and leave nothing in the catalog cache."""
    emb = _emb(spark, sf_dir)
    spark.catalog.clearCache()
    # localCheckpoint blocks from other tests may exist in the shared
    # session; the contract is that THIS call adds no storage.
    jsc = spark.sparkContext._jsc.sc()
    before = len(jsc.getRDDStorageInfo())
    a0, c0, i0 = kmeans(emb, k=4, max_iter=3, persist=False)
    rows0 = sorted((r.vec_id, r.cluster) for r in a0.select("vec_id", "cluster").collect())
    assert len(jsc.getRDDStorageInfo()) == before
    a1, c1, i1 = kmeans(emb, k=4, max_iter=3)  # default persisted path
    rows1 = sorted((r.vec_id, r.cluster) for r in a1.select("vec_id", "cluster").collect())
    spark.catalog.clearCache()
    assert c0 == c1 and i0 == i1 and rows0 == rows1
