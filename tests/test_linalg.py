"""PCA pipeline guarantees (the parity suite covers the oracled
covariance query; this pins the driver-side eigensolve composition)."""

from __future__ import annotations

import numpy as np
import pytest

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators import (
    linalg as L,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
    read_fixture,
)


@pytest.fixture(scope="module")
def pca(spark, sf_dir):
    proj, eigvals = L.pca_embeddings(spark, sf_dir, k=4)
    pc = np.array([r.pc for r in proj.orderBy("vec_id").collect()])
    return pc, eigvals


def test_projected_variance_matches_eigenvalues(pca):
    """Variance along each principal component equals its eigenvalue —
    the end-to-end check that covariance pass, eigensolve, centering
    and projection all compose correctly."""
    pc, eigvals = pca
    var = pc.var(axis=0)
    assert np.allclose(var, eigvals, rtol=1e-6)


def test_eigenvalues_descending_and_nonnegative(pca):
    _, eigvals = pca
    assert all(eigvals[i] >= eigvals[i + 1] for i in range(len(eigvals) - 1))
    assert all(v >= 0 for v in eigvals)


def test_components_decorrelated(pca):
    """Projected dimensions are uncorrelated (off-diagonal covariance
    ~0) — the defining property of the PCA basis."""
    pc, _ = pca
    cov = np.cov(pc, rowvar=False, bias=True)
    off = cov - np.diag(np.diag(cov))
    assert np.max(np.abs(off)) < 1e-8


def test_covariance_matrix_symmetric_psd(spark, sf_dir):
    emb = read_fixture(spark, sf_dir, "embeddings")
    cov, n = L.covariance_matrix(emb, dims=16)
    assert n > 0
    assert np.allclose(cov, cov.T)
    assert np.all(np.linalg.eigvalsh(cov) > -1e-12)
