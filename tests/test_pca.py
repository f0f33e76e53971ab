"""PCA model properties: the covariance path is oracle-checked
(embedding_covariance); the eigendecomposition artifact is pinned here."""

from __future__ import annotations

import numpy as np

from columnflow_spark.queries import all_queries
from columnflow_spark.queries.mmdata import pca_components


def test_components_orthonormal(spark, sf_dir):
    _, comps = pca_components(spark, sf_dir)
    gram = comps.T @ comps
    assert np.allclose(gram, np.eye(comps.shape[1]), atol=1e-9)


def test_eigenvalues_descending_and_positive(spark, sf_dir):
    vals, _ = pca_components(spark, sf_dir)
    assert all(vals[i] >= vals[i + 1] for i in range(len(vals) - 1))
    assert vals[0] > 0


def test_projected_variance_matches_eigenvalues(spark, sf_dir):
    vals, _ = pca_components(spark, sf_dir)
    out = all_queries()["embedding_pca_project"](spark, sf_dir).collect()
    proj = np.array([[r.pc1, r.pc2, r.pc3, r.pc4] for r in out])
    var = proj.var(axis=0)  # population variance, matching the covariance
    # grid quantization (1e-3) perturbs the axes slightly; 1% is generous
    assert np.allclose(var, vals, rtol=0.01)


def test_projection_deterministic_sign(spark, sf_dir):
    # the sign fix must make the largest-|.| entry of each axis positive
    _, comps = pca_components(spark, sf_dir)
    for k in range(comps.shape[1]):
        assert comps[np.argmax(np.abs(comps[:, k])), k] > 0
