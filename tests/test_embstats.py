"""Distributed covariance / PCA / projection (operators/embstats.py)
vs dense NumPy on the collected vectors — including partial-batch
merging, NULL/ragged-vector hygiene, and the deterministic eigenvector
sign convention the oracle replay relies on."""

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.embstats import (
    covariance_matrix, pca, project)

_DIM = 12


def _mk(spark, n=300, seed=5, n_parts=7):
    rng = np.random.default_rng(seed)
    # anisotropic cloud so PCA has a meaningful spectrum
    w = rng.normal(size=(_DIM, _DIM))
    x = rng.normal(size=(n, 3)) @ w[:3] + 0.05 * rng.normal(
        size=(n, _DIM))
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>").repartition(n_parts)
    return df, x


def test_covariance_matches_numpy(spark):
    df, x = _mk(spark)
    got = np.zeros((_DIM, _DIM))
    for r in covariance_matrix(df, "embedding", _DIM).collect():
        got[r["i"], r["j"]] = got[r["j"], r["i"]] = r["cov"]
    want = np.cov(x, rowvar=False, bias=True)
    assert np.allclose(got, want, atol=1e-10)


def test_covariance_skips_null_and_ragged(spark):
    df, x = _mk(spark, n=50)
    extra = spark.createDataFrame(
        [(1000, None), (1001, [1.0, 2.0])],
        "vec_id long, embedding array<double>")
    got = {(r["i"], r["j"]): r["cov"] for r in covariance_matrix(
        df.unionByName(extra), "embedding", _DIM).collect()}
    want = np.cov(x, rowvar=False, bias=True)
    assert len(got) == _DIM * (_DIM + 1) // 2
    for (i, j), v in got.items():
        assert abs(v - want[i, j]) < 1e-10


def test_pca_spectrum_and_projection(spark):
    df, x = _mk(spark)
    w, vals = pca(df, "embedding", _DIM, 4)
    # variances descend and match the dense eigendecomposition
    want_vals = np.sort(np.linalg.eigvalsh(
        np.cov(x, rowvar=False, bias=True)))[::-1][:4]
    assert np.all(np.diff(vals) <= 1e-12)
    assert np.allclose(vals, want_vals, atol=1e-9)
    # loadings orthonormal, sign convention pinned
    assert np.allclose(w.T @ w, np.eye(4), atol=1e-9)
    for k in range(4):
        assert w[np.argmax(np.abs(w[:, k])), k] > 0
    # JVM projection == NumPy matmul
    out = (project(df, "embedding", w)
           .orderBy("vec_id")
           .select("pc0", "pc1", "pc2", "pc3").toPandas().values)
    assert np.allclose(out, x @ w, atol=1e-8)
    # projected variance == eigenvalue (population convention)
    assert np.allclose(np.var(out, axis=0), vals, atol=1e-8)


def test_pca_sign_deterministic_across_runs(spark):
    df, _ = _mk(spark, seed=9)
    w1, _ = pca(df, "embedding", _DIM, 3)
    w2, _ = pca(df.repartition(3), "embedding", _DIM, 3)
    assert np.allclose(w1, w2, atol=1e-9)


def test_bad_args_raise(spark):
    df, _ = _mk(spark, n=10)
    with pytest.raises(ValueError, match="dim"):
        covariance_matrix(df, "embedding", 0)
    with pytest.raises(ValueError, match="n_components"):
        pca(df, "embedding", _DIM, _DIM + 1)
