"""Distributed PCA (operators/linalg.py): the moment sketch must match
direct numpy on the same data, the variance-accounting identity must
hold exactly at full rank, and the gate must be able to FAIL — a
corrupted (non-orthonormal / truncated) basis or a wrong mean has to
flip its booleans."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from simplemapreduceframework_spark.operators import linalg
from simplemapreduceframework_spark.operators.linalg import (
    embedding_moments,
    embedding_pca_gate,
    make_residual_udf,
    pca_components,
)
from simplemapreduceframework_spark.sources import load_table


def _vectors(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(F.col("embedding").alias("e"))
    )


def test_moment_sketch_matches_direct_numpy(spark, sf_dir):
    emb = _vectors(spark, sf_dir)
    n, mean, cov = embedding_moments(emb)
    V = np.vstack(
        [r["e"] for r in emb.collect()]
    ).astype(np.float64)
    assert n == V.shape[0]
    np.testing.assert_allclose(mean, V.mean(axis=0), rtol=0, atol=1e-10)
    direct = (V - V.mean(axis=0)).T @ (V - V.mean(axis=0)) / n
    np.testing.assert_allclose(cov, direct, rtol=0, atol=1e-9)


def test_full_rank_reconstruction_is_exact(spark, sf_dir):
    """r = d keeps every direction: the distributed SSE must be ~0 and
    the identity's right side is exactly zero."""
    emb = _vectors(spark, sf_dir)
    n, mean, cov = embedding_moments(emb)
    w, Q = pca_components(cov, cov.shape[0])
    sse = (
        emb.select(make_residual_udf(mean, Q)(F.col("e")).alias("r2"))
        .agg(F.sum("r2").alias("s"))
        .collect()[0]["s"]
    )
    assert sse == pytest.approx(0.0, abs=1e-6 * n)


def test_eigh_basis_is_sign_pinned_and_sorted(spark, sf_dir):
    emb = _vectors(spark, sf_dir)
    _, _, cov = embedding_moments(emb)
    w, Q = pca_components(cov, 8)
    assert np.all(np.diff(w) <= 1e-12)  # descending
    for j in range(Q.shape[1]):
        i = np.argmax(np.abs(Q[:, j]))
        assert Q[i, j] > 0  # largest-magnitude entry pinned positive
    np.testing.assert_allclose(Q.T @ Q, np.eye(8), atol=1e-12)


def test_gate_passes_on_real_data(spark, sf_dir):
    row = embedding_pca_gate(spark, sf_dir).collect()[0]
    assert row["orthonormal_ok"] and row["variance_ok"] and row["spectrum_ok"]
    assert row["n_vectors"] > 0 and row["rank_r"] == 8


def test_gate_fails_on_corrupted_basis(spark, sf_dir, monkeypatch):
    """Scale one component by 1.1 (non-orthonormal, wrong projection):
    orthonormal_ok and variance_ok must BOTH flip — proof the gate's
    booleans are computed from the real distributed math, not
    constants mirroring the oracle."""
    real = pca_components

    def corrupt(cov, r):
        w, Q = real(cov, r)
        Q = Q.copy()
        Q[:, 0] *= 1.1
        return w, Q

    monkeypatch.setattr(linalg, "pca_components", corrupt)
    row = embedding_pca_gate(spark, sf_dir).collect()[0]
    assert not row["orthonormal_ok"]
    assert not row["variance_ok"]


def test_gate_fails_on_wrong_mean(spark, sf_dir, monkeypatch):
    """An uncentered projection (mean zeroed) breaks the variance
    identity while the basis stays orthonormal — the two booleans are
    independent detectors."""
    real = embedding_moments

    def uncentered(emb):
        n, mean, cov = real(emb)
        return n, np.zeros_like(mean), cov

    monkeypatch.setattr(linalg, "embedding_moments", uncentered)
    row = embedding_pca_gate(spark, sf_dir).collect()[0]
    assert row["orthonormal_ok"]
    assert not row["variance_ok"]


def test_gate_vacuous_pass_on_empty_corpus(spark, tmp_path):
    import os

    from simplemapreduceframework_spark.sources import TABLES

    empty = str(tmp_path / "sf_empty_pca")
    os.makedirs(empty, exist_ok=True)
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.parquet(
            f"{empty}/{t}.parquet"
        )
    rows = embedding_pca_gate(spark, empty).collect()
    assert len(rows) == 1 and rows[0]["n_vectors"] == 0
