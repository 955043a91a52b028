"""Distributed linear algebra over the embedding column: one-pass
moment sketches (mean + covariance), PCA via driver-side
eigendecomposition of the tiny covariance, and a driver-checkable
variance-accounting gate.

The pattern is the standard big-data PCA split (the same shape Spark
MLlib's RowMatrix.computePrincipalComponents uses): the DATA never
leaves the cluster — executors reduce (count, Σx, Σxxᵀ) partial sums,
only the (d + d²)-sized sketch reaches the driver, the d×d eigensolve
is a trivial local numpy call, and the resulting components broadcast
back for distributed projection. For d=64 the sketch is ~33 KB
regardless of whether the table is 500 rows or 100 TB.

Correctness is gated by an exact identity, not a heuristic: with the
covariance normalized by n, the total squared reconstruction error of
rank-r PCA equals n * (sum of the discarded eigenvalues). The gate
recomputes the left side DISTRIBUTED (Arrow-batched residual norms,
one aggregate) and the right side from the eigensolve, and asserts
they close to 1e-6 relative — a wrong mean, a non-orthonormal basis,
a transposed projection, or a dropped component all break the
identity by orders of magnitude more than partition-order float
noise (~1e-12).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..registry import query
from ..sources import load_table

_PCA_RANK = 8
_REL_TOL = 1e-6


def embedding_moments(emb: DataFrame) -> tuple[int, np.ndarray, np.ndarray]:
    """One-pass distributed (n, mean, covariance) over a vector column
    ``e``. Executors emit one partial-sum row PER PARTITION (count,
    Σx, flattened Σxxᵀ); the driver combines the bounded sketch set
    (numPartitions rows of d² + d + 1 doubles) and normalizes.
    Covariance uses the n (population) convention so the PCA identity
    ``SSE == n * tail-eigenvalue mass`` is exact."""

    def partial(batches):
        cnt = 0
        s = None
        ss = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            cnt += V.shape[0]
            s = V.sum(axis=0) if s is None else s + V.sum(axis=0)
            g = V.T @ V
            ss = g if ss is None else ss + g
        if cnt:
            yield pd.DataFrame(
                {
                    "cnt": [cnt],
                    "s": [s.tolist()],
                    "ss": [ss.reshape(-1).tolist()],
                }
            )

    parts = emb.select("e").mapInPandas(
        partial, "cnt long, s array<double>, ss array<double>"
    ).collect()
    if not parts:
        return 0, np.zeros(0), np.zeros((0, 0))
    n = sum(r["cnt"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    d = s.shape[0]
    ss = np.sum([np.asarray(r["ss"]) for r in parts], axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_components(cov: np.ndarray, r: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-r eigenpairs of the (symmetric PSD) covariance, eigenvalues
    descending. Deterministic: ``eigh`` on the same matrix always
    returns the same factorization, and sign is pinned by making each
    component's largest-magnitude entry positive (eigenvectors are
    only defined up to sign)."""
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:r]
    w, v = w[order], v[:, order]
    for j in range(v.shape[1]):
        i = np.argmax(np.abs(v[:, j]))
        if v[i, j] < 0:
            v[:, j] = -v[:, j]
    return w, v


def make_residual_udf(mean: np.ndarray, Q: np.ndarray):
    """Arrow-batched squared reconstruction error for rank-|Q| PCA:
    ||(x-μ) - QQᵀ(x-μ)||² per row (Q broadcast via closure, d×r)."""
    mu = mean.copy()
    Qm = Q.copy()

    @pandas_udf(DoubleType())
    def residual(e: pd.Series) -> pd.Series:
        if len(e) == 0:
            return pd.Series([], dtype="float64")
        V = np.vstack(e.to_numpy()).astype(np.float64) - mu
        proj = (V @ Qm) @ Qm.T
        return pd.Series(((V - proj) ** 2).sum(axis=1))

    return residual


@query(
    "embedding_pca_gate",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST({_PCA_RANK} AS INTEGER) AS rank_r,
       TRUE AS orthonormal_ok,
       TRUE AS variance_ok,
       TRUE AS spectrum_ok
FROM embeddings WHERE embedding IS NOT NULL
""",
)
def embedding_pca_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible gate for distributed PCA (same constant-true
    pattern as ann_ivf_recall_gate): emits the vector count plus three
    booleans computed from REAL distributed math, so any break in the
    moment sketch, eigensolve, or projection flips a boolean and fails
    the driver hash.

    - orthonormal_ok: ||QᵀQ - I||_inf < 1e-9 (driver-side, exact
      property of the eigh basis);
    - variance_ok: the distributed rank-r reconstruction SSE equals
      n * (trace(cov) - Σ top-r eigenvalues) to 1e-6 relative — the
      exact PCA identity; a wrong mean or transposed Q is off by
      orders of magnitude;
    - spectrum_ok: eigenvalues are non-negative (PSD covariance) and
      non-increasing, and explained-variance ratio lies in [0, 1].

    Plan: one mapInPandas pass reduces the (d+d²) moment sketch (one
    row per partition reaches the driver — bounded collect), the 64×64
    eigensolve is local, and the verification pass is one more scan +
    one aggregate with the (64×8) basis broadcast in the UDF closure.
    A monkeypatched non-orthonormal basis in tests proves the gate can
    fail."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select(F.col("embedding").alias("e"))
    n, mean, cov = embedding_moments(emb)
    if n == 0:
        # vacuous pass, aligned with the oracle's COUNT(*)=0 row
        return spark.createDataFrame(
            [(0, _PCA_RANK, True, True, True)],
            "n_vectors long, rank_r int, orthonormal_ok boolean, "
            "variance_ok boolean, spectrum_ok boolean",
        )
    w, Q = pca_components(cov, _PCA_RANK)
    ortho = bool(
        np.max(np.abs(Q.T @ Q - np.eye(Q.shape[1]))) < 1e-9
    )
    evr = float(w.sum() / np.trace(cov))
    spectrum = bool(
        np.all(w >= -1e-12)
        and np.all(np.diff(w) <= 1e-12)
        and 0.0 <= evr <= 1.0 + 1e-12
    )
    sse_row = (
        emb.select(make_residual_udf(mean, Q)(F.col("e")).alias("r2"))
        .agg(F.sum("r2").alias("sse"))
        .collect()[0]
    )
    expected = float(n * (np.trace(cov) - w.sum()))
    got = float(sse_row["sse"])
    variance = bool(
        abs(got - expected) <= _REL_TOL * max(abs(expected), 1.0)
    )
    return spark.createDataFrame(
        [(n, _PCA_RANK, ortho, variance, spectrum)],
        "n_vectors long, rank_r int, orthonormal_ok boolean, "
        "variance_ok boolean, spectrum_ok boolean",
    )


from .._serde import pickle_by_value as _pbv  # noqa: E402

_pbv(__name__)
