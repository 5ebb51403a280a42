"""Sparse projector recovery via refit (reference sPCAvsPCA.ipynb workload).

An 8-dimensional dataset whose target depends on 3 *sparse* linear
combinations.  A single EDR fit caches the predictive gradients; sweeping
``SparsePCA(alpha)`` against the cached gradients (no GP re-fit — the
cached-gradient design of SURVEY.md §3.4) recovers a sparse projector that
plain SVD cannot, measured by subspace discrepancy against the truth.

Run: ``python examples/sparse_recovery.py``
"""

import numpy as np
import scipy.sparse
from scipy.linalg import inv, sqrtm
from sklearn.decomposition import SparsePCA

from edrgp_tpu import (EffectiveDimensionalityReduction, SVDTransformer,
                       discrepancy)
from edrgp_tpu.models import GaussianProcessRegressor


def make_data(sample_size=500, noise_std=0.03, density=0.2, seed=7):
    rng = np.random.default_rng(seed)
    U = rng.random((8, 8))
    U = U @ inv(sqrtm(U.T @ U))          # orthonormalize
    S = np.diag([2, 1.7, 1.4, 1.1, 0.9, 0.7, 0.4, 0.1])
    cov = U @ S @ U.T
    X = rng.multivariate_normal(np.zeros(8), cov, sample_size)
    X -= X.mean(0)
    for state in range(seed, seed + 100):
        B = scipy.sparse.rand(8, 3, density=density,
                              random_state=state).toarray()
        if np.all((np.abs(B) > 0).sum(axis=0) >= 1):
            break  # every combination must involve at least one feature
    y = np.tanh(X @ B).sum(axis=1) + noise_std * rng.standard_normal(sample_size)
    return X, y, B


def main():
    X, y, B_true = make_data()
    B_norm = B_true / np.sqrt((B_true ** 2).sum(axis=0))

    edr = EffectiveDimensionalityReduction(
        GaussianProcessRegressor(["RBF"], [{"ARD": True}]),
        SVDTransformer(), n_components=3)
    edr.fit(X, y)
    d_svd = discrepancy(B_norm, edr.components_.T)
    print(f"SVD projector discrepancy:      {d_svd:.4f}")

    best = (np.inf, None)
    for alpha in np.logspace(-3, 0, 15):
        edr.refit(SparsePCA(n_components=3, alpha=alpha, random_state=0))
        if edr.refit_components_.shape[0] < 3:
            continue  # alpha too aggressive: components zeroed out
        d = discrepancy(B_norm, edr.refit_components_.T)
        if d < best[0]:
            best = (d, alpha)
    d_sparse, alpha = best
    print(f"SparsePCA refit discrepancy:    {d_sparse:.4f} (alpha={alpha:.4f})")

    nnz_true = int((np.abs(B_true) > 0).sum())
    edr.refit(SparsePCA(n_components=3, alpha=alpha, random_state=0))
    nnz_found = int((np.abs(edr.refit_components_) > 1e-6).sum())
    print(f"nonzeros: true projector {nnz_true}, sparse refit {nnz_found}, "
          f"dense would be {B_true.size}")


if __name__ == "__main__":
    main()
