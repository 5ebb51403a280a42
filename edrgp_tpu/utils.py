"""Projector-quality linear algebra and the SVD transformer.

Capability-parity rewrite of ``/root/reference/edrgp/utils.py`` (C6 in
SURVEY.md §2.1) with the reference's latent bugs fixed (SURVEY.md §7):

* ``subspace_variance_ratio``: the non-orthonormal branch now returns
  per-component values (reference ``utils.py:48-52`` collapsed to a scalar);
* ``SVDTransformer`` with float ``n_components`` works (reference
  ``utils.py:149`` referenced an undefined name).

These operate on small [Q, Q]-scale matrices; the SVD of the [N, Q] gradient
matrix is the one data-sized op and runs through XLA.
"""

from __future__ import annotations

import numpy as np
from sklearn.base import BaseEstimator, TransformerMixin
from sklearn.utils import check_array

__all__ = ["ort_space", "subspace_variance_ratio", "discrepancy",
           "SVDTransformer"]


def ort_space(A: np.ndarray) -> np.ndarray:
    """Orthonormal basis of the orthogonal complement of span(A).

    Parameters
    ----------
    A : array, shape (n_features, n_components)

    Returns
    -------
    array, shape (n_features, n_features - rank(A)) — columns spanning the
    orthogonal complement.
    """
    A = np.asarray(A)
    U, s, _ = np.linalg.svd(A, full_matrices=True)
    rank = int(np.sum(np.abs(s) > 1e-10))
    return U[:, rank:]


def subspace_variance_ratio(X: np.ndarray, V: np.ndarray):
    """Energy of X captured along each column of the projector V.

    For orthonormal V this is ‖X v_i‖ per column; a non-orthonormal V is
    QR-orthonormalized first (and still reports per-component values).

    Returns
    -------
    subspace_variance_ : array (n_components,) — per-component ‖X v_i‖.
    subspace_variance_ratio_ : array (n_components,) — (‖X v_i‖/‖X‖)².
    """
    X = np.asarray(X)
    V = np.asarray(V)
    gram = V.T @ V
    if not np.allclose(gram, np.eye(V.shape[1])):
        V = np.linalg.qr(V)[0]
    sv = np.linalg.norm(X @ V, axis=0)
    ratio = (sv / np.linalg.norm(X)) ** 2
    return sv, ratio


def discrepancy(B: np.ndarray, V: np.ndarray) -> float:
    """Subspace mismatch ‖B Bᵀ (I − V Vᵀ)‖_F / d (reference ``utils.py:58``).

    B : (n_features, d) true projector; V : (n_features, k) estimate.
    Zero iff span(B) ⊆ span(V).

    A non-orthonormal V is QR-orthonormalized first (same policy as
    :func:`subspace_variance_ratio`): the formula reads V Vᵀ as the
    projector onto span(V), which is only true for orthonormal columns —
    passing e.g. a normalized EDR's ``components_.T`` (which folds the
    StandardScaler back into the projector) used to silently report
    garbage (observed: 1.1552 beside sub-degree principal angles,
    results/EDR_SCALE_r04.json first capture).
    """
    B = np.asarray(B)
    V = np.asarray(V)
    gram = V.T @ V
    if not np.allclose(gram, np.eye(V.shape[1])):
        V = np.linalg.qr(V)[0]
    n = B.shape[0]
    resid = B @ B.T @ (np.eye(n) - V @ V.T)
    return float(np.linalg.norm(resid)) / B.shape[1]


class SVDTransformer(BaseEstimator, TransformerMixin):
    """PCA without centering: top right-singular vectors of X.

    The recommended DR transformer for the EDR gradient matrix (reference
    ``utils.py:81-175``).  ``n_components`` may be None (keep all), an int,
    or a float in (0, 1) meaning "smallest count whose cumulative variance
    ratio exceeds this value".

    Attributes
    ----------
    components_ : (n_components, n_features)
    subspace_variance_ : (n_components,) — squared singular values.
    subspace_variance_ratio_ : (n_components,)
    """

    def __init__(self, n_components=None):
        self.n_components = n_components

    def _n_keep(self, ratio, n_features: int) -> int:
        nc = self.n_components
        if nc is None:
            return n_features
        if isinstance(nc, (int, np.integer)):
            if not 0 < nc <= n_features:
                raise ValueError(
                    f"n_components={nc} out of range for {n_features} features")
            return int(nc)
        if isinstance(nc, float) and 0.0 < nc < 1.0:
            return int(np.searchsorted(np.cumsum(ratio), nc) + 1)
        raise ValueError(f"invalid n_components: {nc!r}")

    def fit(self, X, y=None):
        X = check_array(X, copy=False)
        _, S, Vh = np.linalg.svd(X, full_matrices=False)
        energy = S ** 2
        ratio = energy / energy.sum()
        n_keep = min(X.shape[0], self._n_keep(ratio, X.shape[1]), len(S))

        self.components_ = Vh[:n_keep, :]
        self.subspace_variance_ = energy[:n_keep]
        self.subspace_variance_ratio_ = ratio[:n_keep]
        return self

    def fit_gram(self, gram, n_rows=None):
        """Fit from the [Q, Q] Gram matrix XᵀX instead of X itself.

        Identical subspace to ``fit(X)`` — the right-singular vectors of X
        are the eigenvectors of XᵀX and the squared singular values its
        eigenvalues (component SIGNS are basis-convention arbitrary either
        way).  This is the reduction the distributed EDR path feeds: the
        Gram is psum-accumulated across shards so the [N, Q] gradient
        matrix never needs to reach one device
        (:mod:`edrgp_tpu.parallel.edr_sharded`).
        """
        gram = np.asarray(check_array(gram, copy=False))
        w, V = np.linalg.eigh(gram)
        energy = np.maximum(w[::-1], 0.0)           # descending, clipped
        V = V[:, ::-1]
        ratio = energy / energy.sum()
        n_keep = min(self._n_keep(ratio, gram.shape[0]), gram.shape[0])
        if n_rows is not None:
            n_keep = min(n_keep, int(n_rows))

        self.components_ = V[:, :n_keep].T
        self.subspace_variance_ = energy[:n_keep]
        self.subspace_variance_ratio_ = ratio[:n_keep]
        return self

    def transform(self, X):
        return np.asarray(X) @ self.components_.T
