"""Heteroscedastic GP regression: one learnable noise variance per point.

The reference carries this model *commented out*
(``/root/reference/edrgp/gp_model/regression.py:159-212``, delegating to
``GPy.models.GPHeteroscedasticRegression``); here it is implemented and
tested.  The likelihood is N(yᵢ | fᵢ, σ²_{g(i)}) where the grouping g
follows GPy's ``Y_metadata`` contract (reference ctor passthrough at
``regression.py:47-56``): ``Y_metadata={"output_index": idx}`` ties noise
variances within each group (one learnable σ² per unique index); without
metadata every observation gets its own σᵢ² (GPy's het default, where
``output_index = arange(N)``).  All σ² are optimized jointly with the
kernel by ML-II.  Predictions at new points return the *latent*
mean/variance (a new point has no observation-noise estimate — GPy
behaves the same way).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype
from ..inference.lbfgs import minimize_segmented, register_objective
from ..ops import exact as _exact
from ..ops.kernels import Kernel, RBF, inv_positive, positive
from ..ops.linalg import cho_solve, logdet_and_quad, safe_cholesky, tri_solve
from .base import _BaseGP
from .state import Normalizer, _BaseModel
from . import state as _state

__all__ = ["HeteroscedasticGPModel", "GaussianProcessHeteroscedasticRegressor"]

_LOG2PI = math.log(2.0 * math.pi)


@partial(jax.jit, static_argnums=0)
def _het_nlml(kernel: Kernel, params, X, y, idx):
    """NLML with per-group noise: σ²ᵢ = positive(raw_noise)[idx[i]]."""
    K = kernel.K(params["kernel"], X, X)
    Ky = K + jnp.diag(positive(params["raw_noise"])[idx])
    logdet, quad = logdet_and_quad(Ky, y)
    return 0.5 * (X.shape[0] * _LOG2PI + logdet + quad)


register_objective("het_nlml",
                   lambda kernel: lambda p, X, y, idx: _het_nlml(
                       kernel, p, X, y, idx))


@partial(jax.jit, static_argnums=0)
def _het_posterior(kernel: Kernel, params, X, y, idx):
    K = kernel.K(params["kernel"], X, X)
    Ky = K + jnp.diag(positive(params["raw_noise"])[idx])
    L = safe_cholesky(Ky)
    alpha = cho_solve(L, y[:, None])[:, 0]
    return L, alpha


class HeteroscedasticGPModel(_BaseModel):
    """GPy-like surface over the per-point-noise exact GP."""

    def __init__(self, X, y, kernel, Y_metadata=None, normalizer: bool = True,
                 noise_var: float = 1.0, dtype=None):
        dtype = dtype or default_dtype()
        self.kernel = kernel
        self.mean_function = None
        self.Y_metadata = Y_metadata
        y = np.asarray(y).reshape(-1)
        self.normalizer = Normalizer(y, enabled=bool(normalizer))
        self._X = jnp.asarray(X, dtype)
        self._y = jnp.asarray(self.normalizer.normalize(y), dtype)
        n = X.shape[0]
        if Y_metadata is not None and "output_index" in Y_metadata:
            # GPy semantics: observations sharing an output_index share one
            # learnable noise variance.
            raw_idx = np.asarray(Y_metadata["output_index"]).reshape(-1)
            if raw_idx.shape[0] != n:
                raise ValueError(
                    f"Y_metadata['output_index'] has {raw_idx.shape[0]} "
                    f"entries for {n} observations")
            self.groups_, idx = np.unique(raw_idx, return_inverse=True)
        else:
            self.groups_, idx = np.arange(n), np.arange(n)
        self._idx = jnp.asarray(idx, jnp.int32)
        self.params = {
            "kernel": kernel.init_params(dtype),
            "raw_noise": jnp.full((len(self.groups_),), float(inv_positive(
                jnp.asarray(noise_var, dtype))), dtype),
        }
        self._objective = float("nan")
        self._cache = None

    _objective_name = "het_nlml"

    def _fit_data(self):
        return (self._X, self._y, self._idx)

    def optimize_restarts(self, num_restarts: int = 1, **kw):
        # per-point noise makes restart perturbation of N params unhelpful
        return self.optimize(**kw)

    def _posterior(self):
        if self._cache is None:
            self._cache = _het_posterior(self.kernel, self.params,
                                         self._X, self._y, self._idx)
        return self._cache

    def log_likelihood(self) -> float:
        return float(-_het_nlml(self.kernel, self.params, self._X, self._y,
                                self._idx))

    @property
    def group_noise_variances_(self) -> np.ndarray:
        """Learned noise per Y_metadata group (original y scale), ordered
        like ``groups_``."""
        return np.asarray(positive(self.params["raw_noise"])) \
            * self.normalizer.std ** 2

    @property
    def noise_variances_(self) -> np.ndarray:
        """Per-point learned noise in the original y scale."""
        return self.group_noise_variances_[np.asarray(self._idx)]

    @property
    def noise_variance(self) -> float:
        return float(np.mean(np.asarray(positive(self.params["raw_noise"]))))

    def predict(self, Xnew, include_likelihood: bool = False):
        """Latent posterior mean/var at Xnew (no per-point noise exists for
        unseen points; ``include_likelihood=True`` adds the *mean* learned
        noise as a crude predictive band)."""
        Xnew = jnp.asarray(Xnew, self._X.dtype)
        L, alpha = self._posterior()
        Ks = self.kernel.K(self.params["kernel"], self._X, Xnew)
        mean = Ks.T @ alpha
        v = tri_solve(L, Ks, lower=True)
        kss = self.kernel.Kdiag(self.params["kernel"], Xnew)
        var = jnp.maximum(kss - jnp.sum(v * v, axis=0), 1e-15)
        if include_likelihood:
            var = var + jnp.mean(positive(self.params["raw_noise"]))
        mean = self.normalizer.unnorm_mean(np.asarray(mean))
        var = self.normalizer.unnorm_var(np.asarray(var))
        return mean[:, None], var[:, None]

    def predictive_gradients(self, Xnew):
        Xnew = jnp.asarray(Xnew, self._X.dtype)
        _, alpha = self._posterior()
        dmu = _exact.predict_mean_grad(self.kernel, {"kernel": self.params["kernel"]},
                                       self._X, alpha, Xnew)
        dmu = self.normalizer.unnorm_grad(np.asarray(dmu))
        return dmu[:, :, None], np.zeros_like(dmu)


    def _pickle_state(self) -> dict:
        state = super()._pickle_state()
        state["idx"] = np.asarray(self._idx)
        state["groups"] = np.asarray(self.groups_)
        state["Y_metadata"] = self.Y_metadata
        return state


def _load_het(state):
    obj = HeteroscedasticGPModel.__new__(HeteroscedasticGPModel)
    obj.kernel = state["kernel"]
    obj.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
    obj._X = jnp.asarray(state["X"])
    obj._y = jnp.asarray(state["y"])
    obj.normalizer = state["normalizer"]
    obj._objective = state["objective"]
    obj._cache = None
    obj.mean_function = state.get("mean_function")
    obj._idx = jnp.asarray(state["idx"], jnp.int32)
    obj.groups_ = np.asarray(state["groups"])
    obj.Y_metadata = state.get("Y_metadata")
    return obj


_state._MODEL_CLASSES["HeteroscedasticGPModel"] = HeteroscedasticGPModel
_state._MODEL_LOADERS["HeteroscedasticGPModel"] = _load_het


class GaussianProcessHeteroscedasticRegressor(_BaseGP):
    """sklearn facade (reference ``regression.py:159-212``, de-commented)."""

    _estimator_type = "regressor"

    def __init__(self, kernels=None, kernel_options=None, Y_metadata=None,
                 normalizer=True, noise_var=1.0, method="optimize"):
        self.kernels = kernels
        self.kernel_options = kernel_options
        self.Y_metadata = Y_metadata
        self.normalizer = normalizer
        self.noise_var = noise_var
        self.method = method

    def _get_model(self, X, y, kernel):
        if kernel is None:
            kernel = RBF(X.shape[1])
        return HeteroscedasticGPModel(X, y, kernel,
                                      Y_metadata=self.Y_metadata,
                                      normalizer=self.normalizer,
                                      noise_var=self.noise_var)
