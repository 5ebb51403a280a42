"""Fitted classification model objects (GPy-compatible surface).

Native equivalents of ``GPy.models.GPClassification`` /
``SparseGPClassification`` as driven by the reference adapters
(``/root/reference/edrgp/gp_model/classification.py:63-64,146-149``):
``predict`` returns the class-1 probability (GPy Bernoulli semantics),
``predictive_gradients`` returns gradients of the *latent* posterior mean,
``log_likelihood`` reports the variational bound.  Inference is whitened
VI with Gauss-Hermite expectations (see :mod:`edrgp_tpu.ops.vgp`) instead
of GPy's EP — same predictive surface, one jitted L-BFGS fit.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype
from ..inference.lbfgs import register_objective
from ..ops import ep as _ep
from ..ops import ep_dtc as _ep_dtc
from ..ops import exact as _exact
from ..ops import vgp as _vgp
from ..ops.kernels import Kernel
from . import state as _state
from .state import _BaseModel, _perturb_inits

__all__ = ["VGPClassificationModel", "SparseVGPClassificationModel",
           "EPClassificationModel", "SparseEPClassificationModel"]

register_objective("neg_vgp_elbo",
                   lambda kernel: lambda p, X, y: -_vgp.vgp_elbo(
                       kernel, p, X, y, "probit"))
register_objective("neg_vgp_elbo_logit",
                   lambda kernel: lambda p, X, y: -_vgp.vgp_elbo(
                       kernel, p, X, y, "logit"))
register_objective("neg_svgp_cls_elbo",
                   lambda kernel: lambda p, X, y: -_vgp.svgp_cls_elbo(
                       kernel, p, X, y, "probit"))
register_objective("neg_svgp_cls_elbo_logit",
                   lambda kernel: lambda p, X, y: -_vgp.svgp_cls_elbo(
                       kernel, p, X, y, "logit"))
register_objective("neg_ep_energy", _ep.ep_neg_energy_objective)
register_objective("neg_ep_dtc_energy", _ep_dtc.ep_dtc_neg_energy_objective)


class _BaseClsModel(_BaseModel):
    """Shared classification surface over the VI engine."""

    _lik = "probit"  # Bernoulli link; GPy's default

    def _latent(self, Xnew):
        raise NotImplementedError

    def log_likelihood(self) -> float:
        return float(self._elbo_fn(self.kernel, self.params, self._X,
                                   self._y, self._lik))

    def predict(self, Xnew, include_likelihood: bool = True):
        """(P(y=1|x*) [M,1], latent var [M,1]) — GPy Bernoulli predict."""
        Xnew = jnp.asarray(Xnew, self._X.dtype)
        mean, var = self._latent(Xnew)
        proba = _vgp.bernoulli_predict_proba(mean, var, self._lik)
        return np.asarray(proba)[:, None], np.asarray(var)[:, None]

    def predictive_gradients(self, Xnew):
        """Gradients of the latent posterior mean (EDR consumes [0])."""
        Xnew = jnp.asarray(Xnew, self._X.dtype)
        grad_fn = jax.vmap(jax.grad(lambda x: self._latent_mean_one(x)))
        dmu = np.asarray(grad_fn(Xnew))          # [M, Q]
        return dmu[:, :, None], np.zeros_like(dmu)

    @property
    def noise_variance(self) -> float:  # no Gaussian likelihood here
        return 0.0

    def _pickle_state(self) -> dict:
        state = super()._pickle_state()
        state["lik"] = self._lik
        return state


class VGPClassificationModel(_BaseClsModel):
    """Full (non-sparse) variational GP binary classifier."""

    _objective_name = "neg_vgp_elbo"
    _elbo_fn = staticmethod(_vgp.vgp_elbo)

    def __init__(self, X: np.ndarray, y: np.ndarray, kernel: Kernel,
                 mean_function=None, dtype=None):
        dtype = dtype or default_dtype()
        self.kernel = kernel
        self.mean_function = mean_function
        self.normalizer = None
        y = np.asarray(y).reshape(-1)
        classes = np.unique(y)
        if classes.size != 2:
            raise ValueError(f"binary classification requires 2 classes, got {classes}")
        self.classes_ = classes
        self._X = jnp.asarray(X, dtype)
        self._y = jnp.asarray(np.where(y == classes[1], 1.0, -1.0), dtype)
        self.params = {"kernel": kernel.init_params(dtype),
                       **_vgp.init_variational_params(X.shape[0], dtype)}
        self._objective = float("nan")
        self._cache = None

    def _latent(self, Xnew):
        return _vgp.vgp_predict_latent(self.kernel, self.params, self._X, Xnew)

    def _latent_mean_one(self, x):
        mean, _ = _vgp.vgp_predict_latent(self.kernel, self.params, self._X,
                                          x[None, :])
        return mean[0]


class SparseVGPClassificationModel(_BaseClsModel):
    """Sparse (inducing-point) variational GP binary classifier
    (EP-DTC capability equivalent).

    ``likelihood`` honors the reference's sparse-classifier ctor param
    (``classification.py:140``): None/'bernoulli'/'probit' is the GPy
    Bernoulli-probit default; 'bernoulli_logit'/'logit' swaps the link."""

    _elbo_fn = staticmethod(_vgp.svgp_cls_elbo)

    @property
    def _objective_name(self) -> str:
        return ("neg_svgp_cls_elbo" if self._lik == "probit"
                else "neg_svgp_cls_elbo_logit")

    def __init__(self, X: np.ndarray, y: np.ndarray, kernel: Kernel,
                 Z: Optional[np.ndarray] = None, num_inducing: int = 10,
                 likelihood=None, mean_function=None, dtype=None,
                 seed: int = 0):
        dtype = dtype or default_dtype()
        self._lik = _vgp.canonical_likelihood(likelihood)
        self.kernel = kernel
        self.mean_function = mean_function
        self.normalizer = None
        y = np.asarray(y).reshape(-1)
        classes = np.unique(y)
        if classes.size != 2:
            raise ValueError(f"binary classification requires 2 classes, got {classes}")
        self.classes_ = classes
        self._X = jnp.asarray(X, dtype)
        self._y = jnp.asarray(np.where(y == classes[1], 1.0, -1.0), dtype)
        if Z is None:
            rng = np.random.default_rng(seed)
            m = min(int(num_inducing), X.shape[0])
            Z = np.asarray(X)[rng.permutation(X.shape[0])[:m]]
        self.params = {"kernel": kernel.init_params(dtype),
                       "Z": jnp.asarray(Z, dtype),
                       **_vgp.init_variational_params(Z.shape[0], dtype)}
        self._objective = float("nan")
        self._cache = None

    def _latent(self, Xnew):
        return _vgp.svgp_cls_predict_latent(self.kernel, self.params, Xnew)

    def _latent_mean_one(self, x):
        mean, _ = _vgp.svgp_cls_predict_latent(self.kernel, self.params,
                                               x[None, :])
        return mean[0]


class EPClassificationModel(_BaseClsModel):
    """Binary GP classifier fitted by Expectation Propagation — the same
    inference GPy's ``GPClassification`` runs at the reference call site
    (``classification.py:63-64``), in damped-parallel TPU form
    (:mod:`edrgp_tpu.ops.ep`).  ``log_likelihood`` reports log Z_EP, the
    EP approximation of the marginal (GPy's classifier objective)."""

    _objective_name = "neg_ep_energy"

    def __init__(self, X: np.ndarray, y: np.ndarray, kernel: Kernel,
                 mean_function=None, dtype=None):
        dtype = dtype or default_dtype()
        self.kernel = kernel
        self.mean_function = mean_function
        self.normalizer = None
        y = np.asarray(y).reshape(-1)
        classes = np.unique(y)
        if classes.size != 2:
            raise ValueError(f"binary classification requires 2 classes, got {classes}")
        self.classes_ = classes
        self._X = jnp.asarray(X, dtype)
        self._y = jnp.asarray(np.where(y == classes[1], 1.0, -1.0), dtype)
        self.params = {"kernel": kernel.init_params(dtype)}
        self._objective = float("nan")
        self._cache = None

    def _ep(self):
        """Lazy (sites, prediction cache); reset on every optimize()."""
        if self._cache is None:
            state = _ep.ep_fit(self.kernel, self.params, self._X, self._y)
            cache = _ep.ep_posterior_cache(self.kernel, self.params, self._X,
                                           state.nu, state.tau)
            self._cache = (state, cache)
        return self._cache

    def log_likelihood(self) -> float:
        state, _ = self._ep()
        return float(_ep.ep_energy(self.kernel, self.params, self._X, self._y,
                                   state.nu, state.tau))

    def _latent(self, Xnew):
        _, cache = self._ep()
        return _ep.ep_predict_latent(self.kernel, self.params, self._X,
                                     cache, Xnew)

    def predictive_gradients(self, Xnew):
        """d(latent mean)/dx*: μ*(x) = k(x, X)·α is the same form as the
        exact-GP posterior mean, so the fused mean-grad op applies."""
        Xnew = jnp.asarray(Xnew, self._X.dtype)
        _, (alpha, _, _) = self._ep()
        dmu = np.asarray(_exact.predict_mean_grad(
            self.kernel, self.params, self._X, alpha, Xnew))
        return dmu[:, :, None], np.zeros_like(dmu)

    def _latent_mean_one(self, x):  # pragma: no cover - generic fallback
        _, (alpha, _, _) = self._ep()
        return (self.kernel.K(self.params["kernel"], x[None, :],
                              self._X)[0] * alpha).sum()


class SparseEPClassificationModel(_BaseClsModel):
    """Sparse binary GP classifier fitted by EP-DTC — the inference GPy's
    ``SparseGPClassification`` runs at the reference's sparse call site
    (``classification.py:146-149``), in damped-parallel O(NM²) TPU form
    (:mod:`edrgp_tpu.ops.ep_dtc`).  ``log_likelihood`` reports log Z_EP-DTC.
    Only the probit link exists under EP (GPy likewise); logit requests
    route through the VI engine at the estimator layer."""

    _objective_name = "neg_ep_dtc_energy"

    def __init__(self, X: np.ndarray, y: np.ndarray, kernel: Kernel,
                 Z: Optional[np.ndarray] = None, num_inducing: int = 10,
                 mean_function=None, dtype=None, seed: int = 0):
        dtype = dtype or default_dtype()
        self.kernel = kernel
        self.mean_function = mean_function
        self.normalizer = None
        y = np.asarray(y).reshape(-1)
        classes = np.unique(y)
        if classes.size != 2:
            raise ValueError(f"binary classification requires 2 classes, got {classes}")
        self.classes_ = classes
        self._X = jnp.asarray(X, dtype)
        self._y = jnp.asarray(np.where(y == classes[1], 1.0, -1.0), dtype)
        if Z is None:
            rng = np.random.default_rng(seed)
            m = min(int(num_inducing), X.shape[0])
            Z = np.asarray(X)[rng.permutation(X.shape[0])[:m]]
        self.params = {"kernel": kernel.init_params(dtype),
                       "Z": jnp.asarray(Z, dtype)}
        self._objective = float("nan")
        self._cache = None

    def _ep(self):
        """Lazy (sites, prediction cache); reset on every optimize()."""
        if self._cache is None:
            state = _ep_dtc.ep_dtc_fit(self.kernel, self.params, self._X,
                                       self._y)
            cache = _ep_dtc.ep_dtc_posterior_cache(
                self.kernel, self.params, self._X, state.nu, state.tau)
            self._cache = (state, cache)
        return self._cache

    def log_likelihood(self) -> float:
        state, _ = self._ep()
        return float(_ep_dtc.ep_dtc_energy(self.kernel, self.params, self._X,
                                           self._y, state.nu, state.tau))

    def _latent(self, Xnew):
        _, cache = self._ep()
        return _ep_dtc.ep_dtc_predict_latent(self.kernel, self.params,
                                             cache, Xnew)

    def _latent_mean_one(self, x):
        mean, _ = self._latent(x[None, :])
        return mean[0]

    def predictive_gradients(self, Xnew):
        """d(latent mean)/dx* via autodiff of the DTC projection mean."""
        Xnew = jnp.asarray(Xnew, self._X.dtype)
        self._ep()
        grad_fn = jax.vmap(jax.grad(self._latent_mean_one))
        dmu = np.asarray(grad_fn(Xnew))
        return dmu[:, :, None], np.zeros_like(dmu)


_state._MODEL_CLASSES["VGPClassificationModel"] = VGPClassificationModel
_state._MODEL_CLASSES["SparseVGPClassificationModel"] = SparseVGPClassificationModel
_state._MODEL_CLASSES["EPClassificationModel"] = EPClassificationModel
_state._MODEL_CLASSES["SparseEPClassificationModel"] = SparseEPClassificationModel
