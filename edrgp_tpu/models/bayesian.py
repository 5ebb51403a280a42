"""Fully Bayesian GP regression: NUTS-marginalized hyperparameters.

The reference's engine (GPy) fits hyperparameters by ML-II only; this
estimator carries the full posterior (BASELINE.json config: "NUTS/HMC over
ARD lengthscales + EDR projection, 1024 chains vmapped and sharded").
``fit`` runs vmapped NUTS chains over (kernel params, noise) of the exact
GP; ``predict``/``predict_gradient`` marginalize over a thinned sample set
(vmapped posterior evaluations — one batched program, not a Python loop),
so EDR on top of this estimator uses *posterior-averaged* gradients with
hyperparameter uncertainty integrated out.

Plugs into the EDR layer through the same duck-typed contract as every
other estimator here (SURVEY.md §1 L3→L2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from ..config import default_dtype
from ..inference.nuts import run_nuts
from ..metrics import potential_scale_reduction
from ..ops import exact as _exact
from ..ops.kernels import RBF, inv_positive
from .base import _BaseGP
from .state import Normalizer

__all__ = ["BayesianGPModel", "BayesianGaussianProcessRegressor"]


class BayesianGPModel:
    """GPy-like model surface with a posterior *ensemble* behind it."""

    def __init__(self, X, y, kernel, normalizer=True, noise_var=1.0,
                 num_chains=4, num_warmup=300, num_samples=300,
                 max_depth=8, max_models=32, prior_scale=3.0, seed=0,
                 target_accept=0.9, dtype=None):
        dtype = dtype or default_dtype()
        self.kernel = kernel
        y = np.asarray(y).reshape(-1)
        self.normalizer = Normalizer(y, enabled=bool(normalizer))
        self._X = jnp.asarray(X, dtype)
        self._y = jnp.asarray(self.normalizer.normalize(y), dtype)
        p0 = {"kernel": kernel.init_params(dtype),
              "raw_noise": inv_positive(jnp.asarray(noise_var, dtype))}
        self._flat0, self._unravel = ravel_pytree(p0)
        # target_accept 0.9 (not the generic 0.8): GP hyperparameter
        # posteriors are funnel-prone, and the sharper dual-averaging
        # adaptation (Hoffman-Gelman init + windowed restarts) otherwise
        # settles on step sizes that clip divergent regions.
        self._cfg = dict(num_chains=num_chains, num_warmup=num_warmup,
                         num_samples=num_samples, max_depth=max_depth,
                         prior_scale=float(prior_scale),
                         target_accept=float(target_accept))
        self.max_models = max_models
        self._seed = seed
        self.samples_ = None         # [S, D] thinned unconstrained samples
        self.diagnostics_ = {}

    # --- fitting -----------------------------------------------------------
    def optimize(self, messages=False, max_iters=None, **_ignored):
        kernel, unravel = self.kernel, self._unravel
        X, y = self._X, self._y
        prior_scale = self._cfg["prior_scale"]

        def logprob(q):
            return (-_exact.nlml(kernel, unravel(q), X, y)
                    - 0.5 * jnp.sum(q ** 2) / prior_scale ** 2)

        run = partial(run_nuts, logprob,
                      num_warmup=self._cfg["num_warmup"],
                      num_samples=self._cfg["num_samples"],
                      max_depth=self._cfg["max_depth"],
                      target_accept=self._cfg.get("target_accept", 0.9))
        key = jax.random.PRNGKey(self._seed)
        q0 = jnp.tile(self._flat0, (self._cfg["num_chains"], 1))
        keys = jax.random.split(key, self._cfg["num_chains"])
        qs, info = jax.vmap(run)(q0, keys)
        chains = np.asarray(qs)                      # [C, S, D]
        self.diagnostics_ = {
            "rhat": potential_scale_reduction(chains),
            "divergences": int(np.sum(np.asarray(info["divergences"]))),
            "step_size": np.asarray(info["step_size"]),
        }
        pooled = chains.reshape(-1, chains.shape[-1])
        stride = max(1, pooled.shape[0] // self.max_models)
        self.samples_ = jnp.asarray(pooled[::stride][:self.max_models])
        # posterior caches for every kept sample, one vmapped program
        self._caches = jax.vmap(
            lambda q: _exact.posterior(self.kernel, self._unravel(q),
                                       self._X, self._y))(self.samples_)
        if messages:
            print(f"BayesianGP: {self.samples_.shape[0]} posterior models, "
                  f"max R-hat {self.diagnostics_['rhat'].max():.3f}, "
                  f"{self.diagnostics_['divergences']} divergences")
        return self

    optimize_restarts = optimize

    # --- prediction (posterior mixture) ------------------------------------
    def predict(self, Xnew, include_likelihood=True):
        Xnew = jnp.asarray(Xnew, self._X.dtype)

        def one(q, cache):
            return _exact.predict(self.kernel, self._unravel(q), self._X,
                                  cache, Xnew, include_likelihood)

        means, vars_ = jax.vmap(one)(self.samples_, self._caches)
        mean = jnp.mean(means, axis=0)
        # mixture variance: E[var] + Var[mean]
        var = jnp.mean(vars_ + means ** 2, axis=0) - mean ** 2
        mean = self.normalizer.unnorm_mean(np.asarray(mean))
        var = self.normalizer.unnorm_var(np.asarray(var))
        return mean[:, None], var[:, None]

    def predictive_gradients(self, Xnew):
        Xnew = jnp.asarray(Xnew, self._X.dtype)

        def one(q, cache):
            return _exact.predict_mean_grad(self.kernel, self._unravel(q),
                                            self._X, cache[1], Xnew)

        grads = jax.vmap(one)(self.samples_, self._caches)
        dmu = self.normalizer.unnorm_grad(np.asarray(jnp.mean(grads, axis=0)))
        return dmu[:, :, None], np.asarray(jnp.std(grads, axis=0))

    def log_likelihood(self):
        """Posterior-mean log marginal likelihood (diagnostic summary)."""
        vals = jax.vmap(lambda q: -_exact.nlml(
            self.kernel, self._unravel(q), self._X, self._y))(self.samples_)
        return float(jnp.mean(vals))

    def pickle(self, path):
        """Save the posterior ensemble; round-trip partner is the
        ``BayesianGPModel`` loader registered in ``state._MODEL_LOADERS``
        (reference persistence contract ``gp_model/base.py:224-257``)."""
        from .state import _atomic_pickle_dump
        _atomic_pickle_dump({
            "class": "BayesianGPModel",
            "kernel": self.kernel,
            "samples": np.asarray(self.samples_),
            "X": np.asarray(self._X),
            "y": np.asarray(self._y),
            "normalizer": self.normalizer,
            "diagnostics": self.diagnostics_,
            "cfg": dict(self._cfg),
            "max_models": self.max_models,
            "seed": self._seed,
        }, path)

    @classmethod
    def _load(cls, state):
        obj = cls.__new__(cls)
        obj.kernel = state["kernel"]
        obj._X = jnp.asarray(state["X"])
        obj._y = jnp.asarray(state["y"])
        obj.normalizer = state["normalizer"]
        obj.diagnostics_ = state.get("diagnostics", {})
        obj._cfg = state.get("cfg", dict(num_chains=4, num_warmup=300,
                                         num_samples=300, max_depth=8,
                                         prior_scale=3.0))
        obj.max_models = state.get("max_models", 32)
        obj._seed = state.get("seed", 0)
        p0 = {"kernel": obj.kernel.init_params(obj._X.dtype),
              "raw_noise": inv_positive(jnp.asarray(1.0, obj._X.dtype))}
        obj._flat0, obj._unravel = ravel_pytree(p0)
        obj.samples_ = jnp.asarray(state["samples"])
        obj._caches = jax.vmap(
            lambda q: _exact.posterior(obj.kernel, obj._unravel(q),
                                       obj._X, obj._y))(obj.samples_)
        return obj

    @property
    def noise_variance(self):
        from ..ops.kernels import positive
        vals = [float(positive(self._unravel(q)["raw_noise"]))
                for q in np.asarray(self.samples_)]
        return float(np.mean(vals))


from . import state as _state  # noqa: E402  (registration after class def)

_state._MODEL_LOADERS["BayesianGPModel"] = BayesianGPModel._load


class BayesianGaussianProcessRegressor(_BaseGP):
    """sklearn facade: drop-in for ``GaussianProcessRegressor`` with the
    hyperparameter posterior integrated out."""

    _estimator_type = "regressor"

    def __init__(self, kernels=None, kernel_options=None, normalizer=True,
                 noise_var=1.0, num_chains=4, num_warmup=300,
                 num_samples=300, max_depth=8, max_models=32,
                 prior_scale=3.0, seed=0, target_accept=0.9,
                 method="optimize"):
        self.kernels = kernels
        self.kernel_options = kernel_options
        self.normalizer = normalizer
        self.noise_var = noise_var
        self.num_chains = num_chains
        self.num_warmup = num_warmup
        self.num_samples = num_samples
        self.max_depth = max_depth
        self.max_models = max_models
        self.prior_scale = prior_scale
        self.seed = seed
        self.target_accept = target_accept
        self.method = method

    def _get_model(self, X, y, kernel):
        if kernel is None:
            kernel = RBF(X.shape[1])
        return BayesianGPModel(
            X, y, kernel, normalizer=self.normalizer,
            noise_var=self.noise_var, num_chains=self.num_chains,
            num_warmup=self.num_warmup, num_samples=self.num_samples,
            max_depth=self.max_depth, max_models=self.max_models,
            prior_scale=self.prior_scale, seed=self.seed,
            target_accept=self.target_accept)
