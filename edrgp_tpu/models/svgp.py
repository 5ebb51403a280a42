"""SVGP regression model and sklearn facade (the large-N flagship).

Training loop: a single jitted ``lax.scan`` over optimization steps — per
step one minibatch is gathered from HBM, hyperparameters (kernel, noise,
inducing inputs) take an Adam step on the minibatch ELBO, and the
variational posterior takes a closed-form natural-gradient step
(:func:`edrgp_tpu.ops.svgp.natural_gradient_update`).  No host round-trips
inside the loop.  The data-parallel multi-chip variant of the same step
lives in :mod:`edrgp_tpu.parallel.sharded`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import default_dtype
from ..ops import svgp as _svgp
from ..ops.kernels import Kernel, RBF, inv_positive
from .base import _BaseGP
from .state import Normalizer, _BaseModel
from . import state as _state

__all__ = ["SVGPModel", "SVGPRegressor"]


@partial(jax.jit, static_argnames=("kernel", "steps", "batch_size", "lr"))
def _fit_svgp_scan(kernel: Kernel, params, qstate, opt_state, X, y, key,
                   step0, *, steps: int, batch_size: int, lr: float):
    """Jitted SVI segment of ``steps`` iterations (host loop chains
    segments so no single device program outlives runtime watchdogs)."""
    n_total = X.shape[0]
    opt = optax.adam(lr)

    def hyper_loss(p, m, S, Xb, yb):
        return -_svgp.svgp_elbo(kernel, p, m, S, Xb, yb, n_total)

    def step_fn(carry, step_idx):
        params, qstate, opt_state, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (batch_size,), 0, n_total)
        Xb, yb = X[idx], y[idx]
        m, S = _svgp.q_from_natural(qstate)
        loss, grads = jax.value_and_grad(hyper_loss)(params, m, S, Xb, yb)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # Robbins-Monro style step size for the natural-gradient leg.
        rho = 0.5 / (1.0 + 0.05 * step_idx.astype(X.dtype))
        qstate = _svgp.natural_gradient_update(kernel, params, qstate,
                                               Xb, yb, n_total, rho)
        return (params, qstate, opt_state, key), -loss

    (params, qstate, opt_state, key), elbos = jax.lax.scan(
        step_fn, (params, qstate, opt_state, key),
        step0 + jnp.arange(steps))
    return params, qstate, opt_state, key, elbos


class SVGPModel(_BaseModel):
    """Minibatch SVGP regression with the GPy-like model surface."""

    def __init__(self, X: np.ndarray, y: np.ndarray, kernel: Kernel,
                 Z: Optional[np.ndarray] = None, num_inducing: int = 128,
                 normalizer: bool = True, noise_var: float = 1.0,
                 dtype=None, seed: int = 0):
        dtype = dtype or default_dtype()
        self.kernel = kernel
        self.mean_function = None
        y = np.asarray(y).reshape(-1)
        self.normalizer = Normalizer(y, enabled=bool(normalizer))
        self._X = jnp.asarray(X, dtype)
        self._y = jnp.asarray(self.normalizer.normalize(y), dtype)
        if Z is None:
            rng = np.random.default_rng(seed)
            m = min(int(num_inducing), X.shape[0])
            Z = np.asarray(X)[rng.permutation(X.shape[0])[:m]]
        self.params = {
            "kernel": kernel.init_params(dtype),
            "raw_noise": inv_positive(jnp.asarray(noise_var, dtype)),
            "Z": jnp.asarray(Z, dtype),
        }
        self.qstate = _svgp.init_svgp_state(Z.shape[0], dtype)
        self._objective = float("nan")
        self._seed = seed
        self.elbo_trace_ = None

    @classmethod
    def from_dataset(cls, dataset, kernel: Kernel, num_inducing: int = 128,
                     subsample: int = 4096, normalizer: bool = True,
                     noise_var: float = 1.0, dtype=None, seed: int = 0):
        """Construct from an on-disk :class:`edrgp_tpu.data.MMapDataset`
        without loading it: a random subsample provides the y-normalizer
        statistics and the inducing-point init; training then runs through
        :meth:`optimize_stream`."""
        rng = np.random.default_rng(seed)
        idx = np.sort(rng.choice(dataset.n_rows,
                                 size=min(subsample, dataset.n_rows),
                                 replace=False))
        Xs, ys = dataset.read_rows(idx)
        return cls(Xs, ys, kernel, num_inducing=num_inducing,
                   normalizer=normalizer, noise_var=noise_var, dtype=dtype,
                   seed=seed)

    # --- fitting (optimize/optimize_restarts surface) ----------------------
    def optimize(self, messages: bool = False, max_iters: int = 1000,
                 batch_size: int = 256, lr: float = 3e-3, **_ignored):
        from ..config import on_tpu
        batch_size = min(batch_size, self._X.shape[0])
        key = jax.random.PRNGKey(self._seed)
        seg = 200 if on_tpu() else int(max_iters)
        params, qstate = self.params, self.qstate
        opt_state = optax.adam(float(lr)).init(params)
        traces = []
        done = 0
        while done < int(max_iters):
            n_seg = min(seg, int(max_iters) - done)
            params, qstate, opt_state, key, elbos = _fit_svgp_scan(
                self.kernel, params, qstate, opt_state, self._X, self._y,
                key, jnp.asarray(done), steps=n_seg,
                batch_size=int(batch_size), lr=float(lr))
            traces.append(np.asarray(elbos))
            done += n_seg
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.qstate = qstate
        self.elbo_trace_ = np.concatenate(traces)
        self._objective = float(-self.elbo_trace_[-1])
        if messages:
            print(f"SVGP: final minibatch ELBO={self.elbo_trace_[-1]:.4f}")
        return self

    def optimize_restarts(self, num_restarts: int = 1, **kw):
        # SVI is stochastic already; restarts degrade to a single run.
        return self.optimize(**kw)

    def optimize_stream(self, batches, n_total: int, steps: int = 1000,
                        lr: float = 3e-3, messages: bool = False,
                        log_every: int = 0, metrics_logger=None,
                        scan_chunk: int = 16):
        """Train from a host-side minibatch iterator (the N ≫ memory path).

        ``batches`` yields (X_b [B,Q], y_b [B]) — typically
        ``edrgp_tpu.data.MMapDataset.batches(...)`` backed by the native
        C++ loader, so batch gather overlaps device compute.  Each step:
        Adam on hyperparameters + a natural-gradient update of q(u) with a
        1/(1+0.05·t) step-size schedule.

        ``scan_chunk`` batches are prefetched, stacked, and advanced by ONE
        jitted ``lax.scan`` program — on a remotely-scheduled runtime a
        per-step host dispatch pays the tunnel's RPC latency every step
        (measured 60.8 s vs 351–792 s for the SAME 10M-row fit purely on
        RPC weather, results/svgp10m_smc_r4*.log); chunking divides that
        exposure by ``scan_chunk``.  Set 1 to recover per-step dispatch.
        """
        import optax as _optax
        opt = _optax.adam(lr)
        opt_state = opt.init(self.params)
        kernel = self.kernel
        n_total_f = float(n_total)

        @partial(jax.jit, static_argnames=())
        def chunk_steps(params, qstate, opt_state, Xc, yc, rhos):
            def one(carry, inp):
                params, qstate, opt_state = carry
                Xb, yb, rho = inp
                m, S = _svgp.q_from_natural(qstate)

                def loss_fn(p):
                    return -_svgp.svgp_elbo(kernel, p, m, S, Xb, yb,
                                            n_total_f)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = _optax.apply_updates(params, updates)
                qstate = _svgp.natural_gradient_update(
                    kernel, params, qstate, Xb, yb, n_total_f, rho)
                return (params, qstate, opt_state), -loss

            (params, qstate, opt_state), elbos = jax.lax.scan(
                one, (params, qstate, opt_state), (Xc, yc, rhos))
            return params, qstate, opt_state, elbos

        params, qstate = self.params, self.qstate
        mu_y, std_y = self.normalizer.mean, self.normalizer.std
        dt = self._X.dtype
        elbo = float("nan")
        t = 0
        while t < steps:
            k = min(int(scan_chunk), steps - t)
            Xs, ys = zip(*(next(batches) for _ in range(k)))
            Xc = jnp.asarray(np.stack(Xs), dt)
            yc = jnp.asarray((np.stack(ys) - mu_y) / std_y, dt)
            rhos = jnp.asarray(
                [0.5 / (1.0 + 0.05 * (t + i)) for i in range(k)], dt)
            params, qstate, opt_state, elbos = chunk_steps(
                params, qstate, opt_state, Xc, yc, rhos)
            elbo = elbos[-1]
            if log_every and (t // max(int(scan_chunk), 1)) % max(
                    log_every // max(int(scan_chunk), 1), 1) == 0:
                if metrics_logger is not None:
                    metrics_logger.log(t, elbo=float(elbo))
                if messages:
                    print(f"step {t}: minibatch ELBO {float(elbo):.2f}")
            t += k
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.qstate = qstate
        self._objective = float(-elbo)
        return self

    # --- posterior ---------------------------------------------------------
    def _mS(self):
        return _svgp.q_from_natural(self.qstate)

    def log_likelihood(self):
        m, S = self._mS()
        val = float(_svgp.svgp_elbo(self.kernel, self.params, m, S,
                                    self._X, self._y, self._X.shape[0]))
        return np.array([[val]])

    def predict(self, Xnew, include_likelihood: bool = True):
        Xnew = jnp.asarray(Xnew, self._X.dtype)
        m, S = self._mS()
        mean, var = _svgp.svgp_predict(self.kernel, self.params, m, S, Xnew,
                                       include_likelihood)
        mean = self.normalizer.unnorm_mean(np.asarray(mean))
        var = self.normalizer.unnorm_var(np.asarray(var))
        return mean[:, None], var[:, None]

    def _gradient_basis(self):
        """(kernel, kparams, Z, β=Kuu⁻¹m) — see
        ``ExactGPModel._gradient_basis``."""
        m, _ = self._mS()
        beta = _svgp._mean_grad_beta(self.kernel, self.params, m)
        return (self.kernel, self.params["kernel"], self.params["Z"], beta)

    def predictive_gradients(self, Xnew, batch: int | None = None):
        Xnew = jnp.asarray(Xnew, self._X.dtype)
        m, _ = self._mS()
        if batch is None:
            from ..ops.exact import grad_batch_size
            batch = grad_batch_size(Xnew.shape[0],
                                    self.params["Z"].shape[0])
        dmu = _svgp.svgp_predict_mean_grad_batched(self.kernel, self.params,
                                                   m, Xnew, batch)
        dmu = self.normalizer.unnorm_grad(np.asarray(dmu))
        return dmu[:, :, None], np.zeros_like(dmu)

    def pickle(self, path: str):
        import pickle as _pickle
        state = {
            "class": "SVGPModel",
            "kernel": self.kernel,
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "qstate": jax.tree_util.tree_map(np.asarray, self.qstate),
            "X": np.asarray(self._X),
            "y": np.asarray(self._y),
            "normalizer": self.normalizer,
            "objective": self._objective,
        }
        with open(path, "wb") as f:
            _pickle.dump(state, f)


def _load_svgp(state):
    obj = SVGPModel.__new__(SVGPModel)
    obj.kernel = state["kernel"]
    obj.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
    obj.qstate = _svgp.SVGPState(*[jnp.asarray(v) for v in state["qstate"]])
    obj._X = jnp.asarray(state["X"])
    obj._y = jnp.asarray(state["y"])
    obj.normalizer = state["normalizer"]
    obj._objective = state["objective"]
    obj.mean_function = None
    obj.elbo_trace_ = None
    obj._seed = 0
    return obj


_state._MODEL_CLASSES["SVGPModel"] = SVGPModel
_state._MODEL_LOADERS = getattr(_state, "_MODEL_LOADERS", {})
_state._MODEL_LOADERS["SVGPModel"] = _load_svgp


class SVGPRegressor(_BaseGP):
    """sklearn facade over :class:`SVGPModel` — the streaming counterpart of
    ``SparseGaussianProcessRegressor`` for N far beyond chip memory."""

    _estimator_type = "regressor"

    def __init__(self, kernels=None, kernel_options=None, Z=None,
                 num_inducing=128, normalizer=True, noise_var=1.0,
                 batch_size=256, lr=3e-3, method="optimize"):
        self.kernels = kernels
        self.kernel_options = kernel_options
        self.Z = Z
        self.num_inducing = num_inducing
        self.normalizer = normalizer
        self.noise_var = noise_var
        self.batch_size = batch_size
        self.lr = lr
        self.method = method

    def _get_model(self, X, y, kernel):
        if kernel is None:
            kernel = RBF(X.shape[1])
        return SVGPModel(X, y, kernel, Z=self.Z,
                         num_inducing=self.num_inducing,
                         normalizer=self.normalizer, noise_var=self.noise_var)

    def fit(self, X, y, **opt_kws):
        opt_kws.setdefault("batch_size", self.batch_size)
        opt_kws.setdefault("lr", self.lr)
        return super().fit(X, y, **opt_kws)
