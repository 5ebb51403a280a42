"""Expectation Propagation for binary probit GP classification.

GPy's ``GPClassification`` — the model the reference binds at
``/root/reference/edrgp/gp_model/classification.py:63-64`` — performs EP
inference (Rasmussen & Williams, GPML §3.6).  The variational engine in
:mod:`edrgp_tpu.ops.vgp` covers the same capability with a single bound;
this module provides the *actual EP algorithm* for users who want GPy's
inference semantics (EP's marginals and log-evidence are near-exact for
probit likelihoods, and its ML-II objective matches GPy's).

TPU-first design decisions vs GPy's implementation:

* **Parallel EP**: GPy sweeps sites one at a time with rank-1 posterior
  downdates — a host loop with O(N²) work per site.  Here every site is
  updated simultaneously from the current posterior marginals (damped to
  keep the fixed point stable), so one EP iteration is one Cholesky of
  B = I + S̃^{1/2} K S̃^{1/2} plus MXU gemms, and the whole fit lives in a
  single ``lax.while_loop`` inside ``jit``.  Both schemes share the same
  fixed points (Minka 2001); damping 0.5 converges on all our targets.
* **Hyperparameter gradients without differentiating the loop**: the EP
  site loop runs under ``stop_gradient``.  The returned energy is the full
  EP log-marginal (GPML eq. 3.65), with the site-local terms stopped, so
  reverse-mode AD of :func:`ep_energy` yields exactly GPML eq. 5.27 —
  dlogZ/dθ = ½·tr[(aaᵀ − (K+S̃⁻¹)⁻¹)·∂K/∂θ] — which is the *exact* total
  derivative at an EP fixed point.  Each ML-II objective evaluation
  re-converges EP, so the optimizer always sits on the fixed-point
  manifold (the same alternation GPy uses).

All math below is the natural-parameter-safe form: sites are
(ν̃ᵢ, τ̃ᵢ); B-matrix identities keep everything PSD:

  Σ = K − K S̃^½ B⁻¹ S̃^½ K,   μ = Σ ν̃,   w = ν̃ / √τ̃,
  log Z_EP = Σᵢ log Φ(zᵢ) − ½ log|B| − ½ wᵀB⁻¹w
           + Σᵢ [ ½ log(1 + τ̃ᵢ σ₋ᵢ²) + (ν̃ᵢ − τ̃ᵢ μ₋ᵢ)² / (2 τ̃ᵢ (1+τ̃ᵢσ₋ᵢ²)) ].
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .kernels import Kernel
from .linalg import safe_cholesky, tri_solve

__all__ = ["ep_fit", "ep_energy", "ep_neg_energy_objective",
           "ep_posterior_cache", "ep_predict_latent", "EPState"]


class EPState(NamedTuple):
    nu: jnp.ndarray      # site natural means ν̃ [N]
    tau: jnp.ndarray     # site natural precisions τ̃ [N] (≥ 0)
    iters: jnp.ndarray   # EP iterations executed (scalar int)
    delta: jnp.ndarray   # final max site change (scalar)


def _site_tiny(dtype) -> float:
    return 1e-12 if dtype == jnp.float64 else 1e-8


def _posterior_marginals(K, nu, tau):
    """Diag/mean of Σ = K − K S̃^½ B⁻¹ S̃^½ K and μ = Σ ν̃."""
    srt = jnp.sqrt(tau)
    B = jnp.eye(K.shape[0], dtype=K.dtype) + (srt[:, None] * K) * srt[None, :]
    L = safe_cholesky(B)
    V = tri_solve(L, srt[:, None] * K, lower=True)      # [N, N] = L⁻¹S̃^½K
    sigma2 = jnp.diagonal(K) - jnp.sum(V * V, axis=0)
    mu = K @ nu - V.T @ (V @ nu)
    return mu, jnp.maximum(sigma2, _site_tiny(K.dtype)), L


def _probit_moments(y_sign, mu_cav, var_cav):
    """Tilted moments for the probit likelihood (GPML eqs. 3.58)."""
    denom = jnp.sqrt(1.0 + var_cav)
    z = y_sign * mu_cav / denom
    # N(z)/Φ(z), stable in the far tail via log-space
    log_ratio = jax.scipy.stats.norm.logpdf(z) - jax.scipy.stats.norm.logcdf(z)
    ratio = jnp.exp(log_ratio)
    mu_hat = mu_cav + y_sign * var_cav * ratio / denom
    var_hat = var_cav - var_cav ** 2 * ratio * (z + ratio) / (1.0 + var_cav)
    return mu_hat, jnp.maximum(var_hat, _site_tiny(mu_cav.dtype))


def _cavity(mu, sigma2, nu, tau, tiny):
    tau_cav = jnp.maximum(1.0 / sigma2 - tau, tiny)
    nu_cav = mu / sigma2 - nu
    return nu_cav / tau_cav, 1.0 / tau_cav


def ep_site_loop(K, y_sign, *, damping: float = 0.5, tol: float | None = None,
                 max_iters: int = 100) -> EPState:
    """Run damped parallel EP to convergence at fixed K.  Not differentiable
    (callers stop gradients; see :func:`ep_energy`)."""
    dtype = K.dtype
    n = K.shape[0]
    tiny = _site_tiny(dtype)
    if tol is None:
        tol = 1e-10 if dtype == jnp.float64 else 1e-5
    d = jnp.asarray(damping, dtype)

    def step(state):
        nu, tau, it, _ = state
        mu, sigma2, _ = _posterior_marginals(K, nu, tau)
        mu_cav, var_cav = _cavity(mu, sigma2, nu, tau, tiny)
        mu_hat, var_hat = _probit_moments(y_sign, mu_cav, var_cav)
        tau_new = jnp.maximum(1.0 / var_hat - 1.0 / var_cav, 0.0)
        nu_new = mu_hat / var_hat - mu_cav / var_cav
        nu_next = (1.0 - d) * nu + d * nu_new
        tau_next = (1.0 - d) * tau + d * tau_new
        delta = jnp.maximum(jnp.max(jnp.abs(nu_next - nu)),
                            jnp.max(jnp.abs(tau_next - tau)))
        return EPState(nu_next, tau_next, it + 1, delta)

    def cond(state):
        return jnp.logical_and(state.iters < max_iters, state.delta > tol)

    init = EPState(jnp.zeros((n,), dtype), jnp.zeros((n,), dtype),
                   jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, dtype))
    return lax.while_loop(cond, step, init)


@partial(jax.jit, static_argnums=0)
def ep_fit(kernel: Kernel, params, X, y_sign, damping: float = 0.5,
           max_iters: int = 100) -> EPState:
    """Converged EP sites for the model defined by (kernel, params)."""
    K = kernel.K(params["kernel"], X, X)
    state = ep_site_loop(K, y_sign, damping=damping, max_iters=max_iters)
    return EPState(*[lax.stop_gradient(s) for s in state])


def ep_energy(kernel: Kernel, params, X, y_sign, nu, tau) -> jnp.ndarray:
    """EP log marginal likelihood log Z_EP (GPML eq. 3.65) at fixed sites.

    Differentiable in ``params``; the gradient equals GPML eq. 5.27 (exact
    at an EP fixed point) because every site-local term is stop-gradiented
    and cotangents flow only through log|B| and wᵀB⁻¹w.
    """
    K = kernel.K(params["kernel"], X, X)
    dtype = K.dtype
    tiny = _site_tiny(dtype)
    nu = lax.stop_gradient(nu)
    tau = jnp.maximum(lax.stop_gradient(tau), tiny)

    srt = jnp.sqrt(tau)
    B = jnp.eye(K.shape[0], dtype=dtype) + (srt[:, None] * K) * srt[None, :]
    L = safe_cholesky(B)
    w = nu / srt
    v = tri_solve(L, w[:, None], lower=True)[:, 0]
    core = -jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * (v @ v)

    # Site-local terms: functions of the (stopped) fixed point only.
    Kng = lax.stop_gradient(K)
    mu, sigma2, _ = _posterior_marginals(Kng, nu, tau)
    mu_cav, var_cav = _cavity(mu, sigma2, nu, tau, tiny)
    z = y_sign * mu_cav / jnp.sqrt(1.0 + var_cav)
    s1 = jnp.sum(jax.scipy.stats.norm.logcdf(z))
    one_p = 1.0 + tau * var_cav
    s2 = 0.5 * jnp.sum(jnp.log(one_p))
    s3 = 0.5 * jnp.sum((nu - tau * mu_cav) ** 2 / (tau * one_p))
    return core + lax.stop_gradient(s1 + s2 + s3)


def ep_neg_energy_objective(kernel: Kernel):
    """−log Z_EP(θ) with EP re-converged inside each evaluation.

    Registered as an L-BFGS objective: every value/gradient query re-runs
    the (stop-gradiented) parallel EP loop at the queried θ, then evaluates
    the differentiable energy at that fixed point — the standard
    EP-within-ML-II alternation, expressed as one jitted program.
    """
    def objective(p, X, y_sign):
        K = kernel.K(p["kernel"], X, X)
        state = ep_site_loop(lax.stop_gradient(K), y_sign)
        return -ep_energy(kernel, p, X, y_sign, state.nu, state.tau)
    return objective


@partial(jax.jit, static_argnums=0)
def ep_posterior_cache(kernel: Kernel, params, X, nu, tau):
    """Prediction cache (GPML eqs. 3.60-3.61): returns (alpha, L, srt) with
    μ* = k*ᵀ·alpha and σ*² = k** − ‖L⁻¹(srt∘k*)‖²."""
    K = kernel.K(params["kernel"], X, X)
    tau = jnp.maximum(tau, _site_tiny(K.dtype))
    srt = jnp.sqrt(tau)
    B = jnp.eye(K.shape[0], dtype=K.dtype) + (srt[:, None] * K) * srt[None, :]
    L = safe_cholesky(B)
    # (K + S̃⁻¹)⁻¹ μ̃ = S̃^½ B⁻¹ w with w = ν̃/√τ̃
    w = nu / srt
    alpha = srt * tri_solve(L, tri_solve(L, w[:, None], lower=True),
                            lower=True, trans=True)[:, 0]
    return alpha, L, srt


@partial(jax.jit, static_argnums=0)
def ep_predict_latent(kernel: Kernel, params, X, cache, Xnew):
    """Latent posterior mean/var at Xnew under the EP approximation."""
    alpha, L, srt = cache
    Ks = kernel.K(params["kernel"], X, Xnew)            # [N, M]
    mean = Ks.T @ alpha
    V = tri_solve(L, srt[:, None] * Ks, lower=True)
    kss = kernel.Kdiag(params["kernel"], Xnew)
    var = kss - jnp.sum(V * V, axis=0)
    return mean, jnp.maximum(var, _site_tiny(mean.dtype))
