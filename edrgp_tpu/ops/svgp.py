"""Minibatch stochastic variational GP regression (SVGP) with natural
gradients.

The scaling model for N ≫ chip memory (BASELINE.json north star: SVGP
minibatch VI on N=10M).  The reference has no equivalent — its only large-N
story is the collapsed Titsias bound (``SparseGPRegression``,
``regression.py:94-157``); SVGP extends that capability to streaming
minibatches with O(BM² + M³) per step.

Inference layout (Hensman et al. 2013 SVI):
  * q(u) = N(m, S) over M inducing outputs, parametrized by its *natural*
    parameters θ₁ = S⁻¹m, θ₂ = −½S⁻¹ so the variational update is a convex
    combination — one natural-gradient step with ρ=1 on the full batch is
    the exact optimum.
  * Hyperparameters (kernel, noise, Z) follow Adam on the minibatch ELBO
    with q held fixed.
  * Everything is one jitted ``lax.scan`` over steps; per step the heavy
    ops are [M,B] kernel-block matmuls (MXU) and one M×M Cholesky.

Data-parallel scaling: :func:`elbo_terms` returns per-shard sufficient
statistics that sum across devices — ``psum`` them inside ``shard_map``
(see :mod:`edrgp_tpu.parallel.sharded`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .kernels import Kernel, positive
from .linalg import safe_cholesky, tri_solve

__all__ = ["SVGPState", "init_svgp_state", "q_from_natural", "svgp_elbo",
           "natural_gradient_update", "svgp_predict", "svgp_predict_mean_grad",
           "svgp_predict_mean_grad_batched"]

_LOG2PI = math.log(2.0 * math.pi)


class SVGPState(NamedTuple):
    """Variational posterior in natural parameters (pytree)."""
    theta1: jnp.ndarray  # [M]    = S⁻¹ m
    theta2: jnp.ndarray  # [M, M] = −½ S⁻¹ (symmetric negative definite)


def init_svgp_state(M: int, dtype=jnp.float32) -> SVGPState:
    """q(u) = N(0, I): θ₁ = 0, θ₂ = −½I."""
    return SVGPState(theta1=jnp.zeros((M,), dtype),
                     theta2=-0.5 * jnp.eye(M, dtype=dtype))


def q_from_natural(state: SVGPState):
    """(m, S) from natural params.  S = −½ θ₂⁻¹ via Cholesky of −θ₂."""
    neg2 = -(state.theta2 + state.theta2.T)  # = S⁻¹, symmetrized
    L = safe_cholesky(neg2)
    M = state.theta1.shape[0]
    eye = jnp.eye(M, dtype=state.theta1.dtype)
    Linv = tri_solve(L, eye, lower=True)
    S = Linv.T @ Linv                         # (S⁻¹)⁻¹
    m = S @ state.theta1
    return m, S


def _latent_moments(kernel: Kernel, params, m, S, Xb):
    """Posterior moments of f at a minibatch: μ [B], var [B] + Kuu chol."""
    Z = params["Z"]
    Kuu = kernel.K(params["kernel"], Z, Z)
    Luu = safe_cholesky(Kuu)
    Kub = kernel.K(params["kernel"], Z, Xb)                   # [M, B]
    A = tri_solve(Luu, Kub, lower=True)                        # Luu⁻¹ Kub
    Lm = tri_solve(Luu, m[:, None], lower=True)[:, 0]          # Luu⁻¹ m
    mu = A.T @ Lm
    P = tri_solve(Luu, S, lower=True)                          # Luu⁻¹ S
    P = tri_solve(Luu, P.T, lower=True)                        # Luu⁻¹ S Luu⁻ᵀ
    kdiag = kernel.Kdiag(params["kernel"], Xb)
    var = kdiag - jnp.sum(A * A, axis=0) + jnp.sum(A * (P @ A), axis=0)
    return mu, jnp.maximum(var, 1e-12), Luu


def _kl(m, S, Luu):
    """KL(N(m,S) ‖ N(0,Kuu)) given chol(Kuu)."""
    M = m.shape[0]
    Lim = tri_solve(Luu, m[:, None], lower=True)[:, 0]
    LiS = tri_solve(Luu, S, lower=True)
    LiSLi = tri_solve(Luu, LiS.T, lower=True)
    trace = jnp.trace(LiSLi)
    logdet_Kuu = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Luu)))
    Ls = safe_cholesky(S)
    logdet_S = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ls)))
    return 0.5 * (trace + Lim @ Lim - M + logdet_Kuu - logdet_S)


@partial(jax.jit, static_argnums=0)
def svgp_elbo(kernel: Kernel, params, m, S, Xb, yb, n_total) -> jnp.ndarray:
    """Minibatch estimate of the SVGP evidence lower bound (scalar)."""
    sigma2 = positive(params["raw_noise"])
    mu, var, Luu = _latent_moments(kernel, params, m, S, Xb)
    B = Xb.shape[0]
    quad = (yb - mu) ** 2 + var
    exp_ll = -0.5 * (B * (_LOG2PI + jnp.log(sigma2)) + jnp.sum(quad) / sigma2)
    scale = n_total / B
    return scale * exp_ll - _kl(m, S, Luu)


def elbo_terms(kernel: Kernel, params, m, S, Xb, yb):
    """Per-shard sufficient statistics of the expected log-likelihood:
    (count, Σ quad) — additive across data shards, so a ``psum`` of these
    plus one local KL reconstitutes the global ELBO."""
    mu, var, _ = _latent_moments(kernel, params, m, S, Xb)
    quad = jnp.sum((yb - mu) ** 2 + var)
    return jnp.asarray(Xb.shape[0], mu.dtype), quad


@partial(jax.jit, static_argnums=0)
def natural_gradient_update(kernel: Kernel, params, state: SVGPState,
                            Xb, yb, n_total, rho) -> SVGPState:
    """One stochastic natural-gradient step on q(u) (Hensman 2013, eq. 12).

    With a Gaussian likelihood the expected natural parameters of the
    optimum are closed-form on the batch:
      θ̂₁ = (N/B)/σ² · Kuu⁻¹ Kub y_b
      θ̂₂ = −½ (Kuu⁻¹ + (N/B)/σ² · Kuu⁻¹ Kub Kbu Kuu⁻¹)
    and the step is θ ← (1−ρ)θ + ρθ̂ (stays in the valid cone).
    """
    sigma2 = positive(params["raw_noise"])
    Z = params["Z"]
    Kuu = kernel.K(params["kernel"], Z, Z)
    Luu = safe_cholesky(Kuu)
    Kub = kernel.K(params["kernel"], Z, Xb)
    A = tri_solve(Luu, Kub, lower=True)                       # [M, B]
    A = tri_solve(Luu, A, lower=True, trans=True)              # Kuu⁻¹ Kub
    scale = n_total / Xb.shape[0]
    t1_hat = (scale / sigma2) * (A @ yb)
    Minv = tri_solve(Luu, jnp.eye(Z.shape[0], dtype=A.dtype), lower=True)
    Kuu_inv = Minv.T @ Minv
    t2_hat = -0.5 * (Kuu_inv + (scale / sigma2) * (A @ A.T))
    return SVGPState(
        theta1=(1.0 - rho) * state.theta1 + rho * t1_hat,
        theta2=(1.0 - rho) * state.theta2 + rho * t2_hat,
    )


@partial(jax.jit, static_argnums=(0, 5))
def svgp_predict(kernel: Kernel, params, m, S, Xnew,
                 include_likelihood: bool = True):
    """Posterior mean/variance at Xnew under q(u)=N(m,S)."""
    mu, var, _ = _latent_moments(kernel, params, m, S, Xnew)
    if include_likelihood:
        var = var + positive(params["raw_noise"])
    return mu, var


def _mean_grad_beta(kernel: Kernel, params, m):
    """β = Kuu⁻¹ m, the test-point-independent weights of dμ/dx*."""
    Z = params["Z"]
    Kuu = kernel.K(params["kernel"], Z, Z)
    Luu = safe_cholesky(Kuu)
    beta = tri_solve(Luu, m[:, None], lower=True)
    return tri_solve(Luu, beta, lower=True, trans=True)[:, 0]


@partial(jax.jit, static_argnums=0)
def svgp_predict_mean_grad(kernel: Kernel, params, m, Xnew):
    """dμ/dx*: [S, Q].  μ(x*) = k(x*,Z) Kuu⁻¹ m ⇒ same autodiff pattern as
    the exact/SGPR predictive gradient (G4 contract)."""
    from .exact import weighted_kernel_grad
    beta = _mean_grad_beta(kernel, params, m)
    return weighted_kernel_grad(kernel, params["kernel"], params["Z"],
                                beta, Xnew)


@partial(jax.jit, static_argnums=(0, 4))
def svgp_predict_mean_grad_batched(kernel: Kernel, params, m, Xnew,
                                   batch: int = 8192):
    """dμ/dx* in ``batch``-row chunks — the EDR-at-scale extraction path
    (M can be the full training set; β is computed once, outside the map)."""
    from .exact import grad_rows
    beta = _mean_grad_beta(kernel, params, m)
    return grad_rows(kernel, params["kernel"], params["Z"], beta, Xnew, batch)
