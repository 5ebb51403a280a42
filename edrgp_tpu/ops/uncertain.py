"""Sparse GP regression with uncertain (Gaussian) inputs.

Native replacement for the reference's ``X_variance`` plumbing into
``GPy.models.SparseGPRegression`` (``/root/reference/edrgp/gp_model/
regression.py:153-157``): each training input is a Gaussian
x_n ~ N(mu_n, diag(S_n)) with *fixed* (non-variational) moments, and the
Titsias collapsed bound is evaluated with the kernel expectations
("psi statistics", Titsias & Lawrence 2010) in place of Kuf products:

    psi0      = sum_n E[k(x_n, x_n)]
    Psi1[n,m] = E[k(x_n, z_m)]
    Psi2[m,k] = sum_n E[k(x_n, z_m) k(x_n, z_k)]

TPU notes: Psi1/Psi2 exponents are assembled from [N,Q]x[Q,M...] einsum
contractions (MXU work) plus fused elementwise tails; the N x N matrix is
never formed, and Psi2's over-n reduction happens on device in one pass.
Closed forms exist for the RBF (ARD) kernel; other kernels raise.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .kernels import RBF, Kernel, positive
from .linalg import safe_cholesky, tri_solve

__all__ = ["psi_statistics", "elbo", "posterior"]

_LOG2PI = math.log(2.0 * math.pi)


def _rbf_moments(kernel: RBF, kp, mu, S, Z):
    """Slice active dims and return (variance, lengthscale² [Q], mu, S, Z)."""
    mu = kernel._slice(mu)
    S = kernel._slice(S)
    Z = kernel._slice(Z)
    v = positive(kp["variance"])
    ls = positive(kp["lengthscale"])
    l2 = jnp.broadcast_to(ls * ls, (mu.shape[1],))
    return v, l2, mu, S, Z


def psi_statistics(kernel: Kernel, kp, mu, S, Z):
    """(psi0, Psi1 [N,M], Psi2 [M,M]) for x_n ~ N(mu_n, diag(S_n)).

    Closed-form for RBF/ARD; ``NotImplementedError`` otherwise (matching
    GPy, where psi statistics exist only for a few kernels).
    """
    if not isinstance(kernel, RBF):
        raise NotImplementedError(
            f"X_variance (uncertain inputs) requires an RBF kernel with "
            f"closed-form psi statistics; got {type(kernel).__name__}")
    v, l2, mu, S, Z = _rbf_moments(kernel, kp, mu, S, Z)
    n = mu.shape[0]

    # psi0: E[k(x,x)] = sigma_f^2 for RBF regardless of input noise.
    psi0 = n * v

    # Psi1[n,m] = v * prod_d (l2/(S+l2))^1/2 * exp(-1/2 (mu-z)^2/(S+l2))
    D1 = S + l2[None, :]                                    # [N, Q]
    logw1 = -0.5 * jnp.sum(jnp.log1p(S / l2[None, :]), axis=1)  # [N]
    # (mu-z)^2/D1 summed over d, decomposed into einsum contractions.
    quad1 = (jnp.sum(mu * mu / D1, axis=1)[:, None]
             - 2.0 * (mu / D1) @ Z.T
             + (1.0 / D1) @ (Z * Z).T)                      # [N, M]
    Psi1 = v * jnp.exp(logw1[:, None] - 0.5 * quad1)

    # Psi2[m,k] = sum_n v^2 * prod_d (l2/(2S+l2))^1/2
    #             * exp(-(z_m-z_k)^2/(4 l2) - (mu - zbar_mk)^2/(2S+l2))
    D2 = 2.0 * S + l2[None, :]                              # [N, Q]
    logw2 = -0.5 * jnp.sum(jnp.log1p(2.0 * S / l2[None, :]), axis=1)  # [N]
    zl = Z / jnp.sqrt(4.0 * l2)[None, :]
    zz = jnp.sum(zl * zl, axis=1)
    dist = zz[:, None] + zz[None, :] - 2.0 * zl @ zl.T      # [M, M]
    zbar = 0.5 * (Z[:, None, :] + Z[None, :, :])            # [M, M, Q]
    a = jnp.sum(mu * mu / D2, axis=1)                       # [N]
    b = jnp.einsum("nq,mkq->nmk", mu / D2, zbar)            # [N, M, M]
    c = jnp.einsum("nq,mkq->nmk", 1.0 / D2, zbar * zbar)    # [N, M, M]
    expo = logw2[:, None, None] - a[:, None, None] + 2.0 * b - c
    Psi2 = (v * v) * jnp.exp(-dist) * jnp.sum(jnp.exp(expo), axis=0)
    return psi0, Psi1, Psi2


def _common(kernel: Kernel, params, X, y, X_variance):
    """Factorizations shared by bound and posterior.

    L = chol(Kuu); B = I + L⁻¹ Psi2 L⁻ᵀ/σ²; c = LB⁻¹ L⁻¹ Psi1ᵀy/σ².
    With X_variance → 0 this reduces exactly to the certain-input SGPR
    factorization (Psi1 → Kfu, Psi2 → Kuf Kfu).
    """
    Z = params["Z"]
    sigma2 = positive(params["raw_noise"])
    kp = params["kernel"]
    psi0, Psi1, Psi2 = psi_statistics(kernel, kp, X, X_variance, Z)
    Kuu = kernel.K(kp, Z, Z)
    L = safe_cholesky(Kuu)
    LiP2 = tri_solve(L, Psi2, lower=True)                   # L⁻¹ Psi2
    A2 = tri_solve(L, LiP2.T, lower=True).T / sigma2        # L⁻¹Psi2L⁻ᵀ/σ²
    A2 = 0.5 * (A2 + A2.T)
    B = A2 + jnp.eye(Z.shape[0], dtype=A2.dtype)
    LB = safe_cholesky(B)
    Py = tri_solve(L, Psi1.T @ y[:, None], lower=True) / sigma2
    c = tri_solve(LB, Py, lower=True)                       # [M, 1]
    return L, LB, c, A2, psi0, sigma2


@partial(jax.jit, static_argnums=0)
def elbo(kernel: Kernel, params, X, y, X_variance) -> jnp.ndarray:
    """Collapsed uncertain-input lower bound on log p(y) (to MAXIMIZE)."""
    n = X.shape[0]
    L, LB, c, A2, psi0, sigma2 = _common(kernel, params, X, y, X_variance)
    return (
        -0.5 * n * (_LOG2PI + jnp.log(sigma2))
        - jnp.sum(jnp.log(jnp.diagonal(LB)))
        - 0.5 * (y @ y) / sigma2
        + 0.5 * jnp.sum(c * c)
        - 0.5 * psi0 / sigma2
        + 0.5 * jnp.trace(A2)
    )


@partial(jax.jit, static_argnums=0)
def posterior(kernel: Kernel, params, X, y, X_variance):
    """Posterior cache (L, LB, beta) compatible with ``sgpr.predict`` /
    ``sgpr.predict_mean_grad`` / ``sgpr.predict_var_grad`` at deterministic
    test inputs: μ(x*) = k(x*, Z) β."""
    L, LB, c, _, _, _ = _common(kernel, params, X, y, X_variance)
    tmp = tri_solve(LB, c, lower=True, trans=True)
    beta = tri_solve(L, tmp, lower=True, trans=True)[:, 0]
    return L, LB, beta
