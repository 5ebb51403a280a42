"""Titsias sparse GP regression (collapsed variational bound).

Native replacement for ``GPy.models.SparseGPRegression`` (bound at
``/root/reference/edrgp/gp_model/regression.py:153-157``; behavioural
contract: the optimized bound approaches the exact NLML on easy data —
``tests/test_edr.py:33-50`` asserts an absolute gap < 0.5).

All heavy ops are MXU matmuls (Kuf Kfu products) and M×M Cholesky
factorizations — the N×N kernel matrix is never materialized, which is the
whole point on HBM-bandwidth-limited hardware.

Parametrization: ``params = {"kernel": ..., "raw_noise": ..., "Z": [M, Q]}``;
inducing inputs Z are optimized jointly (unconstrained), matching GPy's
default behaviour.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .kernels import Kernel, positive
from .linalg import safe_cholesky, tri_solve

__all__ = ["elbo", "sgpr_posterior", "predict", "predict_mean_grad",
           "predict_mean_grad_batched", "predict_var_grad"]

_LOG2PI = math.log(2.0 * math.pi)


def _common(kernel: Kernel, params, X, y):
    """Shared factorizations: L=chol(Kuu), A=L⁻¹Kuf/σ, LB=chol(I+AAᵀ), c."""
    Z = params["Z"]
    sigma2 = positive(params["raw_noise"])
    sigma = jnp.sqrt(sigma2)
    Kuu = kernel.K(params["kernel"], Z, Z)
    Kuf = kernel.K(params["kernel"], Z, X)
    L = safe_cholesky(Kuu)
    A = tri_solve(L, Kuf, lower=True) / sigma                    # [M, N]
    B = A @ A.T + jnp.eye(Z.shape[0], dtype=A.dtype)
    LB = safe_cholesky(B)
    Ay = A @ y[:, None] / sigma                                   # [M, 1]
    c = tri_solve(LB, Ay, lower=True)                             # [M, 1]
    return L, A, LB, c, sigma2


@partial(jax.jit, static_argnums=0)
def elbo(kernel: Kernel, params, X, y) -> jnp.ndarray:
    """Titsias collapsed lower bound on log p(y) (scalar, to MAXIMIZE)."""
    n = X.shape[0]
    L, A, LB, c, sigma2 = _common(kernel, params, X, y)
    kdiag = kernel.Kdiag(params["kernel"], X)
    bound = (
        -0.5 * n * _LOG2PI
        - jnp.sum(jnp.log(jnp.diagonal(LB)))
        - 0.5 * n * jnp.log(sigma2)
        - 0.5 * (y @ y) / sigma2
        + 0.5 * jnp.sum(c * c)
        - 0.5 * jnp.sum(kdiag) / sigma2       # -1/(2σ²) tr(Kff)
        + 0.5 * jnp.sum(A * A)                 # +1/(2σ²) tr(Qff)
    )
    return bound


@partial(jax.jit, static_argnums=0)
def sgpr_posterior(kernel: Kernel, params, X, y):
    """Posterior cache for prediction: (L, LB, beta) with μ(x*) = k(x*,Z) β."""
    L, A, LB, c, _ = _common(kernel, params, X, y)
    tmp = tri_solve(LB, c, lower=True, trans=True)                # LB⁻ᵀ c
    beta = tri_solve(L, tmp, lower=True, trans=True)[:, 0]        # L⁻ᵀ LB⁻ᵀ c
    return L, LB, beta


@partial(jax.jit, static_argnums=(0, 5))
def predict(kernel: Kernel, params, cache, Xnew, _unused=None,
            include_likelihood: bool = True):
    """Sparse posterior mean/variance at Xnew (GPy predict semantics)."""
    L, LB, beta = cache
    Z = params["Z"]
    Kus = kernel.K(params["kernel"], Z, Xnew)                     # [M, S]
    mean = Kus.T @ beta
    tmp1 = tri_solve(L, Kus, lower=True)                          # L⁻¹ Kus
    tmp2 = tri_solve(LB, tmp1, lower=True)                        # LB⁻¹ L⁻¹ Kus
    kss = kernel.Kdiag(params["kernel"], Xnew)
    var = kss - jnp.sum(tmp1 * tmp1, axis=0) + jnp.sum(tmp2 * tmp2, axis=0)
    var = jnp.maximum(var, 1e-15)
    if include_likelihood:
        var = var + positive(params["raw_noise"])
    return mean, var


@partial(jax.jit, static_argnums=0)
def predict_var_grad(kernel: Kernel, params, cache, Xnew):
    """d var/dx* for the sparse posterior: [S, Q] (GPy sparse
    ``predictive_gradients(X)[1]`` parity)."""
    L, LB, _ = cache
    kp = params["kernel"]
    Z = params["Z"]

    def var_one(x):
        kus = kernel.K(kp, Z, x[None, :])
        t1 = tri_solve(L, kus, lower=True)
        t2 = tri_solve(LB, t1, lower=True)
        kss = kernel.Kdiag(kp, x[None, :])[0]
        return kss - jnp.sum(t1 * t1) + jnp.sum(t2 * t2)

    return jax.vmap(jax.grad(var_one))(Xnew)


@partial(jax.jit, static_argnums=0)
def predict_mean_grad(kernel: Kernel, params, beta, Xnew):
    """dμ/dx* for the sparse posterior: [S, Q] (same contract as exact)."""
    from .exact import weighted_kernel_grad
    return weighted_kernel_grad(kernel, params["kernel"], params["Z"],
                                beta, Xnew)


@partial(jax.jit, static_argnums=(0, 4))
def predict_mean_grad_batched(kernel: Kernel, params, beta, Xnew,
                              batch: int = 8192):
    """dμ/dx* in ``batch``-row chunks (scales to M in the millions)."""
    from .exact import grad_rows
    return grad_rows(kernel, params["kernel"], params["Z"], beta, Xnew,
                     batch)
