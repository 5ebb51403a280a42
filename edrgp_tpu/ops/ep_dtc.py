"""EP-DTC: Expectation Propagation on the DTC (projected-process) prior.

GPy's ``SparseGPClassification`` — the model bound at the reference's
sparse-classifier call site
(``/root/reference/edrgp/gp_model/classification.py:146-149``) — runs EP
under the DTC sparse prior.  Round 2 covered the capability with whitened
sparse VI (:mod:`edrgp_tpu.ops.vgp`); this module implements the actual
EP-DTC inference so ``inference="ep"`` exists on the sparse classifier
(VERDICT r2 stretch item 8).

Model: whitened inducing variables u ~ N(0, I_M); latent at the data is
the deterministic projection f = P u with P = K_nm L_m^{-T}
(L_m = chol(K_mm)), i.e. the degenerate DTC prior f ~ N(0, Q),
Q = K_nm K_mm^{-1} K_mn.  Probit sites t̃_i(f_i) = exp(ν̃_i f_i − τ̃_i f_i²/2)
act on the N projections, so the posterior over u stays M-dimensional:

    Λ = I_M + Pᵀ S̃ P,   b = Pᵀ ν̃,   u | data ~ N(Λ⁻¹ b, Λ⁻¹)

and every EP sweep costs O(N M²) MXU gemms + one M×M Cholesky — the same
damped-parallel update scheme as the full model (:mod:`edrgp_tpu.ops.ep`),
one ``lax.while_loop`` inside ``jit``.

The EP evidence is kept in its *stationary* arrangement

    log Z_EP = log Z_gauss(θ; sites) + Σ_i [ log Ẑ_i − log G_i ],
    log Z_gauss = −Σ log diag(L_Λ) + ½ ‖L_Λ^{-1} b‖²,
    G_i = ∫ N(f; μ_{-i}, σ_{-i}²) t̃_i(f) df,

which is stationary w.r.t. both the site and cavity parameters at an EP
fixed point (moment matching makes ∂logẐ_i and ∂logG_i w.r.t. the cavity
naturals equal, and ∂logZ_gauss/∂site cancel against ∂logG_i/∂site).  The
hyperparameter gradient with all site/cavity terms stop-gradiented is
therefore the exact total derivative — the DTC analogue of GPML eq. 5.27,
verified against finite differences in ``tests/test_ep.py``.  With Z = X
(M = N) the DTC prior equals the full prior, and value/marginals reduce
exactly to :func:`edrgp_tpu.ops.ep.ep_energy` — also tested.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .ep import EPState, _cavity, _probit_moments, _site_tiny
from .kernels import Kernel
from .linalg import safe_cholesky, tri_solve

__all__ = ["ep_dtc_fit", "ep_dtc_energy", "ep_dtc_neg_energy_objective",
           "ep_dtc_posterior_cache", "ep_dtc_predict_latent"]


def _projection(kernel: Kernel, params, X):
    """P = K_nm L_m^{-T} ([N, M]) and L_m for the current hyperparameters."""
    Z = params["Z"]
    Kmm = kernel.K(params["kernel"], Z, Z)
    Lm = safe_cholesky(Kmm)
    Knm = kernel.K(params["kernel"], X, Z)               # [N, M]
    P = tri_solve(Lm, Knm.T, lower=True).T               # K_nm L_m^{-T}
    return P, Lm


def _dtc_marginals(P, nu, tau):
    """Posterior marginals (μ, σ², L_Λ, b) of f = P u given sites."""
    M = P.shape[1]
    Lam = jnp.eye(M, dtype=P.dtype) + P.T @ (tau[:, None] * P)
    LL = safe_cholesky(Lam)
    b = P.T @ nu
    u_mean = tri_solve(LL, tri_solve(LL, b[:, None], lower=True),
                       lower=True, trans=True)[:, 0]
    mu = P @ u_mean
    W = tri_solve(LL, P.T, lower=True)                   # [M, N] = L_Λ^{-1}Pᵀ
    sigma2 = jnp.sum(W * W, axis=0)
    return mu, jnp.maximum(sigma2, _site_tiny(P.dtype)), LL, b


def ep_dtc_site_loop(P, y_sign, *, damping: float = 0.5,
                     tol: float | None = None,
                     max_iters: int = 100) -> EPState:
    """Damped parallel EP to convergence at fixed projection P.
    Not differentiable (callers stop gradients; see :func:`ep_dtc_energy`)."""
    dtype = P.dtype
    n = P.shape[0]
    tiny = _site_tiny(dtype)
    if tol is None:
        tol = 1e-10 if dtype == jnp.float64 else 1e-5
    d = jnp.asarray(damping, dtype)

    def step(state):
        nu, tau, it, _ = state
        mu, sigma2, _, _ = _dtc_marginals(P, nu, tau)
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
def ep_dtc_fit(kernel: Kernel, params, X, y_sign, damping: float = 0.5,
               max_iters: int = 100) -> EPState:
    """Converged EP-DTC sites for (kernel, params) with params['Z']."""
    P, _ = _projection(kernel, params, X)
    state = ep_dtc_site_loop(lax.stop_gradient(P), y_sign, damping=damping,
                             max_iters=max_iters)
    return EPState(*[lax.stop_gradient(s) for s in state])


def ep_dtc_energy(kernel: Kernel, params, X, y_sign, nu, tau) -> jnp.ndarray:
    """EP-DTC log marginal likelihood at fixed sites (differentiable in
    the hyperparameters AND the inducing inputs params['Z'])."""
    P, _ = _projection(kernel, params, X)
    dtype = P.dtype
    tiny = _site_tiny(dtype)
    nu = lax.stop_gradient(nu)
    tau = lax.stop_gradient(tau)

    # Gaussian integral over u — the only θ-differentiable part.
    M = P.shape[1]
    Lam = jnp.eye(M, dtype=dtype) + P.T @ (tau[:, None] * P)
    LL = safe_cholesky(Lam)
    b = P.T @ nu
    v = tri_solve(LL, b[:, None], lower=True)[:, 0]
    core = -jnp.sum(jnp.log(jnp.diagonal(LL))) + 0.5 * (v @ v)

    # Site-local cavity corrections: stopped (stationary at the EP fixed
    # point — see module docstring).
    Png = lax.stop_gradient(P)
    mu, sigma2, _, _ = _dtc_marginals(Png, nu, tau)
    mu_cav, var_cav = _cavity(mu, sigma2, nu, tau, tiny)
    z = y_sign * mu_cav / jnp.sqrt(1.0 + var_cav)
    log_zhat = jax.scipy.stats.norm.logcdf(z)
    # log G_i = −½log(1+τ̃σ²_cav) + (μ_cav/σ²_cav+ν̃)²/(2(1/σ²_cav+τ̃))
    #           − μ_cav²/(2σ²_cav)
    prec_cav = 1.0 / var_cav
    log_g = (-0.5 * jnp.log1p(tau * var_cav)
             + (mu_cav * prec_cav + nu) ** 2 / (2.0 * (prec_cav + tau))
             - mu_cav ** 2 * prec_cav / 2.0)
    return core + lax.stop_gradient(jnp.sum(log_zhat - log_g))


def ep_dtc_neg_energy_objective(kernel: Kernel):
    """−log Z_EP-DTC(θ, Z) with EP re-converged inside each evaluation
    (EP-within-ML-II alternation as one jitted program)."""
    def objective(p, X, y_sign):
        P, _ = _projection(kernel, p, X)
        state = ep_dtc_site_loop(lax.stop_gradient(P), y_sign)
        return -ep_dtc_energy(kernel, p, X, y_sign, state.nu, state.tau)
    return objective


@partial(jax.jit, static_argnums=0)
def ep_dtc_posterior_cache(kernel: Kernel, params, X, nu, tau):
    """(u_mean, L_Λ, L_m): whitened posterior over the inducing values."""
    P, Lm = _projection(kernel, params, X)
    _, _, LL, b = _dtc_marginals(P, nu, tau)
    u_mean = tri_solve(LL, tri_solve(LL, b[:, None], lower=True),
                       lower=True, trans=True)[:, 0]
    return u_mean, LL, Lm


@partial(jax.jit, static_argnums=0)
def ep_dtc_predict_latent(kernel: Kernel, params, cache, Xnew):
    """Latent posterior mean/var at Xnew under the DTC approximation:
    μ* = p*ᵀ Λ⁻¹ b,  σ*² = k** − ‖p*‖² + ‖L_Λ^{-1} p*‖²  (the standard
    DTC predictive, healing the degenerate prior at test points)."""
    u_mean, LL, Lm = cache
    Z = params["Z"]
    Ksm = kernel.K(params["kernel"], Xnew, Z)            # [M*, M]
    Pstar = tri_solve(Lm, Ksm.T, lower=True)             # [M, M*] = L_m^{-1}K_ms
    mean = Pstar.T @ u_mean
    kss = kernel.Kdiag(params["kernel"], Xnew)
    W = tri_solve(LL, Pstar, lower=True)                 # [M, M*]
    var = kss - jnp.sum(Pstar * Pstar, axis=0) + jnp.sum(W * W, axis=0)
    return mean, jnp.maximum(var, _site_tiny(mean.dtype))
