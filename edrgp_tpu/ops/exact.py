"""Exact GP regression math: NLML, posterior prediction, predictive gradients.

Implements natively what the reference obtains from GPy (SURVEY.md §2.2
G2-G4; call sites ``gp_model/base.py:69,187,206,222``):

  * :func:`nlml` — negative log marginal likelihood of (θ, X, y), a pure
    jitted function differentiable in θ for ML-II.
  * :func:`posterior` — Cholesky cache (L, α) for repeated prediction.
  * :func:`predict` — posterior mean/variance at test points.
  * :func:`predict_mean_grad` — dμ/dx*, the EDR workhorse (north-star op).

All params are pytrees ``{"kernel": ..., "raw_noise": ...}`` in unconstrained
space.  y is expected already normalized (the estimator layer owns the
``normalizer=True`` semantics of ``regression.py:26-30``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .kernels import Kernel, positive
from .linalg import cho_solve, logdet_from_chol, safe_cholesky, tri_solve

__all__ = [
    "nlml", "posterior", "predict", "predict_mean_grad", "predict_var_grad",
    "predict_mean_grad_batched", "predict_var_grad_batched", "map_batched",
    "grad_batch_size", "weighted_kernel_grad", "grad_rows",
    "predict_full_cov", "posterior_samples_f", "noise_variance",
]

_LOG2PI = math.log(2.0 * math.pi)


def noise_variance(params) -> jnp.ndarray:
    return positive(params["raw_noise"])


def _Ky(kernel: Kernel, params, X):
    K = kernel.K(params["kernel"], X, X)
    n = X.shape[0]
    return K + noise_variance(params) * jnp.eye(n, dtype=K.dtype)


# --------------------------------------------------------------------------
# Fused RBF NLML adjoint: the dK → d(ℓ, σ², σₙ²) contraction is the last
# non-factorization term of the headline value+grad anatomy (~3.5 ms of
# 38.6 at N=10k — BENCH_NOTES r4 "adjoint floor").  XLA's autodiff makes
# several [N, N] HBM passes (saved exp residual + elementwise products +
# two gemms); the Pallas backward recomputes K tile-wise in VMEM and reads
# the [N, N] cotangent exactly once.  Forward numerics are IDENTICAL to
# the stock path (same sq_dist/exp composition); only the backward route
# changes.  VALID ONLY FOR SYMMETRIC dL/dK COTANGENTS — true by
# construction here, where the only consumer is logdet_and_quad's adjoint
# W = g_ld·K⁻¹ − g_q·ααᵀ.  Keep this function private to the NLML path.
# --------------------------------------------------------------------------

_PALLAS_NLML_ANNOUNCED = False


@jax.custom_vjp
def _rbf_ky_fused(ls, var, noise, X):
    """Ky = σ²·exp(−½‖(xᵢ−xⱼ)/ℓ‖²) + σₙ²·I with a fused-Pallas backward.

    ``ls`` arrives broadcast to [Q] (constrained space) so the cotangent
    reduction for isotropic kernels happens in the caller's broadcast."""
    from .kernels import sq_dist
    Xs = X / ls
    K = var * jnp.exp(-0.5 * sq_dist(Xs, Xs))
    return K + noise * jnp.eye(X.shape[0], dtype=K.dtype)


def _rbf_ky_fwd(ls, var, noise, X):
    return _rbf_ky_fused(ls, var, noise, X), (ls, var, X)


def _rbf_ky_bwd(res, W):
    from ..config import on_tpu
    from .pallas.rbf import rbf_nlml_adjoint
    ls, var, X = res
    Xs = X / ls
    # P = (W∘K)·Xs, r = (W∘K)·1 — all O(N²) work, one read of W
    P, r = rbf_nlml_adjoint(X, W, ls, var, precision="high",
                            interpret=not on_tpu())
    P = P.astype(X.dtype)
    r = r.astype(X.dtype)
    dvar = jnp.sum(r) / var
    # symmetric W: Σᵢⱼ A_ij (xs_iq − xs_jq)² = 2Σᵢ rᵢ xs_iq² − 2Σᵢ xs_iq P_iq
    dls = 2.0 * jnp.sum(r[:, None] * Xs * Xs - Xs * P, axis=0) / ls
    dnoise = jnp.trace(W)
    dX = 2.0 * (P - Xs * r[:, None]) / ls
    return dls, dvar, dnoise, dX


_rbf_ky_fused.defvjp(_rbf_ky_fwd, _rbf_ky_bwd)


def _Ky_for_nlml(kernel: Kernel, params, X):
    """_Ky with the fused-adjoint fast path when eligible (see the knob
    ``EDRGP_PALLAS_NLML`` / :func:`edrgp_tpu.config.pallas_nlml_mode`)."""
    from ..config import on_tpu, pallas_nlml_mode
    from .kernels import RBF
    mode = pallas_nlml_mode()
    if (mode != "off" and type(kernel) is RBF
            and kernel.active_dims is None and X.dtype == jnp.float32):
        if mode == "force" or (on_tpu() and X.shape[0] >= 2048):
            global _PALLAS_NLML_ANNOUNCED
            if not _PALLAS_NLML_ANNOUNCED:
                _PALLAS_NLML_ANNOUNCED = True
                import logging
                logging.getLogger("edrgp_tpu").info(
                    "nlml: fused-Pallas kernel adjoint engaged (mode=%s, "
                    "N=%d; set EDRGP_PALLAS_NLML=off to disable)",
                    mode, X.shape[0])
            ls = jnp.broadcast_to(positive(params["kernel"]["lengthscale"]),
                                  (X.shape[1],))
            var = positive(params["kernel"]["variance"])
            return _rbf_ky_fused(ls, var, noise_variance(params), X)
    return _Ky(kernel, params, X)


@partial(jax.jit, static_argnums=0)
def nlml(kernel: Kernel, params, X: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Negative log marginal likelihood; y shape [N].

    Reverse-mode differentiates through :func:`logdet_and_quad`'s analytic
    adjoint (trace-form dNLML/dK) rather than the Cholesky factorization —
    the difference between the reference engine's O(N³) LAPACK gradient
    path and a naive autodiff one.  On TPU f32 plain-RBF problems the
    remaining dK → dθ contraction dispatches to the fused Pallas adjoint
    (:func:`_rbf_ky_fused`).
    """
    from .linalg import logdet_and_quad
    n = X.shape[0]
    logdet, quad = logdet_and_quad(_Ky_for_nlml(kernel, params, X), y)
    return 0.5 * (n * _LOG2PI + logdet + quad)


@partial(jax.jit, static_argnums=0)
def posterior(kernel: Kernel, params, X, y):
    """Posterior cache: (L, alpha) with L = chol(K + σ²I), α = (K+σ²I)⁻¹ y."""
    L = safe_cholesky(_Ky(kernel, params, X))
    alpha = cho_solve(L, y[:, None])[:, 0]
    return L, alpha


@partial(jax.jit, static_argnums=(0, 5))
def predict(kernel: Kernel, params, X, cache, Xnew, include_likelihood: bool = True):
    """Posterior mean and variance at Xnew.

    Matches GPy's ``model.predict`` semantics (likelihood noise added to the
    variance by default — reference reads it at ``gp_model/base.py:187,206``).
    Returns (mean [M], var [M]).
    """
    L, alpha = cache
    Ks = kernel.K(params["kernel"], X, Xnew)          # [N, M]
    mean = Ks.T @ alpha
    v = tri_solve(L, Ks, lower=True)                   # [N, M]
    kss = kernel.Kdiag(params["kernel"], Xnew)
    var = jnp.maximum(kss - jnp.sum(v * v, axis=0), 1e-15)
    if include_likelihood:
        var = var + noise_variance(params)
    return mean, var


@partial(jax.jit, static_argnums=0)
def predict_full_cov(kernel: Kernel, params, X, cache, Xnew):
    """Posterior mean and FULL covariance at Xnew (latent, no noise)."""
    L, alpha = cache
    Ks = kernel.K(params["kernel"], X, Xnew)
    mean = Ks.T @ alpha
    v = tri_solve(L, Ks, lower=True)
    Kss = kernel.K(params["kernel"], Xnew, Xnew)
    cov = Kss - v.T @ v
    return mean, cov


@partial(jax.jit, static_argnums=(0, 5))
def posterior_samples_f(kernel: Kernel, params, X, cache, Xnew,
                        size: int = 10, key=None):
    """Draw ``size`` joint samples of the latent function at Xnew: [size, M]."""
    if key is None:
        key = jax.random.PRNGKey(0)
    mean, cov = predict_full_cov(kernel, params, X, cache, Xnew)
    Lc = safe_cholesky(cov)
    eps = jax.random.normal(key, (size, Xnew.shape[0]), mean.dtype)
    return mean[None, :] + eps @ Lc.T


def map_batched(fn, Xnew: jnp.ndarray, batch: int):
    """Apply a row-batched ``fn([b, Q]) -> [b, ...]`` over Xnew in chunks.

    ``lax.map`` over static-size chunks keeps one [batch, N] pushforward
    live at a time, so gradient extraction scales to M in the millions
    without materializing the [M, N] cross-kernel the one-shot vmap path
    implies (the EDR-at-scale requirement — the reference evaluates
    ``predictive_gradients`` at every training row, ``base.py:485``).
    """
    M = Xnew.shape[0]
    if M <= batch:
        return fn(Xnew)
    nb = -(-M // batch)
    pad = nb * batch - M
    Xp = jnp.pad(Xnew, ((0, pad),) + ((0, 0),) * (Xnew.ndim - 1))
    out = jax.lax.map(fn, Xp.reshape((nb, batch) + Xnew.shape[1:]))
    return out.reshape((nb * batch,) + out.shape[2:])[:M]


def grad_batch_size(M: int, N: int, budget_elems: int = 1 << 26) -> int:
    """Auto chunk size for gradient extraction: bound the [batch, N]
    pushforward tile to ~``budget_elems`` (256 MiB at f32 by default),
    quantized to powers of two so recompiles stay rare."""
    if M * max(N, 1) <= budget_elems:
        return M
    b = max(budget_elems // max(N, 1), 256)
    return 1 << (b.bit_length() - 1)


def weighted_kernel_grad(kernel: Kernel, kparams, C, w, Xnew):
    """∇ₓ Σᵢ wᵢ k(x, cᵢ) at each row of Xnew — the shared core of every
    predictive-gradient path (exact: C=X, w=α; SGPR/SVGP: C=Z, w=β)."""

    def mean_one(x):
        return (kernel.K(kparams, x[None, :], C)[0] * w).sum()

    return jax.vmap(jax.grad(mean_one))(Xnew)


_PALLAS_GRAD_ANNOUNCED = False


def _pallas_grad_dispatch(kernel: Kernel, kparams, C, w, Xnew):
    """Fused-Pallas fast path for the weighted RBF kernel gradient, or None.

    On TPU float32 with a plain full-dimension RBF kernel, the fused
    ``rbf_grad_mu`` kernel never materializes the [M, N] cross-kernel in
    HBM and measured 1.4–1.8× the chunked-autodiff path at M=1e5–1e6
    (results/pallas_tpu_r4.log, pallas_precision_r4.log) at 4e-5 relative
    error (in-kernel 3-pass hi/lo bf16 dots).  Dispatch is trace-time:
    small problems and every non-RBF / non-TPU / f64 case keep the
    generic autodiff path.

    Overridable via ``EDRGP_PALLAS_GRAD`` /
    :func:`edrgp_tpu.config.set_pallas_grad_mode`: ``off`` forces the exact
    autodiff path everywhere; ``force`` dispatches every structurally
    eligible call (RBF/f32) regardless of platform and size (interpret
    mode off-TPU).  The first engagement is logged once.
    """
    from ..config import on_tpu, pallas_grad_mode
    from .kernels import RBF
    mode = pallas_grad_mode()
    if mode == "off":
        return None
    eligible = (type(kernel) is RBF and kernel.active_dims is None
                and Xnew.dtype == jnp.float32 and C.dtype == jnp.float32)
    if not eligible:
        return None
    tpu = on_tpu()
    if mode == "auto" and not (tpu and Xnew.shape[0] * C.shape[0] >= (1 << 22)):
        return None
    global _PALLAS_GRAD_ANNOUNCED
    if not _PALLAS_GRAD_ANNOUNCED:
        _PALLAS_GRAD_ANNOUNCED = True
        import logging
        logging.getLogger("edrgp_tpu").info(
            "predictive_gradients: fused-Pallas fast path engaged "
            "(mode=%s, M=%d, N=%d; ~4e-5 relative vs autodiff; "
            "set EDRGP_PALLAS_GRAD=off to disable)",
            mode, Xnew.shape[0], C.shape[0])
    from .pallas.rbf import rbf_grad_mu
    ls = positive(kparams["lengthscale"])
    sigma2 = positive(kparams["variance"])
    return rbf_grad_mu(Xnew, C, w, ls, sigma2, precision="high",
                       interpret=not tpu)


def grad_rows(kernel: Kernel, kparams, C, w, Xrows, batch: int):
    """Traceable core of every batched predictive-gradient path:
    fused-Pallas dispatch when eligible, else ``batch``-row-chunked
    autodiff.  Shared by :func:`predict_mean_grad_batched`, the
    SGPR/SVGP counterparts, and the shard-local gradient extraction in
    :mod:`edrgp_tpu.parallel.edr_sharded` (so the sharded EDR composition
    and the single-device path are numerically the same program)."""
    fast = _pallas_grad_dispatch(kernel, kparams, C, w, Xrows)
    if fast is not None:
        return fast
    return map_batched(
        lambda c: weighted_kernel_grad(kernel, kparams, C, w, c),
        Xrows, batch)


@partial(jax.jit, static_argnums=0)
def predict_mean_grad(kernel: Kernel, params, X, alpha, Xnew):
    """dμ/dx* at each test point: [M, Q].

    Generic over any kernel composition via reverse-mode autodiff of the
    posterior mean μ(x*) = k(x*, X) α, vmapped across test points so the
    k(x*, X) evaluations batch into MXU matmuls.  This is the exact analogue
    of GPy's ``predictive_gradients(X)[0][:, :, 0]``
    (``gp_model/base.py:222``).
    """
    return weighted_kernel_grad(kernel, params["kernel"], X, alpha, Xnew)


@partial(jax.jit, static_argnums=(0, 5))
def predict_mean_grad_batched(kernel: Kernel, params, X, alpha, Xnew,
                              batch: int = 4096):
    """dμ/dx* in ``batch``-row chunks of test points (see
    :func:`map_batched`); same values as :func:`predict_mean_grad` (up to
    the fused-Pallas fast path's 4e-5 on large TPU-f32 RBF problems)."""
    return grad_rows(kernel, params["kernel"], X, alpha, Xnew, batch)


def _var_grad(kernel: Kernel, kp, X, L, Xnew):
    def var_one(x):
        ks = kernel.K(kp, x[None, :], X)[0]
        v = tri_solve(L, ks[:, None], lower=True)[:, 0]
        kss = kernel.Kdiag(kp, x[None, :])[0]
        return kss - v @ v

    return jax.vmap(jax.grad(var_one))(Xnew)


@partial(jax.jit, static_argnums=0)
def predict_var_grad(kernel: Kernel, params, X, cache, Xnew):
    """d var/dx* at each test point: [M, Q] (GPy predictive_gradients[1])."""
    L, _ = cache
    return _var_grad(kernel, params["kernel"], X, L, Xnew)


@partial(jax.jit, static_argnums=(0, 5))
def predict_var_grad_batched(kernel: Kernel, params, X, cache, Xnew,
                             batch: int = 4096):
    """d var/dx* in ``batch``-row chunks (see :func:`map_batched`)."""
    L, _ = cache
    kp = params["kernel"]
    return map_batched(lambda c: _var_grad(kernel, kp, X, L, c), Xnew, batch)
