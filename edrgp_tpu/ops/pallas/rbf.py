"""Pallas TPU kernels for the RBF-ARD hot path.

Two fused kernels (SURVEY.md §2.2 G1/G4 — the ops GPy implements in C):

* :func:`rbf_kernel_matrix` — blocked K(X₁,X₂) construction: the pairwise
  squared distance lands on the MXU as a matmul, and the exp/scale tail is
  fused in VMEM so the only HBM traffic is the inputs once and the output
  once.
* :func:`rbf_grad_mu` — the EDR workhorse dμ/dx* computed WITHOUT ever
  materializing the [M, N] cross-kernel in HBM: per (test-tile, train-tile)
  the kernel block is built in VMEM, weighted by α, and immediately
  contracted into the [M, Q] gradient accumulator.  HBM traffic drops from
  O(M·N) to O((M+N)·Q) — the difference between bandwidth-bound and
  compute-bound at large N.

Both kernels take *scaled* inputs (X/ℓ) so ARD lengthscales are free, and
run in float32 (TPU native).  Use ``interpret=True`` for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rbf_kernel_matrix", "rbf_grad_mu", "rbf_nlml_adjoint"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(a, target):
    pad = target - a.shape[0]
    if pad == 0:
        return a
    return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))


# --------------------------------------------------------------------------
# K(X1, X2) = σ² exp(−½‖x1/ℓ − x2/ℓ‖²)
# --------------------------------------------------------------------------

def _dot(a, b, precision, b_dim=1):
    """MXU dot contracting a's dim 1 with b's dim ``b_dim``, at the
    requested precision.

    Mosaic's single-pass f32 dot rounds operands to bf16 (~5e-3 relative
    error on K — acceptable for subspace extraction, not for parity-grade
    prediction).  ``precision='high'`` emulates fp32 with the classic
    3-pass hi/lo bf16 split (what XLA's HIGH does): a·b ≈ aₕbₕ + aₕbₗ +
    aₗbₕ, recovering ~1e-6 relative error at 3× MXU passes.
    """
    dims = (((1,), (b_dim,)), ((), ()))
    dot = lambda x, y: jax.lax.dot_general(  # noqa: E731
        x, y, dims, preferred_element_type=jnp.float32)
    if precision == "default":
        return dot(a, b)
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _dot_nt(a, b, precision):
    """a · bᵀ (contract both dim 1)."""
    return _dot(a, b, precision, b_dim=1)


def _kmat_kernel(x1_ref, x2_ref, sig_ref, out_ref, *, precision):
    a = x1_ref[:]                                   # [TM, Q]
    b = x2_ref[:]                                   # [TN, Q]
    a2 = jnp.sum(a * a, axis=1, keepdims=True)      # [TM, 1]
    b2 = jnp.sum(b * b, axis=1, keepdims=True).T    # [1, TN]
    ab = _dot_nt(a, b, precision)
    sq = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    out_ref[:] = sig_ref[0, 0] * jnp.exp(-0.5 * sq)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "interpret", "precision"))
def rbf_kernel_matrix(X1s: jnp.ndarray, X2s: jnp.ndarray, sigma2,
                      *, block_m: int = 256, block_n: int = 256,
                      interpret: bool = False,
                      precision: str = "default") -> jnp.ndarray:
    """σ²·exp(−½‖x1−x2‖²) for pre-scaled inputs X1s=[M,Q], X2s=[N,Q]."""
    M, Q = X1s.shape
    N = X2s.shape[0]
    Mp, Np = _round_up(M, block_m), _round_up(N, block_n)
    X1p = _pad_rows(X1s.astype(jnp.float32), Mp)
    X2p = _pad_rows(X2s.astype(jnp.float32), Np)
    sig = jnp.asarray(sigma2, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_kmat_kernel, precision=precision),
        grid=(Mp // block_m, Np // block_n),
        in_specs=[
            pl.BlockSpec((block_m, Q), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, Q), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        interpret=interpret,
    )(X1p, X2p, sig)
    return out[:M, :N]


# --------------------------------------------------------------------------
# dμ/dx*: G[m] = Σᵢ αᵢ K(x*_m, xᵢ)(xᵢ − x*_m)  (scaled coords; ÷ℓ outside)
# --------------------------------------------------------------------------

def _gradmu_kernel(xs_ref, xt_ref, al_ref, sig_ref, g_ref, w_ref, *,
                   precision):
    j = pl.program_id(1)

    a = xs_ref[:]                                   # [TM, Q] test tile
    b = xt_ref[:]                                   # [TN, Q] train tile
    al = al_ref[:]                                  # [TN, 1]
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True).T
    ab = _dot_nt(a, b, precision)
    sq = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    W = sig_ref[0, 0] * jnp.exp(-0.5 * sq) * al[:, 0][None, :]   # [TM, TN]

    g_inc = _dot(W, b, precision, b_dim=0)
    w_inc = jnp.sum(W, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        g_ref[:] = g_inc
        w_ref[:] = w_inc

    @pl.when(j != 0)
    def _():
        g_ref[:] = g_ref[:] + g_inc
        w_ref[:] = w_ref[:] + w_inc


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "interpret", "precision"))
def rbf_grad_mu(Xnew: jnp.ndarray, X: jnp.ndarray, alpha: jnp.ndarray,
                lengthscale, sigma2, *, block_m: int = 256,
                block_n: int = 512, interpret: bool = False,
                precision: str = "default") -> jnp.ndarray:
    """dμ/dx* for an RBF-ARD posterior mean μ(x*) = Σᵢ αᵢ k(x*, xᵢ).

    Xnew [M, Q], X [N, Q] unscaled; lengthscale scalar or [Q]; returns
    [M, Q].  Matches ``exact.predict_mean_grad`` for RBF kernels
    (``gp_model/base.py:222`` contract) at a fraction of the HBM traffic.
    """
    M, Q = Xnew.shape
    N = X.shape[0]
    ls = jnp.broadcast_to(jnp.asarray(lengthscale, jnp.float32), (Q,))
    Xs = (Xnew / ls).astype(jnp.float32)
    Xt = (X / ls).astype(jnp.float32)

    Mp, Np = _round_up(M, block_m), _round_up(N, block_n)
    Xsp = _pad_rows(Xs, Mp)
    Xtp = _pad_rows(Xt, Np)
    # padded training rows carry α=0 ⇒ contribute nothing
    alp = _pad_rows(alpha.astype(jnp.float32).reshape(-1, 1), Np)
    sig = jnp.asarray(sigma2, jnp.float32).reshape(1, 1)

    g_raw, w_sum = pl.pallas_call(
        functools.partial(_gradmu_kernel, precision=precision),
        grid=(Mp // block_m, Np // block_n),
        in_specs=[
            pl.BlockSpec((block_m, Q), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, Q), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, Q), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, Q), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(Xsp, Xtp, alp, sig)

    # G = (Σ W xs_i − xs* Σ W)/ℓ  (scaled-coordinate identity)
    g = (g_raw[:M] - Xs[:M] * w_sum[:M]) / ls
    return g


# --------------------------------------------------------------------------
# NLML kernel-parameter adjoint contractions: A = W ∘ K(X, X),
# P = A·Xs [N, Q] and r = A·1 [N] — everything the dNLML/d(ℓ, σ², X)
# chain needs for SYMMETRIC W, without materializing A (or re-reading K)
# in HBM.  See exact._rbf_ky_fused for the calculus.
# --------------------------------------------------------------------------

def _kadj_kernel(x1_ref, x2_ref, w_ref, sig_ref, p_ref, r_ref, *, precision):
    j = pl.program_id(1)

    a = x1_ref[:]                                   # [TM, Q] scaled rows
    b = x2_ref[:]                                   # [TN, Q] scaled rows
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True).T
    ab = _dot_nt(a, b, precision)
    sq = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    A = w_ref[:] * (sig_ref[0, 0] * jnp.exp(-0.5 * sq))   # [TM, TN]

    p_inc = _dot(A, b, precision, b_dim=0)          # [TM, Q]
    r_inc = jnp.sum(A, axis=1, keepdims=True)       # [TM, 1]

    @pl.when(j == 0)
    def _():
        p_ref[:] = p_inc
        r_ref[:] = r_inc

    @pl.when(j != 0)
    def _():
        p_ref[:] = p_ref[:] + p_inc
        r_ref[:] = r_ref[:] + r_inc


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "interpret", "precision"))
def rbf_nlml_adjoint(X: jnp.ndarray, W: jnp.ndarray, lengthscale, sigma2,
                     *, block_m: int = 256, block_n: int = 512,
                     interpret: bool = False,
                     precision: str = "high"):
    """(P, r) with P = (W∘K)·Xs [N, Q] and r = (W∘K)·1 [N].

    X [N, Q] unscaled, W [N, N] the dL/dK cotangent.  K is recomputed
    tile-wise in VMEM (never read from HBM), so the only O(N²) HBM
    traffic is reading W once — versus the XLA autodiff path's multiple
    [N, N] elementwise passes plus the saved-exp residual.  Row/column
    sums are NOT symmetrized here; callers needing the full adjoint for
    non-symmetric W must call twice (W and Wᵀ).
    """
    N, Q = X.shape
    ls = jnp.broadcast_to(jnp.asarray(lengthscale, jnp.float32), (Q,))
    Xs = (X / ls).astype(jnp.float32)

    Np_m = _round_up(N, block_m)
    Np_n = _round_up(N, block_n)
    Xs_m = _pad_rows(Xs, Np_m)
    Xs_n = _pad_rows(Xs, Np_n)
    # zero-padded W rows/cols zero out A for every padded pair
    Wp = jnp.pad(W.astype(jnp.float32),
                 ((0, Np_m - N), (0, Np_n - N)))
    sig = jnp.asarray(sigma2, jnp.float32).reshape(1, 1)

    P, r = pl.pallas_call(
        functools.partial(_kadj_kernel, precision=precision),
        grid=(Np_m // block_m, Np_n // block_n),
        in_specs=[
            pl.BlockSpec((block_m, Q), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, Q), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, Q), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np_m, Q), jnp.float32),
            jax.ShapeDtypeStruct((Np_m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(Xs_m, Xs_n, Wp, sig)
    return P[:N], r[:N, 0]
