"""Kernel-block-parallel exact GP: NLML value+grad sharded across a mesh.

The one SURVEY.md §2.3 axis the reference's model class even admits for
exact GPs ("Kernel-block parallel (≈TP): tiles of K(X,X) and batched
Cholesky across devices") — nothing like it exists in the reference, which
is single-process NumPy (SURVEY.md §2.3 header); this is a new design
obligation from BASELINE.json's north star ("blocked kernel-matrix
construction and Cholesky/triangular-solve ... scale across a multi-host
TPU pod slice").

Layout: the N×N system is sharded by contiguous ROW SLABS over one mesh
axis (shard s owns rows [s·L, (s+1)·L), L = N/p).  Every stage is a
``shard_map``-local computation plus explicit collectives:

  * K construction — each shard builds its own [L, N] slab of
    K(X,X) + σ²I from X_local and an all-gathered X (X is [N, Q] with
    small Q: cheap to replicate; the N×N matrix never materializes
    unsharded anywhere).
  * Cholesky — distributed right-looking blocked factorization, one block
    column per shard per step: the owner's diagonal block is broadcast
    (psum of a masked [L, L]), each shard forms its panel block with a
    local triangular solve, the [N, L] panel is all-gathered, and the
    trailing update is one local [L, L]×[L, N] gemm (MXU).  p steps,
    ~N² words moved per factorization.
  * solves / logdet — block forward+back substitution across shards
    (vector RHS: p cheap steps each), diagonal logs psum-reduced.
  * gradient — custom VJP in trace form (the same design as the
    single-device :func:`edrgp_tpu.ops.linalg.logdet_and_quad`):
    ∂/∂K = g_ld·K⁻¹ − g_q·ααᵀ.  K⁻¹'s row slabs are formed by a
    distributed column-slab ``trtri`` (row panels of L broadcast once per
    step, local gemms) followed by a ring ``lauum`` (column slabs of L⁻¹
    rotated around the mesh with ``ppermute``, one [L, N]ᵀ×[N, L] gemm per
    hop) — ICI-neighbor traffic only.

Per-shard memory is O(N²/p): with p=8 an N=10k fp32 problem drops from
~400 MB of HBM working set to ~50 MB, and N beyond single-chip HBM becomes
reachable.  The trailing update runs full-width with masking (static
shapes under ``jit``), spending ~2N³/p flops per shard vs the N³/3p ideal
— all of it MXU gemms; finer block-cyclic panels can recover the factor
later without changing the interface.

Equivalence with the single-device path is tested to 1e-7 on the 8-device
CPU mesh (``tests/test_exact_sharded.py``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import adjoint_precision
from ..ops.kernels import Kernel, positive

__all__ = ["make_sharded_nlml_value_and_grad", "sharded_nlml_value_and_grad",
           "make_sharded_nlml_objective", "shard_rows"]



def _ds(a, starts, sizes):
    """dynamic_slice with starts coerced to a common int32 (axis_index is
    int32; Python ints default to int64 under x64)."""
    return lax.dynamic_slice(
        a, tuple(jnp.asarray(x, jnp.int32) for x in starts), sizes)


def _dus(a, upd, starts):
    return lax.dynamic_update_slice(
        a, upd, tuple(jnp.asarray(x, jnp.int32) for x in starts))


def _bcast_from(x, src, axis):
    """Replicate shard ``src``'s value of ``x`` to every shard."""
    s = lax.axis_index(axis)
    return lax.psum(jnp.where(s == src, x, jnp.zeros_like(x)), axis)


def _distributed_cholesky(A_local: jnp.ndarray, axis: str, p: int):
    """In-place blocked right-looking Cholesky of a row-slab-sharded SPD
    matrix.  Returns the local [L, N] slab of L with the strict upper
    triangle zeroed."""
    L_rows, N = A_local.shape
    s = lax.axis_index(axis)
    prec = adjoint_precision()
    row_block = jnp.arange(N) // L_rows                     # [N]

    def step(k, A):
        colblk = _ds(A, (0, k * L_rows), (L_rows, L_rows))
        Lkk = jnp.linalg.cholesky(_bcast_from(colblk, k, axis))
        # panel block of this shard: P_s = A[:, k-slab] · Lkk⁻ᵀ
        panel = lax.linalg.triangular_solve(Lkk, colblk, left_side=False,
                                            lower=True, transpose_a=True)
        panel = jnp.where(s == k, Lkk, jnp.where(s > k, panel,
                                                 jnp.zeros_like(panel)))
        A = _dus(A, panel, (0, k * L_rows))
        # trailing update restricted to not-yet-finalized columns
        panel_all = lax.all_gather(panel, axis).reshape(N, L_rows)
        panel_all = jnp.where((row_block > k)[:, None], panel_all, 0.0)
        panel_own = jnp.where(s > k, panel, jnp.zeros_like(panel))
        A = A - jnp.matmul(panel_own, panel_all.T, precision=prec)
        return A

    A_local = lax.fori_loop(0, p, step, A_local)
    # zero the upper-triangle junk left by full-width trailing updates
    grow = s * L_rows + jnp.arange(L_rows)                  # global row ids
    col = jnp.arange(N)
    return jnp.where(col[None, :] <= grow[:, None], A_local, 0.0)


def _forward_substitute(L_local, y_local, axis: str, p: int):
    """Solve L z = y across row slabs; z returned replicated [N]."""
    Lr, N = L_local.shape
    s = lax.axis_index(axis)

    def step(k, z):
        # rows of slab k: residual uses z entries < k·L (later entries are 0)
        r = y_local - L_local @ z
        Lkk = _ds(L_local, (0, s * Lr), (Lr, Lr))
        zk = lax.linalg.triangular_solve(Lkk, r[:, None], left_side=True,
                                         lower=True)[:, 0]
        zk = _bcast_from(zk, k, axis)
        return _dus(z, zk, (k * Lr,))

    # promoted dtype: under x64, optax's linesearch evaluates the objective
    # at f64 step scalars, promoting params (hence L) to f64 while the data
    # stays f32 — the carry must live in the promoted type or the
    # dynamic_update_slice above rejects the mixed dtypes.
    dt = jnp.result_type(L_local.dtype, y_local.dtype)
    return lax.fori_loop(0, p, step, jnp.zeros((N,), dt))


def _backward_substitute(L_local, z_full, axis: str, p: int):
    """Solve Lᵀ α = z across row slabs; α returned replicated [N]."""
    Lr, N = L_local.shape
    s = lax.axis_index(axis)

    def step(d, a):
        i = p - 1 - d
        # each shard contributes (L[s-slab, i-slab])ᵀ · α_s  (zero until set)
        a_own = _ds(a, (s * Lr,), (Lr,))
        colblk = _ds(L_local, (0, i * Lr), (Lr, Lr))
        t = lax.psum(colblk.T @ a_own, axis)
        diag_own = _ds(L_local, (0, s * Lr), (Lr, Lr))
        Lii = _bcast_from(diag_own, i, axis)
        zi = _ds(z_full, (i * Lr,), (Lr,))
        ai = lax.linalg.triangular_solve(Lii, (zi - t)[:, None],
                                         left_side=True, lower=True,
                                         transpose_a=True)[:, 0]
        return _dus(a, ai, (i * Lr,))

    return lax.fori_loop(0, p, step, jnp.zeros((N,), z_full.dtype))


def _distributed_tri_inv_cols(L_local, axis: str, p: int):
    """Column-slab s of L⁻¹ ([N, L]) from row-slab-sharded L.

    Row panels of L are broadcast one block step at a time; each shard
    advances its own column of the forward recursion
    L⁻¹[i, s] = −L_ii⁻¹ · (L[i, s:i] · L⁻¹[s:i, s]) with a single local
    full-width gemm (rows of C not yet computed are zero, finalized rows
    of the broadcast panel multiply them away)."""
    Lr, N = L_local.shape
    s = lax.axis_index(axis)
    prec = adjoint_precision()
    eye = jnp.eye(Lr, dtype=L_local.dtype)

    def step(i, C):
        Lrow = _bcast_from(L_local, i, axis)                # [L, N] slab i
        Lii = _ds(Lrow, (0, i * Lr), (Lr, Lr))
        own = lax.linalg.triangular_solve(Lii, eye, left_side=True,
                                          lower=True)
        T = jnp.matmul(Lrow, C, precision=prec)             # [L, L]
        below = -lax.linalg.triangular_solve(Lii, T, left_side=True,
                                             lower=True)
        upd = jnp.where(i == s, own,
                        jnp.where(i > s, below, jnp.zeros_like(own)))
        return _dus(C, upd, (i * Lr, 0))

    return lax.fori_loop(0, p, step, jnp.zeros((N, Lr), L_local.dtype))


def _ring_lauum_rows(C_local, axis: str, p: int):
    """Row slab s of K⁻¹ = L⁻ᵀL⁻¹ from column slabs of L⁻¹.

    Block (s, j) = C_sᵀ C_j; the column slabs rotate around the mesh ring
    (``ppermute``), one [L, N]×[N, L] gemm per hop — p−1 neighbor
    transfers of [N, L], no all-gather of the N×N matrix anywhere."""
    N, Lr = C_local.shape
    s = lax.axis_index(axis)
    prec = adjoint_precision()
    perm = [(r, (r - 1) % p) for r in range(p)]

    def step(t, carry):
        K_rows, buf = carry
        j = (s + t) % p
        blk = jnp.matmul(C_local.T, buf, precision=prec)    # [L, L]
        K_rows = _dus(K_rows, blk, (0, j * Lr))
        buf = lax.ppermute(buf, axis, perm)
        return K_rows, buf

    K_rows0 = jnp.zeros((Lr, N), C_local.dtype)
    K_rows, _ = lax.fori_loop(0, p, step, (K_rows0, C_local))
    return K_rows


def _make_logdet_quad_sharded(axis: str, p: int):
    """(log|Ky|, yᵀKy⁻¹y) over a row-slab-sharded Ky with the trace-form
    adjoint, fully distributed in both passes."""

    @jax.custom_vjp
    def ldq(K_local, y_local):
        (ld, q), _ = _ldq_fwd(K_local, y_local)
        return ld, q

    def _ldq_fwd(K_local, y_local):
        Lr = K_local.shape[0]
        s = lax.axis_index(axis)
        L_local = _distributed_cholesky(K_local, axis, p)
        diag_own = _ds(L_local, (0, s * Lr), (Lr, Lr))
        logdet = lax.psum(2.0 * jnp.sum(jnp.log(jnp.diagonal(diag_own))),
                          axis)
        z = _forward_substitute(L_local, y_local, axis, p)
        alpha = _backward_substitute(L_local, z, axis, p)   # replicated [N]
        y_full = lax.all_gather(y_local, axis).reshape(-1)
        quad = y_full @ alpha
        return (logdet, quad), (L_local, alpha)

    def _ldq_bwd(res, cotangents):
        L_local, alpha = res
        g_ld, g_q = cotangents
        Lr = L_local.shape[0]
        s = lax.axis_index(axis)
        C_local = _distributed_tri_inv_cols(L_local, axis, p)
        Kinv_rows = _ring_lauum_rows(C_local, axis, p)      # [L, N]
        alpha_own = _ds(alpha, (s * Lr,), (Lr,))
        dK_local = g_ld * Kinv_rows - g_q * jnp.outer(alpha_own, alpha)
        dy_local = 2.0 * g_q * alpha_own
        return dK_local, dy_local

    ldq.defvjp(_ldq_fwd, _ldq_bwd)
    return ldq


def make_sharded_nlml_value_and_grad(kernel: Kernel, mesh: Mesh,
                                     axis: str = "data") -> Callable:
    """Build ``fn(params, X_sharded, y_sharded) -> (nlml, grads)`` jitted
    over ``mesh`` with X, y sharded along ``axis`` (see :func:`shard_rows`).

    N must be divisible by the axis size.  grads is the full params pytree
    (psum-reduced), bitwise independent of the sharding up to matmul
    reduction order.
    """
    p = mesh.shape[axis]
    ldq = _make_logdet_quad_sharded(axis, p)
    log2pi = jnp.log(2.0 * jnp.pi)

    def local_fn(params, X_local, y_local):
        Lr = X_local.shape[0]
        N = Lr * p
        s = lax.axis_index(axis)
        X_full = lax.all_gather(X_local, axis).reshape(N, -1)

        def nlml_of(theta):
            K_local = kernel.K(theta["kernel"], X_local, X_full)
            rows = jnp.arange(Lr)
            K_local = K_local.at[rows, s * Lr + rows].add(
                positive(theta["raw_noise"]))
            logdet, quad = ldq(K_local, y_local)
            return 0.5 * (N * log2pi + logdet + quad)

        value, grads = jax.value_and_grad(nlml_of)(params)
        grads = lax.psum(grads, axis)   # θ is replicated; K rows disjoint
        return value, grads

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(), P(axis), P(axis)),
                       out_specs=(P(), P()),
                       check_vma=False)
    return jax.jit(fn)


def make_sharded_nlml_objective(kernel: Kernel, mesh: Mesh,
                                axis: str = "data") -> Callable:
    """Scalar NLML objective ``fun(params, X_sharded, y_sharded)`` whose
    reverse-mode gradient routes through the distributed trace-form adjoint.

    This is the optimizer-facing wrapper that makes the sharded exact GP
    *fittable* (not just differentiable): the custom VJP hands L-BFGS the
    psum-reduced parameter gradient from
    :func:`make_sharded_nlml_value_and_grad`, so the whole optimization
    loop — line search included — compiles to one SPMD program over
    ``mesh``.  Cotangents w.r.t. the data arrays are zero (hyperparameter
    optimization never differentiates w.r.t. X or y).
    """
    vgfn = make_sharded_nlml_value_and_grad(kernel, mesh, axis)

    @jax.custom_vjp
    def fun(params, Xs, ys):
        return vgfn(params, Xs, ys)[0]

    def fwd(params, Xs, ys):
        value, grads = vgfn(params, Xs, ys)
        return value, (grads, Xs, ys)

    def bwd(res, ct):
        grads, Xs, ys = res
        return (jax.tree_util.tree_map(lambda g: ct * g, grads),
                jnp.zeros_like(Xs), jnp.zeros_like(ys))

    fun.defvjp(fwd, bwd)
    return fun


def shard_rows(mesh: Mesh, axis: str, X, y):
    """Device-put (X [N, Q], y [N]) sharded by rows along ``axis``."""
    xs = NamedSharding(mesh, P(axis, None))
    ys = NamedSharding(mesh, P(axis))
    return jax.device_put(X, xs), jax.device_put(y, ys)


def sharded_nlml_value_and_grad(kernel: Kernel, mesh: Mesh, params, X, y,
                                axis: str = "data"):
    """One-call convenience: shard (X, y) over ``axis`` and evaluate the
    distributed NLML value+gradient."""
    p = mesh.shape[axis]
    if X.shape[0] % p:
        raise ValueError(f"N={X.shape[0]} must be divisible by the "
                         f"'{axis}' axis size {p}")
    Xs, ys = shard_rows(mesh, axis, jnp.asarray(X), jnp.asarray(y))
    fn = make_sharded_nlml_value_and_grad(kernel, mesh, axis)
    return fn(params, Xs, ys)
