"""Cholesky-centric linear algebra with TPU-safe jitter handling.

The reference delegates all of this to GPy/LAPACK (see SURVEY.md §2.2 G2/G3).
Here the factorizations run through XLA's blocked TPU kernels; the jitter
cascade is expressed with ``lax.while_loop`` so it stays inside ``jit``
(no data-dependent Python control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import MAX_JITTER_TRIES, adjoint_precision, base_jitter

__all__ = ["safe_cholesky", "cholesky_once", "cho_solve", "tri_solve",
           "logdet_from_chol", "logdet_and_quad", "add_jitter",
           "cholesky_blocked", "cholesky_blocked_v2", "tri_inv_blocked",
           "sym_square_from_tri_inv"]

#: Size above which float32 value-path factorizations route to the
#: hand-blocked gemm-panel Cholesky (:func:`cholesky_blocked_v2`): 14.8 ms
#: vs XLA stock's 22.9 ms at N=10k on the v5e (b=512, rel err 4.6e-7 —
#: ``results/tpu_suite2_r3.log``).  The v1 experiment
#: (:func:`cholesky_blocked`, triangular-solve panels) lost to stock
#: (24.0 vs 22.6 ms) and is kept as the documented negative result.
#: float64 (CPU parity mode) stays on LAPACK/stock.
_BLOCK_CHOL_MIN_N = 4096


def cholesky_blocked(A: jnp.ndarray, block: int = 2048) -> jnp.ndarray:
    """Lower Cholesky via right-looking blocked factorization.

    The LAPACK ``potrf`` blocking keeps only the P diagonal-block
    factorizations on the slow path and turns the O(N³) bulk into ONE
    dense trailing-update gemm per panel:

        L[k,k]  = chol(A[k,k])                       (stock, b×b)
        L[i,k]  = A[i,k] · L[k,k]⁻ᵀ                  (triangular_solve, right)
        A[i,j] -= L[i,k] · L[j,k]ᵀ  for i,j > k      (one [m,b]×[b,m] gemm)

    The static Python loop unrolls (P = N/block is small).  Trailing gemms
    run at :func:`edrgp_tpu.config.adjoint_precision` (HIGH default on TPU:
    3-pass bf16 ≈ fp32) because factorization errors compound panel to
    panel.  Value-path only — differentiable callers use
    :func:`safe_cholesky` (the stock kernel has a maintained VJP).
    """
    prec = adjoint_precision()
    n = A.shape[-1]
    if n <= block:
        return jnp.linalg.cholesky(A)
    Ap, P = _pad_tri(A, block)  # identity corner factorizes to itself
    b = block
    L = jnp.zeros_like(Ap)
    for k in range(P):
        s, e = k * b, (k + 1) * b
        Lkk = jnp.linalg.cholesky(Ap[s:e, s:e])
        L = L.at[s:e, s:e].set(Lkk)
        if k + 1 < P:
            panel = lax.linalg.triangular_solve(
                Lkk, Ap[e:, s:e], left_side=False, lower=True,
                transpose_a=True)                        # A[i,k] Lkk⁻ᵀ
            L = L.at[e:, s:e].set(panel)
            Ap = Ap.at[e:, e:].add(
                -jnp.matmul(panel, panel.T, precision=prec))
    return L[:n, :n]


def cholesky_blocked_v2(A: jnp.ndarray, block: int = 512,
                        precision=None) -> jnp.ndarray:
    """Lower Cholesky: right-looking, gemm panels, syrk-shaped updates.

    Beats XLA's stock TPU kernel 14.8 vs 22.9 ms at N=10k fp32 (b=512,
    rel err 4.6e-7 vs stock; ``results/tpu_suite2_r3.log``) by fixing the
    two costs that sank :func:`cholesky_blocked`:

      * the panel computation is a gemm — the b×b diagonal block is
        trtri'd once and the panel is ``A[i,k] · L_kk⁻ᵀ`` on the MXU —
        instead of a wide-RHS ``triangular_solve`` (which serializes);
      * trailing updates touch only the lower block-columns (~N³/3 gemm
        flops, the syrk shape) instead of the full square (2N³/3).

    Value-path only (no custom VJP) — differentiable callers use
    :func:`safe_cholesky`.  Gemms run at ``adjoint_precision()`` (HIGH on
    TPU: factorization errors compound panel to panel).
    """
    prec = adjoint_precision() if precision is None else precision
    n = A.shape[-1]
    if n <= block:
        return jnp.linalg.cholesky(A)
    Ap, P = _pad_tri(A, block)  # identity corner factorizes to itself
    b = block
    eye_b = jnp.eye(b, dtype=A.dtype)
    L = jnp.zeros_like(Ap)
    for k in range(P):
        s, e = k * b, (k + 1) * b
        Lkk = jnp.linalg.cholesky(Ap[s:e, s:e])
        L = L.at[s:e, s:e].set(Lkk)
        if k + 1 == P:
            break
        Lkk_inv = lax.linalg.triangular_solve(Lkk, eye_b, left_side=True,
                                              lower=True)
        panel = jnp.matmul(Ap[e:, s:e], Lkk_inv.T, precision=prec)
        L = L.at[e:, s:e].set(panel)
        for j in range(k + 1, P):
            js, je = j * b, (j + 1) * b
            pj = panel[js - e:je - e]                            # [b, b]
            Ap = Ap.at[js:, js:je].add(
                -jnp.matmul(panel[js - e:], pj.T, precision=prec))
    return L[:n, :n]


def _chol_value(A: jnp.ndarray) -> jnp.ndarray:
    """Value-path Cholesky: gemm-panel blocked at scale (float32 — the
    TPU fast path), stock LAPACK/XLA otherwise."""
    if A.shape[-1] > _BLOCK_CHOL_MIN_N and A.dtype == jnp.float32:
        return cholesky_blocked_v2(A)
    return jnp.linalg.cholesky(A)


def add_jitter(A: jnp.ndarray, jitter: jnp.ndarray | float) -> jnp.ndarray:
    n = A.shape[-1]
    return A + jitter * jnp.eye(n, dtype=A.dtype)


def _choose_jitter(A_nograd: jnp.ndarray, jitter0: float) -> jnp.ndarray:
    """Smallest jitter (0, j0, 10·j0, …) making chol(A + jitter·I) succeed.

    Runs entirely on stopped-gradient values so the retry ``while_loop``
    never sits on the autodiff path.
    """
    n = A_nograd.shape[-1]
    eye = jnp.eye(n, dtype=A_nograd.dtype)
    diag_mean = jnp.maximum(jnp.mean(jnp.diagonal(A_nograd)),
                            jnp.asarray(1.0, A_nograd.dtype))

    def jitter_at(i):
        # i = 0 → no jitter; i = k → jitter0 · 10^(k−1) · mean(diag)
        dt = A_nograd.dtype
        growth = jnp.asarray(10.0, dt) ** (i - 1).astype(dt)
        return jnp.where(i == 0, jnp.asarray(0.0, dt),
                         jnp.asarray(jitter0, dt) * growth * diag_mean)

    def ok(i):
        L = jnp.linalg.cholesky(A_nograd + jitter_at(i) * eye)
        return jnp.all(jnp.isfinite(jnp.diagonal(L)))

    def cond(i):
        return jnp.logical_and(i < MAX_JITTER_TRIES, jnp.logical_not(ok(i)))

    i = lax.while_loop(cond, lambda i: i + 1, jnp.asarray(0, jnp.int32))
    return jitter_at(i)


def safe_cholesky(A: jnp.ndarray, jitter0: float | None = None) -> jnp.ndarray:
    """Lower Cholesky of a PSD matrix with escalating-jitter retries.

    XLA's ``cholesky`` returns NaNs on indefinite input instead of raising,
    so failure is detected by probing the factor and retried with jitter
    scaled by 10x per attempt (GPy's ``jitchol`` strategy) — all inside jit.
    The jitter search runs under ``stop_gradient``; the returned factor comes
    from a single differentiable Cholesky, so reverse-mode ML-II works.
    """
    if jitter0 is None:
        jitter0 = base_jitter(A.dtype)
    jitter = _choose_jitter(lax.stop_gradient(A), jitter0)
    n = A.shape[-1]
    return jnp.linalg.cholesky(A + jitter * jnp.eye(n, dtype=A.dtype))


def cholesky_once(A: jnp.ndarray, jitter0: float | None = None) -> jnp.ndarray:
    """Value-only escalating-jitter Cholesky: ONE factorization per attempt.

    :func:`safe_cholesky` pays two factorizations on the common
    (no-jitter-needed) path — one inside the probe loop's condition, one
    differentiable re-run.  Call sites that never differentiate through the
    factor (the :func:`logdet_and_quad` custom VJP, posterior caches) can use
    this variant instead, which carries the factor through the retry
    ``while_loop`` and returns it directly.  At N=10k that removes ~23 ms
    (a full Cholesky) from every NLML value+gradient evaluation.

    NOT reverse-mode differentiable: the input passes through
    ``stop_gradient``, so cotangents flowing into the factor are silently
    ZEROED (not an error).  Never place this on a path whose gradient you
    need — use :func:`safe_cholesky` there.
    """
    if jitter0 is None:
        jitter0 = base_jitter(A.dtype)
    A = lax.stop_gradient(A)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    diag_mean = jnp.maximum(jnp.mean(jnp.diagonal(A)),
                            jnp.asarray(1.0, A.dtype))

    def jitter_at(i):
        dt = A.dtype
        growth = jnp.asarray(10.0, dt) ** (i - 1).astype(dt)
        return jnp.where(i == 0, jnp.asarray(0.0, dt),
                         jnp.asarray(jitter0, dt) * growth * diag_mean)

    def cond(state):
        i, L = state
        bad = jnp.logical_not(jnp.all(jnp.isfinite(jnp.diagonal(L))))
        return jnp.logical_and(i < MAX_JITTER_TRIES, bad)

    def body(state):
        i, _ = state
        i = i + 1
        return i, _chol_value(A + jitter_at(i) * eye)

    state0 = (jnp.asarray(0, jnp.int32), _chol_value(A))
    _, L = lax.while_loop(cond, body, state0)
    return L


def tri_solve(L: jnp.ndarray, B: jnp.ndarray, *, lower: bool = True,
              trans: bool = False) -> jnp.ndarray:
    """Triangular solve (XLA's blocked TPU triangular_solve)."""
    return lax.linalg.triangular_solve(
        L, B, left_side=True, lower=lower, transpose_a=trans)


def cho_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve (L Lᵀ) x = B given the lower Cholesky factor L."""
    y = tri_solve(L, B, lower=True, trans=False)
    return tri_solve(L, y, lower=True, trans=True)


def logdet_from_chol(L: jnp.ndarray) -> jnp.ndarray:
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def _pad_tri(L: jnp.ndarray, block: int):
    """Pad a lower-triangular L to a block multiple with an identity corner.

    [[L, 0], [0, I]] keeps the inverse/symmetric-square block-diagonal, so
    results can simply be sliced back to [:n, :n].
    """
    n = L.shape[-1]
    n_blocks = -(-n // block)
    n_pad = n_blocks * block
    if n_pad == n:
        return L, n_blocks
    Lp = jnp.zeros((n_pad, n_pad), L.dtype)
    Lp = Lp.at[:n, :n].set(L)
    Lp = Lp.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
    return Lp, n_blocks


def tri_inv_blocked(L: jnp.ndarray, block: int = 1024,
                    precision=None) -> jnp.ndarray:
    """L⁻¹ for lower-triangular L via blocked forward substitution.

    XLA's TPU ``triangular_solve`` with a matrix-wide RHS runs well below
    MXU peak (it serializes on the triangle).  The LAPACK-``trtri`` blocking
    turns all O(N³) work into dense gemms:

      L⁻¹[i,j] = −D_i⁻¹ · ( Σ_{j≤k<i} L[i,k] · L⁻¹[k,j] ),   D_i = L[i,i]

    with the inner sum evaluated as ONE [b, (i−j)b] × [(i−j)b, b] matmul per
    block (static Python loops — P = N/block is small).  Only the P diagonal
    blocks go through ``triangular_solve``.  ~N³/3 flops, almost all MXU.

    Errors compound through the block recursion, so the gemms run at
    :func:`edrgp_tpu.config.adjoint_precision` (HIGH by default: 3-pass
    bf16 ≈ fp32 accuracy on TPU) rather than the single-pass default.
    """
    prec = adjoint_precision() if precision is None else precision
    n = L.shape[-1]
    if n <= block:
        return tri_solve(L, jnp.eye(n, dtype=L.dtype), lower=True)
    Lp, P = _pad_tri(L, block)
    b = block
    eye_b = jnp.eye(b, dtype=L.dtype)

    Dinv = [tri_solve(Lp[i * b:(i + 1) * b, i * b:(i + 1) * b], eye_b,
                      lower=True) for i in range(P)]

    inv = [[None] * P for _ in range(P)]
    for i in range(P):
        inv[i][i] = Dinv[i]
    for j in range(P):
        for i in range(j + 1, P):
            # rows k = j..i−1 of inverse block-column j, stacked
            col = jnp.concatenate([inv[k][j] for k in range(j, i)], axis=0)
            strip = Lp[i * b:(i + 1) * b, j * b:i * b]      # [b, (i−j)b]
            inv[i][j] = -jnp.matmul(
                Dinv[i], jnp.matmul(strip, col, precision=prec),
                precision=prec)

    zero = jnp.zeros((b, b), L.dtype)
    rows = [jnp.concatenate(inv[i][:i + 1] + [zero] * (P - 1 - i), axis=1)
            for i in range(P)]
    return jnp.concatenate(rows, axis=0)[:n, :n]


def sym_square_from_tri_inv(Linv: jnp.ndarray, block: int = 1024,
                            precision=None) -> jnp.ndarray:
    """Linvᵀ · Linv for lower-triangular Linv, exploiting both structures.

    (LinvᵀLinv)[i,j] only sums over rows k ≥ max(i,j), and the result is
    symmetric — so compute the upper triangle (i ≤ j) with one tall-skinny
    matmul per block pair over the contiguous row range [j·b, N) and mirror.
    ~N³/3 flops vs N³ for the dense gemm (LAPACK ``lauum`` blocking).
    """
    prec = adjoint_precision() if precision is None else precision
    n = Linv.shape[-1]
    if n <= block:
        return jnp.matmul(Linv.T, Linv, precision=prec)
    Lp, P = _pad_tri(Linv, block)   # identity corner: symmetric square stays block-diagonal
    b = block

    out = [[None] * P for _ in range(P)]
    for j in range(P):
        tail_j = Lp[j * b:, j * b:(j + 1) * b]              # [N−jb, b]
        for i in range(j + 1):
            tail_i = Lp[j * b:, i * b:(i + 1) * b]          # [N−jb, b]
            out[i][j] = jnp.matmul(tail_i.T, tail_j, precision=prec)
            if i != j:
                out[j][i] = out[i][j].T

    rows = [jnp.concatenate(out[i], axis=1) for i in range(P)]
    return jnp.concatenate(rows, axis=0)[:n, :n]


def _split_point(n: int, align: int = 256) -> int:
    """Half-split rounded to a lane-aligned boundary, clamped below n.

    The clamp guarantees both halves are non-empty for ANY n ≥ 2, so the
    D&C recursions terminate for any public ``leaf`` value (an unclamped
    ``max(align, ...)`` could return h ≥ n for leaf < 2·align, looping the
    recursion at constant size until RecursionError; ADVICE r4).
    """
    h = max(align, ((n // 2) + align - 1) // align * align)
    return min(h, n - 1)


def tri_inv_dc(L: jnp.ndarray, leaf: int = 1024,
               precision=None) -> jnp.ndarray:
    """L⁻¹ via divide-and-conquer on the 2×2 block partition.

        [[A, 0], [B, C]]⁻¹ = [[A⁻¹, 0], [−C⁻¹·(B·A⁻¹), C⁻¹]]

    All O(N³) work lands in TWO half-size near-square gemms per level —
    the best MXU shapes available — versus the column-blocked recursion's
    ~P²/2 skinny strip gemms (:func:`tri_inv_blocked`).  ~N³·2/3 gemm
    flops (2× the column-blocked count) traded for utilization; error
    compounds over log₂(N/leaf) levels instead of P panels.
    """
    prec = adjoint_precision() if precision is None else precision
    n = L.shape[-1]
    if n <= leaf:
        return tri_solve(L, jnp.eye(n, dtype=L.dtype), lower=True)
    h = _split_point(n)
    A, B, C = L[:h, :h], L[h:, :h], L[h:, h:]
    Ai = tri_inv_dc(A, leaf, precision)
    Ci = tri_inv_dc(C, leaf, precision)
    lower = -jnp.matmul(Ci, jnp.matmul(B, Ai, precision=prec),
                        precision=prec)
    top = jnp.concatenate([Ai, jnp.zeros((h, n - h), L.dtype)], axis=1)
    return jnp.concatenate(
        [top, jnp.concatenate([lower, Ci], axis=1)], axis=0)


def tri_inv_rowbatch(L: jnp.ndarray, block: int = 1024,
                     precision=None) -> jnp.ndarray:
    """L⁻¹ by rows: the column-blocked recursion's per-(i,j) strip gemms
    batched into ONE [b, ib]·[ib, ib] gemm per block-row (then one Dinv
    gemm).  2P launches instead of ~P², at ~1.35× the gemm flops (the
    row gemm multiplies the strictly-upper zeros too)."""
    prec = adjoint_precision() if precision is None else precision
    n = L.shape[-1]
    if n <= block:
        return tri_solve(L, jnp.eye(n, dtype=L.dtype), lower=True)
    Lp, P = _pad_tri(L, block)
    b = block
    eye_b = jnp.eye(b, dtype=L.dtype)
    inv = jnp.zeros_like(Lp)
    Dinv0 = tri_solve(Lp[:b, :b], eye_b, lower=True)
    inv = inv.at[:b, :b].set(Dinv0)
    for i in range(1, P):
        s, e = i * b, (i + 1) * b
        Dinv = tri_solve(Lp[s:e, s:e], eye_b, lower=True)
        S = jnp.matmul(Lp[s:e, :s], inv[:s, :s], precision=prec)  # [b, ib]
        inv = inv.at[s:e, :s].set(-jnp.matmul(Dinv, S, precision=prec))
        inv = inv.at[s:e, s:e].set(Dinv)
    return inv[:n, :n]


def sym_square_dc(Linv: jnp.ndarray, leaf: int = 1024,
                  precision=None) -> jnp.ndarray:
    """Linvᵀ·Linv via divide-and-conquer.  With Linv = [[A, 0], [B, C]]:

        [[AᵀA + BᵀB,  BᵀC],
         [CᵀB,        CᵀC]]

    — per level one syrk-shaped and one near-square gemm, vs the blocked
    lauum's ~P²/2 tall-skinny pair gemms (:func:`sym_square_from_tri_inv`).
    """
    from ..config import lauum_precision
    prec = lauum_precision() if precision is None else precision
    n = Linv.shape[-1]
    if n <= leaf:
        return jnp.matmul(Linv.T, Linv, precision=prec)
    h = _split_point(n)
    A, B, C = Linv[:h, :h], Linv[h:, :h], Linv[h:, h:]
    TL = sym_square_dc(A, leaf, precision) + jnp.matmul(B.T, B,
                                                        precision=prec)
    TR = jnp.matmul(B.T, C, precision=prec)
    BR = sym_square_dc(C, leaf, precision)
    return jnp.concatenate(
        [jnp.concatenate([TL, TR], axis=1),
         jnp.concatenate([TR.T, BR], axis=1)], axis=0)


def sym_square_colbatch(Linv: jnp.ndarray, block: int = 1024,
                        precision=None) -> jnp.ndarray:
    """Linvᵀ·Linv with the blocked lauum's per-(i,j) pair gemms batched
    into ONE [(j+1)b, N−jb]ᵀ·[N−jb, b] gemm per block-column — identical
    flops, P launches instead of P(P+1)/2."""
    from ..config import lauum_precision
    prec = lauum_precision() if precision is None else precision
    n = Linv.shape[-1]
    if n <= block:
        return jnp.matmul(Linv.T, Linv, precision=prec)
    Lp, P = _pad_tri(Linv, block)
    b = block
    out = jnp.zeros_like(Lp)
    for j in range(P):
        s = j * b
        colj = jnp.matmul(Lp[s:, :s + b].T, Lp[s:, s:s + b],
                          precision=prec)               # [(j+1)b, b]
        out = out.at[:s + b, s:s + b].set(colj)
        out = out.at[s:s + b, :s].set(colj[:s].T)
    return out[:n, :n]


@jax.custom_vjp
def logdet_and_quad(Ky: jnp.ndarray, y: jnp.ndarray):
    """(log|Ky|, yᵀKy⁻¹y) with an analytic adjoint.

    The NLML's expensive reverse pass is the Cholesky VJP; the classic
    trace-form gradient replaces it:  ∂log|K|/∂K = K⁻¹ and
    ∂(yᵀK⁻¹y)/∂K = −ααᵀ with α = K⁻¹y.  K⁻¹ is formed as blocked
    trtri + lauum (all MXU gemms, ~N³/3 flops each) — measured faster than
    both differentiating through the factorization and the triangular-solve
    K⁻¹ formations on the N=10k headline benchmark.  Forward uses the
    single-factorization jitter cascade (:func:`cholesky_once`): the factor
    is only ever consumed as a value here, never differentiated through.
    """
    L = cholesky_once(Ky)
    alpha = cho_solve(L, y[:, None])[:, 0]
    return logdet_from_chol(L), y @ alpha


def _ldq_fwd(Ky, y):
    # The gradient path needs L⁻¹ anyway (to form K⁻¹ in the adjoint), so
    # compute it up front and get α = L⁻ᵀL⁻¹y from two O(N²) gemvs — this
    # removes both N-wide 1-RHS triangular solves (the slowest non-gemm ops
    # at N=10k) from the value+grad program.  The gemvs run at HIGHEST
    # precision: they are bandwidth-bound, so the extra passes are free,
    # and α's accuracy sets the quad term's.  Value-only callers take the
    # primal (cholesky + solve) path, not this one.
    L = cholesky_once(Ky)
    Linv = tri_inv_blocked(L)
    hi = jax.lax.Precision.HIGHEST
    alpha = jnp.matmul(Linv.T, jnp.matmul(Linv, y, precision=hi),
                       precision=hi)
    return (logdet_from_chol(L), y @ alpha), (Linv, alpha)


def _ldq_bwd(res, cotangents):
    Linv, alpha = res
    g_logdet, g_quad = cotangents
    from ..config import lauum_precision
    Kinv = sym_square_from_tri_inv(Linv, precision=lauum_precision())
    dK = g_logdet * Kinv - g_quad * jnp.outer(alpha, alpha)
    dy = 2.0 * g_quad * alpha
    return dK, dy


logdet_and_quad.defvjp(_ldq_fwd, _ldq_bwd)
