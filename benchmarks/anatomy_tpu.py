"""Per-op anatomy + adjoint A/B of the headline NLML benchmark (N=10k).

Measures, on the real TPU chip, the O(N^3)/O(N^2 Q) terms of the exact-GP
NLML evaluation (kernel build, stock vs hand-blocked Cholesky, triangular
solve, blocked trtri/lauum at each precision tier, the gemv alpha path),
then A/Bs the full value+grad program across the adjoint designs that the
round-2 record left unreconciled (21.8 vs 18.7 vs a claimed 27.2):

  * v1_solves  — round-1 forward (alpha via two 1-RHS triangular solves),
                 K^-1 formed in the backward pass
  * v2_gemv    — round-2 forward (L^-1 up front, alpha via two gemvs)
  * precision  — trtri/lauum gemms at DEFAULT / HIGH / HIGHEST, plus a
                 mixed tier (trtri HIGH — errors compound through the block
                 recursion — lauum DEFAULT — a single product, they don't)

with gradient accuracy of every tier against the HIGHEST reference.  All
timings are median-of-5 blocks of 10 evals (the round-2 verdict flagged
single-block timing as too noisy to detect a 25% change).

Writes JSON lines to stdout.  Run me alone (the TPU tunnel deadlocks under
concurrent JAX processes) with a generous timeout — each new program costs
minutes at the remote compile service; results cache in .jax_cache.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from edrgp_tpu import config as cfg
from edrgp_tpu.ops import exact
from edrgp_tpu.ops.kernels import RBF, inv_positive
from edrgp_tpu.ops.linalg import (cho_solve, cholesky_blocked, cholesky_once,
                                  logdet_from_chol, sym_square_from_tri_inv,
                                  tri_inv_blocked, tri_solve)

N, Q = 10_000, 8
DT = jnp.float32
_LOG2PI = float(np.log(2.0 * np.pi))


def timeit_blocks(fn, *args, iters=10, blocks=5, warm=2):
    """Median-of-blocks ms/eval plus the block spread."""
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    per_block = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        per_block.append((time.perf_counter() - t0) / iters * 1e3)
    med = float(np.median(per_block))
    return med, {"ms_min": round(min(per_block), 3),
                 "ms_max": round(max(per_block), 3),
                 "spread_pct": round(100 * (max(per_block) - min(per_block))
                                     / med, 1)}


def emit(name, ms, extra=None):
    rec = {"op": name, "ms": round(ms, 3)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def make_variant_vg(kernel, X, y, forward: str, prec_trtri, prec_lauum):
    """Fresh jitted NLML value+grad with an explicit adjoint design.

    forward='gemv': L^-1 formed in the forward pass, alpha via two gemvs
    (round-2 design).  forward='solves': alpha via two 1-RHS triangular
    solves, L^-1 formed in the backward pass (round-1 design).
    """
    hi = jax.lax.Precision.HIGHEST

    @jax.custom_vjp
    def ldq(Ky, y):
        L = cholesky_once(Ky)
        alpha = cho_solve(L, y[:, None])[:, 0]
        return logdet_from_chol(L), y @ alpha

    if forward == "gemv":
        def fwd(Ky, y):
            L = cholesky_once(Ky)
            Linv = tri_inv_blocked(L, precision=prec_trtri)
            alpha = jnp.matmul(Linv.T, jnp.matmul(Linv, y, precision=hi),
                               precision=hi)
            return (logdet_from_chol(L), y @ alpha), (Linv, alpha)

        def bwd(res, cts):
            Linv, alpha = res
            g_ld, g_q = cts
            Kinv = sym_square_from_tri_inv(Linv, precision=prec_lauum)
            return (g_ld * Kinv - g_q * jnp.outer(alpha, alpha),
                    2.0 * g_q * alpha)
    else:
        def fwd(Ky, y):
            L = cholesky_once(Ky)
            alpha = cho_solve(L, y[:, None])[:, 0]
            return (logdet_from_chol(L), y @ alpha), (L, alpha)

        def bwd(res, cts):
            L, alpha = res
            g_ld, g_q = cts
            Linv = tri_inv_blocked(L, precision=prec_trtri)
            Kinv = sym_square_from_tri_inv(Linv, precision=prec_lauum)
            return (g_ld * Kinv - g_q * jnp.outer(alpha, alpha),
                    2.0 * g_q * alpha)

    ldq.defvjp(fwd, bwd)

    def nlml(params):
        K = kernel.K(params["kernel"], X, X)
        Ky = K + exact.noise_variance(params) * jnp.eye(N, dtype=K.dtype)
        logdet, quad = ldq(Ky, y)
        return 0.5 * (N * _LOG2PI + logdet + quad)

    return jax.jit(jax.value_and_grad(nlml))


def main():
    rng = np.random.default_rng(0)
    kernel = RBF(Q, ARD=True)
    X = jnp.asarray(rng.normal(size=(N, Q)), DT)
    y = jnp.asarray(np.sin(rng.normal(size=N)), DT)
    params = {"kernel": kernel.init_params(DT),
              "raw_noise": inv_positive(jnp.asarray(0.1, DT))}
    P = jax.lax.Precision

    # ---------------- forward components ----------------
    kbuild = jax.jit(lambda p: kernel.K(p["kernel"], X, X)
                     + exact.noise_variance(p) * jnp.eye(N, dtype=DT))
    Ky = kbuild(params)
    jax.block_until_ready(Ky)
    ms, sp = timeit_blocks(kbuild, params)
    emit("K_build", ms, sp)

    chol = jax.jit(jnp.linalg.cholesky)
    L = chol(Ky)
    ms, sp = timeit_blocks(chol, Ky)
    emit("cholesky_stock", ms, sp)

    f = jax.jit(partial(cholesky_blocked, block=2048))
    Lb = f(Ky)
    err = float(jnp.linalg.norm(jnp.tril(Lb) - jnp.tril(L))
                / jnp.linalg.norm(jnp.tril(L)))
    ms, sp = timeit_blocks(f, Ky)
    emit("cholesky_blocked_b2048_HIGH", ms, dict(sp, rel_err_vs_stock=err))

    solve1 = jax.jit(lambda L, y: tri_solve(L, y[:, None], lower=True))
    ms, sp = timeit_blocks(solve1, L, y)
    emit("tri_solve_1rhs", ms, sp)

    # ---------------- adjoint components ----------------
    Linv = None
    for prec in ("DEFAULT", "HIGH", "HIGHEST"):
        p = getattr(P, prec)
        ti = jax.jit(partial(tri_inv_blocked, precision=p))
        Linv = ti(L)
        ms, sp = timeit_blocks(ti, L)
        emit(f"tri_inv_blocked_{prec}", ms, sp)
        sq = jax.jit(partial(sym_square_from_tri_inv, precision=p))
        out = sq(Linv)
        jax.block_until_ready(out)
        ms, sp = timeit_blocks(sq, Linv)
        emit(f"lauum_{prec}", ms, sp)

    gemv2 = jax.jit(lambda Li, y: Li.T @ (Li @ y))
    ms, sp = timeit_blocks(gemv2, Linv, y)
    emit("alpha_two_gemv", ms, sp)

    # ------------- end-to-end value+grad: design x precision A/B ---------
    variants = {
        "v2_gemv_HIGH":    ("gemv",   P.HIGH,    P.HIGH),
        "v2_gemv_MIXED":   ("gemv",   P.HIGH,    P.DEFAULT),
        "v2_gemv_DEFAULT": ("gemv",   P.DEFAULT, P.DEFAULT),
        "v2_gemv_HIGHEST": ("gemv",   P.HIGHEST, P.HIGHEST),
        "v1_solves_HIGH":  ("solves", P.HIGH,    P.HIGH),
    }
    grads, values = {}, {}
    for name, (forward, pt, pl) in variants.items():
        vg = make_variant_vg(kernel, X, y, forward, pt, pl)
        out = vg(params)
        jax.block_until_ready(out)
        values[name] = float(out[0])
        grads[name] = np.concatenate(
            [np.asarray(g).ravel()
             for g in jax.tree_util.tree_leaves(out[1])])
        ms, sp = timeit_blocks(vg, params)
        emit(f"nlml_vg_{name}", ms,
             dict(sp, evals_per_s=round(1e3 / ms, 2), nlml=values[name]))

    ref = grads["v2_gemv_HIGHEST"]
    for name, g in grads.items():
        if name == "v2_gemv_HIGHEST":
            continue
        emit(f"grad_rel_err_{name}", 0.0,
             {"rel_l2_vs_HIGHEST":
              float(np.linalg.norm(g - ref) / np.linalg.norm(ref))})

    # the production path (exact.nlml as shipped), for cross-checking
    # against bench.py
    jax.clear_caches()
    cfg.set_adjoint_precision(None)
    vg = jax.jit(jax.value_and_grad(lambda p: exact.nlml(kernel, p, X, y)))
    out = vg(params)
    jax.block_until_ready(out)
    ms, sp = timeit_blocks(vg, params)
    emit("nlml_vg_production", ms,
         dict(sp, evals_per_s=round(1e3 / ms, 2), nlml=float(out[0])))


if __name__ == "__main__":
    main()
