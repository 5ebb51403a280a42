"""Per-op anatomy of the headline NLML value+grad benchmark (N=10k).

Measures, on the real TPU chip, the O(N^3)/O(N^2 Q) terms of the exact-GP
NLML evaluation (kernel build, stock vs hand-blocked Cholesky, triangular
solve, blocked trtri/lauum at each precision tier, the gemv alpha path) and
the end-to-end value+grad at DEFAULT/HIGH/HIGHEST adjoint precision with
gradient accuracy of each tier against the HIGHEST reference.

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
from edrgp_tpu.ops.linalg import (cholesky_blocked, sym_square_from_tri_inv,
                                  tri_inv_blocked, tri_solve)

N, Q = 10_000, 8
DT = jnp.float32


def timeit(fn, *args, iters=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def emit(name, ms, extra=None):
    rec = {"op": name, "ms": round(ms, 3)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    rng = np.random.default_rng(0)
    kernel = RBF(Q, ARD=True)
    X = jnp.asarray(rng.normal(size=(N, Q)), DT)
    y = jnp.asarray(np.sin(rng.normal(size=N)), DT)
    params = {"kernel": kernel.init_params(DT),
              "raw_noise": inv_positive(jnp.asarray(0.1, DT))}

    # ---------------- forward components ----------------
    kbuild = jax.jit(lambda p: kernel.K(p["kernel"], X, X)
                     + exact.noise_variance(p) * jnp.eye(N, dtype=DT))
    Ky = kbuild(params)
    jax.block_until_ready(Ky)
    emit("K_build", timeit(kbuild, params))

    chol = jax.jit(jnp.linalg.cholesky)
    L = chol(Ky)
    emit("cholesky_stock", timeit(chol, Ky))

    cfg.set_adjoint_precision("HIGH")
    f = jax.jit(partial(cholesky_blocked, block=2048))
    Lb = f(Ky)
    err = float(jnp.linalg.norm(jnp.tril(Lb) - jnp.tril(L))
                / jnp.linalg.norm(jnp.tril(L)))
    emit("cholesky_blocked_b2048_HIGH", timeit(f, Ky),
         {"rel_err_vs_stock": round(err, 8)})
    cfg.set_adjoint_precision(None)

    solve1 = jax.jit(lambda L, y: tri_solve(L, y[:, None], lower=True))
    emit("tri_solve_1rhs", timeit(solve1, L, y))

    # ---------------- adjoint components ----------------
    for prec in ("DEFAULT", "HIGH"):
        cfg.set_adjoint_precision(prec)
        ti = jax.jit(tri_inv_blocked)
        Linv = ti(L)
        emit(f"tri_inv_blocked_{prec}", timeit(ti, L))
        sq = jax.jit(sym_square_from_tri_inv)
        emit(f"lauum_{prec}", timeit(sq, Linv))
        cfg.set_adjoint_precision(None)

    gemv2 = jax.jit(lambda Li, y: Li.T @ (Li @ y))
    emit("alpha_two_gemv", timeit(gemv2, Linv, y))

    # ---------------- end-to-end value+grad, precision tiers -------------
    grads = {}
    for prec in ("DEFAULT", "HIGH", "HIGHEST"):
        cfg.set_adjoint_precision(prec)
        vg = jax.jit(jax.value_and_grad(
            lambda p: exact.nlml(kernel, p, X, y)))
        out = vg(params)
        jax.block_until_ready(out)
        grads[prec] = jax.tree_util.tree_map(np.asarray, out[1])
        ms = timeit(vg, params, iters=10)
        emit(f"nlml_value_and_grad_{prec}", ms,
             {"evals_per_s": round(1e3 / ms, 2), "nlml": float(out[0])})
        cfg.set_adjoint_precision(None)

    ref = np.concatenate([g.ravel() for g in
                          jax.tree_util.tree_leaves(grads["HIGHEST"])])
    for prec in ("DEFAULT", "HIGH"):
        g = np.concatenate([x.ravel() for x in
                            jax.tree_util.tree_leaves(grads[prec])])
        emit(f"grad_rel_err_{prec}_vs_HIGHEST", 0.0,
             {"rel_l2": float(np.linalg.norm(g - ref) / np.linalg.norm(ref))})


if __name__ == "__main__":
    main()
