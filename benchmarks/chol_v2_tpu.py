"""Second blocked-Cholesky experiment [SUPERSEDED TIMING —
this script's dispatch-loop timeit is void on the r4 host
(results/timing_probe_r4.log); the valid re-measurement is
benchmarks/hardened_sweep_r4.py -> results/hardened_sweep_r4.log.
Accuracy (rel_err) rows remain valid.] (N=10k, fp32, single chip).

v1 (``ops/linalg.py::cholesky_blocked``) lost to XLA's stock kernel
(24.0 vs 22.6 ms): its full trailing update costs 2N^3/3 gemm flops and its
panels go through a wide-RHS triangular_solve.  v2 fixes both:

  * trailing updates touch only lower block-columns (syrk shape, ~N^3/3)
  * the panel solve becomes a gemm: trtri the b x b diagonal block once,
    then panel = A[e:, s:e] @ Lkk^-T  (MXU instead of triangular_solve)

Prints one JSON line per (block, variant).
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 10_240  # multiple of every tested block size
DT = jnp.float32
PREC = lax.Precision.HIGH


def chol_v2(A, block=512):
    n = A.shape[-1]
    P = n // block
    b = block
    L = jnp.zeros_like(A)
    eye_b = jnp.eye(b, dtype=A.dtype)
    for k in range(P):
        s, e = k * b, (k + 1) * b
        Lkk = jnp.linalg.cholesky(A[s:e, s:e])
        L = L.at[s:e, s:e].set(Lkk)
        if k + 1 == P:
            break
        Lkk_inv = lax.linalg.triangular_solve(Lkk, eye_b, left_side=True,
                                              lower=True)
        panel = jnp.matmul(A[e:, s:e], Lkk_inv.T, precision=PREC)  # [m, b]
        L = L.at[e:, s:e].set(panel)
        # syrk-shaped trailing update: only lower block-columns j > k
        for j in range(k + 1, P):
            js, je = j * b, (j + 1) * b
            pj = panel[js - e:je - e]                              # [b, b]
            A = A.at[js:, js:je].add(
                -jnp.matmul(panel[js - e:], pj.T, precision=PREC))
    return L


def timeit(fn, *args, iters=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    G = rng.normal(size=(N, 64)).astype(np.float32)
    A = jnp.asarray(G @ G.T + N * np.eye(N, dtype=np.float32))

    chol = jax.jit(jnp.linalg.cholesky)
    L0 = chol(A)
    print(json.dumps({"op": "cholesky_stock_10240",
                      "ms": round(timeit(chol, A), 3)}), flush=True)

    for b in (512, 1024):
        f = jax.jit(partial(chol_v2, block=b))
        Lb = f(A)
        err = float(jnp.linalg.norm(jnp.tril(Lb) - jnp.tril(L0))
                    / jnp.linalg.norm(jnp.tril(L0)))
        print(json.dumps({"op": f"chol_v2_b{b}", "ms": round(timeit(f, A), 3),
                          "rel_err_vs_stock": round(err, 9)}), flush=True)


if __name__ == "__main__":
    main()
