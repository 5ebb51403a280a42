"""Blocked trtri/lauum restructuring sweep (N=10k, fp32, single chip).

The round-3 anatomy run measured tri_inv_blocked at 15.0 ms (HIGH) and
lauum at 10.5 ms (DEFAULT) against MXU-peak ideals of ~5 and ~1.7 ms —
16-34% utilization.  Suspects: the O(P²) concatenates the trtri inner
loop rebuilds per (i, j) pair, and lauum's 55 separate tall-skinny gemms.
This sweep measures:

  * trtri v1 (shipped, concat per pair)   blocks {1024, 2048}
  * trtri v2 (per-column slice buffer)    blocks {1024, 2048}
  * lauum v1 (shipped, per-pair gemms)    blocks {1024, 2048}
  * lauum v2 (one wide gemm per block-column) blocks {1024, 2048}

all verified against the shipped implementations, timed median-of-5.
Prints JSON lines.  Run alone with a long timeout (remote compiles).
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

from edrgp_tpu.ops.linalg import (_pad_tri, sym_square_from_tri_inv,
                                  tri_inv_blocked, tri_solve)

N = 10_000
DT = jnp.float32
HIGH = lax.Precision.HIGH
DEFAULT = lax.Precision.DEFAULT


def tri_inv_v2(L, block=1024, precision=HIGH):
    """trtri with a per-column [N, b] slice buffer — same N³/6 MACs as the
    shipped version, no per-pair concatenates."""
    n = L.shape[-1]
    Lp, P = _pad_tri(L, block)
    b = block
    eye_b = jnp.eye(b, dtype=L.dtype)
    Dinv = [tri_solve(Lp[i * b:(i + 1) * b, i * b:(i + 1) * b], eye_b,
                      lower=True) for i in range(P)]
    cols = []
    for j in range(P):
        C = jnp.zeros((P * b, b), L.dtype)
        C = C.at[j * b:(j + 1) * b].set(Dinv[j])
        for i in range(j + 1, P):
            T = jnp.matmul(Lp[i * b:(i + 1) * b, j * b:i * b],
                           C[j * b:i * b], precision=precision)
            C = C.at[i * b:(i + 1) * b].set(
                -jnp.matmul(Dinv[i], T, precision=precision))
        cols.append(C)
    return jnp.concatenate(cols, axis=1)[:n, :n]


def lauum_v2_sym(Linv, block=1024, precision=DEFAULT):
    """LinvᵀLinv with ONE wide gemm per block-column: block-column j of
    the upper triangle is Lp[jb:, :(j+1)b]ᵀ · Lp[jb:, jb:(j+1)b].  The
    block-diagonal blocks come out full and symmetric, so the full matrix
    is U + Uᵀ − blockdiag(U)."""
    n = Linv.shape[-1]
    Lp, P = _pad_tri(Linv, block)
    b = block
    rowblocks = []
    for j in range(P):
        tall = Lp[j * b:, :(j + 1) * b]                  # [N−jb, (j+1)b]
        colj = Lp[j * b:, j * b:(j + 1) * b]             # [N−jb, b]
        cj = jnp.matmul(tall.T, colj, precision=precision)   # [(j+1)b, b]
        cj = jnp.concatenate(
            [cj, jnp.zeros(((P - 1 - j) * b, b), Linv.dtype)], axis=0)
        rowblocks.append(cj)
    U = jnp.concatenate(rowblocks, axis=1)       # upper-block-tri (full diag)
    bd = jnp.zeros_like(U)
    for j in range(P):
        bd = bd.at[j * b:(j + 1) * b, j * b:(j + 1) * b].set(
            U[j * b:(j + 1) * b, j * b:(j + 1) * b])
    return (U + U.T - bd)[:n, :n]


def timeit(fn, *args, iters=10, blocks=5, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    per = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        per.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(per)), per


def emit(name, ms, per, extra=None):
    rec = {"op": name, "ms": round(ms, 3),
           "spread_pct": round(100 * (max(per) - min(per)) / ms, 1)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(N, 24)).astype(np.float32)
    K = jnp.asarray(A @ A.T + N * np.eye(N, dtype=np.float32))
    L = jnp.linalg.cholesky(K)
    jax.block_until_ready(L)

    ref_linv = np.asarray(jax.jit(partial(tri_inv_blocked,
                                          precision=HIGH))(L))
    for b in (1024, 2048):
        f1 = jax.jit(partial(tri_inv_blocked, block=b, precision=HIGH))
        ms, per = timeit(f1, L)
        emit(f"trtri_v1_b{b}_HIGH", ms, per)
        f2 = jax.jit(partial(tri_inv_v2, block=b, precision=HIGH))
        out = np.asarray(f2(L))
        err = float(np.linalg.norm(out - ref_linv) / np.linalg.norm(ref_linv))
        ms, per = timeit(f2, L)
        emit(f"trtri_v2_b{b}_HIGH", ms, per, {"rel_err_vs_v1": err})

    Linv = jnp.asarray(ref_linv)
    ref_kinv = np.asarray(jax.jit(partial(sym_square_from_tri_inv,
                                          precision=HIGH))(Linv))
    for b in (1024, 2048):
        f1 = jax.jit(partial(sym_square_from_tri_inv, block=b,
                             precision=DEFAULT))
        ms, per = timeit(f1, Linv)
        emit(f"lauum_v1_b{b}_DEFAULT", ms, per)
        f2 = jax.jit(partial(lauum_v2_sym, block=b, precision=DEFAULT))
        out = np.asarray(f2(Linv))
        err = float(np.linalg.norm(out - ref_kinv) / np.linalg.norm(ref_kinv))
        ms, per = timeit(f2, Linv)
        emit(f"lauum_v2_b{b}_DEFAULT", ms, per, {"rel_err_vs_v1_HIGH": err})


if __name__ == "__main__":
    main()
