"""Adjoint-floor sweep [SUPERSEDED TIMING —
this script's dispatch-loop timeit is void on the r4 host
(results/timing_probe_r4.log); the valid re-measurement is
benchmarks/hardened_sweep_r4.py -> results/hardened_sweep_r4.log.
Accuracy (rel_err) rows remain valid.] (VERDICT r3 #8): the one restructure not yet swept.

The NLML value+grad floor at N=10k is the explicit K⁻¹ in the trace-form
adjoint: trtri-HIGH 15.0 ms + lauum-DEFAULT 10.5 ms of the 41.5 ms/eval.
Candidates measured here on the real chip, at production precisions
(trtri HIGH, lauum DEFAULT), against the shipped blocked versions:

  * tri_inv_dc / sym_square_dc — divide & conquer: all O(N³) work in a few
    near-square half-size gemms (best MXU shapes, ~2× the gemm flops of
    the triangle-aware blocking);
  * tri_inv_rowbatch / sym_square_colbatch — same recursions, strip gemms
    batched into one launch per block-row/column (identical or ~1.35×
    flops, P launches instead of ~P²/2).

Also times the end-to-end NLML value+grad program with the best combo
wired in, and its gradient accuracy vs a HIGHEST-precision reference.
Adopt-or-retire: winners get wired into logdet_and_quad; losers land in
BENCH_NOTES as the closing negative result.

    python benchmarks/kinv_fused_tpu.py | tee results/kinv_fused_r4.log
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

from edrgp_tpu.ops.linalg import (sym_square_colbatch, sym_square_dc,  # noqa: E402
                                  sym_square_from_tri_inv, tri_inv_blocked,
                                  tri_inv_dc, tri_inv_rowbatch)

N = 10_240
HIGH = jax.lax.Precision.HIGH
DEFAULT = jax.lax.Precision.DEFAULT
HIGHEST = jax.lax.Precision.HIGHEST


def timeit(fn, *args, iters=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def emit(**kw):
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def main():
    emit(note="kinv fused sweep", backend=jax.default_backend(), N=N)
    rng = np.random.default_rng(0)
    G = rng.normal(size=(N, 64)).astype(np.float32)
    A = jnp.asarray(G @ G.T + N * np.eye(N, dtype=np.float32))
    L = jax.jit(jnp.linalg.cholesky)(A)
    jax.block_until_ready(L)

    # reference inverse at HIGHEST for accuracy scoring
    ref_inv = jax.jit(partial(tri_inv_blocked, precision=HIGHEST))(L)
    jax.block_until_ready(ref_inv)

    trtri_variants = {
        "trtri_blocked_b1024_HIGH": jax.jit(
            partial(tri_inv_blocked, block=1024, precision=HIGH)),
        "trtri_dc_leaf1024_HIGH": jax.jit(
            partial(tri_inv_dc, leaf=1024, precision=HIGH)),
        "trtri_dc_leaf512_HIGH": jax.jit(
            partial(tri_inv_dc, leaf=512, precision=HIGH)),
        "trtri_rowbatch_b1024_HIGH": jax.jit(
            partial(tri_inv_rowbatch, block=1024, precision=HIGH)),
        "trtri_dc_leaf1024_DEFAULT": jax.jit(
            partial(tri_inv_dc, leaf=1024, precision=DEFAULT)),
    }
    best_trtri, best_trtri_ms = None, 1e9
    for name, fn in trtri_variants.items():
        out = fn(L)
        ms = timeit(fn, L)
        err = rel_err(out, ref_inv)
        emit(op=name, ms=ms, rel_err_vs_highest=err)
        # production requires ~HIGH-grade error (~<3e-5 on Linv)
        if ms < best_trtri_ms and err < 3e-5:
            best_trtri, best_trtri_ms = name, ms
    emit(best_trtri=best_trtri, ms=best_trtri_ms)

    Linv = ref_inv
    ref_kinv = jax.jit(partial(sym_square_from_tri_inv,
                               precision=HIGHEST))(Linv)
    jax.block_until_ready(ref_kinv)

    lauum_variants = {
        "lauum_blocked_b1024_DEFAULT": jax.jit(
            partial(sym_square_from_tri_inv, block=1024, precision=DEFAULT)),
        "lauum_dc_leaf1024_DEFAULT": jax.jit(
            partial(sym_square_dc, leaf=1024, precision=DEFAULT)),
        "lauum_dc_leaf512_DEFAULT": jax.jit(
            partial(sym_square_dc, leaf=512, precision=DEFAULT)),
        "lauum_colbatch_b1024_DEFAULT": jax.jit(
            partial(sym_square_colbatch, block=1024, precision=DEFAULT)),
        "lauum_dc_leaf1024_HIGH": jax.jit(
            partial(sym_square_dc, leaf=1024, precision=HIGH)),
    }
    best_lauum, best_lauum_ms = None, 1e9
    for name, fn in lauum_variants.items():
        out = fn(Linv)
        ms = timeit(fn, Linv)
        err = rel_err(out, ref_kinv)
        emit(op=name, ms=ms, rel_err_vs_highest=err)
        # lauum tolerance: single product, bf16-level error acceptable
        # (the r3 MIXED finding); still record it
        if ms < best_lauum_ms and err < 5e-3:
            best_lauum, best_lauum_ms = name, ms
    emit(best_lauum=best_lauum, ms=best_lauum_ms)


if __name__ == "__main__":
    main()
