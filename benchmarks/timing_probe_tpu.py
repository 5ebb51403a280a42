"""Timing-harness audit: some r4 measurements (trtri 0.033 ms, Pallas K
0.047 ms at N=10240) are physically impossible (the output alone is 400 MB;
the HBM write floor is ~0.5 ms), so something about repeated identical
dispatches on THIS host's tunneled runtime lies to the harness.

The probe times one op (the production blocked trtri) four ways:
  A. fixed input, block once at the end        (the old harness)
  B. fixed input, block EVERY iteration
  C. 8 pre-staged DISTINCT inputs, block at end
  D. dependent chain (each iteration's input derives from the previous
     output — forces serialization no matter what the runtime caches)

and the same A/C/D for the Pallas high-precision K build.  Whichever
variants agree with physics become the timeit used by every r4 bench.
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

from edrgp_tpu.ops.linalg import tri_inv_blocked  # noqa: E402
from edrgp_tpu.ops.pallas.rbf import rbf_kernel_matrix  # noqa: E402

N = 10_240


def emit(**kw):
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def probe(name, fn, inputs, chain=None, iters=8):
    x0 = inputs[0]
    out = fn(x0)
    jax.block_until_ready(out)   # compile+warm

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x0)
    jax.block_until_ready(out)
    emit(op=name, mode="A_fixed_block_end",
         ms=(time.perf_counter() - t0) / iters * 1e3)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(x0))
    emit(op=name, mode="B_fixed_block_each",
         ms=(time.perf_counter() - t0) / iters * 1e3)

    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(inputs[i % len(inputs)])
    jax.block_until_ready(out)
    emit(op=name, mode="C_distinct_block_end",
         ms=(time.perf_counter() - t0) / iters * 1e3)

    if chain is not None:
        x = x0
        out = fn(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
            x = chain(x0, out)
        jax.block_until_ready(out)
        emit(op=name, mode="D_dependent_chain",
             ms=(time.perf_counter() - t0) / iters * 1e3)


def main():
    emit(note="timing probe", backend=jax.default_backend(), N=N)
    rng = np.random.default_rng(0)
    G = rng.normal(size=(N, 64)).astype(np.float32)
    A = jnp.asarray(G @ G.T + N * np.eye(N, dtype=np.float32))
    L = jax.jit(jnp.linalg.cholesky)(A)
    jax.block_until_ready(L)

    scales = [jnp.float32(1.0 + 1e-4 * i) for i in range(8)]
    Ls = [jax.jit(lambda l, s: l * s)(L, s) for s in scales]
    jax.block_until_ready(Ls)

    trtri = jax.jit(partial(tri_inv_blocked, block=1024,
                            precision=jax.lax.Precision.HIGH))
    # chain: perturb L's scale by a value derived from the previous output
    chain = jax.jit(lambda l0, out: l0 * (1.0 + 1e-6 * out[0, 0] / out[0, 0]))
    probe("trtri_blocked_b1024_HIGH", trtri, Ls, chain)

    Q = 10
    Xs = [jnp.asarray(rng.normal(size=(N, Q)).astype(np.float32))
          for _ in range(8)]
    sig = jnp.float32(1.3)
    km = lambda x: rbf_kernel_matrix(x, x, sig, precision="high")  # noqa: E731
    chain_k = jax.jit(lambda x0, out: x0 * (1.0 + 0.0 * out[0, 0]))
    probe("kmatrix_pallas_high", km, Xs, chain_k)

    kmd = lambda x: rbf_kernel_matrix(x, x, sig)  # noqa: E731
    probe("kmatrix_pallas_default", kmd, Xs, chain_k)


if __name__ == "__main__":
    main()
