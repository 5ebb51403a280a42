"""Pallas wire-or-retire benchmark [SUPERSEDED TIMING —
this script's dispatch-loop timeit is void on the r4 host
(results/timing_probe_r4.log); the valid re-measurement is
benchmarks/hardened_sweep_r4.py -> results/hardened_sweep_r4.log.
Accuracy (rel_err) rows remain valid.] (VERDICT r3 #4): on-hardware numbers for
the two fused RBF kernels in ``ops/pallas/rbf.py`` against the production
XLA paths they would replace.

  * K(X,X) construction: ``rbf_kernel_matrix`` (Pallas, fused sq-dist+exp in
    VMEM) vs the production jnp build (``ops/kernels.py`` RBF.K, matmul at
    HIGHEST precision).
  * dmu/dx*: ``rbf_grad_mu`` (Pallas, never materializes the [M, N]
    cross-kernel in HBM) vs autodiff ``predict_mean_grad`` (one-shot vmap)
    and ``predict_mean_grad_batched`` (lax.map chunks).

Prints one JSON line per measurement; accuracy is reported relative to the
HIGHEST-precision XLA path.  Run on TPU (one process at a time):

    python benchmarks/pallas_tpu.py | tee results/pallas_tpu_r4.log
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from edrgp_tpu.ops import exact  # noqa: E402
from edrgp_tpu.ops.kernels import RBF, inv_positive  # noqa: E402
from edrgp_tpu.ops.pallas.rbf import rbf_grad_mu, rbf_kernel_matrix  # noqa: E402

Q = 10


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
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def emit(**kw):
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def bench_kmatrix(rng):
    k = RBF(Q, ARD=True)
    for n in (4096, 10240, 20480):
        X = jnp.asarray(rng.normal(size=(n, Q)).astype(np.float32))
        ls = jnp.asarray(np.linspace(0.8, 2.0, Q).astype(np.float32))
        params = {"variance": inv_positive(jnp.float32(1.3)),
                  "lengthscale": inv_positive(ls)}

        prod = jax.jit(lambda p, x: k.K(p, x, x))
        K0 = prod(params, X)
        ms_prod = timeit(prod, params, X)
        emit(op=f"kmatrix_xla_jnp_N{n}", ms=ms_prod, gbytes=n * n * 4 / 1e9)

        Xs = X / ls
        sig2 = jnp.float32(1.3)
        pal = lambda a: rbf_kernel_matrix(a, a, sig2)  # noqa: E731
        Kp = pal(Xs)
        emit(op=f"kmatrix_pallas_N{n}", ms=timeit(pal, Xs),
             rel_err_vs_xla_highest=rel_err(Kp, K0))
        del K0, Kp


def bench_gradmu(rng):
    n_train = 10240
    k = RBF(Q, ARD=True)
    X = jnp.asarray(rng.normal(size=(n_train, Q)).astype(np.float32))
    ls_np = np.linspace(0.8, 2.0, Q).astype(np.float32)
    ls = jnp.asarray(ls_np)
    params = {"kernel": {"variance": inv_positive(jnp.float32(1.3)),
                         "lengthscale": inv_positive(ls)},
              "raw_noise": inv_positive(jnp.float32(0.1))}
    alpha = jnp.asarray(rng.normal(size=n_train).astype(np.float32))
    sig2 = jnp.float32(1.3)

    for m in (10_240, 102_400, 1_048_576):
        Xnew = jnp.asarray(rng.normal(size=(m, Q)).astype(np.float32))

        ref = None
        if m <= 10_240:  # one-shot vmap materializes [M, N] pushforward
            f0 = lambda xn: exact.predict_mean_grad(  # noqa: E731
                k, params, X, alpha, xn)
            ref = f0(Xnew)
            emit(op=f"gradmu_xla_oneshot_M{m}", ms=timeit(f0, Xnew))

        fb = lambda xn: exact.predict_mean_grad_batched(  # noqa: E731
            k, params, X, alpha, xn, 4096)
        gb = fb(Xnew)
        row = {"op": f"gradmu_xla_batched4096_M{m}", "ms": timeit(fb, Xnew)}
        if ref is not None:
            row["rel_err_vs_oneshot"] = rel_err(gb, ref)
        emit(**row)
        ref = gb if ref is None else ref

        fp = lambda xn: rbf_grad_mu(xn, X, alpha, ls, sig2)  # noqa: E731
        gp = fp(Xnew)
        emit(op=f"gradmu_pallas_M{m}", ms=timeit(fp, Xnew),
             rel_err_vs_xla=rel_err(gp, ref))
        del ref, gb, gp


def bench_precision(rng):
    """The in-kernel 3-pass hi/lo bf16 split ('high') vs single-pass
    default: does the Pallas speed advantage survive fp32-grade accuracy?"""
    k = RBF(Q, ARD=True)
    n = 10240
    X = jnp.asarray(rng.normal(size=(n, Q)).astype(np.float32))
    ls = jnp.asarray(np.linspace(0.8, 2.0, Q).astype(np.float32))
    params = {"variance": inv_positive(jnp.float32(1.3)),
              "lengthscale": inv_positive(ls)}
    prod = jax.jit(lambda p, x: k.K(p, x, x))
    K0 = prod(params, X)
    Xs = X / ls
    sig2 = jnp.float32(1.3)
    pal_hi = lambda a: rbf_kernel_matrix(a, a, sig2,  # noqa: E731
                                         precision="high")
    Kp = pal_hi(Xs)
    emit(op=f"kmatrix_pallas_high_N{n}", ms=timeit(pal_hi, Xs),
         rel_err_vs_xla_highest=rel_err(Kp, K0))
    del K0, Kp

    full = {"kernel": params,
            "raw_noise": inv_positive(jnp.float32(0.1))}
    alpha = jnp.asarray(rng.normal(size=n).astype(np.float32))
    for m in (102_400, 1_048_576):
        Xnew = jnp.asarray(rng.normal(size=(m, Q)).astype(np.float32))
        fb = lambda xn: exact.predict_mean_grad_batched(  # noqa: E731
            k, full, X, alpha, xn, 4096)
        ref = fb(Xnew)
        fp = lambda xn: rbf_grad_mu(xn, X, alpha, ls, sig2,  # noqa: E731
                                    precision="high")
        gp = fp(Xnew)
        emit(op=f"gradmu_pallas_high_M{m}", ms=timeit(fp, Xnew),
             rel_err_vs_xla=rel_err(gp, ref))
        del ref, gp


def main():
    emit(note="pallas wire-or-retire", backend=jax.default_backend(),
         device=str(jax.devices()[0]))
    rng = np.random.default_rng(0)
    if len(sys.argv) > 1 and sys.argv[1] == "precision":
        bench_precision(rng)
        return
    bench_kmatrix(rng)
    bench_gradmu(rng)


if __name__ == "__main__":
    main()
