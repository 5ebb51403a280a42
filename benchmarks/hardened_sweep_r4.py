"""Re-measurement of every r4 comparison with the readback timing harness
(benchmarks/_timing.py) after the dispatch-loop harness was proven void on
this host (results/timing_probe_r4.log).  Covers:

  * K-matrix build: production jnp (HIGHEST) vs Pallas default vs Pallas
    'high' (in-kernel 3-pass split) at N=10240;
  * dmu/dx*: XLA chunked autodiff vs Pallas default vs Pallas 'high' at
    M=102400 and M=1048576 (N_train=10240) — the wire-or-retire decision
    for the production dispatch;
  * the K^-1 candidates (trtri blocked b512/b1024 HIGH, rowbatch; lauum
    blocked b512/b1024 DEFAULT, colbatch) — the adjoint-floor sweep;
  * NLML value-only vs value+grad (locates the remainder outside
    chol+trtri+lauum).

    python benchmarks/hardened_sweep_r4.py | tee results/hardened_sweep_r4.log
"""

import json
import os
import sys
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from _timing import scan_ms_per_op  # noqa: E402
from edrgp_tpu.ops import exact  # noqa: E402
from edrgp_tpu.ops.kernels import RBF, inv_positive  # noqa: E402
from edrgp_tpu.ops.linalg import (sym_square_colbatch,  # noqa: E402
                                  sym_square_from_tri_inv, tri_inv_blocked,
                                  tri_inv_rowbatch)
from edrgp_tpu.ops.pallas.rbf import rbf_grad_mu, rbf_kernel_matrix  # noqa: E402

HIGH = jax.lax.Precision.HIGH
DEF = jax.lax.Precision.DEFAULT
N = 10_240
Q = 10


def emit(**kw):
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def run(name, op, inputs, k=6, **extra):
    med, ss = scan_ms_per_op(op, inputs, k=k)
    emit(op=name, ms=round(med, 3), samples=[round(s, 3) for s in ss],
         **extra)
    return med


def main():
    emit(note="hardened r4 sweep", backend=jax.default_backend())
    rng = np.random.default_rng(0)
    k = RBF(Q, ARD=True)
    ls = jnp.asarray(np.linspace(0.8, 2.0, Q).astype(np.float32))
    kparams = {"variance": inv_positive(jnp.float32(1.3)),
               "lengthscale": inv_positive(ls)}
    X0 = jnp.asarray(rng.normal(size=(N, Q)).astype(np.float32))
    Xs = [X0 * jnp.float32(1 + 1e-4 * i) for i in range(4)]
    sig2 = jnp.float32(1.3)

    # ---- K-matrix build -------------------------------------------------
    run("kmatrix_jnp_HIGHEST", lambda x: k.K(kparams, x, x), Xs)
    run("kmatrix_pallas_default",
        lambda x: rbf_kernel_matrix(x / ls, x / ls, sig2), Xs)
    run("kmatrix_pallas_high",
        lambda x: rbf_kernel_matrix(x / ls, x / ls, sig2, precision="high"),
        Xs)

    # accuracy (values, not timing)
    K0 = k.K(kparams, X0, X0)
    for nm, prec in (("default", "default"), ("high", "high")):
        Kp = rbf_kernel_matrix(X0 / ls, X0 / ls, sig2, precision=prec)
        err = float(jnp.linalg.norm(Kp - K0) / jnp.linalg.norm(K0))
        emit(op=f"kmatrix_pallas_{nm}_relerr", rel_err_vs_jnp_highest=err)

    # ---- dmu/dx* --------------------------------------------------------
    full = {"kernel": kparams, "raw_noise": inv_positive(jnp.float32(0.1))}
    alpha = jnp.asarray(rng.normal(size=N).astype(np.float32))

    def xla_grad(xn):
        from edrgp_tpu.ops.exact import map_batched, weighted_kernel_grad
        return map_batched(
            lambda c: weighted_kernel_grad(k, kparams, X0, alpha, c),
            xn, 4096)

    for m, kk in ((102_400, 5), (1_048_576, 3)):
        Xn0 = jnp.asarray(rng.normal(size=(m, Q)).astype(np.float32))
        Xns = [Xn0 * jnp.float32(1 + 1e-4 * i) for i in range(4)]
        run(f"gradmu_xla_batched4096_M{m}", xla_grad, Xns, k=kk)
        run(f"gradmu_pallas_default_M{m}",
            lambda xn: rbf_grad_mu(xn, X0, alpha, ls, sig2), Xns, k=kk)
        run(f"gradmu_pallas_high_M{m}",
            lambda xn: rbf_grad_mu(xn, X0, alpha, ls, sig2,
                                   precision="high"), Xns, k=kk)
        gref = xla_grad(Xn0)
        for nm in ("default", "high"):
            gp = rbf_grad_mu(Xn0, X0, alpha, ls, sig2, precision=nm)
            err = float(jnp.linalg.norm(gp - gref) / jnp.linalg.norm(gref))
            emit(op=f"gradmu_pallas_{nm}_relerr_M{m}", rel_err_vs_xla=err)
        del Xn0, Xns, gref

    # ---- K^-1 candidates ------------------------------------------------
    G = rng.normal(size=(N, 64)).astype(np.float32)
    A = jnp.asarray(G @ G.T + N * np.eye(N, dtype=np.float32))
    L0 = jax.jit(jnp.linalg.cholesky)(A)
    Ls = [L0 * jnp.float32(1 + 1e-4 * i) for i in range(4)]
    jax.block_until_ready(Ls)
    run("trtri_blocked_b1024_HIGH",
        partial(tri_inv_blocked, block=1024, precision=HIGH), Ls)
    run("trtri_blocked_b512_HIGH",
        partial(tri_inv_blocked, block=512, precision=HIGH), Ls)
    run("trtri_rowbatch_b1024_HIGH",
        partial(tri_inv_rowbatch, block=1024, precision=HIGH), Ls)
    run("lauum_blocked_b1024_DEFAULT",
        partial(sym_square_from_tri_inv, block=1024, precision=DEF), Ls)
    run("lauum_blocked_b512_DEFAULT",
        partial(sym_square_from_tri_inv, block=512, precision=DEF), Ls)
    run("lauum_colbatch_b1024_DEFAULT",
        partial(sym_square_colbatch, block=1024, precision=DEF), Ls)

    # ---- NLML decomposition ----------------------------------------------
    kernel8 = RBF(8, ARD=True)
    X8 = jnp.asarray(rng.normal(size=(10_000, 8)), jnp.float32)
    y8 = jnp.asarray(np.sin(rng.normal(size=10_000)), jnp.float32)

    def mkp(seed):
        key = jax.random.PRNGKey(seed)
        p = {"kernel": kernel8.init_params(jnp.float32),
             "raw_noise": inv_positive(jnp.asarray(0.1, jnp.float32))}
        return jax.tree_util.tree_map(
            lambda a: a + 1e-3 * jax.random.normal(
                jax.random.fold_in(key, 1), a.shape, a.dtype)
            if a.ndim else a, p)

    plist = [mkp(i) for i in range(4)]
    run("nlml_value_only_N10k",
        lambda p: exact.nlml(kernel8, p, X8, y8), plist)
    run("nlml_value_and_grad_N10k",
        lambda p: jax.value_and_grad(
            lambda q: exact.nlml(kernel8, q, X8, y8))(p), plist)


if __name__ == "__main__":
    main()
