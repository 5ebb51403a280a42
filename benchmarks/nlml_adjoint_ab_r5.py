"""Hardware A/B for the fused-Pallas NLML kernel adjoint (r5; the last
unswept term of the headline anatomy — BENCH_NOTES r4 "adjoint floor"
estimated the dK → dθ contraction at ~3.5 ms of the 38.6 ms value+grad).

Times the full NLML value+gradient at N=10k with the readback harness,
EDRGP_PALLAS_NLML=off (stock XLA autodiff contraction) vs auto (fused
Pallas backward), plus a gradient-agreement check.  Wire-or-retire rule:
the fast path stays default-auto only if it wins here.

Writes results/NLML_ADJOINT_AB_r05.json.
"""

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from _timing import scan_ms_per_op  # noqa: E402

from edrgp_tpu import config as cfg  # noqa: E402
from edrgp_tpu.ops import exact  # noqa: E402
from edrgp_tpu.ops.kernels import RBF, inv_positive  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "NLML_ADJOINT_AB_r05.json")


def emit(**kw):
    print(json.dumps(kw, default=float), flush=True)
    return kw


def measure(mode, N=10_000, Q=8, k=10, samples=5):
    cfg.set_pallas_nlml_mode(mode)
    jax.clear_caches()
    kernel = RBF(Q, ARD=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(N, Q)), jnp.float32)
    y = jnp.asarray(np.sin(rng.normal(size=N)), jnp.float32)

    def vg_op(params):
        return jax.value_and_grad(lambda p: exact.nlml(kernel, p, X, y))(
            params)

    def params_at(seed):
        key = jax.random.PRNGKey(seed)
        p = {"kernel": kernel.init_params(jnp.float32),
             "raw_noise": inv_positive(jnp.asarray(0.1, jnp.float32))}
        return jax.tree_util.tree_map(
            lambda a: a + 1e-3 * jax.random.normal(
                jax.random.fold_in(key, 1), a.shape, a.dtype)
            if a.ndim else a, p)

    med_ms, sample_ms = scan_ms_per_op(
        vg_op, [params_at(i) for i in range(samples + 1)], k=k)
    val, grads = vg_op(params_at(0))
    flat = np.concatenate([np.asarray(g).ravel()
                           for g in jax.tree_util.tree_leaves(grads)])
    cfg.set_pallas_nlml_mode(None)
    return med_ms, sample_ms, float(val), flat


def main():
    res = {"config": {"N": 10_000, "Q": 8, "dtype": "float32"}}
    ms_off, s_off, v_off, g_off = measure("off")
    res["off"] = emit(mode="off", ms_per_eval=round(ms_off, 2),
                      evals_per_s=round(1e3 / ms_off, 2),
                      samples_ms=[round(s, 2) for s in s_off])
    ms_on, s_on, v_on, g_on = measure("auto")
    rel = float(np.max(np.abs(g_on - g_off)
                       / np.maximum(np.abs(g_off), 1e-3)))
    res["auto"] = emit(mode="auto", ms_per_eval=round(ms_on, 2),
                       evals_per_s=round(1e3 / ms_on, 2),
                       samples_ms=[round(s, 2) for s in s_on])
    res["agreement"] = emit(
        value_rel=abs(v_on - v_off) / abs(v_off),
        grad_max_rel=rel,
        speedup=round(ms_off / ms_on, 3),
        ms_saved=round(ms_off - ms_on, 2))

    # the f32 restarts default vmaps the NLML backward: prove the fused
    # adjoint compiles and agrees UNDER VMAP on hardware (Mosaic batching)
    def vmapped_check(mode, N=10_000, Q=8, R=5):
        cfg.set_pallas_nlml_mode(mode)
        jax.clear_caches()
        kernel = RBF(Q, ARD=True)
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.normal(size=(N, Q)), jnp.float32)
        y = jnp.asarray(np.sin(rng.normal(size=N)), jnp.float32)
        base = {"kernel": kernel.init_params(jnp.float32),
                "raw_noise": inv_positive(jnp.asarray(0.1, jnp.float32))}
        batch = jax.tree_util.tree_map(
            lambda a: jnp.stack([a + 0.05 * i for i in range(R)]), base)
        v, g = jax.vmap(jax.value_and_grad(
            lambda p: exact.nlml(kernel, p, X, y)))(batch)
        flat = np.concatenate([np.asarray(l).ravel()
                               for l in jax.tree_util.tree_leaves(g)])
        cfg.set_pallas_nlml_mode(None)
        return np.asarray(v), flat

    v_v_off, g_v_off = vmapped_check("off")
    v_v_on, g_v_on = vmapped_check("auto")
    res["vmapped"] = emit(
        stage="vmapped_restarts_path",
        values_match=bool(np.allclose(v_v_on, v_v_off, rtol=1e-5)),
        grad_max_rel=float(np.max(np.abs(g_v_on - g_v_off)
                                  / np.maximum(np.abs(g_v_off), 1e-3))),
        finite=bool(np.all(np.isfinite(g_v_on))))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    emit(written=os.path.relpath(OUT))


if __name__ == "__main__":
    main()
