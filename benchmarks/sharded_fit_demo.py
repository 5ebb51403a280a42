"""Distributed exact-GP fit demonstration on the 8-device virtual mesh.

VERDICT r2 missing #3 asked for the sharded exact GP to be *consumable*:
an optimize-compatible fit path plus a demonstration at an N whose kernel
matrix exceeds one device's memory share.  This script:

  1. fits ExactGPModel.optimize_sharded on an 8-device mesh and checks it
     reaches the single-device optimum (same NLML), recording wall times;
  2. compiles the sharded and single-device NLML value+grad programs at
     N=16384 and reports XLA's own memory analysis: per-device temp bytes
     for the sharded program vs the single-device program — the committed
     evidence that per-device working set is O(N²/p) (the full fp32
     kernel matrix alone is N²·4B = 1.0 GiB at N=16384; a 16 GiB chip
     holding ~3 such N×N temps caps out near N≈35k single-device, while
     the p=8 sharded program's per-device share extends reach ~√8×).

Virtual CPU devices (2 physical cores) — wall-clock here pins machinery,
not ICI scaling.  Writes results/SHARDED_FIT_r03.json.
"""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from edrgp_tpu.models.state import ExactGPModel
from edrgp_tpu.ops import exact as _exact
from edrgp_tpu.ops.kernels import RBF, inv_positive
from edrgp_tpu.parallel.exact_sharded import (
    make_sharded_nlml_value_and_grad, shard_rows)
from edrgp_tpu.parallel.mesh import make_mesh

OUT = {}


def fit_demo(n=1024, q=4):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(n, q)).astype(np.float32)
    f = np.sin(1.3 * X[:, 0]) + 0.5 * np.cos(X[:, 1])
    y = (f + 0.1 * rng.normal(size=n)).astype(np.float32)
    mesh = make_mesh(("data",), devices=jax.devices()[:8])

    t0 = time.time()
    m_sh = ExactGPModel(X, y, RBF(q, ARD=True), dtype=jnp.float32)
    m_sh.optimize_sharded(mesh=mesh, max_iters=30)
    t_sh = time.time() - t0

    t0 = time.time()
    m_1 = ExactGPModel(X, y, RBF(q, ARD=True), dtype=jnp.float32)
    m_1.optimize(max_iters=30)
    t_1 = time.time() - t0

    ll_sh, ll_1 = m_sh.log_likelihood(), m_1.log_likelihood()
    OUT["fit"] = {
        "n": n, "q": q, "devices": 8,
        "loglik_sharded": round(ll_sh, 4), "loglik_single": round(ll_1, 4),
        "rel_gap": round(abs(ll_sh - ll_1) / abs(ll_1), 8),
        "wall_s_sharded": round(t_sh, 1), "wall_s_single": round(t_1, 1),
        "note": "virtual mesh on 2 cores: sharded wall-clock includes 8x "
                "emulation overhead; the artifact pins optimizer "
                "equivalence, not speed",
    }
    print(json.dumps({"stage": "fit", **OUT["fit"]}), flush=True)


def memory_demo(n=16384, q=4, n_exec=8192):
    """XLA memory analysis at N=16384 (compile only — executing a 16k³
    problem on 2 emulated CPU cores takes ~10 min for no extra evidence),
    plus one executed sharded eval at N=8192."""
    dtype = jnp.float32
    rng = np.random.default_rng(1)
    kernel = RBF(q, ARD=True)
    params = {"kernel": kernel.init_params(dtype),
              "raw_noise": inv_positive(jnp.asarray(0.1, dtype))}
    mesh = make_mesh(("data",), devices=jax.devices()[:8])

    X = jnp.asarray(rng.normal(size=(n, q)), dtype)
    y = jnp.asarray(np.sin(rng.normal(size=n)), dtype)
    Xs, ys = shard_rows(mesh, "data", X, y)
    fn_sh = make_sharded_nlml_value_and_grad(kernel, mesh)
    ma_sh = fn_sh.lower(params, Xs, ys).compile().memory_analysis()

    fn_1 = jax.jit(jax.value_and_grad(
        lambda p: _exact.nlml(kernel, p, X, y)))
    ma_1 = fn_1.lower(params).compile().memory_analysis()

    def gib(x):
        return round(x / 2 ** 30, 3)

    OUT["memory"] = {
        "n": n, "q": q, "kernel_matrix_gib": gib(4 * n * n),
        "sharded_temp_gib_per_device": gib(ma_sh.temp_size_in_bytes),
        "single_temp_gib": gib(ma_1.temp_size_in_bytes),
        "temp_ratio": round(ma_1.temp_size_in_bytes
                            / max(ma_sh.temp_size_in_bytes, 1), 2),
        "sharded_args_gib_per_device": gib(ma_sh.argument_size_in_bytes),
        "single_args_gib": gib(ma_1.argument_size_in_bytes),
    }
    # prove the sharded program executes beyond the fit-demo scale
    Xe = jnp.asarray(rng.normal(size=(n_exec, q)), dtype)
    ye = jnp.asarray(np.sin(rng.normal(size=n_exec)), dtype)
    Xes, yes = shard_rows(mesh, "data", Xe, ye)
    fn_e = make_sharded_nlml_value_and_grad(kernel, mesh)
    t0 = time.time()
    v, g = fn_e(params, Xes, yes)
    jax.block_until_ready(v)
    OUT["memory"]["executed_n"] = n_exec
    OUT["memory"]["sharded_eval_wall_s"] = round(time.time() - t0, 1)
    OUT["memory"]["nlml"] = round(float(v), 2)
    print(json.dumps({"stage": "memory", **OUT["memory"]}), flush=True)


def main():
    fit_demo()
    memory_demo()
    out = os.path.join(os.path.dirname(__file__), "..", "results",
                       "SHARDED_FIT_r03.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(OUT, f, indent=1)
    print(json.dumps({"written": os.path.relpath(out)}), flush=True)


if __name__ == "__main__":
    main()
