"""BASELINE-scale configs run end-to-end on the real TPU chip.

Two of BASELINE.json's named configurations (VERDICT r1 item 8):
  * SGPR, 512 inducing points, N=100k (collapsed Titsias bound, joint Z)
  * streaming SVGP at N=1M rows fed by the native C++ loader

Each prints a JSON line with wall-clock + quality (RMSE vs the true
function, final bound).  Run alone; segments stay under the TPU worker's
~1-minute execution cap (the SGPR fit uses the segmented L-BFGS driver).

Usage: python benchmarks/baseline_scale_tpu.py [sgpr|svgp|both]
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


def _problem(n, q, rng):
    X = rng.uniform(-3, 3, size=(n, q)).astype(np.float32)
    f = np.sin(X[:, 0]) * np.cos(X[:, 1]) + 0.5 * np.tanh(X[:, 2])
    y = (f + 0.1 * rng.normal(size=n)).astype(np.float32)
    return X, y, f


def run_sgpr_100k(n=100_000, q=8, m=512, max_iters=200):
    from edrgp_tpu.models.state import SGPRModel
    from edrgp_tpu.ops.kernels import RBF

    rng = np.random.default_rng(0)
    X, y, f = _problem(n, q, rng)
    t0 = time.time()
    model = SGPRModel(X, y, RBF(q, ARD=True), num_inducing=m, seed=0)
    model.optimize(max_iters=max_iters, messages=False)
    fit_s = time.time() - t0

    idx = np.sort(rng.integers(0, n, 4000))
    pred, var = model.predict(X[idx])
    rmse = float(np.sqrt(np.mean((pred[:, 0] - f[idx]) ** 2)))
    print(json.dumps({
        "workload": "sgpr_titsias", "n": n, "q": q, "num_inducing": m,
        "max_iters": max_iters, "fit_wall_s": round(fit_s, 1),
        "elbo": round(float(model.log_likelihood()[0][0]), 1),
        "rmse_vs_truth": round(rmse, 4),
        "noise_std_truth": 0.1,
        "mean_pred_std": round(float(np.sqrt(var).mean()), 4),
    }), flush=True)


def run_svgp_1m(n=1_000_000, q=8, m=512, steps=1500, batch=4096):
    import tempfile

    from edrgp_tpu.data import MMapDataset, native_available, write_dataset
    from edrgp_tpu.models.svgp import SVGPModel
    from edrgp_tpu.ops.kernels import RBF

    rng = np.random.default_rng(1)
    X, y, f = _problem(n, q, rng)
    path = os.path.join(tempfile.gettempdir(), "svgp_1m.edrg")
    write_dataset(path, X, y)
    del X, y
    ds = MMapDataset(path)

    model = SVGPModel.from_dataset(ds, RBF(q, ARD=True), num_inducing=m)
    t0 = time.time()
    model.optimize_stream(ds.batches(batch_size=batch, seed=1),
                          n_total=ds.n_rows, steps=steps, lr=5e-3)
    fit_s = time.time() - t0

    idx = np.sort(rng.integers(0, n, 4000))
    Xt, _ = ds.read_rows(idx)
    pred, _ = model.predict(Xt)
    rmse = float(np.sqrt(np.mean((pred[:, 0] - f[idx]) ** 2)))

    it = ds.batches(batch_size=batch, seed=2)
    t0l = time.time()
    for _ in range(100):
        next(it)
    loader_rows_s = 100 * batch / (time.time() - t0l)

    ds.close()
    os.unlink(path)
    print(json.dumps({
        "workload": "svgp_streaming", "n": n, "q": q, "num_inducing": m,
        "steps": steps, "batch": batch, "native_loader": native_available(),
        "fit_wall_s": round(fit_s, 1),
        "rows_per_s_through_elbo": round(steps * batch / fit_s, 0),
        "loader_rows_per_s": round(loader_rows_s, 0),
        "rmse_vs_truth": round(rmse, 4), "noise_std_truth": 0.1,
    }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("sgpr", "both"):
        run_sgpr_100k()
    if which in ("svgp", "both"):
        run_svgp_1m()
