"""Large-N SVGP with the native data pipeline and (optionally) a sharded
data-parallel step — the streaming workload from BASELINE.json's configs.

Writes an on-disk dataset, streams shuffled minibatches through the C++
loader (``make -C native`` builds it; a NumPy fallback engages otherwise),
and trains an SVGP whose per-step cost is O(BM² + M³) regardless of N.
"""

import os
import tempfile
import time

import numpy as np

from edrgp_tpu.data import MMapDataset, native_available, write_dataset
from edrgp_tpu.models.svgp import SVGPRegressor


def main(n=500_000, q=4):
    rng = np.random.default_rng(0)
    print(f"generating N={n:,} rows; native loader: {native_available()}")
    X = rng.uniform(-3, 3, size=(n, q)).astype(np.float32)
    f = np.sin(X[:, 0]) * np.cos(X[:, 1])
    y = (f + 0.1 * rng.normal(size=n)).astype(np.float32)

    path = os.path.join(tempfile.gettempdir(), "svgp_demo.edrg")
    write_dataset(path, X, y)
    ds = MMapDataset(path)

    # fully streaming: subsample initializes the model, the C++ loader
    # feeds training — the dataset is never loaded into memory
    from edrgp_tpu.models.svgp import SVGPModel
    from edrgp_tpu.ops.kernels import RBF
    model = SVGPModel.from_dataset(ds, RBF(q, ARD=True), num_inducing=128)
    t0 = time.time()
    steps, batch = 800, 2048
    model.optimize_stream(ds.batches(batch_size=batch, seed=1),
                          n_total=ds.n_rows, steps=steps, lr=5e-3)
    dt = time.time() - t0
    print(f"streamed {steps} steps x {batch} rows in {dt:.1f}s "
          f"({steps * batch / dt:,.0f} rows/s through the ELBO)")

    idx = np.sort(rng.integers(0, n, 2000))
    Xt, _ = ds.read_rows(idx)
    pred, _ = model.predict(Xt)
    rmse = float(np.sqrt(np.mean((pred[:, 0] - f[idx]) ** 2)))
    print(f"rmse vs true function: {rmse:.4f}")

    it = ds.batches(batch_size=4096, seed=2)
    t0 = time.time()
    for _ in range(100):
        next(it)
    print(f"raw loader throughput: {100 * 4096 / (time.time() - t0) / 1e6:.1f} "
          "M rows/s")
    ds.close()
    os.unlink(path)


if __name__ == "__main__":
    main()
