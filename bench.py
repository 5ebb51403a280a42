"""Headline benchmark: exact-GP NLML grad-evals/s/chip at N=10k (RBF-ARD).

This is the metric named in BASELINE.json.  The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` is the speedup over the same
computation in NumPy/LAPACK on this host's CPU — the reference's actual
execution substrate (GPy bottoms out in LAPACK).

Round-4 methodology fix: this round's host tunnel acknowledges
``block_until_ready`` in ~0.05 ms for multi-ms programs
(results/timing_probe_r4.log), so host-side dispatch-loop timing — the
r1–r3 scheme — measures nothing here.  The value+grad eval is now timed
with ``benchmarks/_timing.scan_ms_per_op``: k dependent evals chained in
ONE program, a Σ|output| readback that forces every output element (DCE-
and result-cache-proof), and the k-vs-1 difference cancelling RPC
overhead.  Validated against physics on this host: 8192³ gemm at 77% of
the v5e's 197-TFLOP/s bf16 peak (results/chip_calibration_r4b.log).

Kept from round 3: the CPU baseline is a PINNED constant (measured once
on this idle host, provenance below) instead of being re-measured on a
loaded host every run.  Re-measure with ``python bench.py
--measure-baseline``.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

import numpy as np

#: NumPy/LAPACK NLML value+gradient evals/s at N=10k (trace-form gradient,
#: the reference engine's algorithm), PINNED.  Provenance: median of 5 runs
#: of ``python bench.py --measure-baseline`` on this host, 2026-08-20,
#: otherwise idle (runs: [2.54e-3, 4.55e-3, 4.55e-3, 4.60e-3, 4.83e-3];
#: the previous scheme re-measured this on a loaded host every bench run
#: and swung vs_baseline by ±40%).  Measured at N=2500 and scaled by the
#: O(N^3) Cholesky/inverse/trace term to N=10k — optimistic for the CPU,
#: since the O(N^2 Q) kernel term scales slower than N^3.
CPU_BASELINE_EVALS_PER_S = 4.55e-3


def tpu_evals_per_s(N=10_000, Q=8, k=10, samples=5):
    """Round-4 timing-harness fix: on this round's host the tunneled
    runtime acks ``block_until_ready`` in ~0.05 ms for multi-ms programs
    (results/timing_probe_r4.log), so the r1-r3 dispatch-loop timing is
    unusable.  The eval is now timed with the dedupe/async/DCE-proof
    harness (``benchmarks/_timing.scan_ms_per_op``): k dependent
    value+grad evals chained inside ONE program through an output-derived
    carry perturbation, a Σ|output| readback forcing every element, and
    the k-vs-1 wall difference cancelling RPC overhead, over distinct
    parameter points.
    """
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
    from _timing import scan_ms_per_op

    from edrgp_tpu.ops import exact
    from edrgp_tpu.ops.kernels import RBF, inv_positive

    dtype = jnp.float32
    kernel = RBF(Q, ARD=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(N, Q)), dtype)
    y = jnp.asarray(np.sin(rng.normal(size=N)), dtype)

    def vg_op(params):
        return jax.value_and_grad(lambda p: exact.nlml(kernel, p, X, y))(
            params)

    def params_at(seed):
        key = jax.random.PRNGKey(seed)
        p = {"kernel": kernel.init_params(dtype),
             "raw_noise": inv_positive(jnp.asarray(0.1, dtype))}
        return jax.tree_util.tree_map(
            lambda a: a + 1e-3 * jax.random.normal(
                jax.random.fold_in(key, 1), a.shape, a.dtype)
            if a.ndim else a, p)

    med_ms, sample_ms = scan_ms_per_op(
        vg_op, [params_at(i) for i in range(samples + 1)], k=k)
    rates = sorted(1e3 / s for s in sample_ms)
    median = 1e3 / med_ms
    spread = 100.0 * (rates[-1] - rates[0]) / median
    nlml0 = float(vg_op(params_at(0))[0])
    return median, spread, nlml0


def measure_cpu_baseline(N_meas=2500, N_target=10_000, Q=8):
    """NumPy/LAPACK NLML + analytic gradient (trace form), one timed eval.

    Kept (and runnable via --measure-baseline) as the provenance of
    CPU_BASELINE_EVALS_PER_S; not executed on the benchmark path.
    """
    rng = np.random.default_rng(0)
    X = rng.normal(size=(N_meas, Q))
    y = np.sin(rng.normal(size=N_meas))
    ls = np.ones(Q)
    var, noise = 1.0, 0.1

    t0 = time.perf_counter()
    Xs = X / ls
    n2 = (Xs * Xs).sum(1)
    sq = np.maximum(n2[:, None] + n2[None, :] - 2 * Xs @ Xs.T, 0)
    K = var * np.exp(-0.5 * sq) + noise * np.eye(N_meas)
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    _nlml = 0.5 * (N_meas * np.log(2 * np.pi)
                   + 2 * np.log(np.diag(L)).sum() + y @ alpha)
    # dNLML/dθ = 0.5 tr((K⁻¹ − ααᵀ) dK/dθ): needs K⁻¹ and Q+2 trace products
    Kinv = np.linalg.inv(K)
    W = Kinv - np.outer(alpha, alpha)
    _ = 0.5 * (W * K).sum()                      # variance direction
    for q in range(Q):
        dq = (Xs[:, q:q + 1] - Xs[:, q:q + 1].T) ** 2
        _ = 0.5 * (W * (K * dq)).sum()           # lengthscale directions
    dt_meas = time.perf_counter() - t0

    # O(N³) scaling of the dominant chol/inv/trace terms to N_target
    dt_target = dt_meas * (N_target / N_meas) ** 3
    return 1.0 / dt_target


def main():
    value, spread_pct, nlml0 = tpu_evals_per_s()
    print(json.dumps({
        "metric": "nlml_grad_evals_per_s_per_chip_N10k",
        "value": round(value, 3),
        "unit": "evals/s",
        "vs_baseline": round(value / CPU_BASELINE_EVALS_PER_S, 1),
        "block_spread_pct": round(spread_pct, 1),
    }))


if __name__ == "__main__":
    if "--measure-baseline" in sys.argv:
        runs = sorted(measure_cpu_baseline() for _ in range(5))
        print(json.dumps({"cpu_baseline_evals_per_s_runs": runs,
                          "median": runs[2]}))
    else:
        main()
