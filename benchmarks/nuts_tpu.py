"""NUTS samples/s on a real exact-GP hyperparameter posterior (single chip).

The second headline metric in BASELINE.json ("NUTS samples/s scaling
1 chip -> N"); this measures the per-chip number on real TPU hardware.
Target: the unnormalized posterior over RBF-ARD hyperparameters (Q
lengthscales + variance + noise) of an exact GP at N data points — every
leapfrog step is an NLML gradient, i.e. a Cholesky + trace-form adjoint.

The whole run is ONE jitted program per chain batch (vmapped chains); the
config is sized to stay under the TPU worker's ~1-minute execution cap.
Prints JSON lines; run alone (tunnel contention).

Usage: python benchmarks/nuts_tpu.py [--n 1024] [--chains 16] [--samples 128]
"""

import argparse
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

from edrgp_tpu.inference.nuts import run_nuts
from edrgp_tpu.ops import exact
from edrgp_tpu.ops.kernels import RBF, inv_positive
from jax.flatten_util import ravel_pytree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--q", type=int, default=4)
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=128)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--max-depth", type=int, default=6)
    args = ap.parse_args()

    dt = jnp.float32
    rng = np.random.default_rng(0)
    kernel = RBF(args.q, ARD=True)
    X = jnp.asarray(rng.normal(size=(args.n, args.q)), dt)
    f = np.sin(1.3 * np.asarray(X[:, 0])) + 0.5 * np.cos(np.asarray(X[:, 1]))
    y = jnp.asarray(f + 0.15 * rng.normal(size=args.n), dt)

    p0 = {"kernel": kernel.init_params(dt),
          "raw_noise": inv_positive(jnp.asarray(0.1, dt))}
    flat0, unravel = ravel_pytree(p0)
    prior_scale = 3.0

    def logprob(qflat):
        params = unravel(qflat)
        # NLML + weak N(0, prior_scale) prior on the unconstrained params
        return (-exact.nlml(kernel, params, X, y)
                - 0.5 * jnp.sum((qflat / prior_scale) ** 2))

    C = args.chains
    q0 = jnp.tile(flat0[None], (C, 1)) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (C, flat0.shape[0]), dt)
    keys = jax.random.split(jax.random.PRNGKey(0), C)

    run = jax.jit(jax.vmap(lambda q, k: run_nuts(
        logprob, q, k, num_warmup=args.warmup, num_samples=args.samples,
        max_depth=args.max_depth)))

    t0 = time.perf_counter()
    qs, info = run(q0, keys)
    jax.block_until_ready(qs)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    qs, info = run(q0, keys)
    jax.block_until_ready(qs)
    dt_s = time.perf_counter() - t0

    total = C * args.samples
    leap = float(jnp.mean(info["mean_leapfrogs"]))
    accept = float(jnp.mean(info["accept_prob"])) if "accept_prob" in info else None
    print(json.dumps({
        "metric": "nuts_samples_per_s_per_chip",
        "value": round(total / dt_s, 2),
        "unit": "samples/s",
        "config": {"n": args.n, "q": args.q, "chains": C,
                   "warmup": args.warmup, "samples": args.samples,
                   "max_depth": args.max_depth},
        "grad_evals_per_s": round(total * leap / dt_s, 1),
        "mean_leapfrogs_per_sample": round(leap, 1),
        "divergences": int(jnp.sum(info["divergences"])),
        "accept": accept,
        "wall_s": round(dt_s, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
