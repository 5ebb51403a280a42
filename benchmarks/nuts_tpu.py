"""NUTS samples/s on a real exact-GP hyperparameter posterior (single chip).

The second headline metric in BASELINE.json ("NUTS samples/s scaling
1 chip -> N"); this measures the per-chip number on real TPU hardware.
Target: the unnormalized posterior over RBF-ARD hyperparameters (Q
lengthscales + variance + noise) of an exact GP at N data points — every
leapfrog step is an NLML gradient, i.e. a Cholesky + trace-form adjoint.

Round-3 fix (VERDICT r2 missing #1): the round-2 attempt ran the whole
warmup+sampling as ONE jitted program and died on the TPU worker's
~1-minute execution cap.  This version uses
:func:`edrgp_tpu.inference.nuts.run_nuts_segmented` — bounded device
programs of ``--segment`` transitions with a host continuation loop —
and reports throughput from the median sampling segment (the first
sampling segment absorbs its compile).

Prints JSON lines; run alone (tunnel contention).

Round-4 additions: ``--sweep`` runs the BASELINE config-4 chain-scaling
ladder (16 / 64 / 256 / 1024 chains; ``--chain-chunk`` bounds per-program
memory via grouped vmap so 1024 exact-GP chains fit one chip), reporting
per point samples/s (steady-state AND including warmup+compile), R-hat
and ESS; the ML-II/MAP timer reuse and the eager clip from ADVICE r3 are
fixed.

Usage: python benchmarks/nuts_tpu.py [--n 1024] [--chains 16] [--samples 128]
       python benchmarks/nuts_tpu.py --sweep
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

from edrgp_tpu.inference.nuts import run_nuts_segmented
from edrgp_tpu.metrics import effective_sample_size, potential_scale_reduction
from edrgp_tpu.ops import exact
from edrgp_tpu.ops.kernels import RBF, inv_positive
from jax.flatten_util import ravel_pytree


def make_target(n, q, dt=jnp.float32):
    """Exact-GP hyperparameter posterior target + its (clipped) MAP mode
    and Laplace mass.  Shared across sweep points so the mode/mass cost
    is paid once."""
    rng = np.random.default_rng(0)
    kernel = RBF(q, ARD=True)
    X = jnp.asarray(rng.normal(size=(n, q)), dt)
    f = np.sin(1.3 * np.asarray(X[:, 0])) + 0.5 * np.cos(np.asarray(X[:, 1]))
    y = jnp.asarray(f + 0.15 * rng.normal(size=n), dt)

    p0 = {"kernel": kernel.init_params(dt),
          "raw_noise": inv_positive(jnp.asarray(0.1, dt))}
    flat0, unravel = ravel_pytree(p0)
    prior_scale = 3.0

    def logprob(qflat):
        params = unravel(qflat)
        # NLML + weak N(0, prior_scale) prior on the unconstrained params
        return (-exact.nlml(kernel, params, X, y)
                - 0.5 * jnp.sum((qflat / prior_scale) ** 2))

    # Start chains near the posterior mode (cheap segmented ML-II fit —
    # the first run at default init showed warmup cannot both find the
    # mode and adapt the mass matrix in 128 transitions: R-hat 112).
    from edrgp_tpu.inference.lbfgs import minimize_segmented
    import edrgp_tpu.models.state  # noqa: F401 — registers "exact_nlml"
    t_ml2 = time.perf_counter()
    res = minimize_segmented("exact_nlml", kernel, p0, (X, y),
                             max_iters=200, tol=3e-4, segment_iters=25)
    print(json.dumps({"progress": "ml2_mode", "nlml": float(res.value),
                      "wall_s": round(time.perf_counter() - t_ml2, 1)}),
          flush=True)
    # ML-II (no prior) drives the ARD lengthscales of y-irrelevant features
    # to +inf (raw ~1e4), which sits 1e6 log-prob units outside the NUTS
    # target's N(0, prior_scale) prior — chains started there spend all of
    # warmup falling down the prior cliff and the mass matrix adapts to the
    # fall, not the posterior (first r3 capture: inv_mass ~3e5 in the flat
    # dims, eps ~1e-4, split-R-hat in the hundreds).  Clip into the
    # prior's support (inside the jitted MAP refinement — no eager TPU
    # ops), then refine to the MAP of the *actual target* so the Laplace
    # mass below is taken at a true mode.
    from edrgp_tpu.inference.lbfgs import minimize_segmented_fn
    flat_hat, _ = ravel_pytree(res.params)
    clip_mode = jax.jit(lambda v: jnp.clip(v, -2.0 * prior_scale,
                                           2.0 * prior_scale))
    t_map = time.perf_counter()
    res_map = minimize_segmented_fn(
        lambda qf: -logprob(qf), clip_mode(flat_hat), max_iters=100,
        tol=3e-4, segment_iters=25)
    flat_hat = res_map.params
    print(json.dumps({"progress": "map_mode",
                      "neg_log_post": float(res_map.value),
                      "wall_s": round(time.perf_counter() - t_map, 1)}),
          flush=True)

    # Laplace curvature at the mode seeds the mass matrix: without it the
    # first warmup window runs identity-mass trees at max depth on this
    # ~65x-ill-conditioned posterior and warmup costs 3x the sampling
    # phase (results/tpu_nuts_r3c.log).
    from edrgp_tpu.inference.hmc import curvature_inv_mass
    inv_mass0 = jax.jit(lambda qf: curvature_inv_mass(logprob, qf))(flat_hat)
    print(json.dumps({"progress": "laplace_mass",
                      "inv_mass0": np.asarray(inv_mass0).round(5).tolist()}),
          flush=True)
    return logprob, flat_hat, inv_mass0


def run_point(logprob, flat_hat, inv_mass0, args, chains):
    """One ladder point.  Above ``--chain-chunk`` chains, groups run as
    SEQUENTIAL pooled runs on the host (each group identical to the
    proven single-group program) instead of ``lax.map``-grouped programs
    — on one chip the two are throughput-equivalent (groups execute
    serially either way), and the in-program grouping crashed the TPU
    worker twice at 256 chains (results/nuts_sweep_r4.err)."""
    dt = flat_hat.dtype
    C = chains
    chunk = min(C, args.chain_chunk)
    n_groups = C // chunk

    # per-segment wall clocks, stamped by the host continuation loop
    marks = {"t_last": time.perf_counter(), "warm": [], "sample": []}

    def on_segment(phase, done, total):
        now = time.perf_counter()
        dt_seg = now - marks["t_last"]
        marks["t_last"] = now
        key = "sample" if phase == "sample" else "warm"
        marks[key].append(dt_seg)
        print(json.dumps({"progress": phase, "done": done, "total": total,
                          "chains": C, "segment_s": round(dt_seg, 2)}),
              flush=True)

    t0 = time.perf_counter()
    qs_parts, infos = [], []
    reuse = None
    for g in range(n_groups):
        q0 = (jnp.tile(flat_hat[None], (chunk, 1))
              + 0.05 * jax.random.normal(
                  jax.random.fold_in(jax.random.PRNGKey(1), g),
                  (chunk, flat_hat.shape[0]), dt))
        marks["t_last"] = time.perf_counter()
        qs_g, info_g = run_nuts_segmented(
            logprob, q0, jax.random.fold_in(jax.random.PRNGKey(0), g),
            num_warmup=args.warmup, num_samples=args.samples,
            max_depth=args.max_depth, segment_len=args.segment,
            pool_eps=True, inv_mass0=inv_mass0, reuse_adaptation=reuse,
            on_segment=on_segment)
        qs_parts.append(np.asarray(qs_g))
        infos.append(info_g)
        if reuse is None:
            # warmup is paid ONCE: groups 1..G-1 sample with group 0's
            # tuned kernel (pooled ε, mean mass); split-R̂/ESS over ALL
            # chains below verifies the transfer
            reuse = (np.asarray(info_g["step_size"]).ravel()[0],
                     np.asarray(info_g["inv_mass"]).mean(axis=0))
    qs = np.concatenate(qs_parts, axis=0)
    info = {"accept_rate": float(np.mean([i["accept_rate"]
                                          for i in infos])),
            "divergences": int(sum(i["divergences"] for i in infos)),
            "step_size": infos[0]["step_size"],
            "mean_leapfrogs": float(np.mean([i["mean_leapfrogs"]
                                             for i in infos]))}
    total_wall = time.perf_counter() - t0

    # throughput from the sampling segments, excluding the first (compile);
    # each segment advances `chunk` chains (groups serialize on one chip)
    seg_times = marks["sample"][1:] or marks["sample"]
    med_seg = float(np.median(seg_times))
    full_segs = args.samples // args.segment
    seg_len = args.segment if full_segs else args.samples
    samples_per_s = chunk * seg_len / med_seg
    warm_s = float(np.sum(marks["warm"]))

    # quality: split-Rhat and ESS over the pooled chains
    rhat = potential_scale_reduction(qs)
    ess = effective_sample_size(qs)
    leap = info["mean_leapfrogs"]
    print(json.dumps({
        "metric": "nuts_samples_per_s_per_chip",
        "value": round(samples_per_s, 2),
        "unit": "samples/s",
        "config": {"n": args.n, "q": args.q, "chains": C,
                   "warmup": args.warmup, "samples": args.samples,
                   "max_depth": args.max_depth, "segment": args.segment,
                   "chain_chunk": chunk},
        "grad_evals_per_s": round(samples_per_s * leap, 1),
        "mean_leapfrogs_per_sample": round(leap, 1),
        "divergences": info["divergences"],
        "accept": round(info["accept_rate"], 3),
        "step_size": round(float(np.asarray(info["step_size"]).ravel()[0]), 5),
        "max_split_rhat": round(float(np.max(rhat)), 4),
        "min_ess": round(float(np.min(ess)), 1),
        "median_sampling_segment_s": round(med_seg, 2),
        "warmup_wall_s": round(warm_s, 1),
        "total_wall_s": round(total_wall, 1),
        "samples_per_s_incl_warmup_and_compile":
            round(C * args.samples / total_wall, 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--q", type=int, default=4)
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=256)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--max-depth", type=int, default=8)
    ap.add_argument("--segment", type=int, default=8)
    ap.add_argument("--chain-chunk", type=int, default=16,
                    help="max chains vmapped per program.  16 is the "
                    "measured throughput optimum on this target/chip "
                    "(r5, results/NUTS_INVERSION_r05.json): wider vmap "
                    "groups scale SUPER-linearly in cost (64-wide "
                    "batched value+grad costs 4.6x the 16-wide) and pay "
                    "more deepest-tree synchronization (E[max leaves] "
                    "+37% at 64), inverting throughput 126 -> 90 "
                    "samples/s; sequential 16-wide groups recover it. "
                    "Also the memory/worker-stability knob (>=128-chain "
                    "programs crash the TPU worker).")
    ap.add_argument("--sweep", action="store_true",
                    help="BASELINE config-4 ladder: 16/64/256/1024 chains")
    ap.add_argument("--ladder", type=int, nargs="*", default=None,
                    help="explicit chain ladder (overrides --sweep points)")
    args = ap.parse_args()

    logprob, flat_hat, inv_mass0 = make_target(args.n, args.q)
    ladder = tuple(args.ladder) if args.ladder else (
        (16, 64, 256, 1024) if args.sweep else (args.chains,))
    for chains in ladder:
        try:
            run_point(logprob, flat_hat, inv_mass0, args, chains)
        except Exception as e:  # crash isolation: one ladder point must
            # not cost the others their run (TPU worker crashes happen)
            print(json.dumps({"metric": "nuts_samples_per_s_per_chip",
                              "chains": chains, "error": repr(e)[:300]}),
                  flush=True)
            break


if __name__ == "__main__":
    main()
