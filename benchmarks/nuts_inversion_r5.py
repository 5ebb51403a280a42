"""Root-cause the 16→64-chain NUTS steady-state throughput inversion
(VERDICT r4 weak #1 / next #3).

r4 ladder (results/nuts_sweep_r4e.log): 16 vmapped chains sample at 109.8
samples/s/chip but 64 vmapped chains at 70.8 — quadrupling the batch
REDUCES steady-state throughput 36%.  Hypothesis: deepest-tree
synchronization.  Under vmap the NUTS doubling/subtree ``while_loop``s run
until EVERY lane finishes, so each transition costs the deepest chain's
tree; E[max over C] of the per-transition leapfrog count grows with C
while E[mean] does not, and the batched-leapfrog time itself may scale
super-linearly.  This experiment decomposes the observed wall ratio into

    wall(64)/wall(16) ≈ (E[maxₖ leaves] ratio) × (batched-eval time ratio)

by (a) recording per-transition per-chain leapfrog counts at fixed tuned
(ε, mass) for C=16 and 64, (b) timing the batched posterior value+grad at
C=16/64 with the readback harness, and (c) measuring the candidate
mitigation — run 64 chains as 4 SEQUENTIAL 16-chain groups (the exact
policy the ≥128-chain ladder points already use) — against the one-shot
64-vmap program.

Writes results/NUTS_INVERSION_r05.json; one JSON line per stage.
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
sys.path.insert(0, os.path.dirname(__file__))

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "NUTS_INVERSION_r05.json")
RES = {}


def emit(**kw):
    print(json.dumps(kw, default=float), flush=True)
    return kw


def sample_point(logprob, flat_hat, reuse, C, *, samples, segment, max_depth,
                 groups=1, seed=7):
    """Steady-state sampling at fixed (ε, mass): C chains as ``groups``
    sequential host-level runs of C/groups vmapped chains each."""
    from edrgp_tpu.inference.nuts import run_nuts_segmented

    dt = flat_hat.dtype
    per = C // groups
    marks = {"t": time.perf_counter(), "sample": []}

    def on_segment(phase, done, total):
        now = time.perf_counter()
        if phase == "sample":
            marks["sample"].append(now - marks["t"])
        marks["t"] = now

    leaves_all = []
    t0 = time.perf_counter()
    for g in range(groups):
        q0 = (jnp.tile(flat_hat[None], (per, 1))
              + 0.05 * jax.random.normal(
                  jax.random.fold_in(jax.random.PRNGKey(seed), g),
                  (per, flat_hat.shape[0]), dt))
        marks["t"] = time.perf_counter()
        _, info = run_nuts_segmented(
            logprob, q0, jax.random.fold_in(jax.random.PRNGKey(seed + 1), g),
            num_warmup=0, num_samples=samples, max_depth=max_depth,
            segment_len=segment, reuse_adaptation=reuse,
            on_segment=on_segment)
        leaves_all.append(info["leapfrogs_per_transition"])   # [S, per]
    total_wall = time.perf_counter() - t0

    # steady-state: drop each group's first segment (compile/dispatch warm)
    segs = np.asarray(marks["sample"]).reshape(groups, -1)
    steady = segs[:, 1:].ravel() if segs.shape[1] > 1 else segs.ravel()
    med_seg = float(np.median(steady))
    sps = per * segment / med_seg * 1.0            # chains advance per seg
    leaves = np.concatenate(leaves_all, axis=1)    # [S, C]
    lmean = float(leaves.mean())
    lmax_group = float(np.mean(
        [np.asarray(lv).max(axis=1).mean() for lv in leaves_all]))
    return {
        "chains": C, "groups": groups, "vmap_width": per,
        "samples_per_s_per_chip": round(sps, 2),
        "median_segment_s": round(med_seg, 3),
        "total_wall_s": round(total_wall, 1),
        "mean_leapfrogs": round(lmean, 2),
        "mean_max_leapfrogs_per_transition": round(lmax_group, 2),
        "sync_waste_ratio": round(lmax_group / lmean, 3),
        "depth_hist": {str(d): int(np.sum(np.round(np.log2(
            np.maximum(leaves, 1))).astype(int) == d))
            for d in range(0, 11)},
    }


def batched_eval_scaling(logprob, flat_hat, widths=(16, 64), k=8):
    """Time one batched vmapped value+grad of the posterior at each vmap
    width with the DCE/async-proof readback harness — the β term."""
    from _timing import scan_ms_per_op

    dt = flat_hat.dtype
    out = {}
    for C in widths:
        def op(qb):
            v, g = jax.vmap(jax.value_and_grad(logprob))(qb)
            return v, g

        qs = [jnp.tile(flat_hat[None], (C, 1))
              + 0.05 * jax.random.normal(jax.random.PRNGKey(i),
                                         (C, flat_hat.shape[0]), dt)
              for i in range(4)]
        med_ms, _ = scan_ms_per_op(op, qs, k=k)
        out[str(C)] = round(med_ms, 3)
        emit(stage="batched_eval", vmap_width=C, ms_per_eval=round(med_ms, 3))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--q", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=256)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--segment", type=int, default=8)
    ap.add_argument("--max-depth", type=int, default=8)
    args = ap.parse_args()

    from nuts_tpu import make_target
    from edrgp_tpu.inference.nuts import run_nuts_segmented

    logprob, flat_hat, inv_mass0 = make_target(args.n, args.q)
    RES["config"] = vars(args)

    # one 16-chain pooled warmup provides the shared tuned kernel
    q0 = (jnp.tile(flat_hat[None], (16, 1))
          + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                     (16, flat_hat.shape[0]),
                                     flat_hat.dtype))
    t0 = time.perf_counter()
    _, winfo = run_nuts_segmented(
        logprob, q0, jax.random.PRNGKey(0), num_warmup=args.warmup,
        num_samples=8, max_depth=args.max_depth, segment_len=args.segment,
        pool_eps=True, inv_mass0=inv_mass0)
    reuse = (np.asarray(winfo["step_size"]).ravel()[0],
             np.asarray(winfo["inv_mass"]).mean(axis=0))
    emit(stage="warmup", wall_s=round(time.perf_counter() - t0, 1),
         eps=round(float(reuse[0]), 5))

    points = []
    for C, groups in ((16, 1), (64, 1), (64, 4)):
        pt = sample_point(logprob, flat_hat, reuse, C,
                          samples=args.samples, segment=args.segment,
                          max_depth=args.max_depth, groups=groups)
        emit(stage="ladder_point", **pt)
        points.append(pt)
    RES["points"] = points

    RES["batched_eval_ms"] = batched_eval_scaling(logprob, flat_hat)

    # decomposition: observed vs predicted (sync × batched-eval scaling)
    p16, p64, p64g = points
    obs = (p16["samples_per_s_per_chip"] / p64["samples_per_s_per_chip"]
           * 64 / 16)                       # wall ratio of one transition
    sync = (p64["mean_max_leapfrogs_per_transition"]
            / p16["mean_max_leapfrogs_per_transition"])
    beta = (RES["batched_eval_ms"]["64"] / RES["batched_eval_ms"]["16"])
    RES["decomposition"] = emit(
        stage="decomposition",
        observed_wall_ratio_64_vs_16=round(obs, 3),
        sync_ratio_Emax_leaves=round(sync, 3),
        batched_eval_time_ratio=round(beta, 3),
        predicted_wall_ratio=round(sync * beta, 3),
        mitigation_seq_groups_samples_per_s=p64g["samples_per_s_per_chip"],
        onevmap_samples_per_s=p64["samples_per_s_per_chip"])

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    emit(written=os.path.relpath(OUT))


if __name__ == "__main__":
    main()
