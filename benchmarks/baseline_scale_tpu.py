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


def run_svgp_1m(n=1_000_000, q=8, m=512, steps=1500, batch=4096,
                smc=False, name="svgp_streaming"):
    import tempfile

    from edrgp_tpu.data import MMapDataset, native_available, write_dataset
    from edrgp_tpu.models.svgp import SVGPModel
    from edrgp_tpu.ops.kernels import RBF

    rng = np.random.default_rng(1)
    X, y, f = _problem(n, q, rng)
    path = os.path.join(tempfile.gettempdir(), "svgp_scale.edrg")
    write_dataset(path, X, y)
    del X, y
    ds = MMapDataset(path)

    # r5: fit TWICE (fresh model each run) — the scan-chunked
    # optimize_stream (default scan_chunk=16) divides the tunnel-RPC
    # exposure by 16; two runs measure whether the r4 wall swings
    # (60.8 → 351 s on weather) actually collapse (VERDICT r4 next #2).
    fit_walls = []
    model = None
    for run_idx in range(2):
        model = SVGPModel.from_dataset(ds, RBF(q, ARD=True), num_inducing=m)
        t0 = time.time()
        model.optimize_stream(ds.batches(batch_size=batch, seed=1),
                              n_total=ds.n_rows, steps=steps, lr=5e-3)
        fit_walls.append(time.time() - t0)
        print(json.dumps({"progress": "stream_fit", "run": run_idx,
                          "wall_s": round(fit_walls[-1], 1)}), flush=True)
    fit_s = fit_walls[-1]

    idx = np.sort(rng.integers(0, n, 4000))
    Xt, _ = ds.read_rows(idx)
    pred, _ = model.predict(Xt)
    rmse = float(np.sqrt(np.mean((pred[:, 0] - f[idx]) ** 2)))

    it = ds.batches(batch_size=batch, seed=2)
    t0l = time.time()
    for _ in range(100):
        next(it)
    loader_rows_s = 100 * batch / (time.time() - t0l)

    print(json.dumps({
        "workload": name, "n": n, "q": q, "num_inducing": m,
        "steps": steps, "batch": batch, "native_loader": native_available(),
        "fit_wall_s": round(fit_s, 1),
        "fit_wall_s_runs": [round(w, 1) for w in fit_walls],
        "fit_spread_pct": round(100.0 * (max(fit_walls) - min(fit_walls))
                                / min(fit_walls), 1),
        "scan_chunk": 16,
        "rows_per_s_through_elbo": round(steps * batch / fit_s, 0),
        "loader_rows_per_s": round(loader_rows_s, 0),
        "rmse_vs_truth": round(rmse, 4), "noise_std_truth": 0.1,
    }), flush=True)

    if smc:
        run_smc_hyper(model, ds, n)
    ds.close()
    os.unlink(path)


def run_svgp_10m_smc(n=10_000_000, q=8, m=512, steps=3000, batch=8192):
    """BASELINE config 5: N=10M streaming SVGP + on-chip SMC posterior over
    the GP hyperparameters (VERDICT r3 missing #2)."""
    run_svgp_1m(n=n, q=q, m=m, steps=steps, batch=batch, smc=True,
                name="svgp_streaming_10m")


def run_smc_hyper(model, ds, n_total, n_particles=1024, n_sub=16384,
                  particle_chunk=32, n_eff=None):
    """SMC over GP hyperparameters with the SVGP-bound likelihood on-chip.

    Target: p(θ) ∝ exp(L(θ)) · prior, where L is the SVGP evidence bound
    at the streamed fit's variational posterior q(u), with the data term
    evaluated on a FIXED random subsample of ``n_sub`` rows scaled to
    ``n_eff`` (deterministic given the subsample — SMC weights need a
    deterministic likelihood; the full-N data term neither fits one
    program nor decomposes for Titsias).  Particles are vmapped on-chip in
    groups of ``particle_chunk`` (each bound eval holds an [n_sub, m]
    cross-kernel).  Records the β-ladder, per-stage ESS + ensemble
    diagnostics, logZ and particles/s — the config-5 SMC evidence — and
    cross-checks the posterior against segmented NUTS on the IDENTICAL
    target.

    ``n_eff`` (r5): the effective data count the subsampled bound is
    scaled to.  Default ``n_sub`` — the honest posterior given the rows
    the likelihood actually evaluates.  Scaling a 16,384-row term ×610 to
    n_total=10⁷ (the r4 configuration) concentrates the posterior BELOW
    float32's resolution of the log-density (|logpost| ≈ 4.4e6 ⇒ f32
    representation noise ≈ 0.26, the same order as the 1σ log-variation)
    — on that target every sampler freezes: the r4 SMC collapsed to one
    particle, and an 8-chain NUTS run pinned each chain at its start
    (R̂ ≈ 7e4, results/svgp10m_smc_r5.log first capture).  That boundary
    is a property of fp32 at N=10⁷, not of the samplers; it is recorded
    in BENCH_NOTES.
    """
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from edrgp_tpu.inference.smc import run_smc_segmented
    from edrgp_tpu.ops import svgp as _svgp

    rng = np.random.default_rng(7)
    idx = np.sort(rng.choice(ds.n_rows, size=n_sub, replace=False))
    Xs, ys = ds.read_rows(idx)
    Xs = jnp.asarray(Xs, jnp.float32)
    ys = jnp.asarray((np.asarray(ys) - model.normalizer.mean)
                     / model.normalizer.std, jnp.float32)

    mvec, Svar = model._mS()
    Z = model.params["Z"]
    kernel = model.kernel
    theta0 = {"kernel": model.params["kernel"],
              "raw_noise": model.params["raw_noise"]}
    flat_hat, unravel = ravel_pytree(theta0)
    D = flat_hat.shape[0]
    prior_scale = 3.0
    n_eff = float(n_sub if n_eff is None else n_eff)

    def loglik(theta_flat):
        th = unravel(theta_flat)
        params = {"kernel": th["kernel"], "raw_noise": th["raw_noise"],
                  "Z": Z}
        return _svgp.svgp_elbo(kernel, params, mvec, Svar, Xs, ys, n_eff)

    def logprior(theta_flat):
        return -0.5 * jnp.sum((theta_flat / prior_scale) ** 2)

    # prior draws centered at the fit (the posterior lives within the
    # prior's support; SMC tempers from the prior to the full target)
    parts0 = (0.5 * jax.random.normal(jax.random.PRNGKey(2),
                                      (n_particles, D), jnp.float32)
              + flat_hat[None, :])

    stage_times = {"t": time.time()}

    def on_stage(i, beta, ess_val, logZ):
        now = time.time()
        dt_s = now - stage_times["t"]
        stage_times["t"] = now
        print(json.dumps({"progress": "smc_stage", "stage": i,
                          "beta": round(beta, 5), "ess": round(ess_val, 1),
                          "logZ": round(logZ, 2),
                          "stage_s": round(dt_s, 2)}), flush=True)

    t0 = time.time()
    # max_stages 60 (r5): with WORKING rejuvenation the ESS-bisected
    # ladder is geometric in β (Δβ/β ≈ const once the tempered posterior
    # is Gaussian-ish) — the r4 "22-stage convergence" was an artifact of
    # a frozen kernel degenerating the ensemble (see run_smc_segmented).
    parts, info = run_smc_segmented(
        loglik, logprior, parts0, jax.random.PRNGKey(3), num_mcmc=3,
        n_leapfrog=10, eps=0.02, particle_chunk=particle_chunk,
        max_stages=60, on_stage=on_stage)
    wall = time.time() - t0

    post_mean = np.asarray(parts).mean(0)
    post_std = np.asarray(parts).std(0)
    print(json.dumps({
        "workload": "smc_hyperposterior_tpu", "n_total": int(n_total),
        "n_sub": n_sub, "n_eff": n_eff, "particles": n_particles,
        "particle_chunk": particle_chunk, "dim": int(D),
        "converged": info["converged"], "n_stages": info["n_stages"],
        "log_evidence": round(info["log_evidence"], 2),
        "beta_ladder": [round(b, 4) for b in info["beta_trace"]],
        "min_stage_ess": round(min(info["ess_trace"]), 1),
        "stage_logw_std": [round(s, 3) for s in info["logw_std_trace"]],
        "stage_loglik_std": [round(s, 3) for s in info["loglik_std_trace"]],
        "unique_particles_after_resample":
            info["unique_particles_after_resample"],
        "eps_trace": [round(e, 6) for e in info.get("eps_trace", [])],
        "accept_trace": [round(a, 3) for a in info.get("accept_trace", [])],
        "wall_s": round(wall, 1),
        "particle_stages_per_s": round(
            n_particles * info["n_stages"] / wall, 1),
        "posterior_mean_theta": post_mean.round(4).tolist(),
        "posterior_std_theta": post_std.round(4).tolist(),
        "theta_hat_from_fit": np.asarray(flat_hat).round(4).tolist(),
    }), flush=True)

    # --- independent cross-check: segmented NUTS on the IDENTICAL target
    # (same fixed 16,384-row subsampled SVGP-bound data term, same prior)
    # — settles whether the on-chip SMC posterior is the posterior
    # (VERDICT r4 missing #3 / next #4).
    from edrgp_tpu.inference.nuts import run_nuts_segmented

    def logpost(q):
        return loglik(q) + logprior(q)

    # Chains start at SMC draws with the SMC posterior variance as mass —
    # standard preconditioning that does not bias the stationary check
    # (MCMC converges to the target from any init).  The first r5 attempt
    # started at θ̂ with Laplace-at-θ̂ mass: the posterior mode sits ~50σ
    # away on the diffuse dims (the fixed-q(u) bound's optimum over θ is
    # NOT θ̂), the mismatched mass collapsed dual averaging (ε → 0, all
    # trees at max depth, R̂ ~ 1e6 — results/svgp10m_smc_r5b.log).
    # persist the ensemble AND the full target (subsample + variational
    # state) so an offline f64 confirmation / re-analysis never needs to
    # re-run the 10M fit or the ladder
    np.savez(os.path.join(os.path.dirname(__file__), "..", "results",
                          "smc_particles_r5.npz"),
             particles=np.asarray(parts), theta_hat=np.asarray(flat_hat),
             post_mean=post_mean, post_std=post_std,
             Xs=np.asarray(Xs), ys=np.asarray(ys), Z=np.asarray(Z),
             m=np.asarray(mvec), S=np.asarray(Svar),
             n_eff=np.asarray(n_eff), prior_scale=np.asarray(prior_scale))

    C, warm, samp = 8, 128, 128
    ridx = np.random.default_rng(13).choice(parts.shape[0], C,
                                            replace=False)
    q0 = jnp.asarray(np.asarray(parts)[ridx], jnp.float32)
    inv_mass0 = np.maximum(post_std.astype(np.float64) ** 2, 1e-10)
    t0 = time.time()
    qs, ninfo = run_nuts_segmented(
        logpost, q0, jax.random.PRNGKey(12), num_warmup=warm,
        num_samples=samp, max_depth=8, segment_len=4, pool_eps=True,
        inv_mass0=np.asarray(inv_mass0, np.float32))
    nuts_wall = time.time() - t0
    flat_samples = qs.reshape(-1, D)
    nuts_mean = flat_samples.mean(0)
    nuts_std = flat_samples.std(0)
    from edrgp_tpu.metrics import effective_sample_size, \
        potential_scale_reduction
    rhat = potential_scale_reduction(qs)
    z = (post_mean - nuts_mean) / np.maximum(nuts_std, 1e-12)
    print(json.dumps({
        "workload": "smc_vs_nuts_crosscheck", "dim": int(D),
        "chains": C, "warmup": warm, "samples": samp,
        "nuts_wall_s": round(nuts_wall, 1),
        "nuts_max_split_rhat": round(float(np.max(rhat)), 4),
        "nuts_min_ess": round(float(np.min(effective_sample_size(qs))), 1),
        "nuts_divergences": int(ninfo["divergences"]),
        "nuts_accept": round(float(ninfo["accept_rate"]), 3),
        "nuts_mean_leapfrogs": round(float(ninfo["mean_leapfrogs"]), 1),
        "nuts_step_size": round(float(
            np.asarray(ninfo["step_size"]).ravel()[0]), 6),
        "nuts_mean_theta": nuts_mean.round(4).tolist(),
        "nuts_std_theta": nuts_std.round(4).tolist(),
        "smc_minus_nuts_mean_in_nuts_sigmas": z.round(3).tolist(),
        "max_abs_z": round(float(np.abs(z).max()), 3),
        "smc_over_nuts_std_ratio": (post_std / np.maximum(
            nuts_std, 1e-12)).round(3).tolist(),
    }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("sgpr", "both"):
        run_sgpr_100k()
    if which in ("svgp", "both"):
        run_svgp_1m()
    if which == "svgp10m":
        run_svgp_10m_smc()
