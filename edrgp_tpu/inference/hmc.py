"""Hamiltonian Monte Carlo with window adaptation, built for vmapped chains.

The reference has no Bayesian-inference story at all (GPy's ML-II only);
this module is the chain-parallel scaling layer from BASELINE.json's north
star: trajectories are fixed-length (TPU-friendly — no data-dependent
control flow in the hot loop), proposals are drawn multinomially from the
whole trajectory (Betancourt 2017) which dominates last-state Metropolis
HMC, chains vectorize with ``vmap``, and step-size adaptation can be
*pooled across chains and hosts* by passing ``axis_name`` (a ``pmean``
inside the adaptation — SURVEY.md §2.3 chain-parallel row).

All functions take ``logprob_fn: params_pytree -> scalar``; params are flat
vectors here (use :func:`ravel_pytree` adapters at the call site).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

__all__ = ["HMCState", "AdaptState", "hmc_step", "window_adaptation_init",
           "window_adaptation_update", "find_reasonable_epsilon", "run_hmc",
           "run_hmc_pytree"]


class HMCState(NamedTuple):
    q: jnp.ndarray          # position [D]
    logp: jnp.ndarray       # log target at q
    grad: jnp.ndarray       # ∇ log target at q


class AdaptState(NamedTuple):
    """Dual-averaging step size + Welford diagonal mass matrix."""
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_avg: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray
    w_mean: jnp.ndarray     # Welford running mean [D]
    w_m2: jnp.ndarray       # Welford running M2 [D]
    inv_mass: jnp.ndarray   # current diagonal inverse mass [D]


def init_state(logprob_fn: Callable, q: jnp.ndarray) -> HMCState:
    logp, grad = jax.value_and_grad(logprob_fn)(q)
    return HMCState(q=q, logp=logp, grad=grad)


def _leapfrog(logprob_fn, q, p, grad, eps, inv_mass, n_steps):
    """n fixed leapfrog steps; returns trajectory of (q, logp, grad, p)."""

    def one_step(carry, _):
        q, p, grad = carry
        p = p + 0.5 * eps * grad
        q = q + eps * inv_mass * p
        logp, grad = jax.value_and_grad(logprob_fn)(q)
        p = p + 0.5 * eps * grad
        return (q, p, grad), (q, logp, grad, p)

    (_, _, _), traj = lax.scan(one_step, (q, p, grad), None, length=n_steps)
    return traj


@partial(jax.jit, static_argnums=(0, 5))
def hmc_step(logprob_fn: Callable, state: HMCState, key, eps, inv_mass,
             n_steps: int):
    """One multinomial-HMC transition.

    Samples the next state from the *whole* trajectory with weights
    ∝ exp(logp − ½pᵀM⁻¹p) (energy-conserving multinomial scheme), rather
    than accept/reject on the endpoint.  Returns (state, info dict).
    """
    key_mom, key_choice = jax.random.split(key)
    p0 = jax.random.normal(key_mom, state.q.shape, state.q.dtype) / jnp.sqrt(inv_mass)
    energy0 = state.logp - 0.5 * jnp.sum(p0 * p0 * inv_mass)

    qs, logps, grads, ps = _leapfrog(logprob_fn, state.q, p0, state.grad,
                                     eps, inv_mass, n_steps)
    energies = logps - 0.5 * jnp.sum(ps * ps * inv_mass, axis=-1)
    # numerical safety: divergent energies get -inf weight
    log_w = jnp.where(jnp.isfinite(energies), energies - energy0, -jnp.inf)
    # include the initial point with weight 1
    log_w_all = jnp.concatenate([jnp.zeros((1,), log_w.dtype), log_w])
    idx = jax.random.categorical(key_choice, log_w_all)

    q_all = jnp.concatenate([state.q[None], qs])
    logp_all = jnp.concatenate([state.logp[None], logps])
    grad_all = jnp.concatenate([state.grad[None], grads])
    new = HMCState(q=q_all[idx], logp=logp_all[idx], grad=grad_all[idx])

    accept_stat = jnp.mean(jnp.minimum(1.0, jnp.exp(log_w)))
    diverged = jnp.any(~jnp.isfinite(energies))
    return new, {"accept_stat": accept_stat, "diverged": diverged,
                 "energy": -new.logp}


def find_reasonable_epsilon(logprob_fn: Callable, state: HMCState, key,
                            inv_mass=None, eps0: float = 1.0,
                            max_doublings: int = 20) -> jnp.ndarray:
    """Hoffman-Gelman ε init: double/halve until the one-leapfrog accept
    ratio crosses 0.5.  Jittable; non-finite energies count as reject."""
    dt = state.q.dtype
    if inv_mass is None:
        inv_mass = jnp.ones_like(state.q)
    p0 = jax.random.normal(key, state.q.shape, dt) / jnp.sqrt(inv_mass)
    energy0 = state.logp - 0.5 * jnp.sum(p0 * p0 * inv_mass)

    def accept(eps):
        p_half = p0 + 0.5 * eps * state.grad
        q = state.q + eps * inv_mass * p_half
        logp, grad = jax.value_and_grad(logprob_fn)(q)
        p = p_half + 0.5 * eps * grad
        energy = logp - 0.5 * jnp.sum(p * p * inv_mass)
        a = jnp.exp(jnp.minimum(energy - energy0, 0.0))
        return jnp.where(jnp.isfinite(energy), a, jnp.asarray(0.0, dt))

    eps = jnp.asarray(eps0, dt)
    d = jnp.where(accept(eps) > 0.5, jnp.asarray(1.0, dt),
                  jnp.asarray(-1.0, dt))

    def cond(carry):
        eps, k = carry
        a = accept(eps)
        keep = jnp.where(d > 0, a > 0.5, a < 0.5)
        return keep & (k < max_doublings)

    def body(carry):
        eps, k = carry
        return eps * jnp.exp2(d), k + 1

    eps, _ = lax.while_loop(cond, body, (eps, jnp.int32(0)))
    # one step back toward the crossing point for the shrinking direction
    return jnp.where(d > 0, eps, eps * 2.0) / 2.0


def window_adaptation_init(q: jnp.ndarray, eps0: float = 0.1,
                           inv_mass0: jnp.ndarray | None = None) -> AdaptState:
    d = q.shape[0]
    log_eps = jnp.log(jnp.asarray(eps0, q.dtype))
    inv_mass = (jnp.ones(d, q.dtype) if inv_mass0 is None
                else jnp.broadcast_to(jnp.asarray(inv_mass0, q.dtype), (d,)))
    return AdaptState(
        log_eps=log_eps,
        log_eps_avg=log_eps,
        h_avg=jnp.zeros((), q.dtype),
        mu=jnp.log(10.0) + log_eps,
        count=jnp.zeros((), q.dtype),
        w_mean=jnp.zeros(d, q.dtype),
        w_m2=jnp.zeros(d, q.dtype),
        inv_mass=inv_mass,
    )


def curvature_inv_mass(logprob_fn: Callable, q: jnp.ndarray,
                       floor: float = 1e-6) -> jnp.ndarray:
    """Diagonal inverse-mass init from the target's curvature at ``q``.

    Per dimension: inverse mass = 1 / (−∂²logp/∂q²) — the Laplace-
    approximation variance — wherever the curvature is strictly positive
    (we are at/near a mode), unit mass elsewhere.  Cost: D Hessian-vector
    products = D gradient evals (forward-over-reverse), trivially cheap
    next to warmup.

    Why it exists: the first warmup window otherwise runs under identity
    mass, and on ill-conditioned targets (a GP posterior's tight
    noise/variance dims vs prior-wide flat dims span ~65× in scale at
    N=1024) every identity-mass tree runs to max depth — measured as
    warmup costing 3× the whole sampling phase on the TPU NUTS benchmark.
    Seeding the mass with Laplace curvature makes window-1 trees shallow
    immediately; the Welford estimate then replaces it at the first
    window boundary as usual.
    """
    grad = jax.grad(logprob_fn)

    def hvp_diag(i):
        e = jnp.zeros_like(q).at[i].set(1.0)
        return jax.jvp(grad, (q,), (e,))[1][i]

    h = jax.vmap(hvp_diag)(jnp.arange(q.shape[0]))
    curv = -h
    var = jnp.where(curv > floor, 1.0 / jnp.maximum(curv, floor),
                    jnp.ones_like(curv))
    return jnp.clip(var, 1e-6, 1e6).astype(q.dtype)


def window_adaptation_update(adapt: AdaptState, q, accept_stat,
                             target: float = 0.8,
                             axis_name: str | None = None) -> AdaptState:
    """Nesterov dual averaging on ε + Welford update of the diagonal mass.

    With ``axis_name`` the acceptance statistic is pooled with ``pmean``
    across the named chain axis — the multi-host "pooled step-size
    adaptation" from the north star: every chain shares one ε without any
    host synchronization.
    """
    a = accept_stat
    if axis_name is not None:
        a = lax.pmean(a, axis_name)
    t = adapt.count + 1.0
    kappa, gamma, t0 = 0.75, 0.05, 10.0
    h_avg = (1.0 - 1.0 / (t + t0)) * adapt.h_avg + (target - a) / (t + t0)
    log_eps = adapt.mu - jnp.sqrt(t) / gamma * h_avg
    w = t ** (-kappa)
    log_eps_avg = w * log_eps + (1.0 - w) * adapt.log_eps_avg

    delta = q - adapt.w_mean
    w_mean = adapt.w_mean + delta / t
    w_m2 = adapt.w_m2 + delta * (q - w_mean)
    return adapt._replace(log_eps=log_eps, log_eps_avg=log_eps_avg,
                          h_avg=h_avg, count=t, w_mean=w_mean, w_m2=w_m2)


def _finalize_mass(adapt: AdaptState) -> AdaptState:
    """Regularized sample variance → inverse mass (Stan-style shrinkage),
    followed by a dual-averaging RESTART re-anchored at the current ε.

    The restart is load-bearing: ``count`` doubles as the Welford n and
    the dual-averaging time t, so zeroing it without also resetting
    (h_avg, μ, log_eps_avg) snapped ε back toward the *initial* anchor
    after every mass update — measured on the N=1024 GP-posterior TPU
    benchmark as ε collapsing to 1e-4, every tree pegged at max_depth,
    and split-R̂ in the hundreds (results/tpu_suite2_r3.log, first NUTS
    run).  Stan restarts dual averaging at each window boundary for
    exactly this reason."""
    n = jnp.maximum(adapt.count, 2.0)
    var = adapt.w_m2 / (n - 1.0)
    var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    eps = jnp.exp(adapt.log_eps)
    return AdaptState(
        log_eps=jnp.log(eps),
        log_eps_avg=jnp.log(eps),
        h_avg=jnp.zeros_like(adapt.h_avg),
        mu=jnp.log(10.0 * eps),
        count=jnp.zeros_like(adapt.count),
        w_mean=jnp.zeros_like(adapt.w_mean),
        w_m2=jnp.zeros_like(adapt.w_m2),
        inv_mass=var,
    )


@partial(jax.jit, static_argnames=("logprob_fn", "num_warmup", "num_samples",
                                   "n_leapfrog", "axis_name"))
def run_hmc(logprob_fn: Callable, q0: jnp.ndarray, key, *,
            num_warmup: int = 500, num_samples: int = 500,
            n_leapfrog: int = 16, target_accept: float = 0.8,
            axis_name: str | None = None):
    """Full HMC run for one chain (vmap over q0/key for many chains).

    Warmup: two halves — first adapts ε only, second also accumulates the
    diagonal mass matrix, applied at the midpoint and end (dual averaging
    restarts at each boundary, Stan-style).  ε starts from the
    Hoffman-Gelman doubling search rather than a fixed guess.  Returns
    (samples [num_samples, D], info dict of traces).
    """
    state = init_state(logprob_fn, q0)
    key, k_eps = jax.random.split(key)
    eps0 = find_reasonable_epsilon(logprob_fn, state, k_eps)
    adapt = window_adaptation_init(q0, eps0)

    half = num_warmup // 2

    def warm_step(carry, key):
        state, adapt = carry
        eps = jnp.exp(adapt.log_eps)
        state, info = hmc_step(logprob_fn, state, key, eps, adapt.inv_mass,
                               n_leapfrog)
        adapt = window_adaptation_update(adapt, state.q, info["accept_stat"],
                                         target_accept, axis_name)
        return (state, adapt), info["accept_stat"]

    keys = jax.random.split(key, num_warmup + num_samples + 1)
    (state, adapt), _ = lax.scan(warm_step, (state, adapt), keys[:half])
    adapt = _finalize_mass(adapt)
    (state, adapt), acc_warm = lax.scan(warm_step, (state, adapt),
                                        keys[half:num_warmup])
    adapt = _finalize_mass(adapt)
    eps = jnp.exp(adapt.log_eps_avg)

    def sample_step(state, key):
        state, info = hmc_step(logprob_fn, state, key, eps, adapt.inv_mass,
                               n_leapfrog)
        return state, (state.q, info["accept_stat"], info["diverged"])

    state, (qs, accs, divs) = lax.scan(sample_step, state,
                                       keys[num_warmup:num_warmup + num_samples])
    return qs, {"accept_rate": jnp.mean(accs), "divergences": jnp.sum(divs),
                "step_size": eps, "inv_mass": adapt.inv_mass}


def run_hmc_pytree(logprob_fn: Callable, init_params, key, **kw):
    """Pytree-parameter adapter around :func:`run_hmc`."""
    flat0, unravel = ravel_pytree(init_params)

    def flat_logprob(qflat):
        return logprob_fn(unravel(qflat))

    qs, info = run_hmc(flat_logprob, flat0, key, **kw)
    return jax.vmap(unravel)(qs), info
