"""Jit-compiled L-BFGS (ML-II) with vmapped multi-restart.

Replaces GPy's SciPy L-BFGS loop (reference fit path
``gp_model/base.py:67-69``: ``optimize(messages, max_iters)`` /
``optimize_restarts(num_restarts, verbose)``).  The whole optimization —
zoom line search included — runs on-device inside a single
``lax.while_loop``, so a fit is one XLA program with no host round-trips,
and restarts are *vmapped* (batched while_loop) instead of sequential.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import optax.tree_utils as otu
from jax import lax


class LBFGSResult(NamedTuple):
    params: object          # optimized pytree
    value: jnp.ndarray      # final objective value
    grad_norm: jnp.ndarray  # final gradient l2 norm
    num_iters: jnp.ndarray  # iterations taken


def _guard(fun: Callable) -> Callable:
    """Make the objective line-search-safe: non-finite values become +huge."""

    def safe(params, *args, **kw):
        v = fun(params, *args, **kw)
        return jnp.where(jnp.isfinite(v), v, jnp.asarray(1e30, v.dtype))

    return safe


def minimize(fun: Callable, init_params, *, max_iters: int = 1000,
             tol: float = 1e-6, memory_size: int = 30) -> LBFGSResult:
    """Minimize ``fun(params) -> scalar`` from ``init_params``.

    Jittable and vmappable (under vmap, the batched while_loop runs until
    every restart has converged).
    """
    fun = _guard(fun)
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=fun)
        params = optax.apply_updates(params, updates)
        return params, state

    def cond(carry):
        _, state = carry
        count = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        err = otu.tree_norm(grad)
        return (count == 0) | ((count < max_iters) & (err >= tol))

    state0 = opt.init(init_params)
    params, state = lax.while_loop(cond, step, (init_params, state0))
    grad = otu.tree_get(state, "grad")
    return LBFGSResult(
        params=params,
        value=fun(params),
        grad_norm=otu.tree_norm(grad),
        num_iters=otu.tree_get(state, "count"),
    )


# --------------------------------------------------------------------------
# Segmented execution: bounded device programs + host continuation loop.
#
# Some TPU runtimes (including this machine's tunneled worker) kill single
# XLA executions that run for minutes; a 1000-iteration L-BFGS while_loop at
# N=10k is exactly that.  The segmented driver runs the same while_loop with
# an additional per-segment iteration cap and loops on the host until the
# global convergence condition fires.  Objectives register by name so the
# jitted segment is cached per (objective, kernel, shapes) — closures over
# data would silently bake the dataset into the program.
# --------------------------------------------------------------------------

_OBJECTIVES: dict = {}


def register_objective(name: str, factory: Callable) -> None:
    """factory(kernel) -> fun(params, *data) (scalar loss to minimize)."""
    _OBJECTIVES[name] = factory


from functools import lru_cache


def _make_segment(raw: Callable, opt, max_iters: int, tol: float,
                  segment_iters: int) -> Callable:
    """Build the bounded-iteration L-BFGS segment body for
    ``raw(params, *data) -> scalar``.

    The segment carries the BEST finite iterate alongside the optimizer
    state: in float32 the zoom line search can diverge (accept a huge
    step, then walk in garbage territory until the gradient goes
    non-finite), and returning the *last* iterate then silently hands
    back an arbitrarily bad fit — observed on the TPU BriefIntro probe
    as NLML 1.7e6 vs the true optimum ~150
    (results/EDR_SCALE_r04.json brief_intro_tpu_fp32, first capture).
    The continuation state still threads the last iterate (L-BFGS may
    legitimately pass through worse points), but callers receive the
    best-seen params/value — and the gradient norm AT that best iterate
    (carried alongside, so the reported |g| always describes the returned
    params; ADVICE r4).  ``num_iters`` remains the total iteration count
    of the run, not the index of the best iterate.
    """

    def seg(params, state, best_p, best_v, best_g, *data):
        fun = _guard(lambda p: raw(p, *data))
        value_and_grad = optax.value_and_grad_from_state(fun)

        def cond(c):
            _, state, k, _, _, _ = c
            count = otu.tree_get(state, "count")
            err = otu.tree_norm(otu.tree_get(state, "grad"))
            live = (count == 0) | ((count < max_iters) & (err >= tol))
            return live & (k < segment_iters)

        def step(c):
            params, state, k, best_p, best_v, best_g = c
            value, grad = value_and_grad(params, state=state)
            better = value < best_v
            best_p = jax.tree_util.tree_map(
                lambda b, p: jnp.where(better, p, b), best_p, params)
            best_v = jnp.where(better, value, best_v)
            best_g = jnp.where(better, otu.tree_norm(grad), best_g)
            updates, state = opt.update(grad, state, params, value=value,
                                        grad=grad, value_fn=fun)
            params = optax.apply_updates(params, updates)
            return params, state, k + 1, best_p, best_v, best_g

        params, state, _, best_p, best_v, best_g = lax.while_loop(
            cond, step, (params, state, jnp.int32(0), best_p, best_v, best_g))
        final_v = fun(params)
        count = otu.tree_get(state, "count")
        # optax's linesearch leaves state.grad at the accepted (= current)
        # params, so err is the gradient norm of the final iterate.
        err = otu.tree_norm(otu.tree_get(state, "grad"))
        better = final_v < best_v
        best_p = jax.tree_util.tree_map(
            lambda b, p: jnp.where(better, p, b), best_p, params)
        best_v = jnp.where(better, final_v, best_v)
        best_g = jnp.where(better, err, best_g)
        return params, state, count, err, best_p, best_v, best_g

    return seg


@lru_cache(maxsize=None)
def _segment_runners(objective: str, kernel, max_iters: int, tol: float,
                     memory_size: int, segment_iters: int, n_data: int):
    opt = optax.lbfgs(memory_size=memory_size)
    raw = _OBJECTIVES[objective](kernel)
    seg = _make_segment(raw, opt, max_iters, tol, segment_iters)
    single = jax.jit(seg)
    batched = jax.jit(jax.vmap(seg, in_axes=(0,) * 5 + (None,) * n_data))
    return opt, single, batched


def minimize_segmented(objective: str, kernel, init_params, data: tuple, *,
                       max_iters: int = 1000, tol: float = 1e-6,
                       memory_size: int = 30,
                       segment_iters: int = 10) -> LBFGSResult:
    """Segmented L-BFGS on a registered objective (single start)."""
    opt, single, _ = _segment_runners(objective, kernel, int(max_iters),
                                      float(tol), int(memory_size),
                                      int(segment_iters), len(data))
    params, state = init_params, opt.init(init_params)
    dt = jnp.result_type(*jax.tree_util.tree_leaves(init_params))
    best_p, best_v = init_params, jnp.asarray(jnp.inf, dt)
    best_g = jnp.asarray(jnp.inf, dt)
    while True:
        params, state, count, err, best_p, best_v, best_g = single(
            params, state, best_p, best_v, best_g, *data)
        c, e = int(count), float(err)
        if c >= max_iters or (c > 0 and e < tol) or not jnp.isfinite(e):
            break
    return LBFGSResult(params=best_p, value=best_v, grad_norm=best_g,
                       num_iters=count)


def minimize_segmented_fn(fun: Callable, init_params, data: tuple = (), *,
                          max_iters: int = 1000, tol: float = 1e-6,
                          memory_size: int = 30,
                          segment_iters: int = 10) -> LBFGSResult:
    """Segmented L-BFGS over an arbitrary ``fun(params, *data) -> scalar``.

    Like :func:`minimize_segmented` but without the objective registry —
    used by the distributed fit path, whose objective closes over a
    ``jax.sharding.Mesh`` and receives already-sharded data arrays (the
    sharding propagates through the jitted segment, so the whole L-BFGS
    step — line search included — runs as one SPMD program per segment).
    The jitted segment is built per call; the persistent compile cache
    absorbs repeats.
    """
    opt = optax.lbfgs(memory_size=memory_size)
    single = jax.jit(_make_segment(fun, opt, int(max_iters), float(tol),
                                   int(segment_iters)))
    params, state = init_params, opt.init(init_params)
    dt = jnp.result_type(*jax.tree_util.tree_leaves(init_params))
    best_p, best_v = init_params, jnp.asarray(jnp.inf, dt)
    best_g = jnp.asarray(jnp.inf, dt)
    while True:
        params, state, count, err, best_p, best_v, best_g = single(
            params, state, best_p, best_v, best_g, *data)
        c, e = int(count), float(err)
        if c >= max_iters or (c > 0 and e < tol) or not jnp.isfinite(e):
            break
    return LBFGSResult(params=best_p, value=best_v, grad_norm=best_g,
                       num_iters=count)


def minimize_restarts_segmented(objective: str, kernel, init_batch,
                                data: tuple, *, max_iters: int = 1000,
                                tol: float = 1e-6, memory_size: int = 30,
                                segment_iters: int = 10) -> LBFGSResult:
    """Segmented vmapped multi-start; best run wins."""
    opt, _, batched = _segment_runners(objective, kernel, int(max_iters),
                                       float(tol), int(memory_size),
                                       int(segment_iters), len(data))
    params = init_batch
    state = jax.vmap(opt.init)(init_batch)
    n_runs = jax.tree_util.tree_leaves(init_batch)[0].shape[0]
    dt = jnp.result_type(*jax.tree_util.tree_leaves(init_batch))
    best_p = init_batch
    best_v = jnp.full((n_runs,), jnp.inf, dt)
    best_g = jnp.full((n_runs,), jnp.inf, dt)
    while True:
        params, state, count, err, best_p, best_v, best_g = batched(
            params, state, best_p, best_v, best_g, *data)
        counts = np.asarray(count)
        errs = np.asarray(err)
        done = (counts >= max_iters) | ((counts > 0) & (errs < tol)) \
            | ~np.isfinite(errs)
        if done.all():
            break
    values = jnp.where(jnp.isfinite(best_v), best_v,
                       jnp.asarray(jnp.inf, best_v.dtype))
    best = int(jnp.argmin(values))
    take = lambda t: jax.tree_util.tree_map(lambda x: x[best], t)
    return LBFGSResult(params=take(best_p), value=best_v[best],
                       grad_norm=best_g[best], num_iters=count[best])


def minimize_restarts(fun: Callable, init_batch, *, max_iters: int = 1000,
                      tol: float = 1e-6, memory_size: int = 30) -> LBFGSResult:
    """vmapped multi-start L-BFGS; returns the best run.

    ``init_batch`` is a pytree whose leaves carry a leading restart axis.
    All restarts run concurrently on one chip (TPU-idiomatic replacement for
    GPy's sequential ``optimize_restarts``), then the lowest final value
    wins; non-finite runs lose automatically.
    """
    run = lambda p0: minimize(fun, p0, max_iters=max_iters, tol=tol,
                              memory_size=memory_size)
    results = jax.vmap(run)(init_batch)
    values = jnp.where(jnp.isfinite(results.value), results.value,
                       jnp.asarray(jnp.inf, results.value.dtype))
    best = jnp.argmin(values)
    take = lambda leaf: jax.tree_util.tree_map(lambda x: x[best], leaf)
    return LBFGSResult(
        params=take(results.params),
        value=results.value[best],
        grad_norm=results.grad_norm[best],
        num_iters=results.num_iters[best],
    )
