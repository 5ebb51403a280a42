"""Dedupe/async-proof device timing for the tunneled TPU runtime.

r4 discovery (results/timing_probe_r4.log): on this host's tunneled
runtime, host-side wall timing of repeated dispatches is unusable —
``block_until_ready`` acks in ~0.05 ms for programs whose outputs alone
cost ~0.5 ms of HBM writes, with or without per-iteration blocking or
distinct inputs.  The only signal a runtime cannot fake is a VALUE
readback: to hand the host a scalar that transitively depends on k
chained op applications, it must have executed all k.

:func:`scan_ms_per_op` therefore times
  * k applications of ``op`` inside ONE jitted program, chained through an
    output-derived carry perturbation (numerically negligible, but defeats
    CSE/hoisting and any (program, input) result cache);
  * with a host ``float()`` readback of the final probe scalar;
  * as the (k-reps − 1-rep) wall difference, cancelling dispatch/RPC/
    readback overhead;
  * over several DISTINCT inputs (a repeated identical program call could
    legally be served from a result cache).
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["scan_ms_per_op"]


def scan_ms_per_op(op, inputs, k: int = 8, salt: float = 1e-30):
    """Median device ms per ``op(x)`` application.

    ``inputs``: list of ≥2 distinct same-shape inputs (pytrees ok); one is
    used to compile, the rest produce one timing sample each.  Returns
    (median_ms, samples_ms).
    """
    def make(length):
        @jax.jit
        def rep(x):
            def body(carry, _):
                y = op(carry)
                # The probe must consume EVERY output element through a
                # non-factorable reduction: sum(y[0]) lets XLA DCE the op
                # down to one row (slice-of-dot → dot-of-slices), and a
                # plain sum of a matmul factors into rank-1 row/col sums.
                # Σ|y| admits neither rewrite.
                probe = sum(jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                            for leaf in jax.tree_util.tree_leaves(y))
                carry = jax.tree_util.tree_map(
                    lambda a: a + jnp.asarray(salt * probe, a.dtype), carry)
                return carry, probe
            _, ps = lax.scan(body, x, None, length=length)
            return ps[-1]
        return rep

    r1, rk = make(1), make(k)
    base = inputs[0]
    float(r1(base))   # compile + first (uncacheable-difference) execution
    float(rk(base))
    samples = []
    for x in inputs[1:]:
        t0 = time.perf_counter()
        float(r1(x))
        t1 = time.perf_counter()
        float(rk(x))
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (k - 1) * 1e3)
    samples_sorted = sorted(samples)
    return samples_sorted[len(samples_sorted) // 2], samples
