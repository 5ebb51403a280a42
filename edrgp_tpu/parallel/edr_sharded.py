"""Data-parallel EDR composition: sharded gradient extraction + distributed
Gram accumulation.

This is the multi-chip form of the reference's core loop (fit → predictive
gradients at every training row → SVD of the gradient matrix → projector;
``/root/reference/edrgp/base.py:89-199``): gradient extraction is
embarrassingly row-parallel, and the SVD's input reduces to the [Q, Q] Gram
GᵀG — one ``psum`` away from its row-sharded pieces.  The composition:

  * every fitted GP model in this framework predicts gradients of the
    posterior mean as ∇ₓ Σᵢ wᵢ k(x, cᵢ) for some (centers C, weights w)
    pair — exact: (X, α); SGPR/SVGP: (Z, β) — exposed by
    ``model._gradient_basis()``;
  * rows of the query matrix are sharded over one mesh axis; each shard
    runs the SAME chunked/fused gradient program as the single-device path
    (:func:`edrgp_tpu.ops.exact.grad_rows`) on its rows, with (C, w, θ)
    replicated (C is [M, Q] with small M·Q — cheap to replicate);
  * the Gram matrix GᵀG is accumulated shard-locally and ``psum``-reduced
    — a [Q, Q] collective, so the projector extraction (host eigh of the
    [Q, Q] Gram) never needs the [N, Q] gradient matrix on one device.

``EffectiveDimensionalityReduction(gradient_mesh=...)`` routes its
gradient-extraction and SVD stages through this module; the sharded-vs-
single-device equality is tested on the 8-device CPU mesh
(``tests/test_edr_sharded.py``).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import exact as _exact
from ..ops.kernels import Kernel

__all__ = ["make_sharded_grad_gram", "model_gradient_gram",
           "supports_sharded_gradients"]


@lru_cache(maxsize=None)
def _grad_gram_fn(kernel: Kernel, mesh: Mesh, axis: str, chunk: int):
    """Jitted ``fn(kparams, C, w, X_sharded, n_valid) -> (G_sharded, gram)``.

    X is row-sharded (padded to a multiple of the axis size); pad rows are
    masked out of the Gram by global row index, and ``G`` comes back with
    the same row sharding (pad rows included — the caller slices).  The
    cache key is (kernel, mesh, axis, chunk): kernels are hashable static
    specs and ``Mesh`` hashes by devices+axis names, so repeated EDR
    iterations at the same shapes reuse the program.
    """
    p = mesh.shape[axis]

    def local_fn(kparams, C, w, X_local, n_valid):
        Lr = X_local.shape[0]
        s = lax.axis_index(axis)
        G_local = _exact.grad_rows(kernel, kparams, C, w, X_local, chunk)
        valid = (s * Lr + jnp.arange(Lr)) < n_valid            # pad mask
        G_masked = jnp.where(valid[:, None], G_local, 0.0)
        gram = lax.psum(G_masked.T @ G_masked, axis)           # [Q, Q]
        return G_masked, gram

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(), P(), P(), P(axis), P()),
                       out_specs=(P(axis), P()),
                       check_vma=False)
    return jax.jit(fn)


def make_sharded_grad_gram(kernel: Kernel, mesh: Mesh, axis: str = "data",
                           chunk: int = 4096):
    """Low-level entry: the jitted sharded (gradients, Gram) program for a
    kernel spec (see :func:`_grad_gram_fn`)."""
    return _grad_gram_fn(kernel, mesh, axis, int(chunk))


def supports_sharded_gradients(model) -> bool:
    """True when ``model`` exposes the (C, w) gradient basis AND has no
    prior mean function (whose dm/dx* shift is host-side and would make the
    device-side Gram wrong)."""
    return (hasattr(model, "_gradient_basis")
            and getattr(model, "mean_function", None) is None)


def model_gradient_gram(model, X, mesh: Mesh, axis: str = "data",
                        chunk: int | None = None):
    """Sharded predictive-gradient extraction + distributed Gram for a
    fitted model.

    Returns ``(G [N, Q] numpy, gram [Q, Q] numpy)`` in the model's
    ORIGINAL output scale (the y-normalizer's σ is folded into both), with
    ``gram == G.T @ G`` up to reduction order.  N need not divide the axis
    size — rows are padded and masked.
    """
    if not supports_sharded_gradients(model):
        raise TypeError(
            f"{type(model).__name__} does not support sharded gradient "
            "extraction (no _gradient_basis, or a mean_function is set)")
    kernel, kparams, C, w = model._gradient_basis()
    dtype = C.dtype
    X = jnp.asarray(X, dtype)
    N, Q = X.shape
    p = mesh.shape[axis]
    Lr = -(-N // p)
    Xp = jnp.pad(X, ((0, Lr * p - N), (0, 0)))
    Xp = jax.device_put(Xp, NamedSharding(mesh, P(axis, None)))
    if chunk is None:
        chunk = min(_exact.grad_batch_size(Lr, C.shape[0]), max(Lr, 1))
    fn = _grad_gram_fn(kernel, mesh, axis, int(chunk))
    G_sh, gram = fn(kparams, C, w, Xp, jnp.asarray(N, jnp.int32))
    scale = float(model.normalizer.std) if model.normalizer.enabled else 1.0
    G = np.asarray(G_sh)[:N] * scale
    gram = np.asarray(gram) * scale ** 2
    return G, gram
