"""TPU-native covariance kernels.

Replaces the reference's GPy kernel zoo (bound at
``/root/reference/edrgp/gp_model/base.py:111-147``: kernels are looked up by
string name in ``GPy.kern``, receive ``input_dim`` plus user options, and are
summed with ``+``).  Here each kernel is a *static spec object* (hashable,
safe to close over under ``jax.jit``) whose parameters live in a separate
pytree of unconstrained arrays, so the whole hyperparameter vector can be
optimized with a single jitted L-BFGS and differentiated with ``jax.grad``.

Design notes (TPU-first):
  * All stationary kernels route through one pairwise squared-distance
    computation built on a matmul (``x·xᵀ``) so the O(N²Q) work lands on the
    MXU; the elementwise tail (exp, etc.) is fused by XLA.
  * Parameters are stored unconstrained; ``positive``/``inv_positive``
    (softplus bijector, matching GPy's Logexp transform) map to the
    constrained space inside the kernel evaluation, keeping optimizers
    unconstrained exactly like GPy's ML-II.
  * ``ARD=True`` gives per-dimension lengthscales (reference usage:
    ``tests/test_edr.py:126``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "positive",
    "inv_positive",
    "Kernel",
    "RBF",
    "Exponential",
    "Matern32",
    "Matern52",
    "RatQuad",
    "Linear",
    "Bias",
    "White",
    "Cosine",
    "StdPeriodic",
    "Poly",
    "MLP",
    "Sum",
    "Product",
    "make_kernel",
    "KERNEL_REGISTRY",
    "register_kernel",
]

_SOFTPLUS_CUTOFF = 30.0


def positive(raw: jnp.ndarray) -> jnp.ndarray:
    """Softplus bijector raw → (0, inf); linear for large raw (stable)."""
    return jnp.where(raw > _SOFTPLUS_CUTOFF, raw, jnp.log1p(jnp.exp(-jnp.abs(raw))) + jnp.maximum(raw, 0.0))


def inv_positive(value) -> jnp.ndarray:
    """Inverse softplus: value → raw such that positive(raw) == value."""
    value = jnp.asarray(value)
    return jnp.where(value > _SOFTPLUS_CUTOFF, value, jnp.log(jnp.expm1(jnp.clip(value, 1e-30, None))))


def _safe_sqrt(r2: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a nonzero-gradient-safe floor (grad at 0 would be inf)."""
    return jnp.sqrt(jnp.maximum(r2, 1e-36))


def _KPREC():
    """Precision for the O(N²Q) kernel-matrix matmuls, resolved at trace
    time from :func:`edrgp_tpu.config.kernel_precision` (default HIGHEST).

    K-construction is bandwidth-bound (Q is small), so extra MXU passes are
    free — and the DEFAULT single-pass bf16 product is NOT acceptable here:
    it perturbs K by ~1e-2·‖x‖² absolute, which rivals the likelihood noise
    floor σ² and turns the NLML into a rough surface.  L-BFGS tolerates that
    roughness; MCMC does not — the first TPU NUTS captures collapsed to
    ε≈1e-4 with split-R̂ in the hundreds because dual averaging was chasing
    bf16 noise, not posterior curvature (results/tpu_nuts_r3b.log)."""
    from ..config import kernel_precision
    return kernel_precision()


def sq_dist(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances ‖aᵢ−bⱼ‖² via the MXU-friendly matmul trick."""
    a2 = jnp.sum(A * A, axis=-1)[:, None]
    b2 = jnp.sum(B * B, axis=-1)[None, :]
    ab = jnp.matmul(A, B.T, precision=_KPREC())
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


class Kernel:
    """Base class: static spec + pytree params.

    Subclasses define ``_param_spec`` (name → default constrained value,
    possibly per-dimension when ARD) plus ``K``/``Kdiag``.
    """

    stationary = False

    def __init__(self, input_dim: int, active_dims: Optional[Sequence[int]] = None,
                 name: Optional[str] = None):
        self.input_dim = int(input_dim)
        self.active_dims = None if active_dims is None else tuple(int(d) for d in active_dims)
        self.name = name or type(self).__name__

    # -- spec identity (lets specs be closed over / compared) ---------------
    def _key(self) -> tuple:
        return (type(self).__name__, self.input_dim, self.active_dims)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, Kernel) and self._key() == other._key()

    def __repr__(self):
        return f"{type(self).__name__}(input_dim={self.input_dim})"

    # -- params -------------------------------------------------------------
    def init_params(self, dtype=jnp.float64) -> dict:
        """Unconstrained params pytree with GPy-compatible defaults (1.0)."""
        raise NotImplementedError

    def _slice(self, X: jnp.ndarray) -> jnp.ndarray:
        if self.active_dims is None:
            return X
        return X[..., jnp.array(self.active_dims)]

    # -- evaluation ----------------------------------------------------------
    def K(self, params: dict, X1: jnp.ndarray, X2: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def Kdiag(self, params: dict, X: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def __add__(self, other: "Kernel") -> "Sum":
        parts = []
        for k in (self, other):
            parts.extend(k.kernels if isinstance(k, Sum) else [k])
        return Sum(parts)

    def __mul__(self, other: "Kernel") -> "Product":
        parts = []
        for k in (self, other):
            parts.extend(k.kernels if isinstance(k, Product) else [k])
        return Product(parts)


class _Stationary(Kernel):
    """Kernels of the scaled distance r = ‖(x−x′)/ℓ‖."""

    stationary = True

    def __init__(self, input_dim, variance=1.0, lengthscale=1.0, ARD=False,
                 active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self.ARD = bool(ARD)
        self._default_variance = float(variance)
        self._default_lengthscale = lengthscale

    def _key(self):
        return super()._key() + (self.ARD,)

    @property
    def _n_active(self) -> int:
        return len(self.active_dims) if self.active_dims is not None else self.input_dim

    def init_params(self, dtype=jnp.float64) -> dict:
        n_ls = self._n_active if self.ARD else 1
        ls = jnp.asarray(self._default_lengthscale, dtype)
        ls = jnp.broadcast_to(ls, (n_ls,))
        return {
            "variance": inv_positive(jnp.asarray(self._default_variance, dtype)),
            "lengthscale": inv_positive(ls),
        }

    def _r2(self, params, X1, X2) -> jnp.ndarray:
        ls = positive(params["lengthscale"])
        X1 = self._slice(X1) / ls
        X2 = self._slice(X2) / ls
        return sq_dist(X1, X2)

    def _from_r2(self, variance, r2):
        raise NotImplementedError

    def K(self, params, X1, X2):
        v = positive(params["variance"])
        return self._from_r2(v, self._r2(params, X1, X2))

    def Kdiag(self, params, X):
        v = positive(params["variance"])
        return jnp.full((X.shape[0],), v, X.dtype)


class RBF(_Stationary):
    """k(x,x′) = σ² exp(−r²/2).  GPy.kern.RBF equivalent."""

    def _from_r2(self, v, r2):
        return v * jnp.exp(-0.5 * r2)


class Exponential(_Stationary):
    """Matérn-1/2: σ² exp(−r)."""

    def _from_r2(self, v, r2):
        return v * jnp.exp(-_safe_sqrt(r2))


class Matern32(_Stationary):
    def _from_r2(self, v, r2):
        r = _safe_sqrt(r2) * math.sqrt(3.0)
        return v * (1.0 + r) * jnp.exp(-r)


class Matern52(_Stationary):
    def _from_r2(self, v, r2):
        r = _safe_sqrt(r2) * math.sqrt(5.0)
        return v * (1.0 + r + r * r / 3.0) * jnp.exp(-r)


class RatQuad(_Stationary):
    """σ² (1 + r²/2)^(−α), with learnable power α (GPy.kern.RatQuad)."""

    def __init__(self, input_dim, variance=1.0, lengthscale=1.0, power=2.0,
                 ARD=False, active_dims=None, name=None):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)
        self._default_power = float(power)

    def init_params(self, dtype=jnp.float64):
        p = super().init_params(dtype)
        p["power"] = inv_positive(jnp.asarray(self._default_power, dtype))
        return p

    def _from_r2(self, v, r2):
        raise NotImplementedError  # needs power; override K instead

    def K(self, params, X1, X2):
        v = positive(params["variance"])
        a = positive(params["power"])
        r2 = self._r2(params, X1, X2)
        return v * jnp.exp(-a * jnp.log1p(0.5 * r2))


class Cosine(_Stationary):
    """σ² cos(r)."""

    def _from_r2(self, v, r2):
        return v * jnp.cos(_safe_sqrt(r2))


class StdPeriodic(Kernel):
    """σ² exp(−2 Σ_d sin²(π(x_d−x′_d)/p_d)/ℓ_d²)  (GPy.kern.StdPeriodic)."""

    def __init__(self, input_dim, variance=1.0, period=1.0, lengthscale=1.0,
                 ARD1=False, ARD2=False, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self.ARD1, self.ARD2 = bool(ARD1), bool(ARD2)
        self._defaults = (float(variance), period, lengthscale)

    def _key(self):
        return super()._key() + (self.ARD1, self.ARD2)

    @property
    def _n_active(self):
        return len(self.active_dims) if self.active_dims is not None else self.input_dim

    def init_params(self, dtype=jnp.float64):
        v, p, l = self._defaults
        n1 = self._n_active if self.ARD1 else 1
        n2 = self._n_active if self.ARD2 else 1
        return {
            "variance": inv_positive(jnp.asarray(v, dtype)),
            "period": inv_positive(jnp.broadcast_to(jnp.asarray(p, dtype), (n1,))),
            "lengthscale": inv_positive(jnp.broadcast_to(jnp.asarray(l, dtype), (n2,))),
        }

    def K(self, params, X1, X2):
        v = positive(params["variance"])
        p = positive(params["period"])
        ls = positive(params["lengthscale"])
        X1, X2 = self._slice(X1), self._slice(X2)
        diff = X1[:, None, :] - X2[None, :, :]
        s = jnp.sin(math.pi * diff / p) / ls
        return v * jnp.exp(-2.0 * jnp.sum(s * s, axis=-1))

    def Kdiag(self, params, X):
        return jnp.full((X.shape[0],), positive(params["variance"]), X.dtype)


class Linear(Kernel):
    """k(x,x′) = Σ_d σ_d² x_d x′_d (per-dim variances when ARD)."""

    def __init__(self, input_dim, variances=1.0, ARD=False, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self.ARD = bool(ARD)
        self._default_variances = variances

    def _key(self):
        return super()._key() + (self.ARD,)

    @property
    def _n_active(self):
        return len(self.active_dims) if self.active_dims is not None else self.input_dim

    def init_params(self, dtype=jnp.float64):
        n = self._n_active if self.ARD else 1
        v = jnp.broadcast_to(jnp.asarray(self._default_variances, dtype), (n,))
        return {"variances": inv_positive(v)}

    def K(self, params, X1, X2):
        v = positive(params["variances"])
        X1, X2 = self._slice(X1), self._slice(X2)
        return jnp.matmul(X1 * v, X2.T, precision=_KPREC())

    def Kdiag(self, params, X):
        v = positive(params["variances"])
        X = self._slice(X)
        return jnp.sum(X * X * v, axis=-1)


class Bias(Kernel):
    """Constant kernel σ²."""

    def __init__(self, input_dim, variance=1.0, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self._default_variance = float(variance)

    def init_params(self, dtype=jnp.float64):
        return {"variance": inv_positive(jnp.asarray(self._default_variance, dtype))}

    def K(self, params, X1, X2):
        v = positive(params["variance"])
        return jnp.full((X1.shape[0], X2.shape[0]), v, X1.dtype)

    def Kdiag(self, params, X):
        return jnp.full((X.shape[0],), positive(params["variance"]), X.dtype)


class White(Kernel):
    """White noise: σ² I on matching sets, 0 cross-covariance (GPy semantics)."""

    def __init__(self, input_dim, variance=1.0, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self._default_variance = float(variance)

    def init_params(self, dtype=jnp.float64):
        return {"variance": inv_positive(jnp.asarray(self._default_variance, dtype))}

    def K(self, params, X1, X2):
        v = positive(params["variance"])
        if X1 is X2:
            # Same-set evaluation (identity only — a same-SHAPE test set is
            # still a different set): σ² on the diagonal, matching GPy.
            return v * jnp.eye(X1.shape[0], dtype=X1.dtype)
        return jnp.zeros((X1.shape[0], X2.shape[0]), X1.dtype)

    def Kdiag(self, params, X):
        return jnp.full((X.shape[0],), positive(params["variance"]), X.dtype)


class Poly(Kernel):
    """σ² (w·(x·x′) + b)^order  (GPy.kern.Poly: scale weight + bias)."""

    def __init__(self, input_dim, variance=1.0, scale=1.0, bias=1.0, order=3,
                 active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self.order = int(order)
        self._defaults = (float(variance), float(scale), float(bias))

    def _key(self):
        return super()._key() + (self.order,)

    def init_params(self, dtype=jnp.float64):
        v, s, b = self._defaults
        return {
            "variance": inv_positive(jnp.asarray(v, dtype)),
            "scale": inv_positive(jnp.asarray(s, dtype)),
            "bias": inv_positive(jnp.asarray(b, dtype)),
        }

    def K(self, params, X1, X2):
        v = positive(params["variance"])
        s = positive(params["scale"])
        b = positive(params["bias"])
        X1, X2 = self._slice(X1), self._slice(X2)
        return v * (s * jnp.matmul(X1, X2.T, precision=_KPREC()) + b) ** self.order

    def Kdiag(self, params, X):
        v = positive(params["variance"])
        s = positive(params["scale"])
        b = positive(params["bias"])
        X = self._slice(X)
        return v * (s * jnp.sum(X * X, axis=-1) + b) ** self.order


class MLP(Kernel):
    """Arcsine (neural-network) kernel, GPy.kern.MLP."""

    def __init__(self, input_dim, variance=1.0, weight_variance=1.0,
                 bias_variance=1.0, ARD=False, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self.ARD = bool(ARD)
        self._defaults = (float(variance), weight_variance, float(bias_variance))

    def _key(self):
        return super()._key() + (self.ARD,)

    @property
    def _n_active(self):
        return len(self.active_dims) if self.active_dims is not None else self.input_dim

    def init_params(self, dtype=jnp.float64):
        v, w, b = self._defaults
        n = self._n_active if self.ARD else 1
        return {
            "variance": inv_positive(jnp.asarray(v, dtype)),
            "weight_variance": inv_positive(jnp.broadcast_to(jnp.asarray(w, dtype), (n,))),
            "bias_variance": inv_positive(jnp.asarray(b, dtype)),
        }

    def K(self, params, X1, X2):
        v = positive(params["variance"])
        w = positive(params["weight_variance"])
        b = positive(params["bias_variance"])
        X1, X2 = self._slice(X1), self._slice(X2)
        prod = jnp.matmul(X1 * w, X2.T, precision=_KPREC()) + b
        d1 = jnp.sum(X1 * X1 * w, axis=-1) + b
        d2 = jnp.sum(X2 * X2 * w, axis=-1) + b
        denom = jnp.sqrt((1.0 + 2.0 * d1)[:, None] * (1.0 + 2.0 * d2)[None, :])
        t = jnp.clip(2.0 * prod / denom, -1.0, 1.0)
        return v * (2.0 / math.pi) * jnp.arcsin(t)

    def Kdiag(self, params, X):
        v = positive(params["variance"])
        w = positive(params["weight_variance"])
        b = positive(params["bias_variance"])
        X = self._slice(X)
        d = jnp.sum(X * X * w, axis=-1) + b
        t = jnp.clip(2.0 * d / (1.0 + 2.0 * d), -1.0, 1.0)
        return v * (2.0 / math.pi) * jnp.arcsin(t)


class Sum(Kernel):
    """Sum of kernels; params is a tuple of the children's param dicts.

    Mirrors the reference's ``np.sum([kern(**opt) ...])`` composition at
    ``gp_model/base.py:146``.
    """

    def __init__(self, kernels: Sequence[Kernel]):
        kernels = list(kernels)
        super().__init__(kernels[0].input_dim, None, "Sum")
        self.kernels: Tuple[Kernel, ...] = tuple(kernels)

    def _key(self):
        return ("Sum",) + tuple(k._key() for k in self.kernels)

    def init_params(self, dtype=jnp.float64):
        return tuple(k.init_params(dtype) for k in self.kernels)

    def K(self, params, X1, X2):
        return sum(k.K(p, X1, X2) for k, p in zip(self.kernels, params))

    def Kdiag(self, params, X):
        return sum(k.Kdiag(p, X) for k, p in zip(self.kernels, params))


class Product(Kernel):
    """Product of kernels (GPy's ``*`` composition); params is a tuple of
    the children's param dicts."""

    def __init__(self, kernels: Sequence[Kernel]):
        kernels = list(kernels)
        super().__init__(kernels[0].input_dim, None, "Product")
        self.kernels: Tuple[Kernel, ...] = tuple(kernels)

    def _key(self):
        return ("Product",) + tuple(k._key() for k in self.kernels)

    def init_params(self, dtype=jnp.float64):
        return tuple(k.init_params(dtype) for k in self.kernels)

    def K(self, params, X1, X2):
        out = self.kernels[0].K(params[0], X1, X2)
        for k, p in zip(self.kernels[1:], params[1:]):
            out = out * k.K(p, X1, X2)
        return out

    def Kdiag(self, params, X):
        out = self.kernels[0].Kdiag(params[0], X)
        for k, p in zip(self.kernels[1:], params[1:]):
            out = out * k.Kdiag(p, X)
        return out


KERNEL_REGISTRY = {
    "RBF": RBF,
    "ExpQuad": RBF,  # GPy alias
    "Exponential": Exponential,
    "Matern12": Exponential,
    "OU": Exponential,
    "Matern32": Matern32,
    "Matern52": Matern52,
    "RatQuad": RatQuad,
    "Linear": Linear,
    "Bias": Bias,
    "White": White,
    "Cosine": Cosine,
    "StdPeriodic": StdPeriodic,
    "PeriodicExponential": StdPeriodic,
    "Poly": Poly,
    "MLP": MLP,
}


def register_kernel(name: str, cls) -> None:
    KERNEL_REGISTRY[name] = cls


def make_kernel(kernels, kernel_options, input_dim: int) -> Kernel:
    """String(s) + options → Kernel, honoring gp_model/base.py:111-147.

    * ``None`` → default RBF.
    * a Kernel instance → passthrough.
    * str or list of str → registry lookup, options merged with
      ``input_dim``, summed.
    """
    if kernels is None:
        return RBF(input_dim)
    if isinstance(kernels, Kernel):
        return kernels
    if isinstance(kernels, str):
        kernels = [kernels]
    if isinstance(kernel_options, dict):
        kernel_options = [kernel_options]
    if kernel_options is None:
        kernel_options = [{}] * len(kernels)
    if len(kernel_options) != len(kernels):
        raise ValueError(
            "kernel_options must have the same length as kernels "
            f"({len(kernel_options)} != {len(kernels)})")
    parts = []
    for name, opts in zip(kernels, kernel_options):
        if name not in KERNEL_REGISTRY:
            raise ValueError(f"Unknown kernel {name!r}; known: {sorted(KERNEL_REGISTRY)}")
        opts = dict(opts)
        opts["input_dim"] = input_dim
        parts.append(KERNEL_REGISTRY[name](**opts))
    return parts[0] if len(parts) == 1 else Sum(parts)
