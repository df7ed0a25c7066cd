"""Base distributions for flows.

TPU-native replacement for the reference's use of Distributions.jl
(/root/reference/src/Flows.jl:114: default base = standard ``MvNormal``;
:167: ``rand(rng, base, n)``; :279: ``Distributions.logpdf(base, z)``).
Implemented as tiny pytree dataclasses with analytic ``log_prob`` and
key-threaded ``sample`` — everything jit-traceable, batch axis last-major
``(batch..., d)`` so both functions vectorize over arbitrary batch dims.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

__all__ = ["StandardNormal", "DiagNormal", "GaussianMixture", "BoxUniform"]

_LOG_2PI = math.log(2.0 * math.pi)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StandardNormal:
    """Standard multivariate normal N(0, I_d) — the reference's default base
    (src/Flows.jl:114)."""

    d: int = dataclasses.field(metadata=dict(static=True))

    def log_prob(self, z):
        z32 = z.astype(jnp.float32)
        return -0.5 * (self.d * _LOG_2PI + jnp.sum(z32 * z32, axis=-1))

    def sample(self, key, shape, dtype=jnp.float32):
        return jax.random.normal(key, tuple(shape) + (self.d,), dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiagNormal:
    """Diagonal-covariance normal N(mean, diag(scale²))."""

    mean: jax.Array
    scale: jax.Array

    @property
    def d(self) -> int:
        return self.mean.shape[-1]

    def log_prob(self, z):
        u = (z - self.mean) / self.scale
        u32 = u.astype(jnp.float32)
        return -0.5 * (
            self.d * _LOG_2PI + jnp.sum(u32 * u32, axis=-1)
        ) - jnp.sum(jnp.log(self.scale.astype(jnp.float32)), axis=-1)

    def sample(self, key, shape, dtype=jnp.float32):
        eps = jax.random.normal(key, tuple(shape) + (self.d,), dtype)
        return self.mean + self.scale * eps


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianMixture:
    """Mixture of K diagonal Gaussians — a multimodal base for flows whose
    targets a unimodal base reaches only through high-curvature transport.
    No reference counterpart (Distributions.jl's MixtureModel is never
    used there); standard flow practice for clustered densities.

    ``means``/``scales``: (K, d); ``logits``: (K,) unnormalized mixture
    weights. All leaves are trainable if the base is included in the
    optimized pytree (the default ``Flow`` keeps the base out of the
    model chain, so it stays fixed unless a caller opts in).
    """

    means: jax.Array
    scales: jax.Array
    logits: jax.Array

    @property
    def d(self) -> int:
        return self.means.shape[-1]

    @property
    def k(self) -> int:
        return self.means.shape[0]

    def log_prob(self, z):
        z32 = z.astype(jnp.float32)[..., None, :]      # (..., 1, d)
        mu = self.means.astype(jnp.float32)            # (K, d)
        sc = self.scales.astype(jnp.float32)
        u = (z32 - mu) / sc
        comp = -0.5 * (self.d * _LOG_2PI + jnp.sum(u * u, axis=-1)) - jnp.sum(
            jnp.log(sc), axis=-1
        )                                              # (..., K)
        logw = jax.nn.log_softmax(self.logits.astype(jnp.float32))
        return jax.scipy.special.logsumexp(comp + logw, axis=-1)

    def sample(self, key, shape, dtype=jnp.float32):
        kc, kn = jax.random.split(key)
        shape = tuple(shape)
        comp = jax.random.categorical(kc, self.logits, shape=shape)
        eps = jax.random.normal(kn, shape + (self.d,), dtype)
        mu = self.means.astype(dtype)[comp]
        sc = self.scales.astype(dtype)[comp]
        return mu + sc * eps


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BoxUniform:
    """Uniform on the axis-aligned box [lo, hi]^d — the natural base (or
    SBI prior) for flows ending in a :class:`LogitLayer`/normalization to
    bounded support. ``log_prob`` is -inf outside the box."""

    lo: jax.Array  # (d,)
    hi: jax.Array  # (d,)

    @property
    def d(self) -> int:
        return self.lo.shape[-1]

    def log_prob(self, z):
        z32 = z.astype(jnp.float32)
        lo = self.lo.astype(jnp.float32)
        hi = self.hi.astype(jnp.float32)
        inside = jnp.all((z32 >= lo) & (z32 <= hi), axis=-1)
        vol = jnp.sum(jnp.log(hi - lo))
        return jnp.where(inside, -vol, -jnp.inf)

    def sample(self, key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, tuple(shape) + (self.d,), dtype)
        return self.lo.astype(dtype) + (self.hi - self.lo).astype(dtype) * u
