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

__all__ = ["StandardNormal", "DiagNormal"]

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
