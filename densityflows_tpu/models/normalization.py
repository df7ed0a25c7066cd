"""Non-trainable normalization layer pinned to the data range.

TPU-native counterpart of the reference ``NormalizationLayer``
(/root/reference/src/norm/Normalization.jl:30-103): a per-dim affine
rescale mapping ``[x_min, x_max] → [α, β]`` in the inverse (data→latent)
direction with a constant log-det-Jacobian, typically placed LAST in a
chain to tame exp-overflow NaNs (docs/src/documentation.md:61). bf16 makes
that failure mode sharper, so the ldj is always accumulated in fp32.

Non-trainability: the reference marks ``trainable=()``
(Normalization.jl:61); here ``x_min``/``x_max`` are wrapped in
``jax.lax.stop_gradient`` inside the apply, so their gradients are exactly
zero and any optax optimizer leaves them untouched — no trainable/frozen
partition machinery needed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "NormalizationLayer", "normalization_layer",
    "PermutationLayer", "permutation_layer",
    "LogitLayer", "logit_layer",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NormalizationLayer:
    """Per-dim affine rescale (reference Normalization.jl:30-35).

    ``x_min``/``x_max``: (d,) data range; ``alpha``/``beta``: static scalar
    output bounds (β > α).
    """

    x_min: jax.Array
    x_max: jax.Array
    alpha: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    beta: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    def _bounds(self):
        lo = jax.lax.stop_gradient(self.x_min)
        hi = jax.lax.stop_gradient(self.x_max)
        return lo, hi, hi - lo, self.beta - self.alpha

    def _const_ldj(self, batch_shape):
        _, _, diff, delta = self._bounds()
        val = jnp.sum(jnp.log(diff.astype(jnp.float32) / delta))
        return jnp.broadcast_to(val, batch_shape)

    def inverse(self, x, theta=None):
        """data → latent: map [x_min,x_max] → [α,β]; ldj = −Σ log(Δx/δ)
        (reference ``backward``, Normalization.jl:64-77)."""
        lo, hi, diff, delta = self._bounds()
        z = (self.beta * (x - lo) + self.alpha * (hi - x)) / diff
        return z, -self._const_ldj(x.shape[:-1])

    def forward(self, z, theta=None):
        """latent → data inverse map; ldj = +Σ log(Δx/δ)
        (reference ``forward``, Normalization.jl:79-92)."""
        lo, hi, diff, delta = self._bounds()
        x = (diff * z - self.alpha * hi + self.beta * lo) / delta
        return x, self._const_ldj(z.shape[:-1])

    def forward_(self, z, theta=None):
        """ldj-free sampling fast path (reference ``forward!``,
        Normalization.jl:95-103)."""
        lo, hi, diff, delta = self._bounds()
        return (diff * z - self.alpha * hi + self.beta * lo) / delta

    def summarize(self) -> str:
        return "Normalization Layer"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PermutationLayer:
    """Fixed feature permutation (ldj = 0). No reference counterpart —
    standard flow utility for mixing dims between couplings without
    hand-picking masks; the permutation is a static gather XLA folds into
    the adjacent coupling's slice pattern.
    """

    perm: tuple = dataclasses.field(metadata=dict(static=True))

    def _inv(self):
        inv = np.empty(len(self.perm), np.int64)
        inv[list(self.perm)] = np.arange(len(self.perm))
        return inv.tolist()

    def forward(self, z, theta=None):
        return z[..., list(self.perm)], jnp.zeros(z.shape[:-1], jnp.float32)

    def inverse(self, x, theta=None):
        return x[..., self._inv()], jnp.zeros(x.shape[:-1], jnp.float32)

    def forward_(self, z, theta=None):
        return z[..., list(self.perm)]

    def summarize(self) -> str:
        return f"Permutation Layer {list(self.perm)}"


def permutation_layer(perm_or_d, *, key=None) -> PermutationLayer:
    """``permutation_layer([2,0,1])`` for an explicit permutation, or
    ``permutation_layer(d, key=...)`` for a random one (reversed range
    when no key is given)."""
    if isinstance(perm_or_d, int):
        d = perm_or_d
        if key is None:
            perm = tuple(reversed(range(d)))
        else:
            perm = tuple(int(i) for i in jax.random.permutation(key, d))
    else:
        perm = tuple(int(i) for i in perm_or_d)
        if sorted(perm) != list(range(len(perm))):
            raise ValueError(f"{perm} is not a permutation of range({len(perm)})")
    return PermutationLayer(perm)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LogitLayer:
    """Smooth bijection between the box (lo, hi)^d and all of ℝ^d.

    No reference counterpart — the reference clamps bounded data with the
    affine ``NormalizationLayer`` only, which leaves the support edges
    reachable and the density discontinuous there. The logit transform is
    the standard fix for data with hard bounds (images, simulator outputs
    on a box): place it LAST in the chain so every preceding layer works
    on an unconstrained ℝ^d.

    ``forward`` (latent → data): x = lo + (hi − lo)·σ(z);
    ``inverse`` (data → latent): z = logit((x − lo)/(hi − lo)), with the
    argument clamped to [eps, 1−eps] for edge samples. ldj computed via
    log-sigmoid for stability (no exp overflow anywhere).
    """

    lo: jax.Array  # (d,)
    hi: jax.Array  # (d,)
    eps: float = dataclasses.field(metadata=dict(static=True), default=1e-6)

    def _logdet_fwd(self, z):
        # d x/d z = (hi-lo)·σ(z)(1-σ(z));  log σ(z) = -softplus(-z)
        z32 = z.astype(jnp.float32)
        width = jnp.log((self.hi - self.lo).astype(jnp.float32))
        per_dim = -jax.nn.softplus(-z32) - jax.nn.softplus(z32) + width
        return jnp.sum(per_dim, axis=-1)

    def forward(self, z, theta=None):
        x = self.lo + (self.hi - self.lo) * jax.nn.sigmoid(z)
        return x, self._logdet_fwd(z)

    def inverse(self, x, theta=None):
        u = (x - self.lo) / (self.hi - self.lo)
        u = jnp.clip(u, self.eps, 1.0 - self.eps)
        z = jnp.log(u) - jnp.log1p(-u)
        return z, -self._logdet_fwd(z)

    def forward_(self, z, theta=None):
        return self.lo + (self.hi - self.lo) * jax.nn.sigmoid(z)

    def summarize(self) -> str:
        return f"Logit Layer       | d = {self.lo.shape[0]}"


def logit_layer(x, *, margin: float = 0.0, eps: float = 1e-6) -> LogitLayer:
    """Build from data bounds (min/max over all batch dims, widened by
    ``margin``·range on each side so observed extremes sit strictly
    inside the open box). Accepts an array ``(batch..., d)``, a
    :class:`~densityflows_tpu.data.DataArrays`, or an ``(lo, hi)`` tuple
    of per-dim bounds."""
    from ..data import DataArrays

    if isinstance(x, tuple) and len(x) == 2:
        lo = np.asarray(x[0], np.float32)
        hi = np.asarray(x[1], np.float32)
    else:
        if isinstance(x, DataArrays):
            x = x.x
        x = np.asarray(x, np.float32)
        flat = x.reshape(-1, x.shape[-1])
        lo, hi = flat.min(axis=0), flat.max(axis=0)
        pad = margin * (hi - lo)
        lo, hi = lo - pad, hi + pad
    if np.any(hi <= lo):
        raise ValueError("logit_layer needs hi > lo in every dim")
    return LogitLayer(jnp.asarray(lo), jnp.asarray(hi), float(eps))


def normalization_layer(x, alpha: float = 0.0, beta: float = 1.0) -> NormalizationLayer:
    """Build from data min/max over all batch dims (reference
    Normalization.jl:51-59; also accepts a
    :class:`~densityflows_tpu.data.DataArrays`)."""
    from ..data import DataArrays

    if isinstance(x, DataArrays):
        x = x.x
    if beta <= alpha:
        raise ValueError("normalization bounds must satisfy beta > alpha")
    x = np.asarray(x)
    flat = x.reshape(-1, x.shape[-1])
    lo, hi = flat.min(axis=0), flat.max(axis=0)
    degenerate = np.flatnonzero(hi <= lo)
    if degenerate.size:
        raise ValueError(
            f"data dims {degenerate.tolist()} have zero range — the "
            "normalization ldj log(Δx/δ) would be -inf; drop or jitter "
            "constant dims before building the layer"
        )
    return NormalizationLayer(
        jnp.asarray(lo), jnp.asarray(hi), float(alpha), float(beta)
    )
