"""Masked autoregressive flow (MAF) layers.

Capability addition beyond the reference's coupling layers: a MAF layer
(Papamakarios et al. 2017) transforms EVERY dim with an affine map whose
parameters depend autoregressively on the preceding dims — one masked-MLP
pass in the density/training direction (``inverse``: parallel, the hot
path), a d-step ``lax.scan`` in the sampling direction (``forward``:
inherently sequential — use coupling layers when sampling throughput
matters more than density expressiveness).

Direction convention matches the package (forward = latent→data):

    inverse:  z_i = (x_i − μ_i(x_{<i}, θ)) · exp(−α_i(x_{<i}, θ)),
              ldj = −Σ α                                    (parallel)
    forward:  x_i = z_i · exp(α_i(x_{<i}, θ)) + μ_i(x_{<i}, θ)  (scan)

α is clamped through tanh scaling (±``max_log_scale``) — the standard
MAF stabilization for exp overflow.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.made import MaskedMLP, apply_made, init_made

__all__ = ["MAFLayer", "maf_layer", "IAFLayer", "iaf_layer"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MAFLayer:
    """Affine masked autoregressive flow over all d dims."""

    net: MaskedMLP
    d: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True), default=0)
    max_log_scale: float = dataclasses.field(metadata=dict(static=True),
                                             default=5.0)

    def _mu_alpha(self, x, theta):
        h = jnp.concatenate([theta, x], axis=-1)
        out = apply_made(self.net, h)
        out = out.reshape(out.shape[:-1] + (self.d, 2))
        mu, alpha = out[..., 0], out[..., 1]
        alpha = self.max_log_scale * jnp.tanh(alpha / self.max_log_scale)
        return mu, alpha

    def inverse(self, x, theta):
        """data → latent: one parallel masked pass (the training path)."""
        mu, alpha = self._mu_alpha(x, theta)
        z = (x - mu) * jnp.exp(-alpha)
        ldj = -jnp.sum(alpha.astype(jnp.float32), axis=-1)
        return z, ldj

    def forward(self, z, theta):
        """latent → data: sequential over dims (x_i needs x_{<i})."""
        def body(x, i):
            mu, alpha = self._mu_alpha(x, theta)
            xi = z[..., i] * jnp.exp(alpha[..., i]) + mu[..., i]
            x = x.at[..., i].set(xi)
            return x, alpha[..., i]

        x0 = jnp.zeros_like(z)
        x, alphas = jax.lax.scan(body, x0, jnp.arange(self.d))
        ldj = jnp.sum(
            jnp.moveaxis(alphas, 0, -1).astype(jnp.float32), axis=-1
        )
        return x, ldj

    def forward_(self, z, theta):
        return self.forward(z, theta)[0]

    def summarize(self) -> str:
        return (
            f"MAFLayer          | made  > {list(self.net.dims)} "
            f"(d={self.d}, n={self.n})"
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IAFLayer:
    """Inverse autoregressive flow (Kingma et al. 2016): the MAF dual.

    Parameters are autoregressive in the LATENT z, so sampling
    (``forward``) is one parallel masked pass and density evaluation
    (``inverse``) is the d-step scan — choose MAF for training-heavy
    workloads, IAF for sampling-heavy ones.

        forward:  x_i = z_i · exp(α_i(z_{<i}, θ)) + μ_i(z_{<i}, θ)  (parallel)
        inverse:  z_i = (x_i − μ_i(z_{<i}, θ)) · exp(−α_i)          (scan)
    """

    net: MaskedMLP
    d: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True), default=0)
    max_log_scale: float = dataclasses.field(metadata=dict(static=True),
                                             default=5.0)

    _mu_alpha = MAFLayer._mu_alpha

    def forward(self, z, theta):
        mu, alpha = self._mu_alpha(z, theta)
        x = z * jnp.exp(alpha) + mu
        ldj = jnp.sum(alpha.astype(jnp.float32), axis=-1)
        return x, ldj

    def forward_(self, z, theta):
        return self.forward(z, theta)[0]

    def inverse(self, x, theta):
        def body(z, i):
            mu, alpha = self._mu_alpha(z, theta)
            zi = (x[..., i] - mu[..., i]) * jnp.exp(-alpha[..., i])
            z = z.at[..., i].set(zi)
            return z, alpha[..., i]

        z0 = jnp.zeros_like(x)
        z, alphas = jax.lax.scan(body, z0, jnp.arange(self.d))
        ldj = -jnp.sum(
            jnp.moveaxis(alphas, 0, -1).astype(jnp.float32), axis=-1
        )
        return z, ldj

    def summarize(self) -> str:
        return (
            f"IAFLayer          | made  > {list(self.net.dims)} "
            f"(d={self.d}, n={self.n})"
        )


def maf_layer(
    d: int,
    *,
    n: int = 0,
    key=None,
    n_sublayers: int = 2,
    hidden_dim: int = 64,
    activation: str = "relu",
    max_log_scale: float = 5.0,
    dtype=jnp.float32,
) -> MAFLayer:
    """Build a MAF layer (pair with :func:`permutation_layer` between
    stacked MAF layers to vary the autoregressive order)."""
    if key is None:
        key = jax.random.key(0)
    net = init_made(
        key, d, n, 2, n_sublayers,
        hidden_dim=hidden_dim, activation=activation, dtype=dtype,
    )
    return MAFLayer(net, d, n, float(max_log_scale))


def iaf_layer(
    d: int,
    *,
    n: int = 0,
    key=None,
    n_sublayers: int = 2,
    hidden_dim: int = 64,
    activation: str = "relu",
    max_log_scale: float = 5.0,
    dtype=jnp.float32,
) -> IAFLayer:
    """Build an IAF layer (sampling-fast dual of :func:`maf_layer`)."""
    if key is None:
        key = jax.random.key(0)
    net = init_made(
        key, d, n, 2, n_sublayers,
        hidden_dim=hidden_dim, activation=activation, dtype=dtype,
    )
    return IAFLayer(net, d, n, float(max_log_scale))
