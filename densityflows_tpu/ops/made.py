"""MADE: masked autoencoder MLPs for autoregressive conditioners.

Capability addition beyond the reference (it has only coupling layers):
binary masks over dense weights enforce the autoregressive property
out_i ⟂ in_{≥i} (Germain et al. 2015), so a masked MLP computes ALL
conditional parameters μ_i(x_{<i}), α_i(x_{<i}) in one batched matmul
pass — MXU-friendly, no sequential loop in the density direction.

Conditions θ get degree 0 (visible to every output); feature degrees are
1..d; hidden degrees cycle 1..d−1; outputs connect strictly downstream.
Masks are static (baked at trace time) — the masked matmul is a plain
``(batch, in) @ (in·mask, out)`` the compiler fuses like any dense layer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MaskedMLP", "init_made", "apply_made"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaskedMLP:
    """Dense stack with static binary weight masks (MADE)."""

    weights: tuple
    biases: tuple
    masks: tuple = dataclasses.field(metadata=dict(static=True))
    activation: str = dataclasses.field(metadata=dict(static=True),
                                        default="relu")

    @property
    def dims(self) -> tuple[int, ...]:
        return tuple(int(w.shape[0]) for w in self.weights) + (
            int(self.weights[-1].shape[1]),
        )


def _degrees(d: int, n_cond: int, hidden_dims: list[int], rng: np.random.Generator):
    """Input degrees: 0 for the n_cond condition inputs, then 1..d for the
    features. Hidden degrees cycle over 1..max(d-1,1). Output degrees are
    1..d repeated per-parameter (caller reshapes)."""
    in_deg = np.concatenate([np.zeros(n_cond, np.int64), np.arange(1, d + 1)])
    hid = []
    lo = 1
    hi = max(d - 1, 1)
    for h in hidden_dims:
        hid.append((np.arange(h) % hi) + lo)
    return in_deg, hid


def init_made(
    key,
    d: int,
    n_cond: int,
    n_params_per_dim: int,
    n_sublayers: int = 2,
    *,
    hidden_dim: int = 64,
    activation: str = "relu",
    dtype=jnp.float32,
    zero_final: bool = True,
) -> MaskedMLP:
    """Masked MLP mapping ``concat([θ, x]) (…, n_cond+d)`` to
    ``(…, d·n_params_per_dim)`` with out[i·P..] depending only on
    x_{<i} and θ."""
    hidden_dims = [hidden_dim] * n_sublayers
    rng = np.random.default_rng(0)
    in_deg, hid_degs = _degrees(d, n_cond, hidden_dims, rng)
    out_deg = np.repeat(np.arange(1, d + 1), n_params_per_dim)

    degs = [in_deg] + hid_degs + [out_deg]
    dims = [n_cond + d] + hidden_dims + [d * n_params_per_dim]
    keys = jax.random.split(key, len(dims) - 1)
    weights, biases, masks = [], [], []
    n_layers = len(dims) - 1
    for i, (k, d_in, d_out) in enumerate(zip(keys, dims[:-1], dims[1:])):
        if i == n_layers - 1:
            # output layer: strict inequality enforces out_i ⟂ in_{≥i}
            mask = (degs[i + 1][:, None] > degs[i][None, :]).T
        else:
            mask = (degs[i + 1][:, None] >= degs[i][None, :]).T
        if zero_final and i == n_layers - 1:
            w = jnp.zeros((d_in, d_out), dtype)
        else:
            limit = np.sqrt(6.0 / (d_in + d_out))
            w = jax.random.uniform(k, (d_in, d_out), dtype, -limit, limit)
        weights.append(w)
        biases.append(jnp.zeros((d_out,), dtype))
        masks.append(tuple(map(tuple, mask.astype(np.float32).tolist())))
    return MaskedMLP(tuple(weights), tuple(biases), tuple(masks), activation)


def apply_made(net: MaskedMLP, h: jax.Array) -> jax.Array:
    """(…, n_cond+d) → (…, d·n_params_per_dim), autoregressive in x."""
    from .mlp import ACTIVATIONS

    act = ACTIVATIONS[net.activation]
    n = len(net.weights)
    a = h
    for i, (w, b, m) in enumerate(zip(net.weights, net.biases, net.masks)):
        mask = jnp.asarray(m, dtype=w.dtype)
        # compute in the weights' dtype end-to-end (same rationale as
        # apply_mlp: an f32 epilogue per layer promotes the backward
        # matmuls to half-rate f32); one cast back at the output
        a = jnp.dot(a.astype(w.dtype), w * mask) + b
        if i < n - 1:
            a = act(a)
    return a.astype(h.dtype) if a.dtype != h.dtype else a
