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

The static aux data on the pytree is a 4-int descriptor
``(d, n_cond, n_params_per_dim, hidden_dims)`` — NOT the masks
themselves. Masks are a pure function of the descriptor, rebuilt as
cached numpy constants at trace time (:func:`made_masks`). Storing the
O(d·hidden) float grid in aux (the previous formulation) meant tens of
thousands of boxed Python floats hashed on EVERY jit cache lookup at
BASELINE config-5 scale (d=128): measured at d=128/hidden=128, the
descriptor form cuts trace+lower time 3.7x (39.9 ms → 10.7 ms) and the
jit cache-key hash ~4800x (528 µs → 0.11 µs per lookup)
(docs/design.md §9).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MaskedMLP", "init_made", "apply_made", "made_masks"]


@functools.lru_cache(maxsize=None)
def made_masks(
    d: int, n_cond: int, n_params_per_dim: int, hidden_dims: tuple[int, ...]
) -> tuple[np.ndarray, ...]:
    """The MADE mask stack for one descriptor, as read-only float32 numpy
    arrays (one (in_i, out_i) mask per dense layer). Deterministic in the
    descriptor; cached so every trace of the same architecture reuses the
    same constants (XLA then dedupes them across programs)."""
    in_deg = np.concatenate(
        [np.zeros(n_cond, np.int64), np.arange(1, d + 1)]
    )
    hi = max(d - 1, 1)
    degs = [in_deg]
    for h in hidden_dims:
        degs.append((np.arange(h) % hi) + 1)
    degs.append(np.repeat(np.arange(1, d + 1), n_params_per_dim))

    masks = []
    n_layers = len(degs) - 1
    for i in range(n_layers):
        if i == n_layers - 1:
            # output layer: strict inequality enforces out_i ⟂ in_{≥i}
            m = (degs[i + 1][:, None] > degs[i][None, :]).T
        else:
            m = (degs[i + 1][:, None] >= degs[i][None, :]).T
        m = np.ascontiguousarray(m, np.float32)
        m.setflags(write=False)
        masks.append(m)
    return tuple(masks)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaskedMLP:
    """Dense stack with static binary weight masks (MADE).

    ``made`` is the compact static descriptor
    ``(d, n_cond, n_params_per_dim, hidden_dims)`` from which the masks
    are rebuilt (:func:`made_masks`) — small, hashable, O(1) in the jit
    cache key."""

    weights: tuple
    biases: tuple
    made: tuple = dataclasses.field(metadata=dict(static=True))
    activation: str = dataclasses.field(metadata=dict(static=True),
                                        default="relu")

    @property
    def masks(self) -> tuple[np.ndarray, ...]:
        d, n_cond, n_params, hidden = self.made
        return made_masks(d, n_cond, n_params, tuple(hidden))

    @property
    def dims(self) -> tuple[int, ...]:
        return tuple(int(w.shape[0]) for w in self.weights) + (
            int(self.weights[-1].shape[1]),
        )


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
    hidden_dims = (hidden_dim,) * n_sublayers
    dims = [n_cond + d] + list(hidden_dims) + [d * n_params_per_dim]
    keys = jax.random.split(key, len(dims) - 1)
    weights, biases = [], []
    n_layers = len(dims) - 1
    for i, (k, d_in, d_out) in enumerate(zip(keys, dims[:-1], dims[1:])):
        if zero_final and i == n_layers - 1:
            w = jnp.zeros((d_in, d_out), dtype)
        else:
            limit = np.sqrt(6.0 / (d_in + d_out))
            w = jax.random.uniform(k, (d_in, d_out), dtype, -limit, limit)
        weights.append(w)
        biases.append(jnp.zeros((d_out,), dtype))
    made = (int(d), int(n_cond), int(n_params_per_dim), hidden_dims)
    return MaskedMLP(tuple(weights), tuple(biases), made, activation)


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
